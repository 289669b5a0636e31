"""Parked machinery: measured-negative designs kept OUT of the production
package tree (nbody_tpu/ops, sim) by explicit decision.

Everything here is opt-in only, fully tested, and documented with the
measurement that parked it (BASELINE.md negative-results table).  Promote
a module back to ops/ only with a measurement showing it winning at a
production config.
"""
