"""Leapfrog (velocity-Verlet) integrator.

Exact functional form of System::accelerate_step (src/system.h:52-60):

    x  += dt * v + 0.5 * dt^2 * ao      (uses the PREVIOUS accel ao)
    v  += 0.5 * dt * (a + ao)
    ao  = a

where `a` is the acceleration just produced by the force engine for the
current positions and `ao` is the one from the previous step. A step is
therefore: accel = force(state); state = leapfrog_step(state with a=accel).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from nbody_tpu.state import SystemState


def leapfrog_step(state: SystemState, dt: float) -> SystemState:
    dtv = jnp.asarray(dt, state.x.dtype)
    half = jnp.asarray(0.5, state.x.dtype)
    x = state.x + dtv * state.v + half * dtv * dtv * state.ao
    v = state.v + half * dtv * (state.a + state.ao)
    return dataclasses.replace(state, x=x, v=v, ao=state.a)
