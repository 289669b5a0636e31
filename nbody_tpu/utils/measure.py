"""Robust wall-clock measurement on the axon TPU tunnel.

The tunnel shows multi-second latency spikes (worker restarts, cold
compiles), which wreck naive and single-differential timings (negative
deltas were observed in round 2).  The estimator here:

  * times a jitted lax.scan of `iters` chained evaluations (nothing can
    be elided or cached across iterations);
  * takes the MIN over `repeats` runs of a short and a long scan (min is
    robust to one-sided latency noise);
  * reports (long - short) / (iters_long - iters_short), cancelling the
    constant per-call dispatch cost;
  * forces completion with utils.timing.sync (block_until_ready does not
    block on this backend).
"""

from __future__ import annotations

import time

from nbody_tpu.utils.timing import sync


def scan_seconds_per_step(loop, args, iters_short: int = 2,
                          iters_long: int = 10, repeats: int = 3) -> float:
    """loop(*args, iters) must run `iters` chained steps under jit."""

    def timed(iters: int) -> float:
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = loop(*args, iters)
            sync(out)
            best = min(best, time.perf_counter() - t0)
        return best

    sync(loop(*args, iters_short))  # compile
    sync(loop(*args, iters_long))
    t_short = timed(iters_short)
    t_long = timed(iters_long)
    return max((t_long - t_short) / (iters_long - iters_short), 1e-9)
