"""Headline benchmark: all-pairs fp32 pairwise-interaction throughput on
one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric definition follows the reference (BASELINE.md): the all-pairs kernel
performs exactly N*(N-1) pair evaluations per step (all_pairs.h:20-24), so
interactions/sec = N*(N-1)*steps / elapsed. The baseline denominator is the
north-star target 1e12 interactions/sec/chip (BASELINE.json).

Methodology: the step loop is a jitted lax.scan chaining the positions
through each force evaluation (so nothing can be cached or elided), timed
differentially between a short and a long scan to cancel the constant
dispatch/transfer overhead of the device tunnel. Median of several
differential measurements.
"""

import json
import sys
import time

import numpy as np

N = 32768
ITERS_SHORT = 4
ITERS_LONG = 24
REPEATS = 3
TARGET = 1e12  # north-star interactions/sec/chip


def main() -> int:
    import jax
    import jax.numpy as jnp
    from functools import partial

    from nbody_tpu.ops.pallas_allpairs import allpairs_accel_pallas, pallas_available
    from nbody_tpu.ops.allpairs import allpairs_accel

    eps = float(np.finfo(np.float32).eps)
    rng = np.random.default_rng(0)
    m = jnp.asarray(rng.uniform(0.1, 1.0, N).astype(np.float32))
    x = jnp.asarray(rng.uniform(-1.0, 1.0, (N, 2)).astype(np.float32))

    use_pallas = pallas_available()

    @partial(jax.jit, static_argnames=("iters",))
    def loop(m, x, iters):
        def body(c, _):
            if use_pallas:
                a = allpairs_accel_pallas(m, c, 1.0, eps)
            else:
                a = allpairs_accel(m, c, 1.0, eps, chunk=4096)
            return c + jnp.asarray(1e-12, c.dtype) * a, None

        return jax.lax.scan(body, x, None, length=iters)[0]

    # warm both shapes
    np.asarray(loop(m, x, ITERS_SHORT))
    np.asarray(loop(m, x, ITERS_LONG))

    dts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        np.asarray(loop(m, x, ITERS_SHORT))
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(loop(m, x, ITERS_LONG))
        t_long = time.perf_counter() - t0
        dts.append((t_long - t_short) / (ITERS_LONG - ITERS_SHORT))
    dt = float(np.median(dts))
    dt = max(dt, 1e-9)
    rate = N * (N - 1) / dt

    print(
        json.dumps(
            {
                "metric": "all-pairs fp32 pairwise interactions/sec/chip",
                "value": rate,
                "unit": "interactions/s",
                "vs_baseline": rate / TARGET,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
