#!/usr/bin/env python
"""One-off TPU probe: the f64 LIST-path tree step cost (VERDICT round-2
item 4) -- the reference's benchmark matrix is 3-D double, which on TPU
falls back to the chunked jnp group-list path over emulated f64.

Feeds: BASELINE.md f64 tree-step table (VERDICT r4 item 2).

Measures seconds/step for bvh+octree, 3-D double galaxy theta=0.5, at
increasing n (100k, 250k, then 1M only if a 250k step stays under the
tunnel's ~45 s single-dispatch budget scaled to 1M).  Results appended as
JSON lines to argv[1] (default /tmp/probe_f64.json).
"""

import json
import sys
from functools import partial

import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_f64.json"


def log(obj):
    with open(OUT, "a") as fh:
        fh.write(json.dumps(obj) + "\n")
    print(obj, flush=True)


def measure(algo: str, n: int, iters_long: int = 2) -> float:
    import jax

    # WITHOUT this, float64 arrays silently truncate to f32 and the
    # "double" numbers would be a lie (this jax build also ignores the
    # JAX_ENABLE_X64 env var -- CLAUDE.md)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from nbody_tpu.models import build_galaxy_model
    from nbody_tpu.sim.engines import EngineOptions, get_engine
    from nbody_tpu.utils.measure import scan_seconds_per_step

    cfg, state = build_galaxy_model(n, 3, np.float64)
    step = get_engine(algo).make_step(cfg, EngineOptions(kernel="jnp"))

    @partial(jax.jit, static_argnames=("iters",))
    def loop(s, iters):
        def body(c, k):
            c2, _ = step(c, k)
            return c2, None

        return jax.lax.scan(body, s, jnp.arange(iters))[0].x

    return scan_seconds_per_step(loop, (state,), iters_short=1,
                                 iters_long=iters_long, repeats=1)


def main():
    log({"probe": "f64_start"})
    budget = 40.0  # seconds of device time per dispatch we dare spend
    # optional argv[2] restricts to one algo (retry of a crashed case);
    # optional argv[3] is a comma-separated n list (the octree f64 step
    # at 100k reproducibly crashes the tunnel worker -- one step exceeds
    # the ~45 s single-dispatch budget -- so it must be measured smaller
    # and extrapolated)
    algos = (sys.argv[2],) if len(sys.argv) > 2 else ("bvh", "octree")
    n_list = (tuple(int(x) for x in sys.argv[3].split(","))
              if len(sys.argv) > 3 else (100_000, 250_000, 1_000_000))
    for algo in algos:
        dt_small = None
        for n in n_list:
            if dt_small is not None:
                # n log n scaling estimate of the next step cost; the
                # timed dispatch runs iters_long+? steps back to back
                est = dt_small * (n / n_prev) * 1.3
                if est * 3 > budget:
                    log({"probe": f"{algo}_f64_3d", "n": n, "skipped": True,
                         "estimated_sec_per_step": est})
                    continue
            try:
                dt = measure(algo, n)
                log({"probe": f"{algo}_f64_3d", "n": n, "sec": dt})
                dt_small, n_prev = dt, n
            except Exception as e:  # pragma: no cover
                log({"probe": f"{algo}_f64_3d", "n": n,
                     "error": str(e)[:300]})
                break
    log({"probe": "f64_done"})


if __name__ == "__main__":
    main()
