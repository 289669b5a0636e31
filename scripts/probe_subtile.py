#!/usr/bin/env python
"""One-off TPU probe: full tree steps with the in-kernel subtile MAC,
n=1M galaxy theta=0.5 fp32, both engines x dims.  JSON lines to argv[1].
"""

import json
import sys
from functools import partial

import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_subtile.json"
N = 1_000_000


def log(obj):
    with open(OUT, "a") as fh:
        fh.write(json.dumps(obj) + "\n")
    print(obj, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from nbody_tpu.models import build_galaxy_model
    from nbody_tpu.sim.engines import EngineOptions, get_engine
    from nbody_tpu.utils.measure import scan_seconds_per_step
    from nbody_tpu.utils.timing import sync

    for dim in (3, 2):
        cfg, state = build_galaxy_model(N, dim, np.float32)
        for algo in ("bvh", "octree"):
            step = get_engine(algo).make_step(cfg, EngineOptions())

            @partial(jax.jit, static_argnames=("iters",))
            def eloop(s, iters, _step=step):
                def body(c, k):
                    c2, _ = _step(c, k)
                    return c2, None

                return jax.lax.scan(body, s, jnp.arange(iters))[0].x

            try:
                dt = scan_seconds_per_step(eloop, (state,), iters_short=1,
                                           iters_long=4, repeats=2)
                log({"probe": "subtile_step", "algo": algo, "dim": dim,
                     "sec": dt})
            except Exception as e:
                log({"probe": "subtile_step", "algo": algo, "dim": dim,
                     "error": str(e)[:300]})

        # evolved-state numbers (50 steps pre-roll with the octree step)
        stepo = get_engine("octree").make_step(cfg, EngineOptions())

        @partial(jax.jit, static_argnames=("iters",))
        def evolve(s, iters):
            def body(c, k):
                c2, _ = stepo(c, k)
                return c2, None

            return jax.lax.scan(body, s, jnp.arange(iters))[0]

        est = state
        for _ in range(4):
            est = evolve(est, 13)
        sync(est)
        for algo in ("bvh", "octree"):
            step = get_engine(algo).make_step(cfg, EngineOptions())

            @partial(jax.jit, static_argnames=("iters",))
            def eloop(s, iters, _step=step):
                def body(c, k):
                    c2, _ = _step(c, k)
                    return c2, None

                return jax.lax.scan(body, s, jnp.arange(iters))[0].x

            try:
                dt = scan_seconds_per_step(eloop, (est,), iters_short=1,
                                           iters_long=4, repeats=2)
                log({"probe": "subtile_step_evolved", "algo": algo,
                     "dim": dim, "sec": dt})
            except Exception as e:
                log({"probe": "subtile_step_evolved", "algo": algo,
                     "dim": dim, "error": str(e)[:300]})
    log({"probe": "subtile_done"})


if __name__ == "__main__":
    main()
