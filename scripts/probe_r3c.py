#!/usr/bin/env python
"""One-off TPU probe (round 3): BVH windowed fast path 3-D component
breakdown at n=1M galaxy theta=0.5 -- ablations win/far/resid/rlist,
one case per process.  Usage: probe_r3c.py OUT case SPEC
SPEC = ablate|none,evolved[,refine]  e.g. "resid,0" or "none,0,1"
"""

import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

OUT = sys.argv[1]
SPEC = sys.argv[2]
N = 1_000_000


def log(obj):
    with open(OUT, "a") as fh:
        fh.write(json.dumps(obj) + "\n")
    print(obj, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from nbody_tpu.models import build_galaxy_model
    from nbody_tpu.ops.bvh import build_tree
    from nbody_tpu.ops.bvh_group import compute_force_grouped_windowed
    from nbody_tpu.ops.geometry import aabb_of_points
    from nbody_tpu.ops.hilbert import hilbert_sort_perm
    from nbody_tpu.ops.integrator import leapfrog_step
    from nbody_tpu.sim.engines import EngineOptions, get_engine
    from nbody_tpu.utils.measure import scan_seconds_per_step
    from nbody_tpu.utils.timing import sync

    parts = SPEC.split(",")
    ablate, evolved = parts[0], int(parts[1])
    refine = int(parts[2]) if len(parts) > 2 else None
    ablate = "" if ablate == "none" else ablate

    dim = 3
    cfg, state = build_galaxy_model(N, dim, np.float32)
    theta, G, eps, dt = 0.5, float(cfg.G), cfg.eps, cfg.dt

    import dataclasses

    def step(s):
        xmin, xmax = aabb_of_points(s.x, eps)
        perm = hilbert_sort_perm(s.x, xmin, xmax, true_curve=True)
        m, x = s.m[perm], s.x[perm]
        tree = build_tree(m, x, eps)
        a_s, info = compute_force_grouped_windowed(
            tree, m, x, theta, G, eps, ablate=ablate,
            refine_levels=refine)
        a = jnp.zeros_like(a_s).at[perm].set(a_s)
        return leapfrog_step(dataclasses.replace(s, a=a), dt), info

    st = state
    if evolved:
        stepb = get_engine("bvh").make_step(cfg, EngineOptions())

        @partial(jax.jit, static_argnames=("iters",))
        def evolve(s, iters):
            def body(c, kk):
                c2, _ = stepb(c, kk)
                return c2, None

            return jax.lax.scan(body, s, jnp.arange(iters))[0]

        for _ in range(4):
            st = evolve(st, 13)
        sync(st)

    @partial(jax.jit, static_argnames=("iters",))
    def loop(s, iters):
        def body(c, _):
            c2, _i = step(c)
            return c2, None

        return jax.lax.scan(body, s, None, length=iters)[0].x

    try:
        dtv = scan_seconds_per_step(loop, (st,), iters_short=1,
                                    iters_long=3, repeats=2)

        @jax.jit
        def fb(s):
            info = step(s)[1]
            return {kk: info[kk] for kk in
                    ("fallback_tiles", "entries", "res_pairs")}

        stats = {kk: int(v) for kk, v in fb(st).items()}
        log({"probe": "r3c", "ablate": ablate or "none",
             "evolved": evolved, "refine": refine, "sec": dtv, **stats})
    except Exception as e:
        log({"probe": "r3c", "ablate": ablate or "none",
             "evolved": evolved, "error": str(e)[:300]})


if __name__ == "__main__":
    main()
