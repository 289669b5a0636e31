#!/usr/bin/env python
"""One-off TPU sweep: full BVH step with refine_levels x window_tiles, and
the redesigned (anisotropic) octree fast step, at n=1M galaxy theta=0.5
fp32, both dims.  JSON lines to argv[1] (default /tmp/probe_sweep.json).
"""

import json
import sys
from functools import partial

import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_sweep.json"
N = 1_000_000


def log(obj):
    with open(OUT, "a") as fh:
        fh.write(json.dumps(obj) + "\n")
    print(obj, flush=True)


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from nbody_tpu.models import build_galaxy_model
    from nbody_tpu.ops.bvh import build_tree
    from nbody_tpu.ops.bvh_group import compute_force_grouped_windowed
    from nbody_tpu.ops.geometry import aabb_of_points
    from nbody_tpu.ops.hilbert import hilbert_sort_perm
    from nbody_tpu.ops.integrator import leapfrog_step
    from nbody_tpu.ops.octree import (
        max_depth, morton_sort, robust_quant_box)
    from nbody_tpu.ops.geometry import scalar_bounds
    from nbody_tpu.ops.octree_group import compute_force_grouped_fast
    from nbody_tpu.utils.measure import scan_seconds_per_step

    only = sys.argv[2] if len(sys.argv) > 2 else ""

    for dim in (3, 2):
        cfg, state = build_galaxy_model(N, dim, np.float32)
        theta, G, eps, dt = 0.5, float(cfg.G), cfg.eps, cfg.dt

        def bvh_step(s, ref, wt):
            xmin, xmax = aabb_of_points(s.x, eps)
            perm = hilbert_sort_perm(s.x, xmin, xmax)
            packed = jnp.concatenate(
                [s.m[:, None], s.x, s.v, s.a, s.ao], axis=1)[perm]
            s = dataclasses.replace(
                s, m=packed[:, 0], x=packed[:, 1:1 + dim],
                v=packed[:, 1 + dim:1 + 2 * dim],
                a=packed[:, 1 + 2 * dim:1 + 3 * dim],
                ao=packed[:, 1 + 3 * dim:1 + 4 * dim])
            tree = build_tree(s.m, s.x, eps)
            a, info = compute_force_grouped_windowed(
                tree, s.m, s.x, theta, G, eps,
                refine_levels=ref, window_tiles=wt)
            s = dataclasses.replace(s, a=a)
            return leapfrog_step(s, dt), info["fallback_tiles"]

        def oct_step(s):
            depth = max_depth(N, dim)
            lo, hi = scalar_bounds(s.x)
            lo_r, hi_r = robust_quant_box(s.x, lo, hi)
            ms, xs, ks, perm = morton_sort(s.m, s.x, lo_r, hi_r, depth)
            a_sorted, info = compute_force_grouped_fast(
                ms, xs, ks, lo_r, hi_r, depth, theta, G, eps)
            a = jnp.zeros_like(a_sorted).at[perm].set(a_sorted)
            s = dataclasses.replace(s, a=a)
            return leapfrog_step(s, dt), info["fallback_tiles"]

        if only in ("", "octree"):
            @partial(jax.jit, static_argnames=("iters",))
            def oloop(s, iters):
                def body(c, _):
                    c2, _fb = body_once(c)
                    return c2, None

                def body_once(c):
                    return oct_step(c)

                return jax.lax.scan(body, s, None, length=iters)[0].x

            try:
                dt_o = scan_seconds_per_step(oloop, (state,), iters_short=1,
                                             iters_long=4, repeats=2)
                fb = int(jax.jit(lambda s: oct_step(s)[1])(state))
                log({"probe": "octree_aniso", "dim": dim, "sec": dt_o,
                     "fallback_tiles": fb})
            except Exception as e:
                log({"probe": "octree_aniso", "dim": dim,
                     "error": str(e)[:300]})

        if only in ("", "bvh"):
            cases = ([(0, 32), (1, 32), (2, 32), (3, 32), (2, 64)]
                     if dim == 3 else [(0, 32), (1, 32), (2, 32)])
            for ref, wt in cases:
                @partial(jax.jit, static_argnames=("iters",))
                def bloop(s, iters, _ref=ref, _wt=wt):
                    def body(c, _):
                        c2, _fb = bvh_step(c, _ref, _wt)
                        return c2, None

                    return jax.lax.scan(body, s, None, length=iters)[0].x

                try:
                    dt_b = scan_seconds_per_step(
                        bloop, (state,), iters_short=1, iters_long=4,
                        repeats=2)
                    fb = int(jax.jit(
                        lambda s, _ref=ref, _wt=wt: bvh_step(s, _ref, _wt)[1]
                    )(state))
                    log({"probe": "bvh_refine", "dim": dim, "refine": ref,
                         "window": wt, "sec": dt_b, "fallback_tiles": fb})
                except Exception as e:
                    log({"probe": "bvh_refine", "dim": dim, "refine": ref,
                         "window": wt, "error": str(e)[:300]})

    log({"probe": "sweep_done"})


if __name__ == "__main__":
    main()
