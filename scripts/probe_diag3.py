#!/usr/bin/env python
"""One-off TPU probe: near-field composition diagnostics at n=1M 3-D
galaxy theta=0.5 -- octree open-cell mass/occupancy and BVH residual
per-subtile MAC pass histogram, fresh + evolved.  JSON lines to argv[1]."""

import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_diag3.json"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000


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
    from nbody_tpu.ops.geometry import aabb_of_points, scalar_bounds
    from nbody_tpu.ops.hilbert import hilbert_sort_perm
    from nbody_tpu.ops.octree import max_depth, morton_sort, robust_quant_box
    from nbody_tpu.ops.octree_group import compute_force_grouped_fast
    from nbody_tpu.sim.engines import EngineOptions, get_engine
    from nbody_tpu.utils.timing import sync

    for dim in (3, 2):
        cfg, state = build_galaxy_model(N, dim, np.float32)
        theta, G, eps = 0.5, float(cfg.G), cfg.eps
        depth = max_depth(N, dim)

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

        @jax.jit
        def oct_diag(s):
            lo, hi = scalar_bounds(s.x)
            lo_r, hi_r = robust_quant_box(s.x, lo, hi)
            ms, xs, ks, _ = morton_sort(s.m, s.x, lo_r, hi_r, depth)
            _, info = compute_force_grouped_fast(
                ms, xs, ks, lo_r, hi_r, depth, theta, G, eps)
            return info

        @jax.jit
        def bvh_diag(s):
            xmin, xmax = aabb_of_points(s.x, eps)
            perm = hilbert_sort_perm(s.x, xmin, xmax, true_curve=(dim == 3))
            m, x = s.m[perm], s.x[perm]
            tree = build_tree(m, x, eps)
            _, info = compute_force_grouped_windowed(
                tree, m, x, theta, G, eps)
            return info

        for name, st in (("fresh", state), ("evolved", est)):
            io = {k: int(v) for k, v in oct_diag(st).items()}
            ntiles = -(-N // 512)
            log({"probe": "oct_diag", "dim": dim, "state": name,
                 "entries": io["entries"], "open_cells": io["open_cells"],
                 "open_mass": io["open_mass"],
                 "fallback_tiles": io["fallback_tiles"],
                 "mass_per_tile": io["open_mass"] / ntiles,
                 "occupancy": io["open_mass"] / max(1, io["entries"] * 256)})
            ib = {k: int(v) for k, v in bvh_diag(st).items()}
            hist = [ib.get(f"res_pass_{k}", 0) for k in range(9)]
            exact_subtiles = sum((8 - k) * c for k, c in enumerate(hist))
            log({"probe": "bvh_diag", "dim": dim, "state": name,
                 "entries": ib["entries"], "res_pairs": ib["res_pairs"],
                 "pass_hist": hist,
                 "exact_subtile_frac": exact_subtiles /
                 max(1, 8 * ib["res_pairs"]),
                 "fallback_tiles": ib["fallback_tiles"]})
    log({"probe": "diag3_done"})


if __name__ == "__main__":
    main()
