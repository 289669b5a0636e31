#!/usr/bin/env python
"""CPU extraction diagnostic at production scale (n=1M 3-D galaxy):
entry counts and LANE UTILIZATION of the merged near/residual entry
streams for both tree engines.  sum(hi - lo) / (entries * S) is the
fraction of evaluated lanes doing useful math -- it sizes the
narrower-residual-block lever (VERDICT round-3 item 3) without needing
the TPU: all evals are ablated away, only the jnp extraction pipeline
runs.  Usage: probe_width_diag.py [OUT] [n] [dim]."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_width.json"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
DIM = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def log(obj):
    with open(OUT, "a") as fh:
        fh.write(json.dumps(obj) + "\n")
    print(obj, flush=True)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nbody_tpu.models import build_galaxy_model

    cfg, state = build_galaxy_model(N, DIM, np.float32)
    theta, G, eps = 0.5, float(cfg.G), cfg.eps
    m, x = state.m, state.x

    # --- bvh ---
    from nbody_tpu.ops.bvh import build_tree
    from nbody_tpu.ops.bvh_group import compute_force_grouped_windowed
    from nbody_tpu.ops.geometry import aabb_of_points
    from nbody_tpu.ops.hilbert import hilbert_sort_perm

    xmin, xmax = aabb_of_points(x, eps)
    perm = hilbert_sort_perm(x, xmin, xmax, true_curve=(DIM == 3))
    ms, xs = m[perm], x[perm]
    tree = build_tree(ms, xs, eps)
    _, info = compute_force_grouped_windowed(
        tree, ms, xs, theta, G, eps, ablate="rlist,far,win", interpret=True)
    ent = int(info["entries"])
    ws = int(info["res_width_sum"])
    rec = {"probe": "width", "algo": "bvh", "n": N, "dim": DIM,
           "entries": ent, "res_width_sum": ws,
           "res_pairs": int(info.get("res_pairs", -1)),
           "fallback_tiles": int(info["fallback_tiles"])}
    for k in sorted(info):
        if k.startswith("res_pass_"):
            rec[k] = int(info[k])
    log(rec)

    # --- octree ---
    from nbody_tpu.ops.geometry import scalar_bounds
    from nbody_tpu.ops.octree import max_depth, morton_sort, robust_quant_box
    from nbody_tpu.ops.octree_group import compute_force_grouped_fast

    depth = max_depth(N, DIM)
    lo, hi = scalar_bounds(x)
    lo_r, hi_r = robust_quant_box(x, lo, hi)
    ms2, xs2, ks2, _ = morton_sort(m, x, lo_r, hi_r, depth)
    _, info2 = compute_force_grouped_fast(
        ms2, xs2, ks2, lo_r, hi_r, depth, theta, G, eps,
        ablate="nlist,far,win", interpret=True)
    rec2 = {"probe": "width", "algo": "octree", "n": N, "dim": DIM,
            "entries": int(info2["entries"]),
            "near_width_sum": int(info2["near_width_sum"]),
            "fallback_tiles": int(info2["fallback_tiles"]),
            "open_cells": int(info2.get("open_cells", -1)),
            "open_mass": float(info2.get("open_mass", -1))}
    log(rec2)


if __name__ == "__main__":
    main()
