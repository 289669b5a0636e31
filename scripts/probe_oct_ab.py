#!/usr/bin/env python
"""One-off TPU probe: A/B the round-3 far-compaction and skip_empty
kernel toggles at S=1024, scalar box, n=1M 3-D fresh.
Usage: probe_oct_ab.py OUT "<ablate tokens>"  (none = production)."""

import dataclasses
import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

OUT = sys.argv[1]
AB = "" if sys.argv[2] == "none" else sys.argv[2]
N = 1_000_000


def log(obj):
    with open(OUT, "a") as fh:
        fh.write(json.dumps(obj) + "\n")
    print(obj, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from nbody_tpu.models import build_galaxy_model
    from nbody_tpu.ops.geometry import scalar_bounds
    from nbody_tpu.ops.integrator import leapfrog_step
    from nbody_tpu.ops.octree import (
        max_depth, morton_sort, robust_quant_box)
    from nbody_tpu.ops.octree_group import compute_force_grouped_fast
    from nbody_tpu.utils.measure import scan_seconds_per_step

    dim = 3
    cfg, state = build_galaxy_model(N, dim, np.float32)
    theta, G, eps, dt = 0.5, float(cfg.G), cfg.eps, cfg.dt
    depth = max_depth(N, dim)

    def step(s):
        lo, hi = scalar_bounds(s.x)
        lo_r, hi_r = robust_quant_box(s.x, lo, hi)
        ms, xs, ks, perm = morton_sort(s.m, s.x, lo_r, hi_r, depth)
        a_sorted, info = compute_force_grouped_fast(
            ms, xs, ks, lo_r, hi_r, depth, theta, G, eps, ablate=AB)
        a = jnp.zeros_like(a_sorted).at[perm].set(a_sorted)
        return leapfrog_step(dataclasses.replace(s, a=a), dt), info

    @partial(jax.jit, static_argnames=("iters",))
    def loop(s, iters):
        def body(c, _):
            c2, _i = step(c)
            return c2, None

        return jax.lax.scan(body, s, None, length=iters)[0].x

    try:
        dtv = scan_seconds_per_step(loop, (state,), iters_short=1,
                                    iters_long=3, repeats=2)
        log({"probe": "oct_ab", "ablate": AB or "none", "sec": dtv})
    except Exception as e:
        log({"probe": "oct_ab", "ablate": AB or "none",
             "error": str(e)[:300]})


if __name__ == "__main__":
    main()
