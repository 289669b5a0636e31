#!/usr/bin/env python
"""TPU probe: octree fast-path knob sweep at n=1M galaxy theta=0.5
(VERDICT round-3 items 3/6).  Same lever as probe_bvh_knobs: the near
field is entry-overhead-bound, and doubling the i-tile row count halves
the entry count at constant pair math (each entry's rows double).  The
round-2 'bigger tiles negative' result predates S=1024 blocks, lo/hi
merging, bit-packed masks and in-kernel windows -- re-test at HEAD.

Feeds: BASELINE.md authoritative table + knob-flip record (VERDICT r4 item 3, octree rows).

Usage: probe_oct_knobs.py OUT SPEC
SPEC = tile,s_block,window_tiles,ablate|none,dim,evolved
e.g. "1024,1024,16,none,3,0".  One case per process."""

import dataclasses
import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OUT = sys.argv[1]
SPEC = sys.argv[2]
N = int(os.environ.get("PROBE_N", 1_000_000))
PLATFORM = os.environ.get("PROBE_PLATFORM", "")
INTERPRET = bool(int(os.environ.get("PROBE_INTERPRET", "0")))


def log(obj):
    with open(OUT, "a") as fh:
        fh.write(json.dumps(obj) + "\n")
    print(obj, flush=True)


def main():
    import jax

    if PLATFORM:
        jax.config.update("jax_platforms", PLATFORM)
    import jax.numpy as jnp

    from nbody_tpu.models import build_galaxy_model
    from nbody_tpu.ops.geometry import scalar_bounds
    from nbody_tpu.ops.integrator import leapfrog_step
    from nbody_tpu.ops.octree import max_depth, morton_sort, robust_quant_box
    from nbody_tpu.ops.octree_group import compute_force_grouped_fast
    from nbody_tpu.sim.engines import EngineOptions, get_engine
    from nbody_tpu.utils.measure import scan_seconds_per_step
    from nbody_tpu.utils.timing import sync

    tile_s, sb_s, wt_s, ablate, dim_s, evolved_s = SPEC.split(",")
    tile, s_block, wt = int(tile_s), int(sb_s), int(wt_s)
    dim, evolved = int(dim_s), int(evolved_s)
    # dot-separated multi-token ablate (SPEC itself is comma-split):
    # "fheap.packedj" -> "fheap,packedj"
    ablate = "" if ablate == "none" else ablate.replace(".", ",")

    cfg, state = build_galaxy_model(N, dim, np.float32)
    theta, G, eps, dt = 0.5, float(cfg.G), cfg.eps, cfg.dt
    depth = max_depth(N, dim)

    def step(s):
        lo, hi = scalar_bounds(s.x)
        lo_r, hi_r = robust_quant_box(s.x, lo, hi)
        ms, xs, ks, perm = morton_sort(s.m, s.x, lo_r, hi_r, depth)
        a_sorted, info = compute_force_grouped_fast(
            ms, xs, ks, lo_r, hi_r, depth, theta, G, eps, tile=tile,
            s_block=s_block, window_tiles=wt, ablate=ablate,
            interpret=INTERPRET)
        if "sortunperm" in ablate.split(","):   # A/B: sort-based un-permute
            from nbody_tpu.ops.permutation import unpermute_rows
            a = unpermute_rows(a_sorted, perm)
        else:
            a = jnp.zeros_like(a_sorted).at[perm].set(a_sorted)
        return leapfrog_step(dataclasses.replace(s, a=a), dt), info

    st = state
    if evolved:
        stepo = get_engine("octree").make_step(cfg, EngineOptions())

        @partial(jax.jit, static_argnames=("iters",))
        def evolve(s, iters):
            def body(c, kk):
                c2, _ = stepo(c, kk)
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

    _, info = jax.jit(step)(st)
    diag = {k: int(info[k]) for k in ("entries", "fallback_tiles",
                                      "open_cells", "near_width_sum",
                                      "near_unique_blocks",
                                      "near_width_cell_tile",
                                      "near_width_cell_subtile_xnsub",
                                      "window_span_sum",
                                      "window_capacity",
                                      "far_heap_nonempty")
            if k in info}
    diag.update({k: float(info[k]) for k in ("pb_width_box", "pb_width_com",
                                             "pb_width_tile") if k in info})

    try:
        dtv = scan_seconds_per_step(loop, (st,), iters_short=1,
                                    iters_long=3, repeats=2)
        log({"probe": "octknobs", "spec": SPEC, "n": N, "sec": dtv, **diag})
    except Exception as e:  # noqa: BLE001
        log({"probe": "octknobs", "spec": SPEC, "n": N,
             "error": str(e)[:300], **diag})


if __name__ == "__main__":
    main()
