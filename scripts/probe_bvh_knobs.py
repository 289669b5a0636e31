#!/usr/bin/env python
"""TPU probe: BVH windowed fast-path knob sweep at n=1M 3-D galaxy
theta=0.5 (VERDICT round-3 item 3 follow-up).  The residual eval is
entry-OVERHEAD-bound (~2 us per scalar-prefetch DMA), so doubling the
node granularity S (requires tile >= S) halves the entry count at
constant total pair math -- tile=1024+s_target=1024 is the untried
combination (tile=1024 alone measured neutral, BASELINE.md).

Feeds: BASELINE.md authoritative table + knob-flip record (VERDICT r4 item 3, bvh rows).

Usage: probe_bvh_knobs.py OUT SPEC
SPEC = tile,s_target,window_tiles,ablate|none,evolved
e.g. "1024,1024,16,none,0" or "1024,1024,16,epg8,0".
One case per process (tunnel isolation)."""

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
    from nbody_tpu.ops.bvh import build_tree
    from nbody_tpu.ops.bvh_group import compute_force_grouped_windowed
    from nbody_tpu.ops.geometry import aabb_of_points
    from nbody_tpu.ops.hilbert import hilbert_sort_perm
    from nbody_tpu.ops.integrator import leapfrog_step
    from nbody_tpu.sim.engines import EngineOptions, get_engine
    from nbody_tpu.utils.measure import scan_seconds_per_step
    from nbody_tpu.utils.timing import sync

    parts = SPEC.split(",")
    tile_s, st_s, wt_s, ablate, evolved_s = parts[:5]
    tile, s_target, wt = int(tile_s), int(st_s), int(wt_s)
    evolved = int(evolved_s)
    # dot-separated multi-token ablate (SPEC itself is comma-split):
    # "fheap.packedj" -> "fheap,packedj"
    ablate = "" if ablate == "none" else ablate.replace(".", ",")

    dim = int(parts[5]) if len(parts) > 5 else 3   # optional 6th field
    cfg, state = build_galaxy_model(N, dim, np.float32)
    theta, G, eps, dt = 0.5, float(cfg.G), cfg.eps, cfg.dt

    def step(s):
        xmin, xmax = aabb_of_points(s.x, eps)
        perm = hilbert_sort_perm(s.x, xmin, xmax, true_curve=True)
        m, x = s.m[perm], s.x[perm]
        tree = build_tree(m, x, eps)
        a_s, info = compute_force_grouped_windowed(
            tree, m, x, theta, G, eps, tile=tile, s_target=s_target,
            window_tiles=wt, ablate=ablate, interpret=INTERPRET)
        if "sortunperm" in ablate.split(","):   # A/B: sort-based un-permute
            from nbody_tpu.ops.permutation import unpermute_rows
            a = unpermute_rows(a_s, perm)
        else:
            a = jnp.zeros_like(a_s).at[perm].set(a_s)
        return leapfrog_step(dataclasses.replace(s, a=a), dt), info

    st = state
    if evolved:
        stepo = get_engine("bvh").make_step(cfg, EngineOptions())

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

    # entry-count diagnostics from one un-timed eval
    _, info = jax.jit(step)(st)
    diag = {k: int(info[k]) for k in ("entries", "fallback_tiles",
                                      "res_width_sum", "res_pairs",
                                      "res_unique_blocks") if k in info}
    # per-subtile MAC pass histogram (round-5 pricing): residual nodes
    # are fixed-width (body-median tree), so sum_k hist[k]*(nsub-k)/nsub
    # over res_pairs is the per-subtile residual pair-volume ratio
    diag.update({k: int(info[k]) for k in info if k.startswith("res_pass_")})

    try:
        dtv = scan_seconds_per_step(loop, (st,), iters_short=1,
                                    iters_long=3, repeats=2)
        log({"probe": "bvhknobs", "spec": SPEC, "n": N, "sec": dtv, **diag})
    except Exception as e:  # noqa: BLE001
        log({"probe": "bvhknobs", "spec": SPEC, "n": N,
             "error": str(e)[:300], **diag})


if __name__ == "__main__":
    main()
