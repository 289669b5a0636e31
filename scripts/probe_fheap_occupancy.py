#!/usr/bin/env python
"""Far-heap occupancy + entry diagnostics, fresh vs evolved (round 5).

Hypothesis (VERDICT r5 item 3): the octree 2-D EVOLVED step's
unexplained ~0.13 s lives in the far field -- the evolved state's
nonempty heap-cell count overflows the static fheap cap (8192 in 2-D)
and the lax.cond silently falls back to the DENSE 21k-cell masked eval.
This probe counts the nonempty cells of the exact production heap
(levels 0..L*, same L* formula as compute_force_grouped_fast) on the
fresh state and after `evolve_steps` engine steps, plus the extraction
diagnostics (entries/open_cells/near_width_sum via ablate="near,far,win"
-- evals DCE'd, info still computed).

Usage: probe_fheap_occupancy.py OUT dim[,evolve_steps[,n]]
Feeds: BASELINE.md round-5 "octree 2-D evolved decomposition".
"""

import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OUT = sys.argv[1]
spec = sys.argv[2].split(",") if len(sys.argv) > 2 else ["2"]
DIM = int(spec[0])
EVOLVE = int(spec[1]) if len(spec) > 1 else 50
N = int(spec[2]) if len(spec) > 2 else 1_000_000
PLATFORM = os.environ.get("PROBE_PLATFORM", "")


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
    from nbody_tpu.ops.octree import max_depth, morton_sort, robust_quant_box
    from nbody_tpu.ops.octree_group import compute_force_grouped_fast
    from nbody_tpu.sim.engines import EngineOptions, get_engine
    from nbody_tpu.utils.timing import sync

    cfg, state = build_galaxy_model(N, DIM, np.float32)
    depth = max_depth(N, DIM)
    nbranch = 1 << DIM

    def occupancy(st):
        lo, hi = scalar_bounds(st.x)
        lo_r, hi_r = robust_quant_box(st.x, lo, hi)
        ms, xs, ks, _ = morton_sort(st.m, st.x, lo_r, hi_r, depth)
        # L* exactly as compute_force_grouped_fast (occ, 16-bit guard)
        npad_g = -(-N // 512) * 512
        occ = 8 if DIM == 3 else 4
        ls = 1
        while (1 << (DIM * ls)) * 256 < npad_g * occ and ls < depth:
            ls += 1
        S = 8192 if DIM == 3 else 2048
        while (1 << (DIM * ls)) + npad_g // S + 1 > (1 << 16) and ls > 1:
            ls -= 1
        cid = (ks >> jnp.uint32((depth - ls) * DIM)).astype(jnp.int32)
        cnt = jnp.zeros((1 << (DIM * ls),), jnp.int32).at[cid].add(1)
        per_level = []
        nonempty = 0
        c = cnt
        for l in range(ls, -1, -1):
            ne = int(jnp.sum(c > 0))
            per_level.append(ne)
            nonempty += ne
            if l:
                c = c.reshape(-1, nbranch).sum(1)
        per_level.reverse()
        # extraction diagnostics at production defaults, evals DCE'd
        _, info = compute_force_grouped_fast(
            ms, xs, ks, lo_r, hi_r, depth, 0.5, float(cfg.G), cfg.eps,
            ablate="near,far,win",
            interpret=jax.default_backend() != "tpu")
        return {
            "level_star": ls,
            "heap_cells": sum((1 << (DIM * l)) for l in range(ls + 1)),
            "fheap_cap": 6144 if DIM == 3 else 8192,
            "nonempty": nonempty,
            "nonempty_per_level": per_level,
            "entries": int(info["entries"]),
            "open_cells": int(info["open_cells"]),
            "near_width_sum": int(info["near_width_sum"]),
        }

    log({"probe": "fheap_occ", "dim": DIM, "n": N, "state": "fresh",
         **occupancy(state)})

    if EVOLVE:
        step = get_engine("octree").make_step(cfg, EngineOptions())

        @partial(jax.jit, static_argnames=("iters",))
        def evolve(s, iters):
            def body(si, k):
                return step(si, k)[0], None

            return jax.lax.scan(body, s, jnp.arange(iters))[0]

        done = 0
        while done < EVOLVE:
            chunk = min(16, EVOLVE - done)
            state = evolve(state, chunk)
            sync(state)
            done += chunk
            print(f"evolved {done}/{EVOLVE}", flush=True)
        log({"probe": "fheap_occ", "dim": DIM, "n": N,
             "state": f"evolved{EVOLVE}", **occupancy(state)})


if __name__ == "__main__":
    main()
