#!/usr/bin/env python
"""Round-3 per-phase breakdown probe (VERDICT round-3 item 3: "publish a
per-phase breakdown of the shipped config showing where the non-near-field
~1 s goes").  One ablate case per process (tunnel-safety: a crashed case
must not take the rest down).  Usage:
    probe_r4_breakdown.py OUT ALGO ABLATE [dim] [evolved]
ALGO = octree | bvh; ABLATE = comma-token ablate spec or "none".
Phase cost = step("none") - step(ablate-that-removes-the-phase); the
"near"/"far"/"win" tokens zero an output so XLA DCEs that phase's whole
chain, "nlist"/"rlist" keep the list BUILD and skip only the eval.


Feeds: BASELINE.md per-phase breakdown (VERDICT r4 item 4); summarize with scripts/summarize_breakdown.py.
"""

import dataclasses
import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

OUT = sys.argv[1]
ALGO = sys.argv[2]
ABLATE = "" if sys.argv[3] == "none" else sys.argv[3]
DIM = int(sys.argv[4]) if len(sys.argv) > 4 else 3
EVOLVED = int(sys.argv[5]) if len(sys.argv) > 5 else 0
# CPU smoke-test overrides (the TPU queue uses the defaults)
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
    from nbody_tpu.sim.engines import EngineOptions, get_engine
    from nbody_tpu.utils.measure import scan_seconds_per_step
    from nbody_tpu.utils.timing import sync

    cfg, state = build_galaxy_model(N, DIM, np.float32)
    theta, G, eps, dt = 0.5, float(cfg.G), cfg.eps, cfg.dt
    from nbody_tpu.ops.integrator import leapfrog_step

    if ALGO == "octree":
        from nbody_tpu.ops.geometry import scalar_bounds
        from nbody_tpu.ops.octree import (
            max_depth, morton_sort, robust_quant_box)
        from nbody_tpu.ops.octree_group import compute_force_grouped_fast

        depth = max_depth(N, DIM)

        if ABLATE == "sortonly":
            # bounds + quantize + Morton sort + un-permute scatter +
            # integrate, NO force machinery at all: splits the
            # "remainder" phase into sort vs masks/extraction
            def step(s):
                lo, hi = scalar_bounds(s.x)
                lo_r, hi_r = robust_quant_box(s.x, lo, hi)
                ms, xs, ks, perm = morton_sort(s.m, s.x, lo_r, hi_r, depth)
                consume = (xs * jnp.float32(1e-30)
                           + ms[:, None] * jnp.float32(1e-30)
                           + ks[:, None].astype(xs.dtype)
                           * jnp.float32(1e-38))
                a = jnp.zeros_like(s.x).at[perm].set(consume)
                return leapfrog_step(dataclasses.replace(s, a=a), dt), {}
        else:
            def step(s):
                lo, hi = scalar_bounds(s.x)
                lo_r, hi_r = robust_quant_box(s.x, lo, hi)
                ms, xs, ks, perm = morton_sort(s.m, s.x, lo_r, hi_r, depth)
                a_sorted, info = compute_force_grouped_fast(
                    ms, xs, ks, lo_r, hi_r, depth, theta, G, eps,
                    ablate=ABLATE, interpret=INTERPRET)
                a = jnp.zeros_like(a_sorted).at[perm].set(a_sorted)
                return leapfrog_step(dataclasses.replace(s, a=a), dt), info
    else:
        from nbody_tpu.ops.bvh import build_tree
        from nbody_tpu.ops.bvh_group import compute_force_grouped_windowed
        from nbody_tpu.ops.geometry import aabb_of_points
        from nbody_tpu.ops.hilbert import hilbert_sort_perm

        def _presort(s):
            xmin, xmax = aabb_of_points(s.x, eps)
            perm = hilbert_sort_perm(s.x, xmin, xmax,
                                     true_curve=(DIM == 3))
            packed = jnp.concatenate(
                [s.m[:, None], s.x, s.v, s.a, s.ao], axis=1)[perm]
            d = s.x.shape[1]
            return dataclasses.replace(
                s, m=packed[:, 0], x=packed[:, 1:1 + d],
                v=packed[:, 1 + d:1 + 2 * d],
                a=packed[:, 1 + 2 * d:1 + 3 * d],
                ao=packed[:, 1 + 3 * d:])

        if ABLATE == "sortonly":
            # Hilbert sort + packed permutation + integrate, no tree:
            # splits the bvh "remainder" into sort vs build
            def step(s):
                s = _presort(s)
                return leapfrog_step(
                    dataclasses.replace(s, a=jnp.zeros_like(s.x)), dt), {}
        elif ABLATE == "buildonly":
            # sort + tree build (consumed through a cheap reduction)
            def step(s):
                s = _presort(s)
                tree = build_tree(s.m, s.x, eps)
                consume = (jnp.sum(tree.mm[-1]) + jnp.sum(tree.mx[-1])) \
                    * jnp.float32(1e-30)
                a = jnp.zeros_like(s.x) + consume
                return leapfrog_step(dataclasses.replace(s, a=a), dt), {}
        else:
            def step(s):
                s = _presort(s)
                tree = build_tree(s.m, s.x, eps)
                a, info = compute_force_grouped_windowed(
                    tree, s.m, s.x, theta, G, eps, ablate=ABLATE,
                    interpret=INTERPRET)
                return leapfrog_step(dataclasses.replace(s, a=a), dt), info

    st = state
    if EVOLVED:
        stepo = get_engine(ALGO).make_step(cfg, EngineOptions())

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

    try:
        dtv = scan_seconds_per_step(loop, (st,), iters_short=1,
                                    iters_long=3, repeats=2)
        log({"probe": "r4bd", "algo": ALGO, "dim": DIM, "evolved": EVOLVED,
             "ablate": ABLATE or "none", "sec": dtv})
    except Exception as e:
        log({"probe": "r4bd", "algo": ALGO, "dim": DIM, "evolved": EVOLVED,
             "ablate": ABLATE or "none", "error": str(e)[:300]})


if __name__ == "__main__":
    main()
