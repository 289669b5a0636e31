#!/usr/bin/env python
"""One-off TPU probe: BVH windowed-step component ablations at n=1M 3-D
galaxy theta=0.5 (full / no-far / no-window / no-resid-eval / no-resid).
Each ablation zeroes one component's OUTPUT (forces are wrong; only the
timing matters); XLA dead-code-eliminates the skipped kernel and
whatever feeds only it.  JSON lines to argv[1]."""

import json
import sys
from functools import partial

import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_ablate.json"
N = 1_000_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 3


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
    from nbody_tpu.utils.measure import scan_seconds_per_step

    cfg, state = build_galaxy_model(N, DIM, np.float32)
    theta, G, eps, dt = 0.5, float(cfg.G), cfg.eps, cfg.dt
    tc = DIM == 3

    def step(s, ablate):
        xmin, xmax = aabb_of_points(s.x, eps)
        perm = hilbert_sort_perm(s.x, xmin, xmax, true_curve=tc)
        packed = jnp.concatenate(
            [s.m[:, None], s.x, s.v, s.a, s.ao], axis=1)[perm]
        s = dataclasses.replace(
            s, m=packed[:, 0], x=packed[:, 1:1 + DIM],
            v=packed[:, 1 + DIM:1 + 2 * DIM],
            a=packed[:, 1 + 2 * DIM:1 + 3 * DIM],
            ao=packed[:, 1 + 3 * DIM:1 + 4 * DIM])
        tree = build_tree(s.m, s.x, eps)
        a, info = compute_force_grouped_windowed(
            tree, s.m, s.x, theta, G, eps, ablate=ablate)
        s = dataclasses.replace(s, a=a)
        return leapfrog_step(s, dt)

    def sort_only(s):
        xmin, xmax = aabb_of_points(s.x, eps)
        perm = hilbert_sort_perm(s.x, xmin, xmax, true_curve=tc)
        packed = jnp.concatenate(
            [s.m[:, None], s.x, s.v, s.a, s.ao], axis=1)[perm]
        return dataclasses.replace(
            s, m=packed[:, 0], x=packed[:, 1:1 + DIM],
            v=packed[:, 1 + DIM:1 + 2 * DIM],
            a=packed[:, 1 + 2 * DIM:1 + 3 * DIM],
            ao=packed[:, 1 + 3 * DIM:1 + 4 * DIM])

    def sort_build(s):
        s = sort_only(s)
        tree = build_tree(s.m, s.x, eps)
        return dataclasses.replace(s, a=s.a + 1e-30 * tree.mm[0])

    for name, fn in [
        ("full", lambda s: step(s, "")),
        ("no_far", lambda s: step(s, "far")),
        ("no_window", lambda s: step(s, "win")),
        ("no_resid_eval", lambda s: step(s, "rlist")),
        ("no_resid", lambda s: step(s, "resid")),
        ("no_far_win_resid", lambda s: step(s, "far win resid")),
        ("sort_build_only", sort_build),
        ("sort_only", sort_only),
    ]:
        @partial(jax.jit, static_argnames=("iters",))
        def loop(s, iters, _fn=fn):
            return jax.lax.scan(lambda c, _: (_fn(c), None), s, None,
                                length=iters)[0].x

        try:
            dtv = scan_seconds_per_step(loop, (state,), iters_short=1,
                                        iters_long=4, repeats=2)
            log({"probe": "ablate", "dim": DIM, "case": name, "sec": dtv})
        except Exception as e:
            log({"probe": "ablate", "dim": DIM, "case": name,
                 "error": str(e)[:300]})
    log({"probe": "ablate_done"})


if __name__ == "__main__":
    main()
