#!/usr/bin/env python
"""One-off TPU probe: octree fast-step decomposition at n=1M 3-D galaxy
theta=0.5 -- box variant x MAC variant x component ablations.  JSON
lines to argv[1]."""

import json
import sys
from functools import partial

import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_oct.json"
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
    from nbody_tpu.ops.geometry import scalar_bounds
    from nbody_tpu.ops.integrator import leapfrog_step
    from nbody_tpu.ops.octree import (
        max_depth, morton_sort, robust_quant_box)
    from nbody_tpu.ops.octree_group import compute_force_grouped_fast
    from nbody_tpu.utils.measure import scan_seconds_per_step

    cfg, state = build_galaxy_model(N, DIM, np.float32)
    theta, G, eps, dt = 0.5, float(cfg.G), cfg.eps, cfg.dt
    depth = max_depth(N, DIM)

    def scalar_robust_box(x, lo, hi):
        """Round-2 box: scalar cube quantile box."""
        stride = max(1, x.shape[0] // 16384)
        xs_sub = x[::stride]
        qlo = jnp.quantile(xs_sub, 0.005, axis=0)
        qhi = jnp.quantile(xs_sub, 0.995, axis=0)
        span = jnp.max(qhi - qlo)
        lo_r = jnp.maximum(jnp.min(qlo) - 0.15 * span, lo) - 1.0
        hi_r = jnp.minimum(jnp.max(qhi) + 0.15 * span, hi) + 1.0
        return lo_r, hi_r

    def step(s, box, ablate):
        lo, hi = scalar_bounds(s.x)
        if box == "aniso":
            lo_r, hi_r = robust_quant_box(s.x, lo, hi)
        else:
            lo_r, hi_r = scalar_robust_box(s.x, lo, hi)
            lo_r = jnp.full((DIM,), lo_r, s.x.dtype)
            hi_r = jnp.full((DIM,), hi_r, s.x.dtype)
        ms, xs, ks, perm = morton_sort(s.m, s.x, lo_r, hi_r, depth)
        a_sorted, info = compute_force_grouped_fast(
            ms, xs, ks, lo_r, hi_r, depth, theta, G, eps, ablate=ablate)
        a = jnp.zeros_like(a_sorted).at[perm].set(a_sorted)
        return leapfrog_step(dataclasses.replace(s, a=a), dt), info

    # evolved state: 52 steps with the production engine step
    from nbody_tpu.sim.engines import EngineOptions, get_engine
    from nbody_tpu.utils.timing import sync

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

    cases = [
        ("aniso", "", state),
        ("aniso", "mono", state),
        ("scalar", "mono sidefloor", state),   # = round-2 semantics
        ("aniso", "near", state),
        ("aniso", "nlist", state),
        ("aniso", "far", state),
        ("aniso", "far near mono", state),
        ("aniso", "", est),
        ("aniso", "mono", est),
        ("scalar", "mono sidefloor", est),     # round-2 on evolved
        ("aniso", "near", est),
    ]
    for box, ablate, st in cases:
        evolved = st is est

        @partial(jax.jit, static_argnames=("iters",))
        def loop(s, iters, _b=box, _a=ablate):
            def body(c, _):
                c2, _i = step(c, _b, _a)
                return c2, None

            return jax.lax.scan(body, s, None, length=iters)[0].x

        try:
            dtv = scan_seconds_per_step(loop, (st,), iters_short=1,
                                        iters_long=4, repeats=2)

            @jax.jit
            def fb(s, _b=box, _a=ablate):
                info = step(s, _b, _a)[1]
                return info["fallback_tiles"], info["entries"]

            fbt, ents = fb(st)
            log({"probe": "oct_ablate", "dim": DIM, "box": box,
                 "ablate": ablate, "evolved": evolved, "sec": dtv,
                 "fallback_tiles": int(fbt), "entries": int(ents)})
        except Exception as e:
            log({"probe": "oct_ablate", "dim": DIM, "box": box,
                 "ablate": ablate, "evolved": evolved,
                 "error": str(e)[:300]})
    log({"probe": "oct_ablate_done"})


if __name__ == "__main__":
    main()
