#!/usr/bin/env python
"""One-off TPU probe: octree fast step -- depth_bias sweep (2-D) and box
variants (3-D), fresh + evolved, n=1M galaxy theta=0.5.  JSON lines to
argv[1]."""

import json
import sys
from functools import partial

import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_oct3.json"
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
    from nbody_tpu.ops.geometry import scalar_bounds
    from nbody_tpu.ops.integrator import leapfrog_step
    from nbody_tpu.ops.octree import (
        max_depth, morton_sort, robust_quant_box)
    from nbody_tpu.ops.octree_group import compute_force_grouped_fast
    from nbody_tpu.sim.engines import EngineOptions, get_engine
    from nbody_tpu.utils.measure import scan_seconds_per_step
    from nbody_tpu.utils.timing import sync

    def scalar_robust_box(x, lo, hi, dim):
        stride = max(1, x.shape[0] // 16384)
        xs_sub = x[::stride]
        qlo = jnp.quantile(xs_sub, 0.005, axis=0)
        qhi = jnp.quantile(xs_sub, 0.995, axis=0)
        span = jnp.max(qhi - qlo)
        lo_r = jnp.maximum(jnp.min(qlo) - 0.15 * span, lo) - 1.0
        hi_r = jnp.minimum(jnp.max(qhi) + 0.15 * span, hi) + 1.0
        return (jnp.full((dim,), lo_r, x.dtype),
                jnp.full((dim,), hi_r, x.dtype))

    for dim in (2, 3):
        cfg, state = build_galaxy_model(N, dim, np.float32)
        theta, G, eps, dt = 0.5, float(cfg.G), cfg.eps, cfg.dt
        depth = max_depth(N, dim)

        def step(s, box, ablate, bias):
            lo, hi = scalar_bounds(s.x)
            if box == "aniso":
                lo_r, hi_r = robust_quant_box(s.x, lo, hi)
            else:
                lo_r, hi_r = scalar_robust_box(s.x, lo, hi, dim)
            ms, xs, ks, perm = morton_sort(s.m, s.x, lo_r, hi_r, depth)
            a_sorted, info = compute_force_grouped_fast(
                ms, xs, ks, lo_r, hi_r, depth, theta, G, eps,
                ablate=ablate, depth_bias=bias)
            a = jnp.zeros_like(a_sorted).at[perm].set(a_sorted)
            return leapfrog_step(dataclasses.replace(s, a=a), dt), info

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

        if dim == 2:
            cases = [("aniso", "", 0, state), ("aniso", "", 1, state),
                     ("aniso", "", 2, state),
                     ("aniso", "", 1, est), ("aniso", "", 2, est)]
        else:
            cases = [("scalar", "", 0, state),
                     ("scalar", "mono sidefloor", 0, state),
                     ("aniso", "near", 0, state),
                     ("aniso", "nlist", 0, state),
                     ("aniso", "far", 0, state),
                     ("aniso", "win", 0, state),
                     ("scalar", "", 0, est)]
        for box, ablate, bias, st in cases:
            evolved = st is est

            @partial(jax.jit, static_argnames=("iters",))
            def loop(s, iters, _b=box, _a=ablate, _x=bias):
                def body(c, _):
                    c2, _i = step(c, _b, _a, _x)
                    return c2, None

                return jax.lax.scan(body, s, None, length=iters)[0].x

            try:
                dtv = scan_seconds_per_step(loop, (st,), iters_short=1,
                                            iters_long=4, repeats=2)

                @jax.jit
                def fb(s, _b=box, _a=ablate, _x=bias):
                    info = step(s, _b, _a, _x)[1]
                    return info["fallback_tiles"], info["entries"]

                fbt, ents = fb(st)
                log({"probe": "oct3", "dim": dim, "box": box,
                     "ablate": ablate, "bias": bias, "evolved": evolved,
                     "sec": dtv, "fallback_tiles": int(fbt),
                     "entries": int(ents)})
            except Exception as e:
                log({"probe": "oct3", "dim": dim, "box": box,
                     "ablate": ablate, "bias": bias, "evolved": evolved,
                     "error": str(e)[:300]})
    log({"probe": "oct3_done"})


if __name__ == "__main__":
    main()
