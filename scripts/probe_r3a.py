#!/usr/bin/env python
"""One-off TPU probe (round 3): 3-D octree fast path on CURRENT code --
scalar vs aniso quantization box at dlev=0, and descend-level 1/2 compile
+ overflow behavior with generous caps.  JSON lines to argv[1]."""

import dataclasses
import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_r3a.json"
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

    dim = 3
    cfg, state = build_galaxy_model(N, dim, np.float32)
    theta, G, eps, dt = 0.5, float(cfg.G), cfg.eps, cfg.dt
    depth = max_depth(N, dim)

    def step(s, box, dlev, caps, maxb):
        lo, hi = scalar_bounds(s.x)
        if box == "aniso":
            lo_r, hi_r = robust_quant_box(s.x, lo, hi)
        else:
            lo_r, hi_r = scalar_robust_box(s.x, lo, hi, dim)
        ms, xs, ks, perm = morton_sort(s.m, s.x, lo_r, hi_r, depth)
        a_sorted, info = compute_force_grouped_fast(
            ms, xs, ks, lo_r, hi_r, depth, theta, G, eps,
            descend_levels=dlev, descend_caps=caps, descend_maxb=maxb)
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

    cases = [
        ("aniso", 0, (1024, 1024, 2048), 4, state),
        ("scalar", 0, (1024, 1024, 2048), 4, state),
        ("scalar", 0, (1024, 1024, 2048), 4, est),
        ("scalar", 1, (4096, 4096, 8192), 4, state),
        ("scalar", 2, (4096, 4096, 8192), 4, state),
    ]
    for box, dlev, caps, maxb, st in cases:
        evolved = st is est

        @partial(jax.jit, static_argnames=("iters",))
        def loop(s, iters, _b=box, _d=dlev, _c=caps, _m=maxb):
            def body(c, _):
                c2, _i = step(c, _b, _d, _c, _m)
                return c2, None

            return jax.lax.scan(body, s, None, length=iters)[0].x

        try:
            dtv = scan_seconds_per_step(loop, (st,), iters_short=1,
                                        iters_long=4, repeats=2)

            @jax.jit
            def fb(s, _b=box, _d=dlev, _c=caps, _m=maxb):
                info = step(s, _b, _d, _c, _m)[1]
                keys = ("fallback_tiles", "entries", "open_cells",
                        "open_mass")
                out = {k: info[k] for k in keys}
                for k, v in info.items():
                    if k.startswith("descend_"):
                        out[k] = v
                return out

            stats = {k: int(v) for k, v in fb(st).items()}
            log({"probe": "r3a", "box": box, "dlev": dlev, "caps": caps,
                 "maxb": maxb, "evolved": evolved, "sec": dtv, **stats})
        except Exception as e:
            log({"probe": "r3a", "box": box, "dlev": dlev, "caps": caps,
                 "maxb": maxb, "evolved": evolved, "error": str(e)[:300]})
    log({"probe": "r3a_done"})


if __name__ == "__main__":
    main()
