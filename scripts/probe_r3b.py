#!/usr/bin/env python
"""One-off TPU probe (round 3): merged-entry near field -- S sweep at
dlev=0 and the sparse descent at dlev>=2, one case per process (the
tunnel worker dies if a dispatch exceeds ~45 s; crashed cases must not
take the rest down).  Usage:
    probe_r3b.py OUT case SPEC
SPEC = box,dlev,S,k0,k,m,maxb,evolved[,dim]  e.g. scalar,2,512,2048,4096,8192,4,0,3
"""

import dataclasses
import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

OUT = sys.argv[1]
SPEC = sys.argv[2]
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

    parts = SPEC.split(",")
    box, dlev, S, k0, k, m, maxb, evolved = parts[:8]
    dim = int(parts[8]) if len(parts) > 8 else 3
    dlev, S, maxb, evolved = int(dlev), int(S), int(maxb), int(evolved)
    caps = (int(k0), int(k), int(m))

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

    cfg, state = build_galaxy_model(N, dim, np.float32)
    theta, G, eps, dt = 0.5, float(cfg.G), cfg.eps, cfg.dt
    depth = max_depth(N, dim)

    def step(s):
        lo, hi = scalar_bounds(s.x)
        if box == "aniso":
            lo_r, hi_r = robust_quant_box(s.x, lo, hi)
        else:
            lo_r, hi_r = scalar_robust_box(s.x, lo, hi, dim)
        ms, xs, ks, perm = morton_sort(s.m, s.x, lo_r, hi_r, depth)
        a_sorted, info = compute_force_grouped_fast(
            ms, xs, ks, lo_r, hi_r, depth, theta, G, eps,
            descend_levels=dlev, descend_caps=caps, descend_maxb=maxb,
            s_block=S)
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

    try:
        dtv = scan_seconds_per_step(loop, (st,), iters_short=1,
                                    iters_long=3, repeats=2)

        @jax.jit
        def fb(s):
            info = step(s)[1]
            keys = ("fallback_tiles", "entries", "open_cells", "open_mass")
            out = {kk: info[kk] for kk in keys}
            for kk, v in info.items():
                if kk.startswith("descend_"):
                    out[kk] = v
            return out

        stats = {kk: int(v) for kk, v in fb(st).items()}
        log({"probe": "r3b", "dim": dim, "box": box, "dlev": dlev,
             "S": S, "caps": caps, "maxb": maxb, "evolved": evolved,
             "sec": dtv, **stats})
    except Exception as e:
        log({"probe": "r3b", "box": box, "dlev": dlev, "S": S,
             "caps": caps, "maxb": maxb, "evolved": evolved,
             "error": str(e)[:300]})


if __name__ == "__main__":
    main()
