#!/usr/bin/env python
"""One-off TPU probe: where do the tree fast-path steps spend time?

Measures, at n=1M galaxy theta=0.5 fp32 (fresh and evolved states):
  * full production step (octree / bvh)
  * octree step with the robust quantile box REPLACED by a fixed box
    (isolates the per-step quantile/box tax -- VERDICT round-2 item 6)
  * sort-only and eval-only pieces

Writes results as JSON lines to the path given as argv[1] (default
/tmp/probe_tree.json) so it can run in the background and be polled.
"""

import json
import sys
from functools import partial

import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_tree.json"
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 2
N = 1_000_000


def log(obj):
    with open(OUT, "a") as fh:
        fh.write(json.dumps(obj) + "\n")
    print(obj, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from nbody_tpu.models import build_galaxy_model
    from nbody_tpu.ops.octree import (
        max_depth,
        morton_sort,
        octree_step_force,
        robust_quant_box,
    )
    from nbody_tpu.ops.geometry import scalar_bounds
    from nbody_tpu.ops.octree_group import compute_force_grouped_fast
    from nbody_tpu.sim.engines import EngineOptions, get_engine
    from nbody_tpu.utils.measure import scan_seconds_per_step
    from nbody_tpu.utils.timing import sync

    cfg, state = build_galaxy_model(N, DIM, np.float32)
    theta, G, eps = 0.5, float(cfg.G), cfg.eps
    depth = max_depth(N, DIM)
    log({"probe": "start", "dim": DIM, "depth": depth})

    def scan_of(fn):
        """fn: state -> state; returns seconds/step via differenced scans."""

        @partial(jax.jit, static_argnames=("iters",))
        def loop(s, iters):
            return jax.lax.scan(lambda c, _: (fn(c), None), s, None,
                                length=iters)[0].x

        return loop

    # engine steps (the real production steps)
    for algo in ("octree", "bvh"):
        step = get_engine(algo).make_step(cfg, EngineOptions())

        @partial(jax.jit, static_argnames=("iters",))
        def eloop(s, iters, _step=step):
            def body(c, k):
                c2, _ = _step(c, k)
                return c2, None

            return jax.lax.scan(body, s, jnp.arange(iters))[0].x

        dt = scan_seconds_per_step(eloop, (state,), iters_short=1,
                                   iters_long=4, repeats=2)
        log({"probe": f"{algo}_step_fresh", "sec": dt})

    # evolve 50 steps with the octree engine
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
    log({"probe": "evolved", "steps": 52})

    for algo in ("octree", "bvh"):
        step = get_engine(algo).make_step(cfg, EngineOptions())

        @partial(jax.jit, static_argnames=("iters",))
        def eloop(s, iters, _step=step):
            def body(c, k):
                c2, _ = _step(c, k)
                return c2, None

            return jax.lax.scan(body, s, jnp.arange(iters))[0].x

        dt = scan_seconds_per_step(eloop, (est,),
                                   iters_short=1, iters_long=4, repeats=2)
        log({"probe": f"{algo}_step_evolved", "sec": dt})

    # --- octree step variants (evolved state) --------------------------
    from nbody_tpu.ops.integrator import leapfrog_step
    import dataclasses

    def mk_step(box_mode):
        lo_f, hi_f = scalar_bounds(est.x)
        lo_r0, hi_r0 = robust_quant_box(est.x, lo_f, hi_f)
        lo_c = np.asarray(lo_r0)
        hi_c = np.asarray(hi_r0)

        def step(s):
            lo, hi = scalar_bounds(s.x)
            if box_mode == "quantile":
                lo_r, hi_r = robust_quant_box(s.x, lo, hi)
            elif box_mode == "fixed":
                lo_r = jnp.asarray(lo_c, s.x.dtype)
                hi_r = jnp.asarray(hi_c, s.x.dtype)
            else:  # minmax
                lo_r, hi_r = lo, hi
            ms, xs, ks, perm = morton_sort(s.m, s.x, lo_r, hi_r, depth)
            a_sorted, _ = compute_force_grouped_fast(
                ms, xs, ks, lo_r, hi_r, depth, theta, G, eps)
            a = jnp.zeros_like(a_sorted).at[perm].set(a_sorted)
            return leapfrog_step(dataclasses.replace(s, a=a), cfg.dt)

        return step

    for mode in ("quantile", "fixed"):
        dt = scan_seconds_per_step(scan_of(mk_step(mode)), (est,),
                                   iters_short=1, iters_long=4, repeats=2)
        log({"probe": f"octree_box_{mode}_evolved", "sec": dt})

    # sort-only and box-only pieces
    lo_f, hi_f = scalar_bounds(est.x)

    @partial(jax.jit, static_argnames=("iters",))
    def box_loop(s, iters):
        def body(c, _):
            lo, hi = scalar_bounds(c)
            lo_r, hi_r = robust_quant_box(c, lo, hi)
            return c + 1e-30 * (lo_r + hi_r), None

        return jax.lax.scan(body, s, None, length=iters)[0]

    dt = scan_seconds_per_step(box_loop, (est.x,), iters_short=1,
                               iters_long=8, repeats=2)
    log({"probe": "box_only", "sec": dt})

    @partial(jax.jit, static_argnames=("iters",))
    def sort_loop(s, iters):
        def body(c, _):
            ms, xs, ks, perm = morton_sort(est.m, c, lo_f, hi_f, depth)
            return c + 1e-30 * xs, None

        return jax.lax.scan(body, s, None, length=iters)[0]

    dt = scan_seconds_per_step(sort_loop, (est.x,), iters_short=1,
                               iters_long=4, repeats=2)
    log({"probe": "sort_only", "sec": dt})

    log({"probe": "done"})


if __name__ == "__main__":
    main()
