#!/usr/bin/env python
"""Structure ladder: WHERE does the near-field entry kernel's ~1.9 us/
entry production-vs-ideal overhead go?

The dma_pipeline microbench (results/r4/dma_pipeline.jsonl) pinned the
IDEAL full-width entry at ~3.6 us (S=1024, tb=512, 3-D: ~3.3 us pair
math at the all-pairs slot-ceiling rate + ~0.3 us DMA), while the
production entries_lohi_eval_pallas runs at ~5.5 us effective
(octree 3-D: 0.924 s / 166,516 entries).  This probe adds production
features ONE AT A TIME on top of the ideal kernel so the gap decomposes:

  ideal    packed (4,S) j-block DMA, fixed i-tile/out, no mask/branch
           (= dma_pipeline "blockspec" mode)
  sepmj    + the j side split into TWO BlockSpec DMAs (xjt (dim,S) +
           mj (1,S)) -- the production layout
  sel      + lo/hi lane mask (unconditional multiply; lo/hi scalar-
           prefetched per entry, production values full-width)
  when     sel wrapped in pl.when(hi > lo) -- production skip_empty
  switch   sel + REAL tile switching: xi/out blocks indexed by the
           entry's tile id over T tiles (entries tile-sorted, zero-init
           on tid != prev) -- production structure minus sepmj
  prod     the actual entries_lohi_eval_pallas (packed j? no: sepmj +
           sel + when + switch + epg plumbing + chunk loop)

Reading: (prod - switch) ~ the mj DMA + epg plumbing; (switch - sel) ~
output-switch + zero-init branch; (when - sel) ~ the data-dependent
branch bubble; (sepmj - ideal) ~ the second DMA issue; (sel - ideal) ~
mask math.  Whichever rung owns the microseconds is the rewrite target.

Feeds: BASELINE.md "Refined near-field cost model" (round-5 attack
item 1: recover the 1.9 us/entry production-vs-ideal gap).

Usage: probe_entry_overhead.py OUT [MODE] [S] [T]
  MODE in {ideal,sepmj,sel,when,switch,prod,all}; S in {1024,512,256};
  T (tiles; argv overrides PROBE_T) probes entry-per-tile SKEW: the
  production galaxy averages ~84 entries/tile but is heavily skewed,
  so sparse tiles switch the output block every few entries.
Env: PROBE_PLATFORM=cpu + PROBE_INTERPRET=1 for CPU equivalence runs;
PROBE_E / PROBE_DIM / PROBE_T override the synthetic workload.
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/entry_overhead.jsonl"
MODE = sys.argv[2] if len(sys.argv) > 2 else "all"
S = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
E = int(os.environ.get("PROBE_E", 8192))
DIM = int(os.environ.get("PROBE_DIM", 3))
T = int(sys.argv[4]) if len(sys.argv) > 4 else     int(os.environ.get("PROBE_T", 128))   # tiles touched by switch/prod
TB = 512
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from nbody_tpu.utils.measure import scan_seconds_per_step

    nblk = (1_000_000 + S - 1) // S       # production-scale j blocks
    npad = nblk * S
    rng = np.random.default_rng(42)
    R = 4
    xm = np.zeros((R, npad), np.float32)
    xm[:DIM] = rng.standard_normal((DIM, npad))
    xm[DIM] = rng.uniform(0.5, 1.0, npad)
    xm = jnp.asarray(xm)
    xjt = xm[:DIM]
    mj = xm[DIM]
    # i side: T tiles of TB bodies (only `switch`/`prod` index them)
    xi_all = jnp.asarray(rng.standard_normal((T * TB, DIM)), jnp.float32)
    xi0 = xi_all[:TB]
    # entries: tile-sorted, E//T per tile, random j blocks, production-
    # like lo/hi widths (mean ~0.85*S, clipped at [1, S])
    ept = E // T
    ents = rng.integers(0, nblk, E).astype(np.int32)
    tids = np.repeat(np.arange(T, dtype=np.int32), ept)[:E]
    lo = rng.integers(0, S // 8, E).astype(np.int32)
    hi = np.clip(S - rng.integers(0, S // 8, E), 1, S).astype(np.int32)
    ent_plain = jnp.asarray(ents)
    ent_tiled = jnp.asarray((tids << 16) | ents)
    lohi = jnp.asarray(lo | (hi << 16))
    eps = 1e-3

    def pair_math(xi, xb, mrow, out, sel=None):
        dx = []
        d2 = None
        for d in range(DIM):
            xd = xb[d, :][None, :] - xi[:, d][:, None]
            dx.append(xd)
            d2 = xd * xd if d2 is None else d2 + xd * xd
        s = jnp.sqrt(d2) + jnp.float32(eps)
        t = s * s * s
        r = pl.reciprocal(t, approx=True)
        r = r * (jnp.float32(2.0) - t * r)
        w = (mrow if sel is None else sel * mrow)[None, :] * r
        for d in range(DIM):
            out[:, d] += jnp.sum(w * dx[d], axis=1)

    # ---- rung kernels -------------------------------------------------
    def kern_ideal(ent_ref, xi_ref, xb_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:, :] = jnp.zeros_like(out_ref)
        pair_math(xi_ref[:, :], xb_ref, xb_ref[DIM, :], out_ref)

    def kern_sepmj(ent_ref, xi_ref, xj_ref, mj_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:, :] = jnp.zeros_like(out_ref)
        pair_math(xi_ref[:, :], xj_ref, mj_ref[0, :], out_ref)

    def _sel_of(lohi_v, xi):
        l = lohi_v & 0xFFFF
        h = lohi_v >> 16
        lane = jax.lax.broadcasted_iota(jnp.int32, (S,), 0)
        return ((lane >= l) & (lane < h)).astype(xi.dtype)

    def kern_sel(ent_ref, lohi_ref, xi_ref, xb_ref, out_ref):
        e = pl.program_id(0)

        @pl.when(e == 0)
        def _():
            out_ref[:, :] = jnp.zeros_like(out_ref)
        xi = xi_ref[:, :]
        pair_math(xi, xb_ref, xb_ref[DIM, :], out_ref,
                  sel=_sel_of(lohi_ref[e], xi))

    def kern_when(ent_ref, lohi_ref, xi_ref, xb_ref, out_ref):
        e = pl.program_id(0)

        @pl.when(e == 0)
        def _():
            out_ref[:, :] = jnp.zeros_like(out_ref)
        lohi_v = lohi_ref[e]

        @pl.when((lohi_v >> 16) > (lohi_v & 0xFFFF))
        def _():
            xi = xi_ref[:, :]
            pair_math(xi, xb_ref, xb_ref[DIM, :], out_ref,
                      sel=_sel_of(lohi_v, xi))

    def kern_switch(ent_ref, lohi_ref, xi_ref, xb_ref, out_ref):
        e = pl.program_id(0)
        tid = ent_ref[e] >> 16
        prev = ent_ref[jnp.maximum(e - 1, 0)] >> 16

        @pl.when((e == 0) | (tid != prev))
        def _():
            out_ref[:, :] = jnp.zeros_like(out_ref)
        xi = xi_ref[:, :]
        pair_math(xi, xb_ref, xb_ref[DIM, :], out_ref,
                  sel=_sel_of(lohi_ref[e], xi))

    # ---- runners ------------------------------------------------------
    def fixed_spec(nin_packed):
        ins = [pl.BlockSpec((TB, DIM), lambda e, *a: (0, 0))]
        if nin_packed:
            ins.append(pl.BlockSpec((R, S), lambda e, ent, *a: (0, ent[e])))
        else:
            ins.append(pl.BlockSpec((DIM, S), lambda e, ent, *a: (0, ent[e])))
            ins.append(pl.BlockSpec((1, S), lambda e, ent, *a: (0, ent[e])))
        return ins

    def run_ideal(xi):
        spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(E,), in_specs=fixed_spec(True),
            out_specs=pl.BlockSpec((TB, DIM), lambda e, ent: (0, 0)))
        return pl.pallas_call(
            kern_ideal, grid_spec=spec,
            out_shape=jax.ShapeDtypeStruct((TB, DIM), jnp.float32),
            interpret=INTERPRET)(ent_plain, xi, xm)

    def run_sepmj(xi):
        spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(E,), in_specs=fixed_spec(False),
            out_specs=pl.BlockSpec((TB, DIM), lambda e, ent: (0, 0)))
        return pl.pallas_call(
            kern_sepmj, grid_spec=spec,
            out_shape=jax.ShapeDtypeStruct((TB, DIM), jnp.float32),
            interpret=INTERPRET)(ent_plain, xi, xjt, mj.reshape(1, -1))

    def run_masked(kern, xi):
        spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(E,),
            in_specs=[
                pl.BlockSpec((TB, DIM), lambda e, ent, lh: (0, 0)),
                pl.BlockSpec((R, S), lambda e, ent, lh: (0, ent[e])),
            ],
            out_specs=pl.BlockSpec((TB, DIM), lambda e, ent, lh: (0, 0)))
        return pl.pallas_call(
            kern, grid_spec=spec,
            out_shape=jax.ShapeDtypeStruct((TB, DIM), jnp.float32),
            interpret=INTERPRET)(ent_plain, lohi, xi, xm)

    def run_switch(xi_all_):
        spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(E,),
            in_specs=[
                pl.BlockSpec((TB, DIM), lambda e, ent, lh: (ent[e] >> 16, 0)),
                pl.BlockSpec((R, S),
                             lambda e, ent, lh: (0, ent[e] & 0xFFFF)),
            ],
            out_specs=pl.BlockSpec((TB, DIM),
                                   lambda e, ent, lh: (ent[e] >> 16, 0)))
        return pl.pallas_call(
            kern_switch, grid_spec=spec,
            out_shape=jax.ShapeDtypeStruct((T * TB, DIM), jnp.float32),
            interpret=INTERPRET)(ent_tiled, lohi, xi_all_, xm)

    def run_prod(xi_all_, skip=True, packed=False):
        from nbody_tpu.ops.pallas_group_eval import entries_lohi_eval_pallas
        return entries_lohi_eval_pallas(
            xi_all_, mj, xjt, ent_tiled, lohi, eps, S=S, tb=TB,
            interpret=INTERPRET, softening="sqrt3", skip_empty=skip,
            epg=1, packed_j=packed)

    runners = {
        "ideal": (run_ideal, xi0), "sepmj": (run_sepmj, xi0),
        "sel": (functools.partial(run_masked, kern_sel), xi0),
        "when": (functools.partial(run_masked, kern_when), xi0),
        "switch": (run_switch, xi_all), "prod": (run_prod, xi_all),
        # production-call variants (the candidate fixes, same workload):
        "prod_noskip": (functools.partial(run_prod, skip=False), xi_all),
        "prod_packed": (functools.partial(run_prod, packed=True), xi_all),
        "prod_packed_noskip": (
            functools.partial(run_prod, skip=False, packed=True), xi_all),
    }
    modes = list(runners) if MODE == "all" else MODE.split(",")

    # equivalence: ideal == sepmj; sel == when; switch rows0 ~ prod rows0
    vals = {}
    for m in modes:
        fn, arg = runners[m]
        v = jax.jit(fn)(arg)
        v.block_until_ready()
        vals[m] = np.asarray(v)
    for a, b in [("ideal", "sepmj"), ("sel", "when"), ("switch", "prod")]:
        if a in vals and b in vals:
            va, vb = vals[a], vals[b]
            err = float(np.max(np.abs(va - vb[: va.shape[0]])) /
                        (np.max(np.abs(va)) + 1e-30))
            log({"probe": "entov_equiv", "pair": f"{a}=={b}", "S": S,
                 "rel_err": err})

    for m in modes:
        fn, arg = runners[m]

        def loop(x, iters, fn=fn):
            def body(c, _):
                o = fn(c)
                return c + jnp.float32(1e-30) * o[: c.shape[0]], None
            return jax.lax.scan(body, x, None, length=iters)[0]

        try:
            sec = scan_seconds_per_step(
                jax.jit(loop, static_argnames=("iters",)), (arg,),
                iters_short=1, iters_long=5, repeats=2)
            log({"probe": "entov", "mode": m, "E": E, "S": S, "dim": DIM,
                 "T": T, "sec_per_call": sec,
                 "us_per_entry": sec / E * 1e6})
        except Exception as exc:  # noqa: BLE001
            log({"probe": "entov", "mode": m, "E": E, "S": S,
                 "error": str(exc)[:400]})


if __name__ == "__main__":
    main()
