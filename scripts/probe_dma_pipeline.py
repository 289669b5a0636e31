#!/usr/bin/env python
"""Microbenchmark: per-entry j-block DMA cost — BlockSpec-per-grid-step
(the production entries_lohi_eval structure) vs MANUAL in-kernel
double-buffered async copies (pallas_guide.md "Double Buffering").

Round-4 finding (BASELINE.md "Refined near-field cost model"): the near
field pays ~2 us per entry while moving data at ~1% of HBM bandwidth —
per-entry DMA issue latency, serialized by the one-BlockSpec-DMA-per-
grid-step structure. This probe isolates that cost at matched pair
math: E identical-width entries against ONE fixed i-tile, (a) one grid
step + BlockSpec DMA per entry, (b) CE entries per grid step with an
NBUF-deep manual make_async_copy rotation. If (b) lands well under
~2 us/entry the round-5 kernel rewrite has a measured ceiling.

Feeds: BASELINE.md refined near-field cost model (round-5 attack item 1).

Usage: probe_dma_pipeline.py OUT [MODE]
MODE = blockspec | manual2 | manual4 | all (default all). One process
per mode is NOT required (each mode is one small pallas_call), but the
tunnel-safe queue may still run them separately.
Env: PROBE_PLATFORM=cpu + PROBE_INTERPRET=1 for the CPU equivalence
check; PROBE_E / PROBE_S / PROBE_DIM override sizes.
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dma_pipeline.jsonl"
MODE = sys.argv[2] if len(sys.argv) > 2 else "all"
E = int(os.environ.get("PROBE_E", 8192))
S = int(os.environ.get("PROBE_S", 1024))
DIM = int(os.environ.get("PROBE_DIM", 3))
TB = 512
CE = 64            # entries per grid step in the manual kernels
PLATFORM = os.environ.get("PROBE_PLATFORM", "")
INTERPRET = bool(int(os.environ.get("PROBE_INTERPRET", "0")))
MATH = bool(int(os.environ.get("PROBE_MATH", "1")))   # 0 = DMA-only control


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

    nblk = 977                      # match the n=1M production block count
    npad = nblk * S
    rng = np.random.default_rng(42)
    # coords + mass PACKED into one sublane-aligned (4, npad) array —
    # HBM slices must be (4,128)-tiling aligned on dim 0 (a bare (3, S)
    # slice fails Mosaic: "Slice shape ... must be aligned to tiling"),
    # and one packed DMA per entry beats two anyway.
    R = 4
    xm = np.zeros((R, npad), np.float32)
    xm[:DIM] = rng.standard_normal((DIM, npad))
    xm[DIM] = rng.uniform(0.5, 1.0, npad)
    xm = jnp.asarray(xm)
    xi0 = jnp.asarray(rng.standard_normal((TB, DIM)), jnp.float32)
    ent = jnp.asarray(rng.integers(0, nblk, E), jnp.int32)
    eps = 1e-3      # plain float: jnp constants captured from outside
    #                 the kernel trace become illegal closure constants

    def pair_math(xi, xb, out):
        if not MATH:        # DMA-only control: touch the block, skip pairs
            for d in range(DIM):
                out[:, d] += jnp.sum(xb[d, :])
            return
        # the production per-entry chain (sqrt3 softening, full width);
        # xb rows 0..DIM-1 are coords, row DIM is mass
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
        w = xb[DIM, :][None, :] * r
        for d in range(DIM):
            out[:, d] += jnp.sum(w * dx[d], axis=1)

    # ---- kernel A: one grid step + BlockSpec DMA per entry ------------
    def kern_a(ent_ref, xi_ref, xb_ref, out_ref):
        e = pl.program_id(0)

        @pl.when(e == 0)
        def _():
            out_ref[:, :] = jnp.zeros_like(out_ref)

        pair_math(xi_ref[:, :], xb_ref, out_ref)

    spec_a = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(E,),
        in_specs=[
            pl.BlockSpec((TB, DIM), lambda e, ent: (0, 0)),
            pl.BlockSpec((R, S), lambda e, ent: (0, ent[e])),
        ],
        out_specs=pl.BlockSpec((TB, DIM), lambda e, ent: (0, 0)),
    )

    def run_a(xi):
        return pl.pallas_call(
            kern_a, grid_spec=spec_a,
            out_shape=jax.ShapeDtypeStruct((TB, DIM), jnp.float32),
            interpret=INTERPRET,
        )(ent, xi, xm)

    # ---- kernel B: CE entries per grid step, manual NBUF rotation ------
    def kern_b(nbuf, ent_ref, xi_ref, xm_hbm, out_ref, xbuf, xsem):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            out_ref[:, :] = jnp.zeros_like(out_ref)

        def dma(i, slot):
            blk = ent_ref[c * CE + i]
            return pltpu.make_async_copy(
                xm_hbm.at[:, pl.ds(blk * S, S)], xbuf.at[slot],
                xsem.at[slot])

        for b in range(nbuf - 1):           # warm-up: first nbuf-1 copies
            dma(b, b).start()

        xi = xi_ref[:, :]

        def body(i, _):
            slot = jax.lax.rem(i, nbuf)
            ahead = i + nbuf - 1

            @pl.when(ahead < CE)
            def _():
                dma(ahead, jax.lax.rem(ahead, nbuf)).start()

            dma(i, slot).wait()
            pair_math(xi, xbuf[slot], out_ref)
            return 0

        jax.lax.fori_loop(0, CE, body, 0)

    def run_b(nbuf):
        spec_b = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(E // CE,),
            in_specs=[
                pl.BlockSpec((TB, DIM), lambda c, ent: (0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((TB, DIM), lambda c, ent: (0, 0)),
            scratch_shapes=[
                pltpu.VMEM((nbuf, R, S), jnp.float32),
                pltpu.SemaphoreType.DMA((nbuf,)),
            ],
        )

        def run(xi):
            return pl.pallas_call(
                functools.partial(kern_b, nbuf), grid_spec=spec_b,
                out_shape=jax.ShapeDtypeStruct((TB, DIM), jnp.float32),
                interpret=INTERPRET,
            )(ent, xi, xm)

        return run

    runners = {"blockspec": run_a, "manual2": run_b(2), "manual4": run_b(4)}
    modes = list(runners) if MODE == "all" else [MODE]

    # numeric equivalence first (same entries, same math)
    ref = None
    for m in modes:
        val = jax.jit(runners[m])(xi0)
        val.block_until_ready()
        if ref is None:
            ref = val
        else:
            err = float(jnp.max(jnp.abs(val - ref)) /
                        (jnp.max(jnp.abs(ref)) + 1e-30))
            log({"probe": "dmapipe_equiv", "mode": m, "rel_err": err})

    for m in modes:
        fn = runners[m]

        def loop(x, iters, fn=fn):
            def body(c, _):
                o = fn(c)
                return c + jnp.float32(1e-30) * o[: c.shape[0]], None

            return jax.lax.scan(body, x, None, length=iters)[0]

        try:
            sec = scan_seconds_per_step(
                jax.jit(loop, static_argnames=("iters",)), (xi0,),
                iters_short=1, iters_long=5, repeats=2)
            log({"probe": "dmapipe", "mode": m, "E": E, "S": S, "dim": DIM,
                 "math": int(MATH),
                 "sec_per_call": sec, "us_per_entry": sec / E * 1e6})
        except Exception as exc:  # noqa: BLE001
            log({"probe": "dmapipe", "mode": m, "E": E,
                 "error": str(exc)[:400]})


if __name__ == "__main__":
    main()
