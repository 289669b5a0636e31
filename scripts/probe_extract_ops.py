#!/usr/bin/env python
"""Micro-probe: the octree entry-extraction primitive costs at production
shapes (n=1M 3-D: T=1954 tiles, C=32768 cells, GBE~35011).

Feeds: CLAUDE.md/BASELINE.md v5e primitive-rate table (gather/sort/scatter rates).

Cases (argv[2], one per process for tunnel isolation):
  take     open_gbe = jnp.take(open_c, gbe_cell, axis=1)   (T, GBE) lane
           gather with a SHARED index vector -- the 68M-element suspect
  sort     jnp.sort((T, GBE) i32, axis=1)                  row sort
  sortw    jnp.sort((T, 1024) i32, axis=1)                 word-level sort
  sortc    jnp.sort((T, 16384) i32, axis=1)                cell-stage sort
  pack     bit-fold (T, C) bool -> (T, C//32) i32
  gflat    flat gather cs_arr[(T, 2048) ids]
  scat     entries scatter .at[rank].set at E_cap=120k

Appends JSON lines {case, sec} to argv[1].
"""

import json
import sys
from functools import partial

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_extract.json"
CASE = sys.argv[2] if len(sys.argv) > 2 else "take"
T, C, GBE = 1954, 32768, 35011


def log(obj):
    with open(OUT, "a") as fh:
        fh.write(json.dumps(obj) + "\n")
    print(obj, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from nbody_tpu.utils.measure import scan_seconds_per_step

    rng = np.random.default_rng(0)
    if CASE == "take":
        open_c = jnp.asarray(rng.random((T, C + 1)) < 0.005)
        gbe_cell = jnp.asarray(
            np.sort(rng.integers(0, C + 1, GBE)).astype(np.int32))

        def op(x):
            return jnp.take(x, gbe_cell, axis=1).astype(jnp.int32)
    elif CASE in ("sort", "sortw", "sortc"):
        width = {"sort": GBE, "sortw": 1024, "sortc": 16384}[CASE]
        a = jnp.asarray(rng.integers(0, 1 << 30, (T, width)).astype(np.int32))

        def op(x):
            return jnp.sort(x, axis=1)
    elif CASE == "pack":
        a = jnp.asarray(rng.random((T, C)) < 0.005)
        sh = jnp.arange(32, dtype=jnp.int32)[None, None, :]

        def op(x):
            return (x.reshape(T, C // 32, 32).astype(jnp.int32)
                    << sh).sum(axis=2, dtype=jnp.int32)
        open_c = a
    elif CASE == "gflat":
        cs = jnp.asarray(rng.integers(0, 1 << 20, C).astype(np.int32))
        ids = jnp.asarray(rng.integers(0, C, (T, 2048)).astype(np.int32))

        def op(x):
            return cs[x]
        open_c = ids
    elif CASE == "scat":
        E = 120 * 1024
        flat_v = jnp.asarray(rng.random(T * 2049) < 0.04)
        flat_e = jnp.asarray(rng.integers(0, 1 << 30,
                                          T * 2049).astype(np.int32))

        def op(x):
            rank = jnp.cumsum(x.astype(jnp.int32)) - 1
            return jnp.full((E,), 0, jnp.int32).at[
                jnp.where(x, rank, E)].set(flat_e, mode="drop")
        open_c = flat_v
    else:
        raise SystemExit(f"unknown case {CASE}")

    if CASE in ("sort", "sortw", "sortc"):
        open_c = a

    @partial(jax.jit, static_argnames=("iters",))
    def loop(x, iters):
        # the op input must VARY per iteration (via k) or XLA hoists the
        # loop-invariant op out of the scan and the probe measures nothing;
        # all cases are cost-oblivious to the perturbation
        def body(c, k):
            if c.dtype == jnp.bool_:
                xi = c ^ ((k % 2) == 1)
            else:
                xi = (c + k) % jnp.asarray(
                    C if CASE == "gflat" else (1 << 30), c.dtype)
            r = op(xi)
            return c, jnp.sum(r)

        return jax.lax.scan(body, x, jnp.arange(iters, dtype=jnp.int32))[1]

    try:
        dt = scan_seconds_per_step(loop, (open_c,), iters_short=1,
                                   iters_long=5, repeats=2)
        log({"probe": "extract", "case": CASE, "sec": dt})
    except Exception as e:  # noqa: BLE001
        log({"probe": "extract", "case": CASE, "error": str(e)[:300]})


if __name__ == "__main__":
    main()
