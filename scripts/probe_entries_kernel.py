#!/usr/bin/env python
"""One-off TPU microbench: entries_tables_eval_pallas cost model.

Feeds: BASELINE.md near-field entry cost model (the ~2 us/grid-step number).

Splits the per-entry cost into grid-step overhead vs pair math by timing
synthetic entry lists: E real entries (full S-range) vs E pad entries
(lo == hi, math skipped).  Also times the same pair count delivered with
half the entries (2x S) to show the amortization curve.

JSON lines to argv[1] (default /tmp/probe_entries.json).
"""

import json
import sys
from functools import partial

import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_entries.json"
N = 1_000_000
TILE = 512
DIM = 3


def log(obj):
    with open(OUT, "a") as fh:
        fh.write(json.dumps(obj) + "\n")
    print(obj, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from nbody_tpu.ops.pallas_group_eval import entries_tables_eval_pallas
    from nbody_tpu.utils.measure import scan_seconds_per_step

    eps = float(np.finfo(np.float32).eps)
    rng = np.random.default_rng(0)
    ntiles = N // TILE
    x = jnp.asarray(rng.uniform(-100, 100, (N, DIM)).astype(np.float32))
    m = jnp.asarray(rng.uniform(0.1, 1.0, N).astype(np.float32))

    E = 393216  # ~200 entries/tile, multiple of 49152
    per_tile = E // ntiles

    for S, mode in [(256, "real"), (256, "pad"), (512, "real"),
                    (1024, "real"), (256, "half_real")]:
        nblocks = N // S
        e = E // 2 if mode == "half_real" else E
        pt = e // ntiles
        tid = np.repeat(np.arange(ntiles, dtype=np.int32), pt)
        if mode == "pad":
            gbe = np.full(e, nblocks, np.int32)     # pad row: lo == hi
        else:
            gbe = rng.integers(0, nblocks, e).astype(np.int32)
            gbe = np.sort(gbe.reshape(ntiles, pt), axis=1).reshape(-1)
        entries = jnp.asarray((tid << 16) | gbe)
        blk_tbl = jnp.concatenate(
            [jnp.arange(nblocks, dtype=jnp.int32), jnp.zeros((1,), jnp.int32)])
        lohi = jnp.concatenate(
            [jnp.full((nblocks,), S << 16, jnp.int32),
             jnp.zeros((1,), jnp.int32)])

        @partial(jax.jit, static_argnames=("iters",))
        def loop(x, m, entries, iters, _S=S):
            def body(c, _):
                out = entries_tables_eval_pallas(
                    c, m, c.T, entries.reshape(8, -1), blk_tbl, lohi,
                    eps, S=_S, tb=TILE)
                return c + jnp.asarray(1e-12, c.dtype) * out, None

            return jax.lax.scan(body, x, None, length=iters)[0]

        try:
            dt = scan_seconds_per_step(loop, (x, m, entries), iters_short=1,
                                       iters_long=3, repeats=2)
            log({"probe": "entries", "S": S, "mode": mode, "E": e,
                 "sec": dt, "us_per_entry": dt / e * 1e6,
                 "pairs_per_s": (0 if mode == "pad" else e * TILE * S / dt)})
        except Exception as ex:
            log({"probe": "entries", "S": S, "mode": mode,
                 "error": str(ex)[:300]})
    log({"probe": "entries_done"})


if __name__ == "__main__":
    main()
