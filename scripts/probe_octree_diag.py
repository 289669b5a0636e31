#!/usr/bin/env python
"""One-off TPU diagnostic: octree fast-path entry economics per L*.

For n=1M galaxy (both dims, fresh + 50-step evolved), per candidate L*:
occupied cells, run count n_gbe, per-tile open-cell stats, total entry
count, and the would-be overflow tile count.  Pure jnp (no Pallas), so
it runs anywhere; run on TPU for speed.  JSON lines to argv[1].
"""

import json
import sys
from functools import partial

import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_odiag.json"
N = 1_000_000
TILE = 512


def log(obj):
    with open(OUT, "a") as fh:
        fh.write(json.dumps(obj) + "\n")
    print(obj, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from nbody_tpu.models import build_galaxy_model
    from nbody_tpu.ops.geometry import scalar_bounds
    from nbody_tpu.ops.octree import (
        max_depth, morton_sort, robust_quant_box)

    for dim in (3, 2):
        cfg, state = build_galaxy_model(N, dim, np.float32)
        depth = max_depth(N, dim)
        theta2 = 0.25

        @partial(jax.jit, static_argnames=("level_star",))
        def diag(x, m, level_star):
            lo, hi = scalar_bounds(x)
            lo_r, hi_r = robust_quant_box(x, lo, hi)
            ms, xs, ks, perm = morton_sort(m, x, lo_r, hi_r, depth)
            n = xs.shape[0]
            ntiles = -(-n // TILE)
            npad = ntiles * TILE
            xp = jnp.pad(xs, ((0, npad - n), (0, 0)))
            xt = xp.reshape(ntiles, TILE, dim)
            valid = (jnp.arange(npad) < n).reshape(ntiles, TILE)
            xt_real = jnp.where(valid[:, :, None], xt, xt[:, :1, :])
            tmin = jnp.min(xt_real, axis=1)
            tmax = jnp.max(xt_real, axis=1)

            C = 1 << (dim * level_star)
            shift = jnp.uint32((depth - level_star) * dim)
            cellid = (ks >> shift).astype(jnp.int32)
            ones = jnp.ones((n,), jnp.int32)
            cnt = jnp.zeros((C,), jnp.int32).at[cellid].add(ones)
            msum = jnp.zeros((C,), xs.dtype).at[cellid].add(ms)
            mx = jnp.zeros((C, dim), xs.dtype).at[cellid].add(
                ms[:, None] * xs)
            com = mx / jnp.maximum(msum, 1e-30)[:, None]
            big = jnp.asarray(3.4e38, xs.dtype)
            cmin = jnp.full((C, dim), big, xs.dtype).at[cellid].min(xs)
            cmax = jnp.full((C, dim), -big, xs.dtype).at[cellid].max(xs)
            width = jnp.max(cmax - cmin, axis=-1)
            weff = jnp.where(cnt > 0, width, 0.0)

            dmin_v = jnp.maximum(tmin[:, None, :] - com[None], 0.0)
            dmin_v = jnp.maximum(dmin_v, com[None] - tmax[:, None, :])
            dmin2 = jnp.sum(dmin_v * dmin_v, axis=-1)
            alive = (cnt > 0)[None, :]
            single = (cnt == 1)[None, :]
            mac = (weff[None] * weff[None] < theta2 * dmin2) | single
            open_ = alive & ~mac   # ignores ancestor pruning: upper bound

            S = 256
            blocks_per_cell = jnp.where(
                cnt > 0, (cnt + S - 1) // S + 1, 0)  # +1 straddle bound
            ent_per_tile = jnp.sum(
                jnp.where(open_, blocks_per_cell[None, :], 0), axis=1)
            occupied = jnp.sum(cnt > 0)
            nblocks = npad // S
            n_gbe_bound = occupied + nblocks
            return (occupied, n_gbe_bound, jnp.sum(ent_per_tile),
                    jnp.max(ent_per_tile),
                    jnp.percentile(ent_per_tile.astype(jnp.float32), 95),
                    jnp.sum(ent_per_tile > 2048),
                    jnp.max(cnt), jnp.percentile(
                        jnp.where(cnt > 0, cnt, 0).astype(jnp.float32), 99))

        for level_star in (4, 5, 6) if dim == 3 else (5, 6, 7):
            if dim * level_star > 30:
                continue
            try:
                out = diag(state.x, state.m, level_star)
                occ, ngbe, etot, emax, e95, nover, cmax_, c99 = [
                    float(np.asarray(v)) for v in out]
                log({"probe": "odiag", "dim": dim, "Lstar": level_star,
                     "occupied": occ, "n_gbe_bound": ngbe,
                     "entries_total": etot, "entries_max_tile": emax,
                     "entries_p95_tile": e95, "tiles_over_2048": nover,
                     "cell_cnt_max": cmax_, "cell_cnt_p99": c99})
            except Exception as e:
                log({"probe": "odiag", "dim": dim, "Lstar": level_star,
                     "error": str(e)[:300]})
    log({"probe": "odiag_done"})


if __name__ == "__main__":
    main()
