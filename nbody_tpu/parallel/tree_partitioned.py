"""Partitioned Barnes-Hut trees: sharded bodies, distributed sort,
replicated COARSE heap, halo-exact near field -- the weak-scaling layout.

The replicated-tree engines (parallel/tree_sharded.py) are 1/S only in
the force evaluation: every shard holds all n bodies, sorts them, and
builds the full tree.  This module is the next step of the multi-chip
design (docs/DISTRIBUTED_TREES.md): per-shard memory is O(n/S + C),
where C is the coarse cell count, so n can grow with the mesh.

Layout per step (all inside one shard_map over the 1-D body mesh):

  sort    bodies live sharded; a cross-shard Morton/Hilbert sort
          (parallel/distributed_sort.py) gives every shard a CONTIGUOUS
          range of the global curve order -- shard boundaries are
          spatial boundaries.  Pad rows sort with a MAJOR pad flag so
          they land at the global tail (their duplicated-position key
          would otherwise sit mid-stream and the final [:nreal] slice
          would drop REAL bodies while keeping zero-mass clones);
  heap    one global coarse heap, levels 0..L_top (count, mass, m*x,
          extents per cell): each shard scatter-adds its own bodies and
          ONE psum replicates the result -- O(C) data, C <= 2^14 cells;
  far     per-tile dense MAC masks against the heap, exactly the
          single-chip fast path's conservative group MAC (true-extent
          width, tile-bbox dmin, octree_group.py:770-800) -- evaluated
          from the REPLICATED heap, no remote body data needed;
  near    cells still open at L_top are spatially near the evaluating
          tile; with curve ownership their bodies live on the same or
          curve-adjacent shards.  Each shard ppermutes the body blocks
          of its +-halo neighbours into an extended window E of
          (2*halo + 1) * n/S rows and evaluates the cell-snapped row
          interval [lo_t, hi_t) EXACTLY against its own rows (the
          snapping mirrors octree_group's window partition, so every
          (body, source) pair is counted exactly once);
  beyond  open L_top cells OUTSIDE the halo interval (curve seams,
          extreme density contrast, cells wider than the halo) are
          evaluated EXACTLY: a psum ORs every shard's beyond set into a
          global NEED mask, each shard compacts its needed rows into a
          static beyond_budget buffer, and one small all_gather
          replicates them (S * budget rows of traffic).  If any shard's
          needed rows overflow the budget, ONE replicated flag routes
          the whole step to the exact block-ring fallback (the
          parallel/ring.py structure; n rows of traffic) -- truncation
          is impossible, the conservative never-less-accurate guarantee
          holds everywhere, and theta=0 reproduces the direct sum.  The
          beyond set is COUNTED (aux: beyond_halo_cells/_mass).

Two variants share the machinery below: the OCTREE (Morton cells,
(sqrt(d2)+eps)^3 softening, octree.h:236-247; cell row ranges come from
psum'd counts and the halo interval snaps to cell boundaries) and the
implicit BVH (Hilbert order, d2^1.5+eps softening, bvh.h:297; node row
ranges are fixed arithmetic -- row >> level shift -- so no snapping and
no key transport in the ring pass).

This module favours clarity over peak throughput: the far/near
evaluations are dense jnp contractions chunked per tile with lax.map
(fine on the 8-device CPU mesh and for dryrun validation; the production
path would reuse the masked-bits / windowed Pallas kernels, which take
the same mask/interval inputs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from nbody_tpu.config import SimConfig
from nbody_tpu.parallel.mesh import (
    BODY_AXIS,
    TILE_AXIS,
    body_mesh,
    body_tile_mesh,
)
from nbody_tpu.parallel.distributed_sort import distributed_sort_rows
from nbody_tpu.state import SystemState


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except TypeError:  # older spelling
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_rep=False)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _coarse_level(n: int, dim: int, cap_cells: int = 1 << 14) -> int:
    """L_top: ~16 bodies per cell at uniform density, capped so the
    replicated heap stays O(2^14) cells.  DEEPER than the single-chip
    fast path's occupancy heuristic on purpose: an L_top cell that holds
    more bodies than the halo window cannot be evaluated exactly and
    falls into the beyond-halo ring pass -- at a tile's OWN position
    that means O(n^2/S) work (and, before the ring pass existed, a 1.4
    rel. error from monopole-approximating half the total mass of a
    4-cluster system at L_top=3)."""
    nbranch = 1 << dim
    l = 1
    while (nbranch ** (l + 1)) <= cap_cells and (nbranch ** l) * 16 < n * 4:
        l += 1
    return l


# --------------------------------------------------------------- shared
# machinery for both partitioned variants (each helper runs INSIDE the
# shard_map body)

def _sort_state(key_words, m_l, x_l, v_l, a_l, ao_l, nreal, idx, nl,
                n_shards, dim):
    """Distributed sort of the full body state by (pad_flag, *key_words):
    the flag is MAJOR, so post-sort pads are exactly global rows >= nreal
    and every pad test downstream is pure row arithmetic.  Returns
    (sorted key words without the flag, m, x, v, a, ao)."""
    grow_in = idx * nl + jnp.arange(nl, dtype=jnp.int32)
    pad_flag = (grow_in >= nreal).astype(jnp.uint32)
    cols = ([m_l] + [x_l[:, d] for d in range(dim)]
            + [v_l[:, d] for d in range(dim)]
            + [a_l[:, d] for d in range(dim)]
            + [ao_l[:, d] for d in range(dim)])
    keys, cols = distributed_sort_rows([pad_flag] + list(key_words), cols,
                                       BODY_AXIS, n_shards)
    m_l = cols[0]
    x_l = jnp.stack(cols[1:1 + dim], axis=1)
    v_l = jnp.stack(cols[1 + dim:1 + 2 * dim], axis=1)
    a_l = jnp.stack(cols[1 + 2 * dim:1 + 3 * dim], axis=1)
    ao_l = jnp.stack(cols[1 + 3 * dim:1 + 4 * dim], axis=1)
    return keys[1:], m_l, x_l, v_l, a_l, ao_l


def _psum_heap(index, m_l, x_l, C, nbranch, dim, dtype, L):
    """Replicated coarse heap via ONE psum: scatter this shard's rows
    (index may be OOB == C for pad rows: OOB scatter updates drop), pool
    levels 0..L by reshape.  Returns per-level (cnt, mass, mx, cmin,
    cmax) lists, index 0 = root."""
    cnt = jnp.zeros((C,), jnp.int32).at[index].add(1)
    mass = jnp.zeros((C,), dtype).at[index].add(m_l)
    mx = jnp.zeros((C, dim), dtype).at[index].add(m_l[:, None] * x_l)
    big = jnp.asarray(np.finfo(dtype).max, dtype)
    cmin = jnp.full((C, dim), big, dtype).at[index].min(x_l)
    cmax = jnp.full((C, dim), -big, dtype).at[index].max(x_l)
    cnt, mass, mx = (jax.lax.psum(v, BODY_AXIS) for v in (cnt, mass, mx))
    cmin = jax.lax.pmin(cmin, BODY_AXIS)
    cmax = jax.lax.pmax(cmax, BODY_AXIS)

    lvl = {"cnt": [cnt], "mass": [mass], "mx": [mx],
           "cmin": [cmin], "cmax": [cmax]}
    for _ in range(L):
        lvl["cnt"].insert(0, lvl["cnt"][0].reshape(-1, nbranch).sum(1))
        lvl["mass"].insert(0, lvl["mass"][0].reshape(-1, nbranch).sum(1))
        lvl["mx"].insert(0, lvl["mx"][0].reshape(-1, nbranch, dim).sum(1))
        lvl["cmin"].insert(0,
                           lvl["cmin"][0].reshape(-1, nbranch, dim).min(1))
        lvl["cmax"].insert(0,
                           lvl["cmax"][0].reshape(-1, nbranch, dim).max(1))
    return lvl


def _halo_window(arrays, idx, halo, n_shards):
    """ppermute the +-halo neighbour blocks of each array and concatenate
    into the extended window E.  Missing edge neighbours arrive
    zero-filled: mass 0 == force-invisible."""
    outs = []
    for arr in arrays:
        parts = []
        for h in range(-halo, halo + 1):
            if h == 0:
                parts.append(arr)
                continue
            perm = [(s, s - h) for s in range(n_shards)
                    if 0 <= s - h < n_shards]
            parts.append(jax.lax.ppermute(arr, BODY_AXIS, perm))
        outs.append(jnp.concatenate(parts))
    return outs


def _mac_concat(lvl, xt, range_fn, lo_t, hi_t, theta2, nbranch, L, dtype):
    """Per-level conservative group MAC over the pooled heap.  range_fn(l)
    -> (lstart, lend) global row ranges of level-l nodes ((1, W_l) each).
    Window partition per level: nodes fully inside [lo_t, hi_t) are
    DROPPED (the near field evaluates them exactly); straddling nodes are
    forced open; the rest take the MAC.  Returns the concatenated accept
    mask/heap plus the beyond-halo open set at L and its diagnostics."""
    tmin = jnp.min(xt, axis=1)
    tmax = jnp.max(xt, axis=1)
    ntiles_l = xt.shape[0]
    accepts, coms, masses = [], [], []
    open_mask = jnp.ones((ntiles_l, 1), jnp.bool_)
    beyond = None
    for l in range(L + 1):
        cl, msl = lvl["cnt"][l], lvl["mass"][l]
        com = lvl["mx"][l] / jnp.maximum(
            msl, jnp.asarray(1e-30, dtype))[:, None]
        alive = (cl > 0)[None, :]
        dmin_v = jnp.maximum(tmin[:, None, :] - com[None, :, :], 0.0)
        dmin_v = jnp.maximum(dmin_v, com[None, :, :] - tmax[:, None, :])
        dmin2 = jnp.sum(dmin_v * dmin_v, axis=-1)
        width = jnp.max(lvl["cmax"][l] - lvl["cmin"][l], axis=-1)
        weff = jnp.where(cl > 0, width, 0.0)[None, :]
        single = (cl == 1)[None, :]
        lstart, lend = range_fn(l)
        inside = (lstart >= lo_t) & (lend <= hi_t)
        overlap = (lstart < hi_t) & (lend > lo_t)
        partial_w = overlap & ~inside
        mac = ((weff * weff < theta2 * dmin2) | single) & ~partial_w
        accept = open_mask & alive & mac & ~inside
        open_ = open_mask & alive & ~mac & ~inside
        if l == L:
            beyond = open_
            beyond_cells = jnp.sum(open_, dtype=jnp.int32)
            beyond_mass = jnp.sum(
                jnp.where(jnp.any(open_, axis=0), msl, 0.0))
        accepts.append(accept)
        coms.append(com)
        masses.append(msl)
        if l < L:
            open_mask = jnp.repeat(open_, nbranch, axis=1)
    acc_all = jnp.concatenate(accepts, axis=1)      # (T, W_all)
    com_all = jnp.concatenate(coms, axis=0)         # (W_all, dim)
    ms_all = jnp.concatenate(masses, axis=0)        # (W_all,)
    return acc_all, com_all, ms_all, beyond, beyond_cells, beyond_mass


def _eval_far_pallas(x_l, acc_all, com_all, ms_all, eps, softening,
                     interpret):
    """Production far field: bit-packed accept mask streamed through
    masked_eval_bits_pallas (32x less HBM than a dense mask; the same
    kernel the single-chip fast paths use)."""
    from nbody_tpu.ops.pallas_group_eval import (
        masked_eval_bits_pallas,
        pack_mask_bits,
    )

    return masked_eval_bits_pallas(
        x_l, ms_all, com_all.T, pack_mask_bits(acc_all), float(eps),
        interpret=interpret, softening=softening)


def _eval_near_pallas(x_l, m_e, x_e, lo_rel, hi_rel, tile, eps, softening,
                      interpret):
    """Production near field: the halo interval rides the scalar-prefetch
    operand of window_eval_interval_pallas (w0 = 0: the window IS the
    whole E buffer; the [lo, hi) compare masks rows in-kernel)."""
    from nbody_tpu.ops.pallas_group_eval import window_eval_interval_pallas

    ntiles_l = x_l.shape[0] // tile
    wt = x_e.shape[0] // tile
    wj = 4 if wt % 4 == 0 else (2 if wt % 2 == 0 else 1)
    zeros_t = jnp.zeros((ntiles_l,), jnp.int32)
    lo_b = jnp.broadcast_to(lo_rel.astype(jnp.int32), (ntiles_l,))
    hi_b = jnp.broadcast_to(hi_rel.astype(jnp.int32), (ntiles_l,))
    return window_eval_interval_pallas(
        x_l, m_e, x_e.T, zeros_t, lo_b, hi_b, float(eps),
        window_tiles=wt, interpret=interpret, softening=softening, wj=wj)


def _eval_far(xt, acc_all, com_all, ms_all, soften, nl, dim):
    """Masked monopole evaluation, chunked per tile with lax.map so
    temporaries stay at (tile, W_all) (production: the bit-packed mask
    shape masked_eval_bits_pallas takes)."""
    def _far_tile(args):
        xtb, am = args
        dxf = com_all[None, :, :] - xtb[:, None, :]
        d2f = jnp.sum(dxf * dxf, axis=-1)
        wf = jnp.where(am[None, :], ms_all[None, :] / soften(d2f), 0.0)
        return jnp.einsum("bw,bwd->bd", wf, dxf)

    return jax.lax.map(_far_tile, (xt, acc_all)).reshape(nl, dim)


def _eval_near(xt, x_e, mj, soften, nl, dim):
    """Exact evaluation vs the masked halo window (self-pair contributes
    zero through the 0/soften numerator, the reference's self-skip)."""
    def _near_tile(xtb):
        dxn = x_e[None, :, :] - xtb[:, None, :]
        d2n = jnp.sum(dxn * dxn, axis=-1)
        wn = mj[None, :] / soften(d2n)
        return jnp.einsum("bj,bjd->bd", wn, dxn)

    return jax.lax.map(_near_tile, xt).reshape(nl, dim)


def _beyond_exchange(xt, beyond_open, m_l, x_l, cell_local, soften,
                     idx, dim, dtype, n_shards, extras,
                     cell_of_visitor, r_budget, axes=BODY_AXIS):
    """Entry-compacted beyond exchange (docs/DISTRIBUTED_TREES.md item 2,
    replacing the block ring in the common case): one psum ORs every
    shard's beyond-open cells into a global NEED mask; each shard
    compacts its own rows that fall in needed cells into a STATIC
    r_budget-row buffer; one small all_gather replicates the buffers and
    each tile evaluates them against its own beyond mask -- traffic is
    S * r_budget rows instead of the ring's n.  A shard whose needed
    rows overflow the budget trips ONE global flag and the exact block
    ring runs instead (truncation is impossible, matching the single
    chip paths' cap-trips-fallback rule)."""
    ntiles_l, tile = xt.shape[0], xt.shape[1]
    nlt = ntiles_l * tile                # i-rows this caller evaluates
    C = beyond_open.shape[1]
    # axes: on a 2-D (body x tile) mesh each tile-shard's beyond_open
    # only covers its row slice, so the need/overflow reductions must
    # span BOTH axes (the j-side gather stays on the body axis: the
    # compacted buffers are identical across tile-shards)
    need = jax.lax.psum(
        jnp.any(beyond_open, axis=0).astype(jnp.int32), axes) > 0

    rowmask = (cell_local < C) & need[jnp.minimum(cell_local, C - 1)]
    rank = jnp.cumsum(rowmask.astype(jnp.int32)) - 1
    count = jnp.sum(rowmask, dtype=jnp.int32)
    dst = jnp.where(rowmask, rank, r_budget)
    m_b = jnp.zeros((r_budget,), dtype).at[dst].set(m_l, mode="drop")
    x_b = jnp.zeros((r_budget, dim), dtype).at[dst].set(x_l, mode="drop")
    c_b = jnp.zeros((r_budget,), jnp.int32).at[dst].set(
        cell_local, mode="drop")
    m_g = jax.lax.all_gather(m_b, BODY_AXIS, tiled=True)
    x_g = jax.lax.all_gather(x_b, BODY_AXIS, tiled=True)
    c_g = jax.lax.all_gather(c_b, BODY_AXIS, tiled=True)
    overflow = jax.lax.psum((count > r_budget).astype(jnp.int32),
                            axes) > 0

    def _exchange(_m, _x, _ex):
        bmask = jnp.take(beyond_open, c_g, axis=1)           # (T, S*R)

        def _tile(args):
            xtb, bmt = args
            dxr = x_g[None, :, :] - xtb[:, None, :]
            d2r = jnp.sum(dxr * dxr, axis=-1)
            wr = jnp.where(bmt[None, :], m_g[None, :] / soften(d2r), 0.0)
            return jnp.einsum("bj,bjd->bd", wr, dxr)

        return jax.lax.map(_tile, (xt, bmask)).reshape(nlt, dim)

    def _ring(_m, _x, _ex):
        return _ring_beyond(xt, beyond_open, _m, _x, list(_ex),
                            cell_of_visitor, soften, idx, nlt, dim, dtype,
                            n_shards)

    return jax.lax.cond(overflow, _ring, _exchange,
                        m_l, x_l, tuple(extras)), count, overflow


def _ring_beyond(xt, beyond_open, m_l, x_l, extras, cell_of_visitor,
                 soften, idx, nl, dim, dtype, n_shards):
    """Exact bodies of beyond-halo open cells via a block ring: every
    shard's (m, x, *extras) rotates; rotation r's visitor is shard
    (idx - r)'s block, masked to rows whose cell is beyond-open for the
    local tile.  Beyond cells lie outside the snapped near interval by
    construction, so no pair is double counted; lax.cond skips rotations
    with no targets.  cell_of_visitor(r, rotated_extras) -> (nl,) ids."""
    ring = jnp.zeros((nl, dim), dtype)
    mv, xv = m_l, x_l
    ev = list(extras)
    perm = [(s, (s + 1) % n_shards) for s in range(n_shards)]
    for r in range(n_shards):
        cell_v = cell_of_visitor(r, ev)
        bmask = jnp.take(beyond_open, cell_v, axis=1)        # (T, nl)

        def _eval(xv_, mv_, bm_):
            def _ring_tile(args):
                xtb, bmt = args
                dxr = xv_[None, :, :] - xtb[:, None, :]
                d2r = jnp.sum(dxr * dxr, axis=-1)
                wr = jnp.where(bmt[None, :],
                               mv_[None, :] / soften(d2r), 0.0)
                return jnp.einsum("bj,bjd->bd", wr, dxr)

            return jax.lax.map(_ring_tile, (xt, bm_)).reshape(nl, dim)

        ring = ring + jax.lax.cond(
            jnp.any(bmask), _eval,
            lambda *_: jnp.zeros((nl, dim), dtype),
            xv, mv, bmask)
        if r + 1 < n_shards:
            mv = jax.lax.ppermute(mv, BODY_AXIS, perm)
            xv = jax.lax.ppermute(xv, BODY_AXIS, perm)
            ev = [jax.lax.ppermute(e, BODY_AXIS, perm) for e in ev]
    return ring


def _comm_accounting(*, n_shards, nl, dim, esize, nkeys, C, halo,
                     r_budget, T, nlt, halo_key_words=0, ring_key_words=0,
                     sub_rows=0):
    """Per-shard SEND bytes per step, by category (VERDICT r5 item 7).

    Counts the logical collective payload each shard contributes (the
    quantity ICI actually carries per link, up to the compiler's
    reduction topology), so the O(n/S + C) communication claim of the
    module docstring is a number, not an argument:

      sort    odd-even transposition, worst case S phases x the full
              local block -- O(n) per shard (the adaptive mode exits
              after O(displacement) phases; this is the static bound);
      heap    ONE psum of the leaf level (+ extent pmin/pmax) -- O(C);
      halo    2*halo ppermuted body blocks -- O(halo * n/S);
      beyond  need-mask psum O(C) + compacted all_gather O(r_budget)
              (common case) OR the exact block ring O(n) (overflow
              fallback; reported separately, selected by the traced
              flag the step emits);
      tile    acc all_gather along the tile axis (2-D mesh only).

    Everything except the sort bound and the ring fallback is
    O(n/S + C) -- asserted numerically in tests/test_sharding.py."""
    state_row = (1 + 4 * dim) * esize            # m + x/v/a/ao rows
    sort_row = nkeys * 4 + state_row             # + pad flag/key words
    heap = C * (4 + esize * (1 + 3 * dim))       # cnt/mass/mx + extents
    out = {
        "sort_bytes_max": n_shards * nl * sort_row,
        "box_subsample_bytes": sub_rows * dim * esize,
        "heap_psum_bytes": heap,
        "halo_bytes": 2 * halo * nl * ((1 + dim) * esize
                                       + 4 * halo_key_words),
        "beyond_need_psum_bytes": C * 4,
        "beyond_gather_bytes": r_budget * ((1 + dim) * esize + 4),
        "ring_fallback_bytes": (n_shards - 1) * nl * (
            (1 + dim) * esize + 4 * ring_key_words),
        "tile_gather_bytes": (nlt * dim * esize) if T > 1 else 0,
    }
    out["step_bytes_no_sort"] = (
        out["box_subsample_bytes"] + out["heap_psum_bytes"]
        + out["halo_bytes"] + out["beyond_need_psum_bytes"]
        + out["beyond_gather_bytes"] + out["tile_gather_bytes"])
    return out


def _make_step(cfg, mapped, npad, comm=None):
    """Pad-and-jit wrapper shared by both variants: pad bodies to npad
    (zero mass + duplicated last position; the flag-major sort moves
    them to the global tail), run the shard_map'd force, slice the real
    rows back, leapfrog."""
    from nbody_tpu.ops.integrator import leapfrog_step

    dim = cfg.dim

    @jax.jit
    def step(state: SystemState, k=None):
        nreal = state.x.shape[0]
        pad = npad - nreal
        if pad:
            mp = jnp.concatenate([state.m, jnp.zeros((pad,), state.m.dtype)])
            dup = jnp.broadcast_to(state.x[-1], (pad, dim))
            xp = jnp.concatenate([state.x, dup])
            zp = jnp.zeros((pad, dim), state.x.dtype)
            vp = jnp.concatenate([state.v, zp])
            ap = jnp.concatenate([state.a, zp])
            aop = jnp.concatenate([state.ao, zp])
        else:
            mp, xp, vp, ap, aop = (state.m, state.x, state.v, state.a,
                                   state.ao)
        m2, x2, v2, _a2, ao2, acc, bc, bm, root_mass, ring_used = mapped(
            mp, xp, vp, ap, aop, jnp.asarray(nreal, jnp.int32))
        # engine contract (ops/integrator.py): a = the accel just
        # computed, ao = the previous step's (rides the sort as payload)
        st = SystemState(m=m2[:nreal], x=x2[:nreal], v=v2[:nreal],
                         a=acc[:nreal], ao=ao2[:nreal])
        aux = {"beyond_halo_cells": bc, "beyond_halo_mass": bm,
               "root_mass": root_mass}
        if comm is not None:
            aux["comm"] = dict(comm)
            aux["beyond_used_ring"] = ring_used
            aux["comm_bytes_per_shard"] = (
                comm["step_bytes_no_sort"]
                + jnp.where(ring_used, comm["ring_fallback_bytes"], 0))
        return leapfrog_step(st, cfg.dt), aux

    return step


_SPECS = dict(
    in_specs=(P(BODY_AXIS),) + (P(BODY_AXIS, None),) * 4 + (P(),),
    out_specs=((P(BODY_AXIS),) + (P(BODY_AXIS, None),) * 4
               + (P(BODY_AXIS, None), P(), P(), P(), P())),
)


# ------------------------------------------------------------- variants

def make_partitioned_bvh_step(cfg: SimConfig, n_shards: int,
                              mesh: Mesh | None = None,
                              tile: int = 256, halo: int = 1,
                              l_top: int | None = None,
                              use_pallas=False,
                              beyond_budget: int | None = None,
                              tile_shards: int = 1,
                              comm_only: bool = False):
    """Partitioned implicit-BVH step.  Structurally the simpler variant:
    node j at level l covers rows [j * 2^(k-l), (j+1) * 2^(k-l)) of the
    padded power-of-two stream (bvh.h:98-127 semantics), so the halo
    interval needs no cell snapping (shard-block boundaries ARE node
    boundaries whenever the L_top node size divides n/S) and the ring
    pass derives visitor cells from row arithmetic, no key transport.
    Per-pair math is the BVH softening (d2^1.5 + eps, bvh.h:297).
    fp32/f64; requires power-of-two n_shards and tile.

    tile_shards > 1 selects the 2-D (body x tile) mesh layout
    (docs/DISTRIBUTED_TREES.md item 5): sort/heap/halo ride the body
    axis exactly as in 1-D, each tile-shard evaluates its 1/tile_shards
    row slice of the local block against the full heap + halo window,
    and one all_gather along the tile axis reassembles the (n/S, dim)
    accelerations.

    comm_only=True skips mesh construction and returns just the static
    per-shard communication accounting dict (usable with more shards
    than this host has devices -- feeds docs/DISTRIBUTED_TREES.md)."""
    T = int(tile_shards)
    if mesh is None and not comm_only:
        mesh = body_tile_mesh(n_shards, T) if T > 1 else body_mesh(n_shards)
    axes = (BODY_AXIS, TILE_AXIS) if T > 1 else BODY_AXIS
    from nbody_tpu.ops.hilbert import hilbert_key_u32pair, quantize

    dim, n = cfg.dim, cfg.n
    theta, G, eps = float(cfg.theta), float(cfg.G), cfg.eps
    dtype = np.dtype(cfg.dtype).type
    theta2 = jnp.asarray(theta * theta, dtype)

    if n_shards & (n_shards - 1) or tile & (tile - 1) or T & (T - 1):
        raise ValueError("partitioned bvh requires power-of-two n_shards, "
                         f"tile and tile_shards (got {n_shards}, {tile}, "
                         f"{T})")
    k = max(1, (max(n, 2) - 1).bit_length())       # npad = 2^k
    npad = 1 << k
    while npad % (n_shards * tile * T):
        npad *= 2
        k += 1
    nl = npad // n_shards
    ntiles_l = nl // tile
    nlt = nl // T                      # i-rows per (body, tile) shard
    ntiles_t = nlt // tile
    halo_w = (2 * halo + 1) * nl
    # L_top: ~16 bodies per node, <= 2^14 nodes, node size divides nl
    L = l_top if l_top is not None else max(1, min(k - 4, 14))
    L = min(L, k, (nl - 1).bit_length())
    S2 = 1 << (k - L)                              # bodies per L_top node
    assert nl % S2 == 0
    C = 1 << L
    r_budget = beyond_budget if beyond_budget else max(256, nl // 4)

    def shard_fn(m_l, x_l, v_l, a_l, ao_l, nreal):
        idx = jax.lax.axis_index(BODY_AXIS)
        # eps-padded box like the single-chip path (aabb_of_points
        # semantics, bvh.h:16-22 incl. the origin): computed from local
        # min/max + pmin/pmax -- pads duplicate a real position, so they
        # cannot widen it.  (The quantile/gather forms cannot run on
        # sharded operands outside shard_map.)
        tol = jnp.asarray(10.0 * eps, x_l.dtype)
        zdim = jnp.zeros((dim,), x_l.dtype)
        lo = jax.lax.pmin(jnp.minimum(jnp.min(x_l, axis=0), zdim),
                          BODY_AXIS) - tol
        hi = jax.lax.pmax(jnp.maximum(jnp.max(x_l, axis=0), zdim),
                          BODY_AXIS) + tol
        cell = quantize(x_l, lo, hi - lo, dim)
        khi, klo = hilbert_key_u32pair(cell, dim, true_curve=(dim == 3))
        _, m_l, x_l, v_l, a_l, ao_l = _sort_state(
            [khi, klo], m_l, x_l, v_l, a_l, ao_l, nreal, idx, nl,
            n_shards, dim)

        grow = idx * nl + jnp.arange(nl, dtype=jnp.int32)
        real = grow < nreal
        # pads scatter OOB (dropped): excluded from counts AND bounding
        # boxes (their duplicated input position is arbitrary once the
        # flag-major sort moved them to the tail)
        node = jnp.where(real, grow >> (k - L), jnp.int32(C))
        lvl = _psum_heap(node, m_l, x_l, C, 2, dim, dtype, L)

        m_e, x_e = _halo_window([m_l, x_l], idx, halo, n_shards)
        e0 = (idx - halo) * nl
        # node-aligned halo: S2 | nl, no snapping needed
        r0 = jnp.maximum(0, e0)
        r1 = jnp.minimum(npad, (idx + halo + 1) * nl)

        if T > 1:                      # 2-D mesh: this shard's row slice
            tidx = jax.lax.axis_index(TILE_AXIS)
            x_i = jax.lax.dynamic_slice_in_dim(x_l, tidx * nlt, nlt, 0)
        else:
            x_i = x_l
        xt = x_i.reshape(ntiles_t, tile, dim)
        epsv = jnp.asarray(eps, dtype)

        def range_fn(l):
            span = 1 << (k - l)
            lstart = (jnp.arange(1 << l, dtype=jnp.int32) * span)[None, :]
            return lstart, lstart + span

        acc_all, com_all, ms_all, beyond, bc, bm = _mac_concat(
            lvl, xt, range_fn, r0, r1, theta2, 2, L, dtype)

        def soften(d2):
            return d2 * jnp.sqrt(d2) + epsv    # dist3 = d2^1.5 + eps

        if use_pallas:
            itp = use_pallas == "interpret"
            far = _eval_far_pallas(x_i, acc_all, com_all, ms_all, eps,
                                   "poly", itp)
            near = _eval_near_pallas(x_i, m_e, x_e, r0 - e0, r1 - e0,
                                     tile, eps, "poly", itp)
        else:
            far = _eval_far(xt, acc_all, com_all, ms_all, soften, nlt, dim)
            jrow = e0 + jnp.arange(halo_w, dtype=jnp.int32)
            mj = jnp.where((jrow >= r0) & (jrow < r1), m_e, 0.0)
            near = _eval_near(xt, x_e, mj, soften, nlt, dim)

        def cell_of_visitor(r, _extras):
            src = (idx - r) % n_shards
            return (src * nl + jnp.arange(nl, dtype=jnp.int32)) >> (k - L)

        ring, _need_rows, ring_used = _beyond_exchange(
            xt, beyond, m_l, x_l, node, soften, idx, dim, dtype,
            n_shards, [], cell_of_visitor, r_budget, axes=axes)

        acc = jnp.asarray(G, dtype) * (far + near + ring)
        if T > 1:
            acc = jax.lax.all_gather(acc, TILE_AXIS, tiled=True)
        bc = jax.lax.psum(bc, axes)
        bm = jax.lax.pmax(bm, axes)
        return (m_l, x_l, v_l, a_l, ao_l, acc, bc, bm, lvl["mass"][0][0],
                ring_used)

    comm = _comm_accounting(
        n_shards=n_shards, nl=nl, dim=dim,
        esize=np.dtype(cfg.dtype).itemsize, nkeys=3, C=C, halo=halo,
        r_budget=r_budget, T=T, nlt=nlt)
    if comm_only:
        return comm
    mapped = _shard_map(shard_fn, mesh, **_SPECS)
    return _make_step(cfg, mapped, npad, comm=comm)


def make_partitioned_octree_step(cfg: SimConfig, n_shards: int,
                                 mesh: Mesh | None = None,
                                 tile: int = 256, halo: int = 1,
                                 l_top: int | None = None,
                                 use_pallas=False,
                                 beyond_budget: int | None = None,
                                 tile_shards: int = 1,
                                 comm_only: bool = False):
    """Partitioned Morton-cell octree step ((sqrt(d2)+eps)^3 softening,
    octree.h:236-247).  Cell row ranges come from the psum'd counts'
    cumsum and the halo interval SNAPS to cell boundaries (cells are
    spatial, not row-arithmetic, unlike the BVH variant).

    Returns step(state) -> (state, aux); state arrays are global-view
    (n, ...) jax.Arrays sharded over the body mesh; the returned state is
    in the NEW Morton order (the sort happens inside, exactly like the
    single-chip tree engines re-sort every step).  aux carries the
    beyond-halo diagnostics and the root mass.

    tile_shards > 1 selects the 2-D (body x tile) mesh layout -- see
    make_partitioned_bvh_step; identical row-slice treatment.
    comm_only=True: see make_partitioned_bvh_step."""
    T = int(tile_shards)
    if mesh is None and not comm_only:
        mesh = body_tile_mesh(n_shards, T) if T > 1 else body_mesh(n_shards)
    axes = (BODY_AXIS, TILE_AXIS) if T > 1 else BODY_AXIS
    from nbody_tpu.ops.octree import max_depth, morton_keys, robust_quant_box

    dim, n = cfg.dim, cfg.n
    theta, G, eps = float(cfg.theta), float(cfg.G), cfg.eps
    dtype = np.dtype(cfg.dtype).type
    depth = max_depth(n, dim)
    nbranch = 1 << dim
    L = l_top if l_top is not None else _coarse_level(n, dim)
    L = min(L, depth)
    C = nbranch ** L
    theta2 = jnp.asarray(theta * theta, dtype)

    npad = _round_up(n, n_shards * tile * T)
    nl = npad // n_shards
    ntiles_l = nl // tile
    nlt = nl // T                      # i-rows per (body, tile) shard
    ntiles_t = nlt // tile
    halo_w = (2 * halo + 1) * nl
    r_budget = beyond_budget if beyond_budget else max(256, nl // 4)

    # per-shard subsample size for the robust box quantiles (the
    # single-chip path subsamples to <= 16384 rows, octree.py:355)
    sub_stride = max(1, (npad // n_shards) // max(1, 16384 // n_shards))

    def shard_fn(m_l, x_l, v_l, a_l, ao_l, nreal):
        idx = jax.lax.axis_index(BODY_AXIS)
        # robust quantization box like the single-chip fast path: the raw
        # min/max box is exactly what escaper bodies balloon (octree.py
        # robust_quant_box, measured 13x box growth after 10 steps) -- a
        # collapsed core would push most mass beyond the halo and degrade
        # the ring pass to O(n^2/S) work.  Quantiles cannot run on the
        # sharded global array, so each shard contributes a strided
        # subsample and one small all_gather replicates it (pads
        # duplicate a real position: harmless for min/max, negligible
        # quantile bias).
        sub = jax.lax.all_gather(x_l[::sub_stride], BODY_AXIS, tiled=True)
        lo, hi = robust_quant_box(sub, None, None)
        keys0 = morton_keys(x_l, lo, hi, depth)
        (keys,), m_l, x_l, v_l, a_l, ao_l = _sort_state(
            [keys0], m_l, x_l, v_l, a_l, ao_l, nreal, idx, nl,
            n_shards, dim)

        grow = idx * nl + jnp.arange(nl, dtype=jnp.int32)
        is_pad = grow >= nreal
        shift_L = jnp.uint32((depth - L) * dim)
        # pads scatter to the out-of-range cell C: dropped (OOB scatter)
        cell = jnp.where(is_pad, jnp.int32(C),
                         (keys >> shift_L).astype(jnp.int32))
        lvl = _psum_heap(cell, m_l, x_l, C, nbranch, dim, dtype, L)
        cnt = lvl["cnt"][L]

        # global L_top row ranges (cells are contiguous in the sorted
        # order): starts/ends from the psum'd counts.  Sentinel row C is
        # the pad tail [nreal, npad).
        ce_arr = jnp.cumsum(cnt)
        cs_arr = ce_arr - cnt
        cs_arr = jnp.concatenate([cs_arr, nreal[None]])
        ce_arr = jnp.concatenate([ce_arr, jnp.asarray([npad], jnp.int32)])

        m_e, x_e, k_e = _halo_window([m_l, x_l, keys], idx, halo, n_shards)
        e0 = (idx - halo) * nl

        # cell-snapped exact interval [lo_t, hi_t): the near field must
        # cover whole cells so the far field can drop them cleanly
        # (octree_group.py window partition)
        r0 = jnp.maximum(0, e0)
        r1 = jnp.minimum(npad, (idx + halo + 1) * nl)
        jrow = e0 + jnp.arange(halo_w, dtype=jnp.int32)
        cell_e = jnp.where(jrow >= nreal, jnp.int32(C),
                           (k_e >> shift_L).astype(jnp.int32))
        c0 = cell_e[r0 - e0]
        c1 = cell_e[r1 - 1 - e0]
        lo_t = jnp.where(cs_arr[c0] == r0, r0, ce_arr[c0])
        hi_t = jnp.where(ce_arr[c1] == r1, r1, cs_arr[c1])
        hi_t = jnp.maximum(hi_t, lo_t)

        if T > 1:                      # 2-D mesh: this shard's row slice
            tidx = jax.lax.axis_index(TILE_AXIS)
            x_i = jax.lax.dynamic_slice_in_dim(x_l, tidx * nlt, nlt, 0)
        else:
            x_i = x_l
        xt = x_i.reshape(ntiles_t, tile, dim)
        epsv = jnp.asarray(eps, dtype)

        def range_fn(l):
            cl = lvl["cnt"][l]
            lend = jnp.cumsum(cl)
            return (lend - cl)[None, :], lend[None, :]

        acc_all, com_all, ms_all, beyond, bc, bm = _mac_concat(
            lvl, xt, range_fn, lo_t, hi_t, theta2, nbranch, L, dtype)

        def soften(d2):
            s = jnp.sqrt(d2) + epsv            # (sqrt(d2) + eps)^3
            return s * s * s

        if use_pallas:
            itp = use_pallas == "interpret"
            far = _eval_far_pallas(x_i, acc_all, com_all, ms_all, eps,
                                   "sqrt3", itp)
            near = _eval_near_pallas(x_i, m_e, x_e, lo_t - e0, hi_t - e0,
                                     tile, eps, "sqrt3", itp)
        else:
            far = _eval_far(xt, acc_all, com_all, ms_all, soften, nlt, dim)
            mj = jnp.where((jrow >= lo_t) & (jrow < hi_t), m_e, 0.0)
            near = _eval_near(xt, x_e, mj, soften, nlt, dim)

        def cell_of_visitor(r, extras):
            return (extras[0] >> shift_L).astype(jnp.int32)

        ring, _need_rows, ring_used = _beyond_exchange(
            xt, beyond, m_l, x_l, cell, soften, idx, dim, dtype,
            n_shards, [keys], cell_of_visitor, r_budget, axes=axes)

        acc = jnp.asarray(G, dtype) * (far + near + ring)
        if T > 1:
            acc = jax.lax.all_gather(acc, TILE_AXIS, tiled=True)
        bc = jax.lax.psum(bc, axes)
        bm = jax.lax.pmax(bm, axes)
        return (m_l, x_l, v_l, a_l, ao_l, acc, bc, bm, lvl["mass"][0][0],
                ring_used)

    comm = _comm_accounting(
        n_shards=n_shards, nl=nl, dim=dim,
        esize=np.dtype(cfg.dtype).itemsize, nkeys=2, C=C, halo=halo,
        r_budget=r_budget, T=T, nlt=nlt, halo_key_words=1,
        ring_key_words=1, sub_rows=-(-nl // sub_stride))
    if comm_only:
        return comm
    mapped = _shard_map(shard_fn, mesh, **_SPECS)
    return _make_step(cfg, mapped, npad, comm=comm)
