"""Partitioned Barnes-Hut octree: sharded bodies, distributed sort,
replicated COARSE heap, halo-exact near field -- the weak-scaling layout.

The replicated-tree engines (parallel/tree_sharded.py) are 1/S only in
the force evaluation: every shard holds all n bodies, sorts them, and
builds the full tree.  This module is the next step of the multi-chip
design (docs/DISTRIBUTED_TREES.md): per-shard memory is O(n/S + C),
where C is the coarse cell count, so n can grow with the mesh.

Layout per step (all inside one shard_map over the 1-D body mesh):

  sort    bodies live sharded; a cross-shard Morton sort
          (parallel/distributed_sort.py) gives every shard a CONTIGUOUS
          range of the global Morton order -- shard boundaries are
          spatial boundaries;
  heap    one global coarse heap, levels 0..L_top (count, mass, m*x,
          extents per cell): each shard scatter-adds its own bodies and
          ONE psum replicates the result -- O(C) data, C <= 2^14 cells;
  far     per-tile dense MAC masks against the heap, exactly the
          single-chip fast path's conservative group MAC (true-extent
          width, tile-bbox dmin, octree_group.py:770-800) -- evaluated
          from the REPLICATED heap, no remote body data needed;
  near    cells still open at L_top are spatially near the evaluating
          tile; with Morton ownership their bodies live on the same or
          Morton-adjacent shards.  Each shard ppermutes the body blocks
          of its +-halo neighbours into an extended window E of
          (2*halo + 1) * n/S rows and evaluates the cell-snapped row
          interval [lo_t, hi_t) EXACTLY against its own rows (the
          snapping mirrors octree_group's window partition, so every
          (body, source) pair is counted exactly once);
  beyond  open L_top cells OUTSIDE the halo interval (Morton seams,
          extreme density contrast) are approximated by their L_top
          monopole and COUNTED (aux: beyond_halo cells, beyond_mass).
          This is the one place the skeleton is weaker than the
          replicated path: a failed-MAC monopole is accepted.  The
          production completion (designed, not yet built -- see
          docs/DISTRIBUTED_TREES.md) routes those cells' body blocks
          through a ring pass like parallel/ring.py, restoring the
          conservative never-less-accurate guarantee.

The force math replicates the reference octree semantics ((sqrt(d2) +
eps)^3 softening, octree.h:236-247); the traversal is this rebuild's own
design (the reference is single-device).

This module favours clarity over peak throughput: the far/near
evaluations are dense jnp contractions (fine on the 8-device CPU mesh
and for dryrun validation; the production path would reuse the
masked-bits / windowed Pallas kernels, which take the same mask/interval
inputs).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from nbody_tpu.config import SimConfig
from nbody_tpu.parallel.mesh import BODY_AXIS, body_mesh
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
    falls into the beyond-halo monopole approximation -- at a tile's OWN
    position that is catastrophic (measured: a 4-cluster system at
    L_top=3 put half the total mass beyond-halo, rel err 1.4; at ~16
    bodies/cell the same system evaluates at 0.8% like the uniform
    case).  Dense cores still concentrate mass, so the halo width and
    the beyond_halo_* diagnostics remain the honest guardrail."""
    nbranch = 1 << dim
    l = 1
    while (nbranch ** (l + 1)) <= cap_cells and (nbranch ** l) * 16 < n * 4:
        l += 1
    return l


def make_partitioned_bvh_step(cfg: SimConfig, n_shards: int,
                              mesh: Mesh | None = None,
                              tile: int = 256, halo: int = 1,
                              l_top: int | None = None):
    """Partitioned implicit-BVH step (the BVH variant promised in
    docs/DISTRIBUTED_TREES.md).  Same layout as the octree version --
    distributed sort, one-psum coarse heap, halo-exact near field,
    ring-exact beyond field -- but STRUCTURALLY SIMPLER: implicit-BVH
    nodes are fixed row ranges (node j at level l covers rows
    [j * 2^(k-l), (j+1) * 2^(k-l)) of the padded power-of-two stream,
    bvh.h:98-127 semantics), so the halo interval needs no cell
    snapping: shard-block boundaries ARE node boundaries whenever the
    L_top node size divides n/S.  Per-pair math is the BVH softening
    (d2^1.5 + eps, bvh.h:297).  fp32/f64; requires n_shards and tile to
    be powers of two."""
    if mesh is None:
        mesh = body_mesh(n_shards)
    from nbody_tpu.ops.hilbert import hilbert_key_u32pair, quantize

    dim, n = cfg.dim, cfg.n
    theta, G, eps = float(cfg.theta), float(cfg.G), cfg.eps
    dtype = np.dtype(cfg.dtype).type
    theta2 = jnp.asarray(theta * theta, dtype)

    k = max(1, (max(n, 2) - 1).bit_length())       # npad = 2^k
    npad = 1 << k
    while npad % (n_shards * tile):
        npad *= 2
        k += 1
    nl = npad // n_shards
    ntiles_l = nl // tile
    halo_w = (2 * halo + 1) * nl
    # L_top: ~16 bodies per node, <= 2^14 nodes, node size divides nl
    L = l_top if l_top is not None else max(1, min(k - 4, 14))
    L = min(L, k, (nl - 1).bit_length())
    S2 = 1 << (k - L)                              # bodies per L_top node
    assert nl % S2 == 0

    def shard_fn(m_l, x_l, v_l, a_l, ao_l, lo, hi, nreal):
        idx = jax.lax.axis_index(BODY_AXIS)

        # ---- distributed Hilbert sort ((hi, lo) u32 keys with a MAJOR
        # pad flag: post-sort pads are exactly the global rows >= nreal,
        # so [:nreal] keeps every real body) ---------------------------
        cell = quantize(x_l, lo, hi - lo, dim)
        khi, klo = hilbert_key_u32pair(cell, dim, true_curve=(dim == 3))
        grow_in = idx * nl + jnp.arange(nl, dtype=jnp.int32)
        pad_flag = (grow_in >= nreal).astype(jnp.uint32)
        cols = ([m_l] + [x_l[:, d] for d in range(dim)]
                + [v_l[:, d] for d in range(dim)]
                + [a_l[:, d] for d in range(dim)]
                + [ao_l[:, d] for d in range(dim)])
        (_, khi, klo), cols = distributed_sort_rows(
            [pad_flag, khi, klo], cols, BODY_AXIS, n_shards)
        m_l = cols[0]
        x_l = jnp.stack(cols[1:1 + dim], axis=1)
        v_l = jnp.stack(cols[1 + dim:1 + 2 * dim], axis=1)
        a_l = jnp.stack(cols[1 + 2 * dim:1 + 3 * dim], axis=1)
        ao_l = jnp.stack(cols[1 + 3 * dim:1 + 4 * dim], axis=1)

        # ---- replicated coarse heap (levels 0..L) via ONE psum -------
        grow = idx * nl + jnp.arange(nl, dtype=jnp.int32)
        node = grow >> (k - L)
        real = grow < nreal
        C = 1 << L
        cnt = jnp.zeros((C,), jnp.int32).at[node].add(real.astype(jnp.int32))
        mass = jnp.zeros((C,), dtype).at[node].add(m_l)
        mx = jnp.zeros((C, dim), dtype).at[node].add(m_l[:, None] * x_l)
        big = jnp.asarray(np.finfo(dtype).max, dtype)
        # pads excluded from node bounding boxes (their duplicated input
        # position is arbitrary once the flag-major sort moved them)
        cmin = jnp.full((C, dim), big, dtype).at[node].min(
            jnp.where(real[:, None], x_l, big))
        cmax = jnp.full((C, dim), -big, dtype).at[node].max(
            jnp.where(real[:, None], x_l, -big))
        cnt, mass, mx = (jax.lax.psum(v, BODY_AXIS) for v in (cnt, mass, mx))
        cmin = jax.lax.pmin(cmin, BODY_AXIS)
        cmax = jax.lax.pmax(cmax, BODY_AXIS)

        lvl_cnt, lvl_mass, lvl_mx = [cnt], [mass], [mx]
        lvl_cmin, lvl_cmax = [cmin], [cmax]
        for _ in range(L):
            lvl_cnt.insert(0, lvl_cnt[0].reshape(-1, 2).sum(1))
            lvl_mass.insert(0, lvl_mass[0].reshape(-1, 2).sum(1))
            lvl_mx.insert(0, lvl_mx[0].reshape(-1, 2, dim).sum(1))
            lvl_cmin.insert(0, lvl_cmin[0].reshape(-1, 2, dim).min(1))
            lvl_cmax.insert(0, lvl_cmax[0].reshape(-1, 2, dim).max(1))

        # ---- halo window (node-aligned: S2 | nl, no snapping) --------
        parts_m, parts_x = [], []
        for h in range(-halo, halo + 1):
            if h == 0:
                parts_m.append(m_l)
                parts_x.append(x_l)
                continue
            perm = [(s, s - h) for s in range(n_shards)
                    if 0 <= s - h < n_shards]
            parts_m.append(jax.lax.ppermute(m_l, BODY_AXIS, perm))
            parts_x.append(jax.lax.ppermute(x_l, BODY_AXIS, perm))
        m_e = jnp.concatenate(parts_m)
        x_e = jnp.concatenate(parts_x)
        e0 = (idx - halo) * nl
        r0 = jnp.maximum(0, e0)
        r1 = jnp.minimum(npad, (idx + halo + 1) * nl)

        # ---- far field: conservative group MAC (bw = true extent) ----
        xt = x_l.reshape(ntiles_l, tile, dim)
        tmin = jnp.min(xt, axis=1)
        tmax = jnp.max(xt, axis=1)
        epsv = jnp.asarray(eps, dtype)

        accepts, coms, masses = [], [], []
        open_mask = jnp.ones((ntiles_l, 1), jnp.bool_)
        for l in range(L + 1):
            cl, msl = lvl_cnt[l], lvl_mass[l]
            com = lvl_mx[l] / jnp.maximum(
                msl, jnp.asarray(1e-30, dtype))[:, None]
            alive = (cl > 0)[None, :]
            dmin_v = jnp.maximum(tmin[:, None, :] - com[None, :, :], 0.0)
            dmin_v = jnp.maximum(dmin_v, com[None, :, :] - tmax[:, None, :])
            dmin2 = jnp.sum(dmin_v * dmin_v, axis=-1)
            width = jnp.max(lvl_cmax[l] - lvl_cmin[l], axis=-1)
            weff = jnp.where(cl > 0, width, 0.0)[None, :]
            single = (cl == 1)[None, :]
            span = 1 << (k - l)
            lstart = (jnp.arange(1 << l, dtype=jnp.int32) * span)[None, :]
            lend = lstart + span
            inside = (lstart >= r0) & (lend <= r1)
            overlap = (lstart < r1) & (lend > r0)
            partial_w = overlap & ~inside
            mac = ((weff * weff < theta2 * dmin2) | single) & ~partial_w
            accept = open_mask & alive & mac & ~inside
            open_ = open_mask & alive & ~mac & ~inside
            if l == L:
                beyond_open = open_
                beyond_cells = jnp.sum(open_, dtype=jnp.int32)
                beyond_mass = jnp.sum(
                    jnp.where(jnp.any(open_, axis=0), msl, 0.0))
            accepts.append(accept)
            coms.append(com)
            masses.append(msl)
            if l < L:
                open_mask = jnp.repeat(open_, 2, axis=1)

        acc_all = jnp.concatenate(accepts, axis=1)
        com_all = jnp.concatenate(coms, axis=0)
        ms_all = jnp.concatenate(masses, axis=0)

        def _soften(d2):
            # BVH per-pair math: dist3 = d2^1.5 + eps (bvh.h:297)
            return d2 * jnp.sqrt(d2) + epsv

        def _far_tile(args):
            xtb, am = args
            dxf = com_all[None, :, :] - xtb[:, None, :]
            d2f = jnp.sum(dxf * dxf, axis=-1)
            wf = jnp.where(am[None, :], ms_all[None, :] / _soften(d2f), 0.0)
            return jnp.einsum("bw,bwd->bd", wf, dxf)

        far = jax.lax.map(_far_tile, (xt, acc_all)).reshape(nl, dim)

        # ---- near field: exact vs the halo interval ------------------
        jrow = e0 + jnp.arange(halo_w, dtype=jnp.int32)
        mj = jnp.where((jrow >= r0) & (jrow < r1), m_e, 0.0)

        def _near_tile(xtb):
            dxn = x_e[None, :, :] - xtb[:, None, :]
            d2n = jnp.sum(dxn * dxn, axis=-1)
            wn = mj[None, :] / _soften(d2n)   # self-pair: 0/eps -> 0
            return jnp.einsum("bj,bjd->bd", wn, dxn)

        near = jax.lax.map(_near_tile, xt).reshape(nl, dim)

        # ---- beyond-halo ring pass (node-of-row is pure arithmetic) --
        ring = jnp.zeros((nl, dim), dtype)
        mv, xv = m_l, x_l
        perm = [(s, (s + 1) % n_shards) for s in range(n_shards)]
        for r in range(n_shards):
            src = (idx - r) % n_shards
            node_v = (src * nl
                      + jnp.arange(nl, dtype=jnp.int32)) >> (k - L)
            bmask = jnp.take(beyond_open, node_v, axis=1)     # (T, nl)

            def _eval(xv_, mv_, bm_):
                def _ring_tile(args):
                    xtb, bmt = args
                    dxr = xv_[None, :, :] - xtb[:, None, :]
                    d2r = jnp.sum(dxr * dxr, axis=-1)
                    wr = jnp.where(bmt[None, :],
                                   mv_[None, :] / _soften(d2r), 0.0)
                    return jnp.einsum("bj,bjd->bd", wr, dxr)

                return jax.lax.map(_ring_tile, (xt, bm_)).reshape(nl, dim)

            ring = ring + jax.lax.cond(
                jnp.any(bmask), _eval,
                lambda *_: jnp.zeros((nl, dim), dtype),
                xv, mv, bmask)
            if r + 1 < n_shards:
                mv = jax.lax.ppermute(mv, BODY_AXIS, perm)
                xv = jax.lax.ppermute(xv, BODY_AXIS, perm)

        acc = jnp.asarray(G, dtype) * (far + near + ring)
        beyond_cells = jax.lax.psum(beyond_cells, BODY_AXIS)
        beyond_mass = jax.lax.pmax(beyond_mass, BODY_AXIS)
        return (m_l, x_l, v_l, a_l, ao_l, acc, beyond_cells, beyond_mass,
                lvl_mass[0][0])

    mapped = _shard_map(
        shard_fn, mesh,
        in_specs=(P(BODY_AXIS),) + (P(BODY_AXIS, None),) * 4
        + (P(), P(), P()),
        out_specs=((P(BODY_AXIS),) + (P(BODY_AXIS, None),) * 4
                   + (P(BODY_AXIS, None), P(), P(), P())),
    )

    from nbody_tpu.ops.integrator import leapfrog_step

    @jax.jit
    def step(state: SystemState, k_step=None):
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
        lo = jnp.min(state.x, axis=0)
        hi = jnp.max(state.x, axis=0)
        m2, x2, v2, _a2, ao2, acc, bc, bm, root_mass = mapped(
            mp, xp, vp, ap, aop, lo, hi, jnp.asarray(nreal, jnp.int32))
        st = SystemState(m=m2[:nreal], x=x2[:nreal], v=v2[:nreal],
                         a=acc[:nreal], ao=ao2[:nreal])
        aux = {"beyond_halo_cells": bc, "beyond_halo_mass": bm,
               "root_mass": root_mass}
        return leapfrog_step(st, cfg.dt), aux

    return step


def make_partitioned_octree_step(cfg: SimConfig, n_shards: int,
                                 mesh: Mesh | None = None,
                                 tile: int = 256, halo: int = 1,
                                 l_top: int | None = None):
    """Jitted full leapfrog step over globally-sharded body arrays.

    Returns step(state) -> (state, aux); state arrays are global-view
    (n, ...) jax.Arrays sharded over the body mesh; the returned state is
    in the NEW Morton order (the sort happens inside, exactly like the
    single-chip tree engines re-sort every step).  aux carries the
    beyond-halo diagnostics and the root mass."""
    if mesh is None:
        mesh = body_mesh(n_shards)
    from nbody_tpu.ops.octree import max_depth, morton_keys

    dim, n = cfg.dim, cfg.n
    theta, G, eps = float(cfg.theta), float(cfg.G), cfg.eps
    dtype = np.dtype(cfg.dtype).type
    depth = max_depth(n, dim)
    nbranch = 1 << dim
    L = l_top if l_top is not None else _coarse_level(n, dim)
    L = min(L, depth)
    C = nbranch ** L
    theta2 = jnp.asarray(theta * theta, dtype)

    npad = _round_up(n, n_shards * tile)
    nl = npad // n_shards
    ntiles_l = nl // tile
    halo_w = (2 * halo + 1) * nl

    def shard_fn(m_l, x_l, v_l, a_l, ao_l, lo, hi, nreal):
        idx = jax.lax.axis_index(BODY_AXIS)

        # ---- distributed Morton sort (payload = full body state) ------
        # Pad rows sort with a MAJOR pad flag: their duplicated-position
        # key would otherwise land them mid-stream among equal keys and
        # the final [:nreal] slice would drop REAL bodies while keeping
        # zero-mass clones.  With the flag major, post-sort pads are
        # exactly the global rows >= nreal -- every pad test below is
        # pure row arithmetic.
        keys = morton_keys(x_l, lo, hi, depth)
        grow_in = idx * nl + jnp.arange(nl, dtype=jnp.int32)
        pad_flag = (grow_in >= nreal).astype(jnp.uint32)
        cols = ([m_l] + [x_l[:, d] for d in range(dim)]
                + [v_l[:, d] for d in range(dim)]
                + [a_l[:, d] for d in range(dim)]
                + [ao_l[:, d] for d in range(dim)])
        (_, keys), cols = distributed_sort_rows([pad_flag, keys], cols,
                                                BODY_AXIS, n_shards)
        grow = idx * nl + jnp.arange(nl, dtype=jnp.int32)
        is_pad = grow >= nreal
        m_l = cols[0]
        x_l = jnp.stack(cols[1:1 + dim], axis=1)
        v_l = jnp.stack(cols[1 + dim:1 + 2 * dim], axis=1)
        a_l = jnp.stack(cols[1 + 2 * dim:1 + 3 * dim], axis=1)
        ao_l = jnp.stack(cols[1 + 3 * dim:1 + 4 * dim], axis=1)

        # ---- replicated coarse heap via ONE psum ----------------------
        # pads scatter to the out-of-range cell C: dropped (OOB scatter)
        cell = jnp.where(
            is_pad, jnp.int32(C),
            (keys >> jnp.uint32((depth - L) * dim)).astype(jnp.int32))
        cnt = jnp.zeros((C,), jnp.int32).at[cell].add(1)
        mass = jnp.zeros((C,), dtype).at[cell].add(m_l)
        mx = jnp.zeros((C, dim), dtype).at[cell].add(m_l[:, None] * x_l)
        big = jnp.asarray(np.finfo(dtype).max, dtype)
        cmin = jnp.full((C, dim), big, dtype).at[cell].min(x_l)
        cmax = jnp.full((C, dim), -big, dtype).at[cell].max(x_l)
        cnt, mass, mx = (jax.lax.psum(v, BODY_AXIS) for v in (cnt, mass, mx))
        cmin = jax.lax.pmin(cmin, BODY_AXIS)
        cmax = jax.lax.pmax(cmax, BODY_AXIS)

        lvl_cnt, lvl_mass, lvl_mx = [cnt], [mass], [mx]
        lvl_cmin, lvl_cmax = [cmin], [cmax]
        for _ in range(L):
            lvl_cnt.insert(0, lvl_cnt[0].reshape(-1, nbranch).sum(1))
            lvl_mass.insert(0, lvl_mass[0].reshape(-1, nbranch).sum(1))
            lvl_mx.insert(0, lvl_mx[0].reshape(-1, nbranch, dim).sum(1))
            lvl_cmin.insert(0, lvl_cmin[0].reshape(-1, nbranch, dim).min(1))
            lvl_cmax.insert(0, lvl_cmax[0].reshape(-1, nbranch, dim).max(1))

        # global L_top row ranges (cells are contiguous in the sorted
        # order): starts/ends from the psum'd counts.  Sentinel row C is
        # the pad tail [nreal, npad).
        ce_arr = jnp.cumsum(cnt)
        cs_arr = ce_arr - cnt
        cs_arr = jnp.concatenate([cs_arr, nreal[None]])
        ce_arr = jnp.concatenate([ce_arr, jnp.asarray([npad], jnp.int32)])

        # ---- halo window E (2*halo+1 shard blocks) --------------------
        parts_m, parts_x, parts_k = [], [], []
        for h in range(-halo, halo + 1):
            if h == 0:
                parts_m.append(m_l)
                parts_x.append(x_l)
                parts_k.append(keys)
                continue
            # shift blocks by h: shard i receives shard i+h's block
            perm = [(s, s - h) for s in range(n_shards)
                    if 0 <= s - h < n_shards]
            parts_m.append(jax.lax.ppermute(m_l, BODY_AXIS, perm))
            parts_x.append(jax.lax.ppermute(x_l, BODY_AXIS, perm))
            parts_k.append(jax.lax.ppermute(keys, BODY_AXIS, perm))
        m_e = jnp.concatenate(parts_m)        # missing neighbours arrive
        x_e = jnp.concatenate(parts_x)        # zero-filled: mass 0 ==
        k_e = jnp.concatenate(parts_k)        # force-invisible
        e0 = (idx - halo) * nl                # global row of E[0]

        # cell-snapped exact interval [lo_t, hi_t): the near field must
        # cover whole cells so the far field can drop them cleanly
        # (octree_group.py window partition)
        r0 = jnp.maximum(0, e0)
        r1 = jnp.minimum(npad, (idx + halo + 1) * nl)
        jrow_e = e0 + jnp.arange(halo_w, dtype=jnp.int32)
        cell_e = jnp.where(
            jrow_e >= nreal, jnp.int32(C),
            (k_e >> jnp.uint32((depth - L) * dim)).astype(jnp.int32))
        c0 = cell_e[r0 - e0]
        c1 = cell_e[r1 - 1 - e0]
        lo_t = jnp.where(cs_arr[c0] == r0, r0, ce_arr[c0])
        hi_t = jnp.where(ce_arr[c1] == r1, r1, cs_arr[c1])
        hi_t = jnp.maximum(hi_t, lo_t)

        # ---- far field: dense per-level conservative group MAC --------
        xt = x_l.reshape(ntiles_l, tile, dim)
        tmin = jnp.min(xt, axis=1)
        tmax = jnp.max(xt, axis=1)
        epsv = jnp.asarray(eps, dtype)
        beyond_cells = jnp.zeros((), jnp.int32)
        beyond_mass = jnp.zeros((), dtype)

        accepts, coms, masses = [], [], []
        open_mask = jnp.ones((ntiles_l, 1), jnp.bool_)
        for l in range(L + 1):
            cl, msl = lvl_cnt[l], lvl_mass[l]
            com = lvl_mx[l] / jnp.maximum(
                msl, jnp.asarray(1e-30, dtype))[:, None]
            alive = (cl > 0)[None, :]
            dmin_v = jnp.maximum(tmin[:, None, :] - com[None, :, :], 0.0)
            dmin_v = jnp.maximum(dmin_v, com[None, :, :] - tmax[:, None, :])
            dmin2 = jnp.sum(dmin_v * dmin_v, axis=-1)
            width = jnp.max(lvl_cmax[l] - lvl_cmin[l], axis=-1)
            weff = jnp.where(cl > 0, width, 0.0)[None, :]
            single = (cl == 1)[None, :]
            lend = jnp.cumsum(cl)
            lstart = (lend - cl)[None, :]
            lend = lend[None, :]
            inside = (lstart >= lo_t) & (lend <= hi_t)
            overlap = (lstart < hi_t) & (lend > lo_t)
            partial_w = overlap & ~inside
            mac = ((weff * weff < theta2 * dmin2) | single) & ~partial_w
            accept = open_mask & alive & mac & ~inside
            open_ = open_mask & alive & ~mac & ~inside
            if l == L:
                # beyond-halo opens (Morton seams; cells larger than the
                # halo): evaluated EXACTLY by the masked ring pass below,
                # preserving the fast paths' conservative guarantee.
                # Counted here -- high counts mean the ring pass is doing
                # O(n^2/S)-ish work and the halo/L_top sizing is off.
                beyond_open = open_
                beyond_cells = jnp.sum(open_, dtype=jnp.int32)
                beyond_mass = jnp.sum(
                    jnp.where(jnp.any(open_, axis=0), msl, 0.0))
            accepts.append(accept)
            coms.append(com)
            masses.append(msl)
            if l < L:
                open_mask = jnp.repeat(open_, nbranch, axis=1)

        # one concatenated heap (W_all = (nbranch^(L+1) - 1)/(nbranch - 1)
        # slots) evaluated per TILE under lax.map: temporaries stay at
        # (tile, W_all) instead of (nl, W_all) -- the production path
        # would stream this through masked_eval_bits_pallas instead
        acc_all = jnp.concatenate(accepts, axis=1)          # (T, W_all)
        com_all = jnp.concatenate(coms, axis=0)             # (W_all, dim)
        ms_all = jnp.concatenate(masses, axis=0)            # (W_all,)

        def _far_tile(args):
            xtb, am = args                                  # (tile,d),(W,)
            dxf = com_all[None, :, :] - xtb[:, None, :]
            d2f = jnp.sum(dxf * dxf, axis=-1)
            sf = jnp.sqrt(d2f) + epsv
            wf = jnp.where(am[None, :], ms_all[None, :] / (sf * sf * sf),
                           0.0)
            return jnp.einsum("bw,bwd->bd", wf, dxf)

        far = jax.lax.map(_far_tile, (xt, acc_all)).reshape(nl, dim)

        # ---- near field: exact vs the snapped halo interval -----------
        jrow = e0 + jnp.arange(halo_w, dtype=jnp.int32)
        mj = jnp.where((jrow >= lo_t) & (jrow < hi_t), m_e, 0.0)

        def _near_tile(xtb):
            dxn = x_e[None, :, :] - xtb[:, None, :]
            d2n = jnp.sum(dxn * dxn, axis=-1)
            sn = jnp.sqrt(d2n) + epsv
            wn = mj[None, :] / (sn * sn * sn)   # self-pair: 0/eps^3 -> 0
            return jnp.einsum("bj,bjd->bd", wn, dxn)

        near = jax.lax.map(_near_tile, xt).reshape(nl, dim)

        # ---- beyond-halo ring pass: EXACT bodies of Morton-far opens --
        # Every shard's (m, x, keys) block rotates around the ring (the
        # parallel/ring.py structure); at rotation r the visitor is shard
        # (idx - r)'s block and contributes only rows whose L_top cell is
        # beyond-halo-open for the local tile.  beyond cells lie outside
        # the snapped near interval by construction, so no pair is double
        # counted.  lax.cond skips the math whenever the visitor block
        # has no beyond targets -- the common case is a handful of active
        # rotations.  (Production note: an entry-compacted exchange would
        # move only the needed S-blocks; designed in
        # docs/DISTRIBUTED_TREES.md, not yet built.)
        shift_L = jnp.uint32((depth - L) * dim)
        ring = jnp.zeros((nl, dim), dtype)
        mv, xv, kv = m_l, x_l, keys
        perm = [(s, (s + 1) % n_shards) for s in range(n_shards)]
        for r in range(n_shards):
            cell_v = (kv >> shift_L).astype(jnp.int32)
            bmask = jnp.take(beyond_open, cell_v, axis=1)     # (T, nl)

            def _eval(xv_, mv_, bm_):
                def _ring_tile(args):
                    xtb, bmt = args
                    dxr = xv_[None, :, :] - xtb[:, None, :]
                    d2r = jnp.sum(dxr * dxr, axis=-1)
                    sr = jnp.sqrt(d2r) + epsv
                    wr = jnp.where(bmt[None, :],
                                   mv_[None, :] / (sr * sr * sr), 0.0)
                    return jnp.einsum("bj,bjd->bd", wr, dxr)

                return jax.lax.map(_ring_tile, (xt, bm_)).reshape(nl, dim)

            ring = ring + jax.lax.cond(
                jnp.any(bmask), _eval,
                lambda *_: jnp.zeros((nl, dim), dtype),
                xv, mv, bmask)
            if r + 1 < n_shards:
                mv = jax.lax.ppermute(mv, BODY_AXIS, perm)
                xv = jax.lax.ppermute(xv, BODY_AXIS, perm)
                kv = jax.lax.ppermute(kv, BODY_AXIS, perm)

        acc = jnp.asarray(G, dtype) * (far + near + ring)
        beyond_cells = jax.lax.psum(beyond_cells, BODY_AXIS)
        beyond_mass = jax.lax.pmax(beyond_mass, BODY_AXIS)
        return (m_l, x_l, v_l, a_l, ao_l, acc, beyond_cells, beyond_mass,
                lvl_mass[0][0])

    mapped = _shard_map(
        shard_fn, mesh,
        in_specs=(P(BODY_AXIS),) + (P(BODY_AXIS, None),) * 4
        + (P(), P(), P()),
        out_specs=((P(BODY_AXIS),) + (P(BODY_AXIS, None),) * 4
                   + (P(BODY_AXIS, None), P(), P(), P())),
    )

    from nbody_tpu.ops.integrator import leapfrog_step

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
        lo = jnp.min(xp, axis=0)
        hi = jnp.max(xp, axis=0)
        m2, x2, v2, _a2, ao2, acc, bc, bm, root_mass = mapped(
            mp, xp, vp, ap, aop, lo, hi, jnp.asarray(nreal, jnp.int32))
        # engine contract (ops/integrator.py): a = the accel just
        # computed, ao = the previous step's (rides the sort as payload)
        st = SystemState(m=m2[:nreal], x=x2[:nreal], v=v2[:nreal],
                         a=acc[:nreal], ao=ao2[:nreal])
        aux = {"beyond_halo_cells": bc, "beyond_halo_mass": bm,
               "root_mass": root_mass}
        return leapfrog_step(st, cfg.dt), aux

    return step
