"""Group (tile-based) octree force evaluation -- the TPU-fast path for the
octree engine, mirroring nbody_tpu.ops.bvh_group over the Morton prefix
tree (nbody_tpu.ops.octree.OctreeLevels).

Bodies are Morton-sorted by the octree build, so consecutive sorted bodies
form spatially tight tiles; one traversal per tile collects interaction
lists with the conservative group MAC

    side_l / dmin(tile_bbox, com) < theta

(side_l = root_side / 2^l; dmin <= d(b, com) for every body b in the tile,
so every group-accepted node would also be accepted by the reference's
per-body criterion side/d < theta, octree.h:241 -- the approximation is
never coarser). Single-body nodes are exact and always accepted; open
cells at max depth contribute their bodies as SINGLETON direct-sum
entries. Forces use the octree softening (sqrt(d2)+eps)^3
(octree.h:240-242).

Traversal structure (see bvh_group for the rationale):
  * shallow levels with capacity <= 2F: dense open-mask propagation --
    node data from contiguous level slices, child masks via one gather of
    the parent mask through the `parent` pointers;
  * deeper levels: compacted per-tile frontier, expanded through
    child_start/child_count and re-compacted with the sort-free
    cumsum + searchsorted scheme;
  * tiles that overflow any cap (Morton-order discontinuities, oversized
    max-depth cells) are re-evaluated exactly against all bodies.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from nbody_tpu.ops.octree import OctreeLevels

K_CELL = 16  # max bodies expanded per open max-depth cell (else fallback)


def default_caps(n: int, theta: float, dim: int) -> tuple[int, int]:
    if theta <= 1e-6:
        cap = max(n, 64)
    else:
        cap = int(min(max(n, 64), max(1024, (512.0 * (dim - 1)) / (theta * theta))))
    return cap, cap


@partial(
    jax.jit,
    static_argnames=("theta", "G", "eps", "tile", "cap_nodes", "cap_leaves",
                     "chunk", "nrows", "use_pallas"),
)
def compute_force_grouped(
    levels: OctreeLevels,
    ms: jnp.ndarray,
    xs: jnp.ndarray,
    root_side,
    theta: float,
    G: float,
    eps: float,
    tile: int = 512,
    cap_nodes: int | None = None,
    cap_leaves: int | None = None,
    chunk: int = 8,
    row_start=None,
    nrows: int | None = None,
    use_pallas: bool = False,
):
    """Returns (accel in Morton-sorted body order, info dict).

    Default: forces for ALL n bodies.  With `row_start`/`nrows` (the
    multi-chip path), only rows [row_start, row_start + nrows) of the
    sorted bodies are evaluated against the full (replicated) tree;
    row_start may be traced, nrows must be static and tile-divisible."""
    n, dim = xs.shape
    dtype = xs.dtype
    depth = levels.depth
    if cap_nodes is None or cap_leaves is None:
        cn, cl = default_caps(n, theta, dim)
        cap_nodes = cap_nodes or cn
        cap_leaves = cap_leaves or cl

    theta2 = jnp.asarray(float(theta) ** 2, dtype)
    epsv = jnp.asarray(float(eps), dtype)
    Gv = jnp.asarray(G, dtype)
    caps = levels.caps
    offsets = levels.offsets
    mass, com_arr = levels.mass, levels.com
    start, count = levels.start, levels.count
    child_start, child_count = levels.child_start, levels.child_count
    parent = levels.parent
    side_tbl = [root_side / jnp.asarray(float(1 << l), dtype) for l in range(depth + 1)]

    if nrows is None:
        ntiles = -(-n // tile)
        npad = ntiles * tile
        xp = jnp.pad(xs, ((0, npad - n), (0, 0)))
        row0 = jnp.zeros((), jnp.int32)
        out_rows = n
    else:
        if nrows % tile != 0:
            raise ValueError("nrows must be divisible by tile")
        ntiles = nrows // tile
        npad = nrows
        row0 = jnp.asarray(row_start, jnp.int32)
        xp = jax.lax.dynamic_slice_in_dim(xs, row0, nrows, axis=0)
        out_rows = nrows
    xt = xp.reshape(ntiles, tile, dim)
    valid = (row0 + jnp.arange(npad) < n).reshape(ntiles, tile)
    xt_real = jnp.where(valid[:, :, None], xt, xt[:, :1, :])
    tmin = jnp.min(xt_real, axis=1)
    tmax = jnp.max(xt_real, axis=1)

    F = max(cap_nodes, cap_leaves)
    nbranch = 1 << dim

    def compact_rows(values, valid, width):
        """Pack valid entries of each row to the front, padding/slicing to
        `width` columns; returns (values, valid, counts).  Invalid output
        slots hold a large sentinel -- callers mask with the returned
        validity and clip before indexing.  Implemented as ONE row sort
        (list order is irrelevant to force evaluation): XLA's bitonic
        sort is fully vectorized (~39 ms at (2k, 8k) on v5e), while the
        previous unrolled binary search paid 13 rounds of take_along_axis
        row gathers at ~56M elem/s (~786 ms per call -- it dominated the
        whole force step at n=1M)."""
        counts = jnp.sum(valid.astype(jnp.int32), axis=1)
        big = jnp.asarray(1 << 30, values.dtype)
        packed = jnp.sort(jnp.where(valid, values, big), axis=1)[:, :width]
        if packed.shape[1] < width:   # input narrower than the cap
            packed = jnp.pad(packed, ((0, 0), (0, width - packed.shape[1])),
                             constant_values=1 << 30)
        ks = jnp.arange(1, width + 1, dtype=jnp.int32)[None, :]
        pvalid = ks <= counts[:, None]
        return packed, pvalid, counts

    def classify(lvl, flat_idx, vmask):
        """MAC classification for (ntiles, W) flat node indices.
        Returns (accept_exactish, open_, leafcell)."""
        fc = jnp.clip(flat_idx, 0, mass.shape[0] - 1)
        cnt = count[fc]
        nonempty = vmask & (cnt > 0)
        is_single = nonempty & (cnt == 1)
        # body-exact monopole for singles is handled in eval via count==1
        com = com_arr[fc]
        dmin_v = jnp.maximum(tmin[:, None, :] - com, jnp.zeros((), dtype))
        dmin_v = jnp.maximum(dmin_v, com - tmax[:, None, :])
        dmin2 = jnp.sum(dmin_v * dmin_v, axis=-1)
        side = side_tbl[lvl]
        mac = side * side < theta2 * dmin2
        accept = nonempty & (is_single | mac)
        open_ = nonempty & ~accept
        return accept, open_

    acc_idx = []
    acc_valid = []
    leaf_entries = []   # singleton body indices
    leaf_masks = []
    tile_over = jnp.zeros((ntiles,), jnp.bool_)

    dense_levels = [l for l in range(depth + 1) if caps[l] <= 2 * F]
    n_dense = len(dense_levels)
    frontier = None
    fvalid = None

    def emit_leaf_cells(flat_idx, open_):
        """Open cells at max depth: expand their body ranges into singleton
        entries (K_CELL static bodies per cell; larger cells overflow)."""
        fc = jnp.clip(flat_idx, 0, mass.shape[0] - 1)
        s0 = start[fc]
        cnt = count[fc]
        ks = jnp.arange(K_CELL, dtype=jnp.int32)
        entries = (s0[:, :, None] + ks[None, None, :]).reshape(s0.shape[0], -1)
        emask = (open_[:, :, None] & (ks[None, None, :] < cnt[:, :, None])).reshape(
            s0.shape[0], -1
        )
        over = jnp.any(open_ & (cnt > K_CELL), axis=1)
        return entries, emask, over

    for l in range(n_dense):
        capl = caps[l]
        o = offsets[l]
        flat = jnp.broadcast_to(
            jnp.arange(o, o + capl, dtype=jnp.int32)[None], (ntiles, capl)
        )
        if l == 0:
            vmask = jnp.ones((ntiles, capl), jnp.bool_)
        else:
            # a node is on the frontier iff its parent was open
            po = offsets[l - 1]
            pl = jnp.clip(parent[flat], 0, caps[l - 1] - 1)
            vmask = jnp.take_along_axis(open_prev, pl, axis=1)
        accept, open_ = classify(l, flat, vmask)
        acc_idx.append(flat)
        acc_valid.append(accept)
        if l == depth:
            e, em, ov = emit_leaf_cells(flat, open_)
            leaf_entries.append(e)
            leaf_masks.append(em)
            tile_over = tile_over | ov
        elif l == n_dense - 1 and n_dense <= depth:
            # transition to sparse: compact open LOCAL indices
            local = flat - o
            frontier, fvalid, counts = compact_rows(local, open_, F)
            tile_over = tile_over | (counts > F)
        open_prev = open_

    # compact the dense levels' accepted entries once; sparse levels merge
    # into the running list per level (bounded peak memory -- see
    # bvh_group for the rationale)
    all_idx = jnp.concatenate(acc_idx, axis=1)
    all_valid = jnp.concatenate(acc_valid, axis=1)
    nodes, nvalid, ncount = compact_rows(all_idx, all_valid, cap_nodes)
    tile_over = tile_over | (ncount > cap_nodes)

    for l in range(n_dense, depth + 1):
        # expand frontier (level l-1 local indices) into level-l candidates
        pf = jnp.clip(frontier, 0, caps[l - 1] - 1)
        pflat = offsets[l - 1] + pf
        cs = child_start[pflat]
        cc = child_count[pflat]
        ks = jnp.arange(nbranch, dtype=jnp.int32)
        kids = (cs[:, :, None] + ks[None, None, :]).reshape(ntiles, -1)
        kmask = (
            fvalid[:, :, None] & (ks[None, None, :] < cc[:, :, None])
        ).reshape(ntiles, -1)
        kids = jnp.clip(kids, 0, caps[l] - 1)
        flat = offsets[l] + kids
        accept, open_ = classify(l, flat, kmask)
        nodes, nvalid, ncount = compact_rows(
            jnp.concatenate([jnp.where(nvalid, nodes, 0), flat], axis=1),
            jnp.concatenate([nvalid, accept], axis=1),
            cap_nodes,
        )
        tile_over = tile_over | (ncount > cap_nodes)
        if l == depth:
            e, em, ov = emit_leaf_cells(flat, open_)
            leaf_entries.append(e)
            leaf_masks.append(em)
            tile_over = tile_over | ov
        else:
            frontier, fvalid, counts = compact_rows(kids, open_, F)
            tile_over = tile_over | (counts > F)

    ncnt = jnp.minimum(ncount, cap_nodes)
    leaf_idx_all = jnp.concatenate(leaf_entries, axis=1)
    leaf_valid_all = jnp.concatenate(leaf_masks, axis=1)
    leaves, lvalid, lcount = compact_rows(leaf_idx_all, leaf_valid_all, cap_leaves)
    tile_over = tile_over | (lcount > cap_leaves)
    lcnt = jnp.minimum(lcount, cap_leaves)
    nodes = jnp.where(nvalid, nodes, 0)
    leaves = jnp.where(lvalid, leaves, 0)

    # ---- dense evaluation (octree softening) ---------------------------
    # Pallas path (fp32 TPU): gather combined per-tile lists (monopoles,
    # with single-body cells demoted to that body exactly like the jnp
    # path, + opened leaf bodies) and run the batched VMEM kernel with
    # the octree softening chain.  jnp path: chunked einsum.
    lane = jnp.arange(cap_nodes)
    lane_l = jnp.arange(cap_leaves)

    if use_pallas:
        from nbody_tpu.ops.pallas_group_eval import group_eval_pallas

        nmask = lane[None, :] < ncnt[:, None]
        nidx = jnp.clip(jnp.where(nmask, nodes, 0), 0, mass.shape[0] - 1)
        cnt1 = count[nidx] == 1
        bfirst = jnp.clip(start[nidx], 0, n - 1)
        mj_n = jnp.where(cnt1, ms[bfirst], mass[nidx])
        mj_n = jnp.where(nmask, mj_n, jnp.zeros((), dtype))
        xj_n = jnp.where(cnt1[..., None], xs[bfirst], com_arr[nidx])
        lmask = lane_l[None, :] < lcnt[:, None]
        bc = jnp.clip(jnp.where(lmask, leaves, 0), 0, n - 1)
        mj_b = jnp.where(lmask, ms[bc], jnp.zeros((), dtype))
        xj_b = xs[bc]
        mj_list = jnp.concatenate([mj_n, mj_b], axis=1)
        xj_list = jnp.concatenate([xj_n, xj_b], axis=1)
        acc = group_eval_pallas(
            xt.reshape(npad, dim), mj_list,
            jnp.swapaxes(xj_list, 1, 2), float(eps),
            softening="sqrt3",
            interpret=(use_pallas == "interpret"),
        )[:npad]

    def eval_chunk(args):  # jnp path
        xt_c, nodes_c, ncnt_c, leaves_c, lcnt_c = args
        nmask = lane[None, :] < ncnt_c[:, None]
        nidx = jnp.clip(jnp.where(nmask, nodes_c, 0), 0, mass.shape[0] - 1)
        cnt1 = count[nidx] == 1
        bfirst = jnp.clip(start[nidx], 0, n - 1)
        mj = jnp.where(cnt1, ms[bfirst], mass[nidx])
        mj = jnp.where(nmask, mj, jnp.zeros((), dtype))
        xj = jnp.where(cnt1[..., None], xs[bfirst], com_arr[nidx])
        d = xj[:, None, :, :] - xt_c[:, :, None, :]
        dx = jnp.sqrt(jnp.sum(d * d, axis=-1)) + epsv
        # den > 0 guard: eps^3 underflows the TPU's f32-range emulated f64
        den = dx * dx * dx
        wt = jnp.where(den > 0, mj[:, None, :] / den, jnp.zeros((), dtype))
        acc = jnp.einsum("cbl,cbld->cbd", wt, d)

        lmask = lane_l[None, :] < lcnt_c[:, None]
        bc = jnp.clip(jnp.where(lmask, leaves_c, 0), 0, n - 1)
        mjb = jnp.where(lmask, ms[bc], jnp.zeros((), dtype))
        xjb = xs[bc]
        db = xjb[:, None, :, :] - xt_c[:, :, None, :]
        dbx = jnp.sqrt(jnp.sum(db * db, axis=-1)) + epsv
        denb = dbx * dbx * dbx
        wb = jnp.where(denb > 0, mjb[:, None, :] / denb, jnp.zeros((), dtype))
        acc = acc + jnp.einsum("cbl,cbld->cbd", wb, db)
        return acc

    if not use_pallas:
        pad_tiles = -(-ntiles // chunk) * chunk

        def padt(a):
            return jnp.pad(
                a, ((0, pad_tiles - ntiles),) + ((0, 0),) * (a.ndim - 1)
            )

        args = (padt(xt), padt(nodes), padt(ncnt), padt(leaves), padt(lcnt))
        args = jax.tree_util.tree_map(
            lambda a: a.reshape((pad_tiles // chunk, chunk) + a.shape[1:]),
            args,
        )
        acc = jax.lax.map(eval_chunk, args)
        acc = acc.reshape(pad_tiles * tile, dim)[:npad]

    # ---- exact fallback for overflowed tiles (octree softening): every
    # overflowed tile is re-evaluated exactly in groups of K_GRP via a
    # bounded while_loop (see bvh_group) -- truncation is impossible
    K_GRP = min(8, ntiles)
    scores = jnp.where(tile_over, ncount + lcount, -1)
    _, order = jax.lax.top_k(scores, ntiles)
    n_over = jnp.sum(tile_over)
    n_groups = (n_over + K_GRP - 1) // K_GRP

    jchunk = 4096
    njpad = -(-n // jchunk) * jchunk
    xj_all = jnp.pad(xs, ((0, njpad - n), (0, 0))).reshape(-1, jchunk, dim)
    mj_all = jnp.pad(ms, (0, njpad - n)).reshape(-1, jchunk)

    def fb_group(g, acc):
        tiles = jax.lax.dynamic_slice(order, (g * K_GRP,), (K_GRP,))
        flags = tile_over[tiles]
        xi_fb = xt[tiles].reshape(K_GRP * tile, dim)

        def fb_body(carry, blk):
            mj, xj = blk
            d = xj[None, :, :] - xi_fb[:, None, :]
            dxv = jnp.sqrt(jnp.sum(d * d, axis=-1)) + epsv
            denv = dxv * dxv * dxv
            wt = jnp.where(denv > 0, mj[None, :] / denv,
                           jnp.zeros((), dtype))
            return carry + jnp.einsum("kl,kld->kd", wt, d), None

        fb_acc, _ = jax.lax.scan(
            fb_body, jnp.zeros((K_GRP * tile, dim), dtype), (mj_all, xj_all)
        )
        rows = (tiles[:, None] * tile + jnp.arange(tile)[None, :]).reshape(-1)
        chosen = jnp.where(jnp.repeat(flags, tile)[:, None], fb_acc,
                           acc[rows])
        return acc.at[rows].set(chosen, mode="drop")

    acc = jax.lax.while_loop(
        lambda gv: gv[0] < n_groups,
        lambda gv: (gv[0] + 1, fb_group(gv[0], gv[1])),
        (jnp.zeros((), n_over.dtype), acc),
    )[1]
    acc = acc[:out_rows]

    info = {
        "max_nodes": jnp.max(ncnt),
        "max_leaves": jnp.max(lcnt),
        "fallback_tiles": n_over,
        "node_overflow": jnp.zeros((), jnp.int32),
        "leaf_overflow": jnp.zeros((), jnp.int32),
    }
    return Gv * acc, info
