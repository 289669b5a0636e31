"""Group (tile-based) BVH force evaluation -- the TPU-fast Barnes-Hut path.

The faithful per-body traversal (nbody_tpu.ops.bvh.compute_force) walks the
tree once per body; on a vector machine that is n lockstep walkers doing
scalar gathers -- correct but slow. This module exploits the Hilbert sort
differently: consecutive sorted bodies are spatially adjacent, so a TILE of
TB bodies shares one traversal:

  * one walker per tile (n/TB walkers) collects an INTERACTION LIST using
    a conservative group MAC: node accepted iff bw^2 < theta^2 * dmin^2
    where dmin is the distance from the node's center of mass to the
    tile's bounding box. dmin <= d(b, com) for every body b in the tile,
    so every group-accepted node would also be accepted by the reference's
    per-body MAC (octree-style proof: group acceptance set is a subset) --
    the approximation error is never larger than the reference's;
  * unaccepted deepest-level nodes contribute their (<=2) bodies to a
    direct-sum leaf list;
  * force evaluation is then DENSE: tile bodies x listed monopoles and
    tile bodies x listed leaf bodies, padded to static caps -- regular
    (TB x L) pairwise tiles on the VPU instead of per-body pointer chasing.

Same per-pair math as the reference (dist3 = d2^(3/2) + eps, bvh.h:297,308);
padded list entries carry mass 0 and contribute exactly zero; a body's own
entry in a leaf pair contributes zero through the 0/eps numerator, exactly
like the reference's explicit self-skip.

List overflow: lists are statically capped; entries past the cap are
dropped and the overflow is reported in the returned info (a dropped entry
means missing force, so the engine sizes caps generously and tests pin
real workloads well under the cap).

Two implementations share this module:

  compute_force_grouped           per-tile interaction LISTS (sort-based
                                  compaction).  Backs f64/CPU runs and
                                  remains the faithful level-synchronous
                                  formulation.
  compute_force_grouped_windowed  the TPU fp32 production path: GATHER-
                                  FREE masked far field + windowed /
                                  entry-list exact near field (v5e row
                                  gathers run ~56M elem/s, so any
                                  list-gathering design is gather-bound;
                                  this one took the n=1M step from 13 s
                                  to 0.29 s).  See its docstring.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from nbody_tpu.ops.bvh import BVHTree


def default_caps(n: int, theta: float) -> tuple[int, int]:
    """Static interaction-list caps. Scales like 1/theta^2 (2-D opening
    criterion); theta=0 degenerates to full direct sum, which only the
    small-n oracle configurations use."""
    nleafs = 1 << max(0, (max(n, 2) - 1).bit_length())
    full = nleafs // 2 + 8
    if theta <= 1e-6:
        cap = full
    else:
        cap = int(min(full, max(1024, 640.0 / (theta * theta))))
    return cap, cap


@partial(
    jax.jit,
    static_argnames=("theta", "G", "eps", "tile", "cap_nodes", "cap_leaves",
                     "chunk", "nrows", "use_pallas"),
)
def compute_force_grouped(
    tree: BVHTree,
    m: jnp.ndarray,
    x: jnp.ndarray,
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
    """Returns (accel in sorted body order, info dict).

    Default: forces for ALL n bodies.  With `row_start`/`nrows` (the
    multi-chip path: each shard owns a contiguous row range of the sorted
    bodies), only rows [row_start, row_start + nrows) are evaluated --
    against the FULL tree and body arrays, which are replicated -- and
    the returned accel has nrows rows.  row_start may be traced (it is an
    axis_index inside shard_map); nrows must be static and divisible by
    `tile`, and the caller pads x so the range exists.

    use_pallas: False = chunked jnp/einsum evaluation (f64/CPU);
    True = batched VMEM-tiled Pallas kernel (fp32 TPU, ~HBM-traffic-free);
    "interpret" = Pallas kernel in interpret mode (CPU tests)."""
    n, dim = x.shape
    dtype = x.dtype
    if cap_nodes is None or cap_leaves is None:
        cn, cl = default_caps(n, theta)
        cap_nodes = cap_nodes or cn
        cap_leaves = cap_leaves or cl

    nlevels = tree.nlevels
    leaf_level = nlevels
    nnodes = (1 << nlevels) - 1
    theta2 = jnp.asarray(float(theta) ** 2, dtype)
    epsv = jnp.asarray(float(eps), dtype)
    Gv = jnp.asarray(G, dtype)

    if nrows is None:
        ntiles = -(-n // tile)
        npad = ntiles * tile
        xp = jnp.pad(x, ((0, npad - n), (0, 0)))
        row0 = jnp.zeros((), jnp.int32)
        out_rows = n
    else:
        if nrows % tile != 0:
            raise ValueError("nrows must be divisible by tile")
        ntiles = nrows // tile
        npad = nrows
        row0 = jnp.asarray(row_start, jnp.int32)
        xp = jax.lax.dynamic_slice_in_dim(x, row0, nrows, axis=0)
        out_rows = nrows
    xt = xp.reshape(ntiles, tile, dim)
    # tile bounding boxes over REAL bodies only (padding would widen them);
    # padded slots replicate the tile's first body
    valid = (row0 + jnp.arange(npad) < n).reshape(ntiles, tile)
    first = xt[:, :1, :]
    xt_real = jnp.where(valid[:, :, None], xt, first)
    tmin = jnp.min(xt_real, axis=1)  # (ntiles, dim)
    tmax = jnp.max(xt_real, axis=1)

    mm, mx, bw = tree.mm, tree.mx, tree.bw

    # ---- level-synchronous traversal ---------------------------------
    # One pass per tree level, everything wide. Two regimes:
    #   * shallow levels (2^l <= F): the "frontier" is simply ALL nodes of
    #     the level with an open/closed mask -- node data comes from
    #     contiguous heap SLICES (free), children masks are a repeat, no
    #     gathers and no compaction at all;
    #   * deep levels: a compacted frontier of node indices per tile.
    #     Compaction is cumsum + batched binary search (searchsorted) +
    #     one gather -- an argsort-based compaction was measured to
    #     dominate the whole force step (bitonic sort of ~10k-wide rows).
    last_level = nlevels - 1
    F = max(cap_nodes, cap_leaves)
    dense_levels = [l for l in range(nlevels) if (1 << l) <= 2 * F]
    n_dense = len(dense_levels)

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

    acc_idx = []     # accepted node indices per level (masked, variable width)
    acc_valid = []
    leaf_idx = None
    leaf_valid = None
    tile_over = jnp.zeros((ntiles,), jnp.bool_)

    def mac_accept(com, w, valid_mask):
        """Group MAC for (ntiles, W, dim) node data."""
        dmin_v = jnp.maximum(tmin[:, None, :] - com, jnp.zeros((), dtype))
        dmin_v = jnp.maximum(dmin_v, com - tmax[:, None, :])
        dmin2 = jnp.sum(dmin_v * dmin_v, axis=-1)
        return valid_mask & (w * w < theta2 * dmin2)

    # --- dense shallow levels: open-mask propagation over whole levels
    open_mask = jnp.ones((ntiles, 1), jnp.bool_)   # level 0: root open?
    for l in dense_levels:
        lo_i, hi_i = (1 << l) - 1, (1 << (l + 1)) - 1
        com = jnp.broadcast_to(mx[lo_i:hi_i][None], (ntiles, hi_i - lo_i, dim))
        w = jnp.broadcast_to(bw[lo_i:hi_i][None], (ntiles, hi_i - lo_i))
        accept = mac_accept(com, w, open_mask)
        open_ = open_mask & ~accept
        idxs = jnp.broadcast_to(
            jnp.arange(lo_i, hi_i, dtype=jnp.int32)[None], open_.shape
        )
        acc_idx.append(idxs)
        acc_valid.append(accept)
        if l == last_level:
            leaf_idx = 2 * (idxs - lo_i)
            leaf_valid = open_
        elif l == dense_levels[-1] and n_dense < nlevels:
            # transition to the sparse regime: compact this level's open set
            frontier, fvalid, counts = compact_rows(
                2 * idxs + 1, open_, F
            )  # store LEFT child; right child is +1
            tile_over = tile_over | (counts > F)
        else:
            open_mask = jnp.repeat(open_, 2, axis=1)

    # compact the dense levels' accepted entries once (total width is
    # bounded by ~4F); sparse levels then MERGE into the running list per
    # level so peak memory stays O(ntiles * F) instead of O(ntiles *
    # levels * F) -- the monolithic concat allocated ~600 MB at n=1M and
    # crashed the TPU worker
    all_idx = jnp.concatenate(acc_idx, axis=1)
    all_valid = jnp.concatenate(acc_valid, axis=1)
    nodes, nvalid, ncount = compact_rows(all_idx, all_valid, cap_nodes)
    tile_over = tile_over | (ncount > cap_nodes)

    # --- sparse deep levels: compacted frontier of left-child indices
    for l in range(n_dense, nlevels):
        # expand stored left children into both siblings
        kids = jnp.stack([frontier, frontier + 1], axis=-1).reshape(ntiles, -1)
        kvalid = jnp.repeat(fvalid, 2, axis=1)
        tc = jnp.clip(kids, 0, nnodes - 1)
        com = mx[tc]
        w = bw[tc]
        accept = mac_accept(com, w, kvalid)
        open_ = kvalid & ~accept
        # merge this level's accepted nodes into the running list
        nodes, nvalid, ncount = compact_rows(
            jnp.concatenate([jnp.where(nvalid, nodes, 0), tc], axis=1),
            jnp.concatenate([nvalid, accept], axis=1),
            cap_nodes,
        )
        tile_over = tile_over | (ncount > cap_nodes)
        if l == last_level:
            first = (1 << last_level) - 1
            leaf_idx = 2 * (tc - first)
            leaf_valid = open_
        else:
            frontier, fvalid, counts = compact_rows(2 * tc + 1, open_, F)
            tile_over = tile_over | (counts > F)

    ncnt = jnp.minimum(ncount, cap_nodes)
    leaves, lvalid, lcount = compact_rows(leaf_idx, leaf_valid, cap_leaves)
    tile_over = tile_over | (lcount > cap_leaves)
    lcnt = jnp.minimum(lcount, cap_leaves)
    nodes = jnp.where(nvalid, nodes, 0)
    leaves = jnp.where(lvalid, leaves, 0)

    # ---- dense evaluation ---------------------------------------------
    # Pallas path (fp32 TPU): gather the per-tile lists into dense
    # (ntiles, L) mass / (ntiles, dim, L) position arrays -- monopoles
    # and leaf bodies share the same per-pair math, so they concatenate
    # into ONE list -- and run the batched VMEM-tiled kernel.  jnp path
    # (f64 / CPU): chunked einsum evaluation.
    lane = jnp.arange(cap_nodes)
    lane_l = jnp.arange(cap_leaves)

    if use_pallas:
        from nbody_tpu.ops.pallas_group_eval import group_eval_pallas

        nmask = lane[None, :] < ncnt[:, None]               # (T, Ln)
        nidx = jnp.where(nmask, nodes, 0)
        mj_n = jnp.where(nmask, mm[nidx], jnp.zeros((), dtype))
        xj_n = mx[nidx]                                     # (T, Ln, dim)
        lmask = lane_l[None, :] < lcnt[:, None]             # (T, Ll)
        s0 = jnp.where(lmask, leaves, 0)
        bidx = jnp.stack([s0, s0 + 1], axis=-1).reshape(ntiles, -1)
        bvalid = lmask[:, :, None].repeat(2, axis=2).reshape(ntiles, -1)
        bvalid = bvalid & (bidx < n)
        bc = jnp.clip(bidx, 0, n - 1)
        mj_b = jnp.where(bvalid, m[bc], jnp.zeros((), dtype))
        xj_b = x[bc]                                        # (T, 2Ll, dim)
        mj_list = jnp.concatenate([mj_n, mj_b], axis=1)
        xj_list = jnp.concatenate([xj_n, xj_b], axis=1)     # (T, L, dim)
        acc = group_eval_pallas(
            xt.reshape(npad, dim), mj_list,
            jnp.swapaxes(xj_list, 1, 2), float(eps),
            interpret=(use_pallas == "interpret"),
        )[:npad]
        return _finish_grouped(
            acc, xt, tile_over, ncount, lcount, ncnt, lcnt, m, x, n,
            ntiles, tile, npad, out_rows, dtype, epsv, Gv,
            pallas_fb=use_pallas, eps_f=float(eps),
        )

    def eval_chunk(args):
        xt_c, nodes_c, ncnt_c, leaves_c, lcnt_c = args
        # monopole contributions
        nmask = lane[None, :] < ncnt_c[:, None]            # (C, Ln)
        nidx = jnp.where(nmask, nodes_c, 0)
        mj = jnp.where(nmask, mm[nidx], jnp.zeros((), dtype))  # (C, Ln)
        xj = mx[nidx]                                       # (C, Ln, dim)
        d = xj[:, None, :, :] - xt_c[:, :, None, :]         # (C, TB, Ln, dim)
        d2 = jnp.sum(d * d, axis=-1)
        wt = mj[:, None, :] / (d2 * jnp.sqrt(d2) + epsv)
        acc = jnp.einsum("cbl,cbld->cbd", wt, d)

        # leaf-body contributions: each entry is a body-pair start
        lmask = lane_l[None, :] < lcnt_c[:, None]           # (C, Ll)
        s0 = jnp.where(lmask, leaves_c, 0)
        bidx = jnp.stack([s0, s0 + 1], axis=-1).reshape(s0.shape[0], -1)  # (C, 2Ll)
        bvalid = lmask[:, :, None].repeat(2, axis=2).reshape(s0.shape[0], -1)
        bvalid = bvalid & (bidx < n)
        bc = jnp.clip(bidx, 0, n - 1)
        mjb = jnp.where(bvalid, m[bc], jnp.zeros((), dtype))
        xjb = x[bc]                                          # (C, 2Ll, dim)
        db = xjb[:, None, :, :] - xt_c[:, :, None, :]
        db2 = jnp.sum(db * db, axis=-1)
        wb = mjb[:, None, :] / (db2 * jnp.sqrt(db2) + epsv)
        acc = acc + jnp.einsum("cbl,cbld->cbd", wb, db)
        return acc

    pad_tiles = -(-ntiles // chunk) * chunk
    def padt(a):
        return jnp.pad(a, ((0, pad_tiles - ntiles),) + ((0, 0),) * (a.ndim - 1))

    args = (padt(xt), padt(nodes), padt(ncnt), padt(leaves), padt(lcnt))
    args = jax.tree_util.tree_map(
        lambda a: a.reshape((pad_tiles // chunk, chunk) + a.shape[1:]), args
    )
    acc = jax.lax.map(eval_chunk, args)                     # (PC, C, TB, dim)
    acc = acc.reshape(pad_tiles * tile, dim)[:npad]
    return _finish_grouped(
        acc, xt, tile_over, ncount, lcount, ncnt, lcnt, m, x, n,
        ntiles, tile, npad, out_rows, dtype, epsv, Gv,
    )


def _finish_grouped(acc, xt, tile_over, ncount, lcount, ncnt, lcnt, m, x, n,
                    ntiles, tile, npad, out_rows, dtype, epsv, Gv,
                    pallas_fb=None, eps_f=None, n_entries=None):
    """Exact-fallback pass over overflowed tiles + the info dict (shared
    by the jnp and Pallas evaluation paths).  pallas_fb selects the tiled
    Pallas block kernel for the per-group direct sum (fp32 TPU; the jnp
    einsum scan costs seconds per group at n=1M)."""
    dim = x.shape[1]
    # ---- exact fallback for overflowed tiles --------------------------
    # A tile spanning a Hilbert-curve discontinuity (the jump between the
    # two galaxies) or sitting in an extreme density contrast (a Plummer
    # core, where even the reference's per-body walk degenerates to a
    # near-direct sum) blows past the list caps.  EVERY such tile is
    # re-evaluated exactly against all bodies: a bounded while_loop walks
    # the overflow set in groups of K_GRP tiles (static shapes per
    # iteration, dynamic trip count), so no force is ever truncated and
    # the cost scales with the actual overflow count -- one group for the
    # typical galaxy seam, the honest O(n^2)-degenerate cost for a
    # Plummer core.
    K_GRP = min(8, ntiles)
    scores = jnp.where(tile_over, ncount + lcount, -1)
    _, order = jax.lax.top_k(scores, ntiles)                # overflow first
    n_over = jnp.sum(tile_over)
    n_groups = (n_over + K_GRP - 1) // K_GRP

    jchunk = 4096
    njpad = -(-n // jchunk) * jchunk
    xj_all = jnp.pad(x, ((0, njpad - n), (0, 0))).reshape(-1, jchunk, dim)
    mj_all = jnp.pad(m, (0, njpad - n)).reshape(-1, jchunk)

    def fb_group(g, acc):
        tiles = jax.lax.dynamic_slice(order, (g * K_GRP,), (K_GRP,))
        flags = tile_over[tiles]
        xi_fb = xt[tiles].reshape(K_GRP * tile, dim)

        if pallas_fb:
            from nbody_tpu.ops.pallas_allpairs import allpairs_block_pallas

            fb_acc = allpairs_block_pallas(
                xi_fb, m, x, eps_f,
                interpret=(pallas_fb == "interpret"),
            )
        else:
            def fb_body(carry, blk):
                mj, xj = blk
                d = xj[None, :, :] - xi_fb[:, None, :]
                d2 = jnp.sum(d * d, axis=-1)
                wt = mj[None, :] / (d2 * jnp.sqrt(d2) + epsv)
                return carry + jnp.einsum("kl,kld->kd", wt, d), None

            fb_acc, _ = jax.lax.scan(
                fb_body, jnp.zeros((K_GRP * tile, dim), dtype),
                (mj_all, xj_all)
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
        # the bounded loop covers every overflowed tile: truncation is
        # structurally impossible (fields kept for the runner's guard)
        "node_overflow": jnp.zeros((), jnp.int32),
        "leaf_overflow": jnp.zeros((), jnp.int32),
    }
    if n_entries is not None:
        info["entries"] = n_entries
    return Gv * acc, info


@partial(
    jax.jit,
    static_argnames=("theta", "G", "eps", "tile", "window_tiles",
                     "interpret", "e_chunk", "nrows", "s_target",
                     "refine_levels", "ablate", "epg", "d_block",
                     "sub_width"),
)
def compute_force_grouped_windowed(
    tree: BVHTree,
    m: jnp.ndarray,
    x: jnp.ndarray,
    theta: float,
    G: float,
    eps: float,
    tile: int = 512,
    window_tiles: int = 32,
    interpret: bool = False,
    e_chunk: int = 24576,
    row_start=None,
    nrows: int | None = None,
    s_target: int = 512,
    refine_levels: int | None = None,
    ablate: str = "",
    epg: int = 1,
    d_block: int | None = None,
    sub_width: int | None = None,
):
    """Gather-free grouped BVH force (fp32 TPU fast path).

    epg default flipped 4 -> 1 in round 4 (see octree_group
    compute_force_grouped_fast): bit-exact, fewer pad entries, faster
    in every n=1M config (3-D -3.2/-4.6%, 2-D -2.2/-4.5%;
    results/r4/knob_bvh.jsonl epg1 rows).

    The list-based group traversal (compute_force_grouped) compacts
    per-tile interaction lists with batched binary searches; on the v5e
    those row gathers run at ~56M elem/s and dominate the whole step
    (~13 s at n=1M).  This variant never builds per-tile lists:

      far field   levels 0..L* are traversed with DENSE per-level accept
                  masks (node data = contiguous heap slices, masks
                  propagate by repeat -- no gathers), then evaluated by
                  masked_eval_pallas: every tile vs the SHARED level-
                  0..L* node arrays with its (T, W) accept mask streamed.
      near field  nodes still open at L* are spatially near the tile
                  (group MAC), and each L* node's subtree is a CONTIGUOUS
                  range of the Hilbert-sorted bodies.  Each tile evaluates
                  a contiguous window of `window_tiles` body-tiles around
                  itself (pure block DMA via a t-dependent index map in
                  window_eval_pallas) with a body-level membership mask.
                  Evaluating exact bodies where the reference would
                  descend to deeper monopoles is strictly MORE accurate,
                  so the conservative never-less-accurate guarantee of
                  the group MAC is preserved (bvh.h:246-324 semantics).
      residual    open L* nodes OUTSIDE the window (Hilbert seams,
                  extreme density contrast, and -- in 3-D, where the
                  reference's quirky partial-Hilbert order has poor
                  locality -- mid-range sparse-halo nodes) become exact
                  S-body entries streamed through
                  entries_lohi_eval_pallas.  `refine_levels` > 0
                  optionally refines them deeper first (children passing
                  the tile MAC join the far-field mask as monopoles) --
                  measured counterproductive on the galaxy workloads
                  (see the in-function comment), default 0.  Overflowing
                  tiles still fall back to the exact direct sum --
                  truncation is impossible.

    L* is chosen so an L*-node covers min(s_target, tile) bodies (512
    default -- the sweep found 256 gains only ~4% and 64 overflows);
    window and L* adapt to small n.  fp32-only (f64/CPU runs use the
    list path).
    """
    if "epg1" in ablate.split(","):   # A/B: no packing (one entry/step —
        epg = 1                       # the dma_pipeline microbench ideal)
    if "epg8" in ablate.split(","):   # A/B: double entry packing
        epg = 8
    if "epg16" in ablate.split(","):  # A/B: quadruple entry packing
        epg = 16
    for _tok in ablate.split(","):    # A/B: subwN = residual pair math in
        if _tok.startswith("subw") and _tok[4:].isdigit():   # N-wide
            sub_width = int(_tok[4:])  # pl.when subwindows; dblkN =
        if _tok.startswith("dblk") and _tok[4:].isdigit():   # residual DMA
            d_block = int(_tok[4:])    # blocks WIDER than the node size
    # Production defaults (round-4g flip): wide residual DMA blocks merge
    # adjacent open nodes into one entry (fewer grid steps + DMAs) and the
    # sub-windowed eval keeps the pair math width-proportional.  Measured
    # n=1M galaxy θ=0.5 (results/r4/knob_bvh.jsonl dblk*.subw512 rows):
    # 3-D dblk4096 fresh 1.626 s / evolved 1.409 s vs dblk2048
    # 1.630/1.419 vs shipped-node-blocks 1.701/1.461; 2-D keeps
    # dblk2048 (0.536/0.543, dblk4096 unmeasured there and 2-D nodes
    # are thin).  0 opts out of either knob (d_block=0: node-sized
    # blocks).
    if d_block is None:
        d_block = 4096 if x.shape[1] == 3 else 2048
    if d_block <= 0:
        d_block = None
    if sub_width is None:
        # 3-D 512 -> 1024 (round 5): each pl.when subwindow guard costs
        # ~0.46 us/entry (BASELINE round-5 knob table), so halving the
        # guard count (8 -> 4 per dblk4096 entry) beats the added math
        # overshoot on the BVH's narrow residual runs: same-session A/B
        # at n=1M 3-D fresh 1.5535 (subw1024) vs 1.618/1.622
        # (subw512 default / nowinskip control) = -4%.  2-D keeps 512
        # (dblk2048 = 4 guards already; 2-D rung queued).
        sub_width = 1024 if x.shape[1] == 3 else 512
    if sub_width <= 0:
        sub_width = None
    from nbody_tpu.ops.pallas_group_eval import (
        masked_eval_bits_pallas,
        masked_eval_pallas,
        pack_mask_bits,
        window_eval_nodemask_pallas,
        window_eval_pallas,
    )

    n, dim = x.shape
    dtype = x.dtype
    nlevels = tree.nlevels
    nbodies_tree = 1 << nlevels   # implicit bodies incl. pow2 padding
    theta2 = jnp.asarray(float(theta) ** 2, dtype)
    Gv = jnp.asarray(G, dtype)
    epsv = jnp.asarray(float(eps), dtype)

    # shard-local rows (multi-chip: each shard owns a contiguous row
    # range of the sorted bodies and evaluates it against the full
    # replicated tree/body arrays; see parallel/tree_sharded.py)
    if nrows is None:
        ntiles = -(-n // tile)
        npad = ntiles * tile
        row0 = jnp.zeros((), jnp.int32)
        out_rows = n
    else:
        if nrows % tile != 0:
            raise ValueError("nrows must be divisible by tile")
        ntiles = nrows // tile
        npad = nrows
        row0 = jnp.asarray(row_start, jnp.int32)
        out_rows = nrows
    # FULL padded body arrays (window/entry j-blocks address them)
    ntiles_g = -(-n // tile)
    npad_g = ntiles_g * tile
    if nrows is None and d_block and npad_g % d_block:
        # a residual DMA block wider than the tile-rounded pad needs
        # npad_g divisible by it (partial tail block would index OOB);
        # sharded callers partition rows against the tile-rounded pad,
        # so only the single-chip path widens it
        lcm_bd = tile * d_block // math.gcd(tile, d_block)
        npad_g = -(-n // lcm_bd) * lcm_bd
        ntiles_g = npad_g // tile
        ntiles, npad = ntiles_g, npad_g   # i side covers the widened pad
    xp_g = jnp.pad(x, ((0, npad_g - n), (0, 0)))
    mp_g = jnp.pad(m, (0, npad_g - n))
    if nrows is None:
        xp = xp_g
    else:
        xp = jax.lax.dynamic_slice_in_dim(xp_g, row0, nrows, axis=0)
    xt = xp.reshape(ntiles, tile, dim)
    valid = (row0 + jnp.arange(npad) < n).reshape(ntiles, tile)
    xt_real = jnp.where(valid[:, :, None], xt, xt[:, :1, :])
    tmin = jnp.min(xt_real, axis=1)
    tmax = jnp.max(xt_real, axis=1)
    tile0 = row0 // tile                       # global index of tile 0

    # L*: node covers S = 2^(nlevels - L*) bodies; s_target is the node
    # size itself (power of two), so s_target=512 yields 512-body nodes
    S_target = min(s_target, tile)
    level_star = max(0, nlevels - (S_target.bit_length() - 1))
    # ensure S <= tile so tile boundaries align with node boundaries
    S = 1 << (nlevels - level_star)
    while S > tile and level_star < nlevels:
        level_star += 1
        S = 1 << (nlevels - level_star)
    # DMA block width for the residual entry kernel: the Pallas TPU
    # lowering needs the last block dim divisible by 128, so tiny trees
    # (S < 128 at n < ~64k with default s_target) stream 128-wide blocks
    # and locate the node's S2-range inside them via the lo/hi table
    Sd = max(S, min(128, npad_g))
    if d_block:
        # wider residual DMA block: a node's [row0, row0 + S2) never
        # straddles an Sd block iff Sd % S2 == 0; S2 = S >> ref_lv <= S,
        # so d_block must be a multiple of the node size S and divide
        # the padded body count.  Single-chip callers widened npad_g
        # above; sharded callers (nrows != None) keep the tile-rounded
        # pad, so a defaulted d_block degrades by halving until it fits
        # (reaching S = the node-sized no-op) instead of raising.
        while d_block > S and (d_block % S or npad_g % d_block):
            d_block //= 2
        if d_block > S:
            Sd = d_block
    if refine_levels is None:
        # measured at n=1M galaxy (both dims): refinement is strictly
        # COUNTERPRODUCTIVE here -- implicit-BVH children halve the BODY
        # range, not the box extent (with the reference's partial-Hilbert
        # 3-D order, child boxes barely shrink), so descending an
        # outside-window open node doubles the candidate count instead
        # of retiring it (ref=1: 4.2 s vs 1.36 s at 3-D 1M, 692 tiles
        # into fallback).  Kept as an opt-in knob for distributions with
        # spatially-splitting nodes.
        refine_levels = 0
    refine_levels = min(refine_levels, nlevels - 1 - level_star)
    if (1 << (level_star + refine_levels)) + 1 > (1 << 16):
        # packed entries hold the (refined) node id in 16 bits; beyond
        # that the list path (use_pallas=False) still works
        raise ValueError("windowed BVH path supports at most 2^16 "
                         "residual nodes; lower refine_levels/s_target")
    if ntiles > (1 << 15):
        # the tile id packs into the UPPER 16 bits of an int32 entry and
        # is extracted with an arithmetic shift -- a tid >= 2^15 would set
        # the sign bit and corrupt the BlockSpec index maps
        raise ValueError("windowed BVH path supports at most 2^15 tiles; "
                         "increase tile or use the list path")

    mm, mx, bw = tree.mm, tree.mx, tree.bw

    def mac_accept(com, w, mask):
        dmin_v = jnp.maximum(tmin[:, None, :] - com, jnp.zeros((), dtype))
        dmin_v = jnp.maximum(dmin_v, com - tmax[:, None, :])
        dmin2 = jnp.sum(dmin_v * dmin_v, axis=-1)
        return mask & (w * w < theta2 * dmin2)

    accept_masks = []
    open_mask = jnp.ones((ntiles, 1), jnp.bool_)
    for l in range(level_star + 1):
        lo_i, hi_i = (1 << l) - 1, (1 << (l + 1)) - 1
        com = jnp.broadcast_to(mx[lo_i:hi_i][None],
                               (ntiles, hi_i - lo_i, dim))
        w = jnp.broadcast_to(bw[lo_i:hi_i][None], (ntiles, hi_i - lo_i))
        accept = mac_accept(com, w, open_mask)
        open_ = open_mask & ~accept
        accept_masks.append(accept)
        if l < level_star:
            open_mask = jnp.repeat(open_, 2, axis=1)
        else:
            open_mask = open_   # (ntiles, 2^L*)

    # dead nodes (zero mass) never force a near/residual evaluation
    lvl_lo = (1 << level_star) - 1
    node_alive = (mm[lvl_lo:lvl_lo + (1 << level_star)] > 0)[None, :]
    open_mask = open_mask & node_alive

    # ---- near field: contiguous window around each tile ---------------
    wt = min(window_tiles, ntiles_g)
    npt = tile // S                      # L*-nodes per body-tile
    wnodes = wt * npt
    t_idx = jnp.arange(ntiles, dtype=jnp.int32)
    wjf = 4 if wt % 4 == 0 else (2 if wt % 2 == 0 else 1)
    # wj1/wj2 cap the window j-grouping: the window kernel's scoped
    # vmem holds a (tb, wjf*tile) operand, and at tile=1024 the
    # auto wjf=4 block alone is 16 MB (the knob-table vmem-OOM row);
    # capping wjf trades window grid steps for compileability
    if "wj1" in ablate.split(","):
        wjf = 1
    elif "wj2" in ablate.split(","):
        wjf = min(wjf, 2)
    w0 = jnp.clip(tile0 + t_idx - wt // 2, 0, ntiles_g - wt)  # global tiles
    w0 = (w0 // wjf) * wjf   # j-group alignment (see window_eval_pallas)
    w0n = w0 * npt                                          # node units
    nodes_total = 1 << level_star
    col = w0n[:, None] + jnp.arange(wnodes, dtype=jnp.int32)[None, :]
    in_win = jnp.take_along_axis(
        open_mask, jnp.minimum(col, nodes_total - 1), axis=1
    )                                                       # (T, wnodes)
    if "win" in ablate.split(","):      # ablation probes only (wrong forces!)
        near = jnp.zeros((npad, dim), dtype)
    elif "densemask" in ablate.split(",") or wjf * npt > 64:
        # A/B fallback: round-2 dense body mask (the S-fold broadcast of
        # in_win -- ~130 MB/step at n=1M)
        body_mask = jnp.broadcast_to(
            in_win.astype(dtype)[:, :, None], (ntiles, wnodes, S)
        ).reshape(ntiles, wt * tile)
        near = window_eval_pallas(
            xp.reshape(npad, dim), mp_g, xp_g.T, body_mask, w0, float(eps),
            window_tiles=wt, interpret=interpret, wj=wjf,
        )
    else:
        # per-NODE openness streams as tiny (1, wj*npt) blocks and the
        # S-fold body expansion happens in-kernel
        near = window_eval_nodemask_pallas(
            xp.reshape(npad, dim), mp_g, xp_g.T, in_win, w0, float(eps),
            window_tiles=wt, S=S, interpret=interpret, wj=wjf,
            # DEFAULT ON (round-5 flip, with the octree interval-skip):
            # skip the pair math of j-blocks whose nv window nodes are
            # ALL far-accepted (closed) -- bit-exact (tests pin vs
            # nowinskip).  Opt out: ablate="nowinskip".
            skip_outside="nowinskip" not in ablate.split(","),
        )

    # ---- residual: open nodes OUTSIDE the window -----------------------
    # Mid-range nodes that are too big for their distance (sparse-halo
    # nodes) fail the MAC from far away -- every tile has a few dozen in
    # 2-D, ~200 in 3-D.  First REFINE them `ref_lv` levels: their
    # children are checked against the same group MAC, and passing
    # children are appended to the far-field accept masks (the shared
    # heap holds every level, so the masked eval just widens).  The
    # still-open survivors each cover a CONTIGUOUS S2 = S/2^ref_lv body
    # range of the sorted array and become a flat tile-sorted entry list
    # evaluated EXACTLY by entries_lohi_eval_pallas (scalar-prefetch
    # block DMA; evaluating bodies where the reference descends to deeper
    # monopoles is strictly more accurate).
    all_nodes = jnp.arange(nodes_total, dtype=jnp.int32)[None, :]
    outside = open_mask & (
        (all_nodes < w0n[:, None]) | (all_nodes >= w0n[:, None] + wnodes)
    )

    ref_lv = refine_levels
    out_open = outside
    for l in range(level_star + 1, level_star + ref_lv + 1):
        out_open = jnp.repeat(out_open, 2, axis=1)
        lo_i, hi_i = (1 << l) - 1, (1 << (l + 1)) - 1
        alive_l = (mm[lo_i:hi_i] > 0)[None, :]
        com = jnp.broadcast_to(mx[lo_i:hi_i][None],
                               (ntiles, hi_i - lo_i, dim))
        w = jnp.broadcast_to(bw[lo_i:hi_i][None], (ntiles, hi_i - lo_i))
        accept = mac_accept(com, w, out_open & alive_l)
        accept_masks.append(accept)
        out_open = out_open & alive_l & ~accept

    nodes_res = 1 << (level_star + ref_lv)   # residual granularity
    S2 = 1 << (nlevels - level_star - ref_lv)

    # SUBTILE monopole re-test: the group MAC uses the tile's bounding
    # HULL, which for 512 sorted bodies in a sparse 3-D region is mostly
    # empty space -- min over SUB-TILE boxes of dmin is typically far
    # larger than the hull dmin.  A residual node whose MAC passes
    # against EVERY sub-tile box is a valid theta-monopole for every
    # body of the tile (each body lies in some sub-tile), so it joins
    # the far-field mask; only the remainder stays exact.  Per (tile,
    # node) the outcome is whole-tile monopole OR whole-tile exact --
    # no double counting by construction.  (An in-kernel per-subtile
    # branch version measured SLOWER than no refinement at all: 2.2 s vs
    # 1.36 s at n=1M 3-D -- predicated small-block math defeats Mosaic's
    # pipelining.  This mask-level formulation costs one dense
    # (T, nsub, R) MAC and nothing in the kernels.)
    nsub = max(1, min(8, tile // 8))
    stb = tile // nsub
    sb_lo = jnp.min(xt_real.reshape(ntiles, nsub, stb, dim), axis=2)
    sb_hi = jnp.max(xt_real.reshape(ntiles, nsub, stb, dim), axis=2)
    lvl2 = nodes_res - 1
    com_res = mx[lvl2:lvl2 + nodes_res]
    w2_res = bw[lvl2:lvl2 + nodes_res] ** 2
    min_dmin2 = None
    passcnt = jnp.zeros((ntiles, nodes_res), jnp.int32)
    for s in range(nsub):
        dv = jnp.maximum(sb_lo[:, s, None, :] - com_res[None],
                         jnp.zeros((), dtype))
        dv = jnp.maximum(dv, com_res[None] - sb_hi[:, s, None, :])
        d2s = jnp.sum(dv * dv, axis=-1)
        min_dmin2 = d2s if min_dmin2 is None else jnp.minimum(min_dmin2, d2s)
        passcnt = passcnt + (w2_res[None, :] < theta2 * d2s).astype(jnp.int32)
    # diagnostics (DCE'd when the caller ignores them): per-subtile MAC
    # pass distribution over the residual pairs -- how much of the
    # whole-tile exact evaluation a per-subtile split would retire
    diag_pairs = jnp.sum(out_open, dtype=jnp.int32)
    diag_pass_hist = [
        jnp.sum(out_open & (passcnt == k), dtype=jnp.int32)
        for k in range(nsub + 1)
    ]
    mono = out_open & (w2_res[None, :] < theta2 * min_dmin2)
    accept_masks[-1] = accept_masks[-1] | mono
    out_open = out_open & ~mono

    # far field: one masked eval over the heap prefix covering levels
    # 0..L*+ref_lv (the refinement + subtile-monopole masks extend the
    # same prefix)
    W = (1 << (level_star + ref_lv + 1)) - 1
    far_bool = jnp.concatenate(accept_masks, axis=1)                # (T, W)
    if "far" in ablate.split(","):      # ablation probes only (wrong forces!)
        far = jnp.zeros((npad, dim), dtype)
    elif "densemask" in ablate.split(","):   # A/B: round-2 dense f32 mask
        far = masked_eval_pallas(
            xp.reshape(npad, dim), mm[:W], mx[:W].T,
            far_bool.astype(dtype), float(eps),
            interpret=interpret,
        )
    else:
        # bit-packed accept mask (32x less HBM stream than the dense f32
        # mask -- see masked_eval_bits_pallas)
        far = masked_eval_bits_pallas(
            xp.reshape(npad, dim), mm[:W], mx[:W].T,
            pack_mask_bits(far_bool), float(eps),
            interpret=interpret,
            tile_group=(2 if "ftg2" in ablate.split(",") else 1),
        )

    out_count = jnp.sum(out_open, axis=1).astype(jnp.int32)

    # gbe table: gbe == residual node id; blk/lo/hi locate its S2-range
    # inside the S-sized DMA block; one pad row (lo == hi) absorbs both
    # the per-tile sentinels and the tail padding
    R_slice = min(nodes_res, 1024)
    BIG = jnp.asarray(1 << 30, jnp.int32)
    res_ids = jnp.arange(nodes_res, dtype=jnp.int32)
    if nodes_res % 32 or nodes_res < 32 or "widextract" in ablate.split(","):
        # wide extraction (A/B fallback): (T, nodes_res) row sort scales
        # with the dense node count, not the ~200 actual residuals
        key = jnp.where(out_open, res_ids[None, :], BIG)
        sorted_ids = jnp.sort(key, axis=1)[:, :R_slice]      # (T, R)
    else:
        # word-compacted extraction (same trick as octree_group): bit-fold
        # the open mask into int32 words, compact nonzero words with a
        # narrow sort, expand bits back to node ids, final narrow sort --
        # BIT-identical whenever RW does not overflow (overflowing tiles
        # hit the existing out_count > R_slice exact fallback: wcnt > RW
        # implies out_count > RW*1 >= R_slice only when RW >= R_slice, so
        # flag it explicitly below)
        WKS = nodes_res // 32
        RW = min(WKS, max(256, R_slice // 4))
        sh32 = jnp.arange(32, dtype=jnp.int32)
        ow = (out_open.reshape(ntiles, WKS, 32).astype(jnp.int32)
              << sh32[None, None, :]).sum(axis=2, dtype=jnp.int32)
        wkey = jnp.where(ow != 0,
                         jnp.arange(WKS, dtype=jnp.int32)[None, :], BIG)
        sw = jnp.sort(wkey, axis=1)[:, :RW]
        wvalid = sw < BIG
        swc = jnp.minimum(sw, WKS - 1)
        wv = jnp.where(wvalid, jnp.take_along_axis(ow, swc, axis=1), 0)
        wcnt = jnp.sum(ow != 0, axis=1).astype(jnp.int32)
        nodes32 = swc[:, :, None] * 32 + sh32[None, None, :]
        obit = ((wv[:, :, None] >> sh32[None, None, :]) & 1) > 0
        nkey = jnp.where(obit, nodes32, BIG).reshape(ntiles, RW * 32)
        sorted_ids = jnp.sort(nkey, axis=1)[:, :R_slice]
        # word overflow: residuals beyond RW words are missing from
        # sorted_ids -- force those tiles to the exact fallback
        out_count = jnp.where(wcnt > RW,
                              jnp.asarray(R_slice + 1, jnp.int32), out_count)
    if "forceover0" in ablate.split(","):
        # regression-test knob (tests/test_trees.py): simulate the
        # wcnt > RW word overflow at test scale by inflating tile 0's
        # count past its valid ids -- vmask then spans sort sentinels
        out_count = out_count.at[0].set(R_slice + 1)
    slot = jnp.arange(R_slice, dtype=jnp.int32)[None, :]
    vmask = slot < jnp.minimum(out_count, R_slice)[:, None]
    pad_gbe = nodes_res
    row0_arr = res_ids * S2                   # node's first sorted row
    blk_tbl = jnp.concatenate(
        [row0_arr // Sd, jnp.zeros((1,), jnp.int32)])
    lo_arr = row0_arr % Sd                    # S2 <= Sd: never straddles
    lohi_tbl = jnp.concatenate(
        [lo_arr | ((lo_arr + S2) << 16), jnp.zeros((1,), jnp.int32)])
    # sorted_ids can carry BIG sort sentinels INSIDE vmask: when
    # wcnt > RW forces out_count to R_slice + 1, vmask spans all R_slice
    # slots while the RW retained words may expand to fewer valid node
    # ids.  The originating tile hits the exact fallback, but an
    # unsanitized sentinel would set bit 30 of the packed word -- bit 14
    # of the TILE field -- and add node 0's bodies as garbage force to a
    # different, UNflagged tile.  Clamp to the pad row (lo == hi: no-op).
    nid_rows = jnp.concatenate(
        [jnp.full((ntiles, 1), pad_gbe, jnp.int32),          # per-tile sentinel
         jnp.where(vmask, jnp.minimum(sorted_ids, pad_gbe), pad_gbe)], axis=1)
    vflag = jnp.concatenate(
        [jnp.ones((ntiles, 1), jnp.bool_), vmask], axis=1)
    tid_rows = jnp.broadcast_to(t_idx[:, None], vflag.shape).astype(jnp.int32)
    flat_v = vflag.reshape(-1)
    flat_ent = ((tid_rows << 16) | nid_rows).reshape(-1)
    rank = jnp.cumsum(flat_v.astype(jnp.int32)) - 1
    E_CHUNK = e_chunk
    # per-tile entry budget: GENEROUS -- all-pad chunks past the actual
    # entry count are skipped via n_real/lax.cond, so over-budgeting only
    # costs worst-case memory, while under-budgeting causes fallback
    # direct sums.  Measured outside-window opens per tile: ~24 mean in
    # 2-D, ~200 in 3-D (concentrated galaxy).
    # budget scales with refinement: each level at most doubles the raw
    # residual count (survivor siblings merge back below, so the EVALUATED
    # entry count never exceeds the unrefined one)
    per_tile_est = min(R_slice, (96 if dim == 2 else 400) << ref_lv)
    n_chunks = max(1, min(40, -(-(ntiles * per_tile_est + ntiles) // E_CHUNK)))
    E_cap = min(ntiles * (R_slice + 1), n_chunks * E_CHUNK)
    E_cap = -(-E_cap // epg) * epg     # entry-packed steps (epg | E)
    if E_cap > E_CHUNK:          # chunked: round up to whole chunks
        E_cap = -(-E_cap // E_CHUNK) * E_CHUNK
    else:                        # small runs: one exact-size chunk
        E_CHUNK = E_cap
    pad_gbe_entry = ((ntiles - 1) << 16) | pad_gbe
    entries_gbe = jnp.full((E_cap,), pad_gbe_entry, jnp.int32).at[
        jnp.where(flat_v, rank, E_cap)
    ].set(flat_ent, mode="drop")
    per_tile = 1 + jnp.minimum(out_count, R_slice)
    end_rank = jnp.cumsum(per_tile)
    tile_over = (out_count > R_slice) | (end_rank > E_cap)

    # resolve node ids into self-describing lo/hi entries and merge
    # touching same-block ranges: after ref_lv refinement levels the
    # survivors are S2 = S/2^ref_lv-body siblings, and any sibling RUN
    # that survived intact merges back into one block-wide entry -- the
    # evaluated entry count can only DECREASE with refinement (accepted
    # children leave as far-field monopoles; the rest re-coalesce)
    from nbody_tpu.ops.octree_group import merge_contiguous_entries
    from nbody_tpu.ops.pallas_group_eval import entries_lohi_eval_pallas

    gidx = entries_gbe & 0xFFFF
    entries = (entries_gbe & jnp.int32(~0xFFFF)) | blk_tbl[gidx]
    lohis = lohi_tbl[gidx]
    pad_entry = (ntiles - 1) << 16
    entries, lohis, n_merged, tend = merge_contiguous_entries(
        entries, lohis, end_rank[-1], pad_entry, ntiles=ntiles, epg=epg)
    if tend is not None:
        tile_over = tile_over | (tend > E_cap)
    # structural invariant (sentinel-leak regression, tests/test_trees.py):
    # every packed entry must address a real tile.  An OOB tile field
    # would be CLAMPED by the Mosaic index map on hardware, silently
    # adding force to the last tile (interpret mode drops the write, so
    # tests pin this count instead of forces).
    bad_entries = jnp.sum((entries >> 16) >= ntiles, dtype=jnp.int32)

    if "resid" in ablate.split(","):    # ablation probes only (wrong forces!)
        resid = jnp.zeros((npad, dim), dtype)
    elif "rlist" in ablate.split(","):  # keep entry-list BUILD, skip only the eval
        resid = jnp.zeros((npad, dim), dtype) + entries.sum().astype(dtype)
    else:
        resid = entries_lohi_eval_pallas(
            xp.reshape(npad, dim), mp_g, xp_g.T,
            entries.reshape(-1, E_CHUNK), lohis.reshape(-1, E_CHUNK),
            float(eps), S=Sd, tb=tile, interpret=interpret, softening="poly",
            n_real=n_merged, epg=epg,
            packed_j="packedj" in ablate.split(","),
            sub_width=sub_width,
        )

    acc = far + near + resid
    a, info = _finish_grouped(
        acc, xt, tile_over, out_count, jnp.zeros_like(out_count),
        jnp.zeros_like(out_count), jnp.zeros_like(out_count),
        m, x, n, ntiles, tile, npad, out_rows, dtype, epsv, Gv,
        pallas_fb=("interpret" if interpret else True), eps_f=float(eps),
        n_entries=n_merged,
    )
    info["res_pairs"] = diag_pairs
    info["bad_entries"] = bad_entries
    # eval-lane utilization: each entry's math runs over the full S-wide
    # block; sum(hi - lo) / (entries * S) is the useful fraction (drives
    # the residual block-width choice)
    info["res_width_sum"] = jnp.sum((lohis >> 16) - (lohis & 0xFFFF))
    # DMA-redundancy diagnostic (mirrors octree_group): distinct
    # S-blocks among real residual entries; entries / unique is the
    # factor a block-resident near kernel could recover (~2 us per
    # entry is the block DMA, round-4 breakdown)
    _blk = jnp.where(jnp.arange(entries.shape[0]) < n_merged,
                     entries & 0xFFFF, jnp.int32(0x7FFFFFFF))
    _sb = jnp.sort(_blk)
    _prev = jnp.concatenate([jnp.full((1,), -1, _sb.dtype), _sb[:-1]])
    info["res_unique_blocks"] = jnp.sum(
        (_sb != _prev) & (_sb != jnp.int32(0x7FFFFFFF)), dtype=jnp.int32)
    for k, v in enumerate(diag_pass_hist):
        info[f"res_pass_{k}"] = v
    return a, info
