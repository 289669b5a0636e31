"""Batched Pallas kernel for the grouped tree-force dense evaluation.

The group traversals (ops/bvh_group.py, ops/octree_group.py) reduce
Barnes-Hut to a dense evaluation: every TILE of TB consecutive sorted
bodies interacts with a per-tile gathered interaction LIST (accepted
monopoles + opened leaf bodies, padded with mass-0 entries to a static
cap).  The round-1 evaluation materialized the (tiles, TB, L, dim)
difference tensor in HBM via jnp/einsum -- HBM-bandwidth-bound at
hundreds of GB per step at n=1M.  This kernel keeps each (TB, TJ) pair
tile in VMEM, exactly like the all-pairs kernel (pallas_allpairs.py)
with a leading tile-batch grid axis: same per-pair math as the
reference (w = m / (d2*sqrt(d2) + eps), bvh.h:297,308; padded entries
contribute exactly zero through the m=0 numerator).

The caller gathers the per-tile lists OUTSIDE the kernel (one XLA take
per field -- a few tens of MB, negligible next to the pairwise work) and
passes them dense:

    xi   (ntiles*TB, dim)   tile bodies, row-major
    mj   (ntiles, L)        list masses (0 = padding)
    xjt  (ntiles, dim, L)   list positions, transposed per tile
    -> a (ntiles*TB, dim)   raw accelerations (no G factor)

Grid is (ntiles, L // TJ) with the list axis innermost; the output
block depends only on the tile index, so it stays resident in VMEM and
accumulates across list chunks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Single source of truth for the far-field j-block width: the STRIDED bit
# order of pack_mask_bits depends on tile_j, and a pack/unpack mismatch
# that rounds to the same padded word width is undetectable at runtime --
# so pack and eval both default to this constant and callers should pass
# neither (ADVICE r3).
MASK_TILE_J = 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _group_eval_kernel(dim, eps, softening, xi_ref, xjt_ref, mj_ref, out_ref):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    xi = xi_ref[:, :]                       # (TB, dim)
    eps_v = jnp.asarray(eps, xi.dtype)
    dx = []
    d2 = None
    for d in range(dim):
        xd = xjt_ref[0, d, :][None, :] - xi[:, d][:, None]   # (TB, TJ)
        dx.append(xd)
        d2 = xd * xd if d2 is None else d2 + xd * xd
    if softening == "poly":
        # bvh / all-pairs: t = d2^1.5 + eps (vec.h:249-252)
        t = d2 * jnp.sqrt(d2) + eps_v
    else:
        # octree quirk: t = (sqrt(d2) + eps)^3 (octree.h:156-160)
        s = jnp.sqrt(d2) + eps_v
        t = s * s * s
    r = pl.reciprocal(t, approx=True)
    r = r * (jnp.asarray(2.0, xi.dtype) - t * r)   # Newton: <=1 ulp
    w = mj_ref[0, 0, :][None, :] * r
    for d in range(dim):
        out_ref[:, d] += jnp.sum(w * dx[d], axis=1)


@functools.partial(
    jax.jit, static_argnames=("eps", "tile_j", "interpret", "softening")
)
def group_eval_pallas(
    xi: jnp.ndarray,
    mj: jnp.ndarray,
    xjt: jnp.ndarray,
    eps: float,
    tile_j: int = 1024,
    interpret: bool = False,
    softening: str = "poly",
) -> jnp.ndarray:
    """xi (ntiles*TB, dim) row-major tile bodies; mj (ntiles, L);
    xjt (ntiles, dim, L).  Returns raw accelerations (ntiles*TB, dim).
    fp32 only (f64 runs use the jnp evaluation).  softening: "poly" =
    d2^1.5 + eps (bvh), "sqrt3" = (sqrt(d2) + eps)^3 (octree quirk)."""
    ntiles, dim, L = xjt.shape
    tb = xi.shape[0] // ntiles
    dtype = xi.dtype
    Lp = _round_up(L, tile_j)
    if Lp != L:
        mj = jnp.pad(mj, ((0, 0), (0, Lp - L)))
        xjt = jnp.pad(xjt, ((0, 0), (0, 0), (0, Lp - L)))

    kernel = functools.partial(_group_eval_kernel, dim, float(eps), softening)
    # mj gets a singleton middle axis: a (1, tile_j) block over (ntiles, L)
    # is illegal (last-two-dims rule: 1 is neither divisible by 8 nor the
    # full 'ntiles'); as (ntiles, 1, L) the last two dims are (1, tile_j)
    # with 1 == the full middle dim.
    out = pl.pallas_call(
        kernel,
        grid=(ntiles, Lp // tile_j),
        in_specs=[
            pl.BlockSpec((tb, dim), lambda t, c: (t, 0)),
            pl.BlockSpec((1, dim, tile_j), lambda t, c: (t, 0, c)),
            pl.BlockSpec((1, 1, tile_j), lambda t, c: (t, 0, c)),
        ],
        out_specs=pl.BlockSpec((tb, dim), lambda t, c: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((ntiles * tb, dim), dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(12 * ntiles * tb) * int(Lp),
            bytes_accessed=int(ntiles * (tb + Lp) * dim * 4),
            transcendentals=int(ntiles * tb) * int(Lp),
        ),
        interpret=interpret,
    )(xi, xjt, mj[:, None, :])
    return out


def _pair_weight(dim, eps, softening, xi, xjt_row):
    """Common per-pair chain: dx list, softened Newton-refined r^-3."""
    eps_v = jnp.asarray(eps, xi.dtype)
    dx = []
    d2 = None
    for d in range(dim):
        xd = xjt_row[d, :][None, :] - xi[:, d][:, None]
        dx.append(xd)
        d2 = xd * xd if d2 is None else d2 + xd * xd
    if softening == "poly":
        t = d2 * jnp.sqrt(d2) + eps_v
    else:
        s = jnp.sqrt(d2) + eps_v
        t = s * s * s
    r = pl.reciprocal(t, approx=True)
    r = r * (jnp.asarray(2.0, xi.dtype) - t * r)
    return dx, r


def _unpack_bits(words, dtype):
    """(1, K) int32 words -> (1, K*32) 0/1 dtype vector in STRIDED order:
    lane l takes bit (l // K) of word (l % K).  Callers pack with
    pack_mask_bits (same stride) so lane l lines up with node l of the
    j-block.  Built on pltpu.repeat's TILE semantics ([w0..wK w0..wK ...])
    plus a per-lane variable shift -- no lane gathers, no relayouts."""
    K = words.shape[1]
    rep = pltpu.repeat(words, 32, axis=1)            # lane l = word (l % K)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K * 32), 1)
    # jnp.int32(K): a bare Python-int divisor becomes an i64 constant
    # under x64 whose i64->i32 convert recurses forever in Mosaic's
    # _convert_helper (accuracy_study's f64-oracle mode trips this)
    bit = jax.lax.shift_right_logical(rep, lane // jnp.int32(K)) & 1
    return bit.astype(dtype)


def pack_mask_bits(mask: jnp.ndarray, tile_j: int = MASK_TILE_J) -> jnp.ndarray:
    """Bit-pack a (T, W) boolean accept mask into (T, Wp // 32) int32 words
    in the strided per-block order _unpack_bits expects: within each
    tile_j-wide j-block, node l -> word (l % K), bit (l // K), K = tile_j
    // 32.  The dense f32 mask was the far field's HBM bound (~300 MB
    written + read per step at n=1M 3-D); packed words are 32x smaller and
    the pack fuses into the traversal's elementwise chain."""
    T, W = mask.shape
    Wp = _round_up(W, tile_j)
    K = tile_j // 32
    if Wp != W:
        mask = jnp.pad(mask, ((0, 0), (0, Wp - W)))
    m = mask.reshape(T, Wp // tile_j, 32, K).astype(jnp.int32)
    shifts = jnp.arange(32, dtype=jnp.int32)[None, None, :, None]
    # sum == bitwise OR here: each term holds one distinct bit, so no
    # carries (bit 31's min-int term included, two's complement)
    words = (m << shifts).sum(axis=2, dtype=jnp.int32)
    return words.reshape(T, Wp // 32)


def _masked_eval_kernel(dim, eps, softening, xi_ref, xjt_ref, mj_ref,
                        mask_ref, out_ref):
    """Shared j-arrays + per-tile mask: w = mask * m / soften(d2)."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    xi = xi_ref[:, :]
    eps_v = jnp.asarray(eps, xi.dtype)
    dx = []
    d2 = None
    for d in range(dim):
        xd = xjt_ref[d, :][None, :] - xi[:, d][:, None]
        dx.append(xd)
        d2 = xd * xd if d2 is None else d2 + xd * xd
    if softening == "poly":
        t = d2 * jnp.sqrt(d2) + eps_v
    else:
        s = jnp.sqrt(d2) + eps_v
        t = s * s * s
    r = pl.reciprocal(t, approx=True)
    r = r * (jnp.asarray(2.0, xi.dtype) - t * r)
    w = (mask_ref[0, 0, :] * mj_ref[0, :])[None, :] * r
    for d in range(dim):
        out_ref[:, d] += jnp.sum(w * dx[d], axis=1)


@functools.partial(
    jax.jit, static_argnames=("eps", "tile_j", "interpret", "softening")
)
def masked_eval_pallas(
    xi: jnp.ndarray,
    mj: jnp.ndarray,
    xjt: jnp.ndarray,
    mask: jnp.ndarray,
    eps: float,
    tile_j: int = 1024,
    interpret: bool = False,
    softening: str = "poly",
) -> jnp.ndarray:
    """Far-field evaluation against SHARED j-arrays with a per-tile mask.

    xi   (ntiles*TB, dim)  tile bodies
    mj   (W,)              shared source masses (heap levels 0..L*)
    xjt  (dim, W)          shared source positions, transposed
    mask (ntiles, W)       1.0 where the node is group-MAC-accepted for
                           the tile, else 0.0

    The j-data is identical for every tile -- only the (ntiles, W) mask
    streams per tile -- so the evaluation is completely gather-free
    (batched row gathers measured ~56M elem/s on v5e, making any
    list-gathering design HBM-gather-bound)."""
    dim, W = xjt.shape
    ntiles = mask.shape[0]
    tb = xi.shape[0] // ntiles
    dtype = xi.dtype
    Wp = _round_up(W, tile_j)
    if Wp != W:
        mj = jnp.pad(mj, (0, Wp - W))
        xjt = jnp.pad(xjt, ((0, 0), (0, Wp - W)))
        mask = jnp.pad(mask, ((0, 0), (0, Wp - W)))

    kernel = functools.partial(_masked_eval_kernel, dim, float(eps), softening)
    out = pl.pallas_call(
        kernel,
        grid=(ntiles, Wp // tile_j),
        in_specs=[
            pl.BlockSpec((tb, dim), lambda t, c: (t, 0)),
            pl.BlockSpec((dim, tile_j), lambda t, c: (0, c)),
            pl.BlockSpec((1, tile_j), lambda t, c: (0, c)),
            pl.BlockSpec((1, 1, tile_j), lambda t, c: (t, 0, c)),
        ],
        out_specs=pl.BlockSpec((tb, dim), lambda t, c: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((ntiles * tb, dim), dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(13 * ntiles * tb) * int(Wp),
            bytes_accessed=int(ntiles * (tb + Wp) * dim * 4),
            transcendentals=int(ntiles * tb) * int(Wp),
        ),
        interpret=interpret,
    )(xi, xjt, mj.reshape(1, Wp), mask[:, None, :])
    return out


def _masked_bits_kernel(dim, eps, softening, tb, tg, xi_ref, xjt_ref,
                        mj_ref, words_ref, out_ref):
    """masked_eval with a bit-packed mask: words (1, 1, tg, TJ//32) int32
    (leading singleton dims are the tile-row / j-chunk grid axes: jax
    >= 0.9 requires the last two block dims to equal the array dims or
    be (8, 128)-divisible, so the j-chunk axis lives in the GRID-mapped
    leading dims rather than as a 32-word slice of the packed row).

    tg > 1 groups tg consecutive body TILES into one grid step (each
    step pays ~2 us of Mosaic sequencing; tg=2 halves the step count):
    the xi block holds tg*tb rows, each tb-row band applying its own
    tile's mask row via a row-iota select."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    xi = xi_ref[:, :]                                        # (tg*tb, dim)
    dx, r = _pair_weight(dim, eps, softening, xi, xjt_ref)
    if tg == 1:
        mask = _unpack_bits(words_ref[0, 0, :, :], xi.dtype)  # (1, TJ)
        w = (mask[0, :] * mj_ref[0, :])[None, :] * r
    else:
        rows = (jax.lax.broadcasted_iota(jnp.int32, (tg * tb, 1), 0)
                // jnp.int32(tb))                   # int32-pinned (x64-safe)
        mask = jnp.zeros((tg * tb, r.shape[1]), xi.dtype)
        zero = jnp.zeros((), xi.dtype)
        for g in range(tg):
            mg = _unpack_bits(words_ref[0, 0, g:g + 1, :], xi.dtype)
            mask = mask + jnp.where(rows == jnp.int32(g), mg, zero)
        w = (mask * mj_ref[0, :][None, :]) * r
    for d in range(dim):
        out_ref[:, d] += jnp.sum(w * dx[d], axis=1)


@functools.partial(
    jax.jit, static_argnames=("eps", "tile_j", "interpret", "softening",
                              "tile_group")
)
def masked_eval_bits_pallas(
    xi: jnp.ndarray,
    mj: jnp.ndarray,
    xjt: jnp.ndarray,
    words: jnp.ndarray,
    eps: float,
    tile_j: int = MASK_TILE_J,
    interpret: bool = False,
    softening: str = "poly",
    tile_group: int = 1,
) -> jnp.ndarray:
    """Far-field evaluation with a BIT-PACKED accept mask.

    Identical math to masked_eval_pallas, but the per-tile mask arrives as
    int32 words (ntiles, Wp // 32) packed by pack_mask_bits(mask, tile_j)
    -- 32x less HBM traffic than the dense f32 mask, which at n=1M 3-D
    (ntiles ~2k, W ~37k) was ~300 MB written by the traversal and read
    back by this kernel, the single largest HBM stream of the tree step.
    The unpack is ~4 vector ops per j-lane, amortized over TB rows."""
    dim, W = xjt.shape
    ntiles = words.shape[0]
    tb = xi.shape[0] // ntiles
    dtype = xi.dtype
    Wp = _round_up(W, tile_j)
    if Wp != W:
        mj = jnp.pad(mj, (0, Wp - W))
        xjt = jnp.pad(xjt, ((0, 0), (0, Wp - W)))
    if words.shape[1] != Wp // 32:
        raise ValueError("words must be pack_mask_bits(mask, tile_j)")
    tg = tile_group
    ntg = ntiles
    nw, nc = tile_j // 32, Wp // tile_j
    xi_g, words_g = xi, words
    if tg > 1:
        # pad the tile axis to a tg multiple with zero-mask tiles
        ntg = -(-ntiles // tg) * tg
        if ntg != ntiles:
            xi_g = jnp.pad(xi, ((0, (ntg - ntiles) * tb), (0, 0)))
            words_g = jnp.pad(words, ((0, ntg - ntiles), (0, 0)))
    # (rows, j-chunk, tg, words-per-chunk): the j-chunk axis must be a
    # leading GRID-mapped dim (block last-two dims == array dims, the
    # jax 0.9 Pallas divisibility rule); tg == 1 is a pure reshape,
    # tg > 1 pays one small transpose (Wp/8 bytes per tile row)
    words_g = words_g.reshape(ntg // tg, tg, nc, nw).swapaxes(1, 2)

    kernel = functools.partial(_masked_bits_kernel, dim, float(eps),
                               softening, tb, tg)
    out = pl.pallas_call(
        kernel,
        grid=(ntg // tg, nc),
        in_specs=[
            pl.BlockSpec((tg * tb, dim), lambda t, c: (t, 0)),
            pl.BlockSpec((dim, tile_j), lambda t, c: (0, c)),
            pl.BlockSpec((1, tile_j), lambda t, c: (0, c)),
            pl.BlockSpec((1, 1, tg, nw), lambda t, c: (t, c, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tg * tb, dim), lambda t, c: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((ntg * tb, dim), dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(13 * ntg * tb) * int(Wp),
            bytes_accessed=int(ntg * (tb * dim * 4 + Wp // 8)
                               + Wp * (dim + 1) * 4),
            transcendentals=int(ntg * tb) * int(Wp),
        ),
        interpret=interpret,
    )(xi_g, xjt, mj.reshape(1, Wp), words_g)
    return out[:ntiles * tb]


@functools.partial(
    jax.jit,
    static_argnames=("eps", "window_tiles", "interpret", "softening", "wj"),
)
def window_eval_pallas(
    xi: jnp.ndarray,
    mj: jnp.ndarray,
    xjt: jnp.ndarray,
    mask: jnp.ndarray,
    w0: jnp.ndarray,
    eps: float,
    window_tiles: int,
    interpret: bool = False,
    softening: str = "poly",
    wj: int = 1,
) -> jnp.ndarray:
    """Near-field evaluation: tile t vs a CONTIGUOUS window of the sorted
    body array starting at tile index w0[t] (w0 is in units of TB-body
    tiles, already clamped by the caller).  The j-blocks are pure block
    DMA via a t-dependent index map -- no gathers.  `mask` (ntiles, WB)
    zeroes window bodies whose leaf-level node is not open for this tile.

    wj groups wj window tiles into one grid step (every grid step pays a
    fixed ~2 us of Mosaic sequencing regardless of block width, measured
    round 3 -- see BASELINE.md); requires wj | window_tiles and w0
    multiples of wj (callers align w0 down, which only shifts the window
    placement, never correctness -- the caller derives its in-window
    interval FROM the aligned w0).

    xi  (ntiles*TB, dim); mj (npad,); xjt (dim, npad);
    mask (ntiles, window_tiles*TB); w0 (ntiles,) int32."""
    ntiles = mask.shape[0]
    WB = mask.shape[1]
    tb = WB // window_tiles
    dim = xi.shape[1]
    dtype = xi.dtype
    if window_tiles % wj:
        raise ValueError("wj must divide window_tiles")
    jb = wj * tb

    base_kernel = functools.partial(_masked_eval_kernel, dim, float(eps),
                                    softening)

    def kernel(w0_ref, *refs):
        # scalar-prefetch operand arrives first; the math kernel
        # ignores it (it only drives the index maps)
        base_kernel(*refs)

    def jmap(t, c, w0_ref):
        return (0, w0_ref[t] // jnp.int32(wj) + c)  # int32-pinned (x64-safe)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles, window_tiles // wj),
        in_specs=[
            pl.BlockSpec((tb, dim), lambda t, c, w0_ref: (t, 0)),
            pl.BlockSpec((dim, jb), jmap),
            pl.BlockSpec((1, jb), jmap),
            pl.BlockSpec((1, 1, jb), lambda t, c, w0_ref: (t, 0, c)),
        ],
        out_specs=pl.BlockSpec((tb, dim), lambda t, c, w0_ref: (t, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ntiles * tb, dim), dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(13 * ntiles * tb) * int(WB),
            bytes_accessed=int(ntiles * (tb + WB) * dim * 4),
            transcendentals=int(ntiles * tb) * int(WB),
        ),
        interpret=interpret,
    )(w0.astype(jnp.int32), xi, xjt, mj.reshape(1, -1), mask[:, None, :])
    return out


def _window_interval_kernel(dim, eps, softening, tb, jb, wj, skip,
                            scalars_ref, xi_ref, xjt_ref, mj_ref, out_ref):
    """Window eval whose mask is the INTERVAL [lo, hi) of global body
    columns, computed in-kernel from prefetched scalars -- replaces the
    dense (T, window_tiles*TB) f32 body mask (~130 MB/step at n=1M).

    skip=True guards the pair math per j-block: the cell-snapped
    interval leaves ~26% of the window's columns outside [lo, hi)
    (window_span_sum / window_capacity diagnostics), and a j-block
    wholly outside contributes exactly zero -- skipping its math is
    bit-exact.  The guarded region is a whole (tb, jb) block's math
    (~3-7 us), the same granularity the round-4g subwindows showed
    pipelines fine (the round-4 'pl.when defeats pipelining' negative
    was per-64-row branching); the block DMA itself stays unconditional
    so Mosaic's pipeline is untouched."""
    t = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    w0 = scalars_ref[t, 0]
    lo = scalars_ref[t, 1]
    hi = scalars_ref[t, 2]
    col0 = (w0 // jnp.int32(wj) + c) * jb          # int32-pinned (x64-safe)

    def _math():
        xi = xi_ref[:, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, jb), 1) + col0
        sel = ((lane >= lo) & (lane < hi)).astype(xi.dtype)
        dx, r = _pair_weight(dim, eps, softening, xi, xjt_ref)
        w = (sel[0, :] * mj_ref[0, :])[None, :] * r
        for d in range(dim):
            out_ref[:, d] += jnp.sum(w * dx[d], axis=1)

    if skip:
        pl.when((col0 < hi) & (col0 + jnp.int32(jb) > lo))(_math)
    else:
        _math()


@functools.partial(
    jax.jit,
    static_argnames=("eps", "window_tiles", "interpret", "softening", "wj",
                     "skip_outside"),
)
def window_eval_interval_pallas(
    xi: jnp.ndarray,
    mj: jnp.ndarray,
    xjt: jnp.ndarray,
    w0: jnp.ndarray,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    eps: float,
    window_tiles: int,
    interpret: bool = False,
    softening: str = "poly",
    wj: int = 1,
    skip_outside: bool = False,
) -> jnp.ndarray:
    """window_eval_pallas for callers whose body mask is a contiguous
    interval [lo[t], hi[t]) of global body columns (the octree's
    cell-snapped window): the mask never materializes -- three int32
    scalars per tile ride the scalar-prefetch operand and the selection
    is an in-kernel iota compare.  w0 in tile units (wj-aligned), lo/hi
    in body units."""
    ntiles = w0.shape[0]
    dim = xi.shape[1]
    tb = xi.shape[0] // ntiles
    dtype = xi.dtype
    if window_tiles % wj:
        raise ValueError("wj must divide window_tiles")
    jb = wj * tb
    scalars = jnp.stack(
        [w0.astype(jnp.int32), lo.astype(jnp.int32), hi.astype(jnp.int32)],
        axis=1)                                            # (T, 3)

    kernel = functools.partial(_window_interval_kernel, dim, float(eps),
                               softening, tb, jb, wj, skip_outside)

    def jmap(t, c, s_ref):
        return (0, s_ref[t, 0] // jnp.int32(wj) + c)  # int32-pinned (x64-safe)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles, window_tiles // wj),
        in_specs=[
            pl.BlockSpec((tb, dim), lambda t, c, s_ref: (t, 0)),
            pl.BlockSpec((dim, jb), jmap),
            pl.BlockSpec((1, jb), jmap),
        ],
        out_specs=pl.BlockSpec((tb, dim), lambda t, c, s_ref: (t, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ntiles * tb, dim), dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(13 * ntiles * tb) * int(window_tiles * tb),
            bytes_accessed=int(ntiles * (tb + window_tiles * tb) * dim * 4),
            transcendentals=int(ntiles * tb) * int(window_tiles * tb),
        ),
        interpret=interpret,
    )(scalars, xi, xjt, mj.reshape(1, -1))
    return out


def _window_nodemask_kernel(dim, eps, softening, tb, jb, wj, nv, S, skip,
                            w0_ref, xi_ref, xjt_ref, mj_ref, win_ref,
                            out_ref):
    """Window eval whose mask is per-NODE openness (nv = wj * tile//S
    nodes per j-block, each covering S consecutive bodies), expanded
    in-kernel -- replaces the (T, wnodes*S) broadcast body mask (the
    BVH windowed path's ~130 MB/step stream).

    skip=True guards the j-block's pair math on ANY of its nv nodes
    being open -- a block whose nodes are all far-field-accepted
    contributes exactly zero (bit-exact skip; see
    _window_interval_kernel on why block-granularity pl.when
    pipelines fine)."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    def _math():
        xi = xi_ref[:, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, jb), 1)
        # under x64 (accuracy_study's f64-oracle mode) a bare Python-int
        # divisor becomes an int64 constant whose int64->int32 convert hits
        # unbounded recursion in Mosaic's _convert_helper -- keep every
        # integer op pinned to int32
        node = lane // jnp.int32(S)                         # (1, jb) in [0, nv)
        sel = jnp.zeros((1, jb), xi.dtype)
        zero = jnp.zeros((), xi.dtype)
        for v in range(nv):
            sel = sel + jnp.where(node == jnp.int32(v), win_ref[0, 0, 0, v],
                                  zero)
        dx, r = _pair_weight(dim, eps, softening, xi, xjt_ref)
        w = (sel[0, :] * mj_ref[0, :])[None, :] * r
        for d in range(dim):
            out_ref[:, d] += jnp.sum(w * dx[d], axis=1)

    if skip:
        any_open = jnp.zeros((), jnp.float32)
        for v in range(nv):
            any_open = any_open + win_ref[0, 0, 0, v].astype(jnp.float32)
        pl.when(any_open > 0)(_math)
    else:
        _math()


@functools.partial(
    jax.jit,
    static_argnames=("eps", "window_tiles", "S", "interpret", "softening",
                     "wj", "skip_outside"),
)
def window_eval_nodemask_pallas(
    xi: jnp.ndarray,
    mj: jnp.ndarray,
    xjt: jnp.ndarray,
    in_win: jnp.ndarray,
    w0: jnp.ndarray,
    eps: float,
    window_tiles: int,
    S: int,
    interpret: bool = False,
    softening: str = "poly",
    wj: int = 1,
    skip_outside: bool = False,
) -> jnp.ndarray:
    """window_eval_pallas for callers whose body mask is per-NODE openness
    broadcast over S consecutive bodies (the BVH windowed near field):
    in_win (ntiles, window_tiles * tile // S) 0/1 streams as tiny blocks
    and the S-fold body expansion happens in-kernel (unrolled scalar
    selects over nv = wj * tile // S node slots per block)."""
    ntiles, wnodes = in_win.shape
    dim = xi.shape[1]
    tb = xi.shape[0] // ntiles
    dtype = xi.dtype
    if window_tiles % wj:
        raise ValueError("wj must divide window_tiles")
    jb = wj * tb
    npt = wnodes // window_tiles                            # nodes per tile
    nv = wj * npt
    if nv * S != jb:
        raise ValueError("in_win width inconsistent with S / window_tiles")
    if nv > 64:
        raise ValueError("nodemask window supports at most 64 nodes per "
                         "j-block (unrolled selects); use the dense mask")

    kernel = functools.partial(_window_nodemask_kernel, dim, float(eps),
                               softening, tb, jb, wj, nv, S, skip_outside)

    def jmap(t, c, w0_ref):
        return (0, w0_ref[t] // jnp.int32(wj) + c)  # int32-pinned (x64-safe)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles, window_tiles // wj),
        in_specs=[
            pl.BlockSpec((tb, dim), lambda t, c, w0_ref: (t, 0)),
            pl.BlockSpec((dim, jb), jmap),
            pl.BlockSpec((1, jb), jmap),
            # window-chunk axis as a leading grid-mapped dim (jax 0.9
            # requires block last-two dims == array dims or (8, 128)-
            # divisible; the per-chunk nv node slots are contiguous in
            # the wnodes row, so this is a pure reshape)
            pl.BlockSpec((1, 1, 1, nv), lambda t, c, w0_ref: (t, c, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tb, dim), lambda t, c, w0_ref: (t, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ntiles * tb, dim), dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(13 * ntiles * tb) * int(wnodes * S),
            bytes_accessed=int(ntiles * (tb + wnodes * S) * dim * 4),
            transcendentals=int(ntiles * tb) * int(wnodes * S),
        ),
        interpret=interpret,
    )(w0.astype(jnp.int32), xi, xjt, mj.reshape(1, -1),
      in_win.astype(dtype).reshape(ntiles, window_tiles // wj, 1, nv))
    return out


def _group_shared_masked_kernel(dim, eps, softening, G, xi_ref, xjt_ref,
                                mj_ref, mask_ref, out_ref):
    """Per-tile mask over a SHARED per-supertile j-list (j blocks are
    indexed by t // G, the mask by t)."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    xi = xi_ref[:, :]
    eps_v = jnp.asarray(eps, xi.dtype)
    dx = []
    d2 = None
    for d in range(dim):
        xd = xjt_ref[0, d, :][None, :] - xi[:, d][:, None]
        dx.append(xd)
        d2 = xd * xd if d2 is None else d2 + xd * xd
    if softening == "poly":
        t = d2 * jnp.sqrt(d2) + eps_v
    else:
        s = jnp.sqrt(d2) + eps_v
        t = s * s * s
    r = pl.reciprocal(t, approx=True)
    r = r * (jnp.asarray(2.0, xi.dtype) - t * r)
    w = (mask_ref[0, 0, :] * mj_ref[0, 0, :])[None, :] * r
    for d in range(dim):
        out_ref[:, d] += jnp.sum(w * dx[d], axis=1)


@functools.partial(
    jax.jit, static_argnames=("eps", "G", "tile_j", "interpret", "softening")
)
def group_shared_masked_eval_pallas(
    xi: jnp.ndarray,
    mj: jnp.ndarray,
    xjt: jnp.ndarray,
    mask: jnp.ndarray,
    eps: float,
    G: int,
    tile_j: int = 1024,
    interpret: bool = False,
    softening: str = "poly",
) -> jnp.ndarray:
    """Monopole evaluation for the sparse-descent near field: each
    SUPERTILE of G consecutive body tiles shares one gathered monopole
    list; each member tile applies its own accept mask.

    xi   (ntiles*TB, dim)      tile bodies
    mj   (nsuper, M)           per-supertile monopole masses (0 = pad)
    xjt  (nsuper, dim, M)      per-supertile monopole positions
    mask (ntiles, M)           1.0 where accepted for this member tile

    The j-data streams once per supertile (grid-minor reuse), so the
    gather cost of list building is amortized G ways while acceptance
    stays per-tile (descent accepts differ between members)."""
    nsuper, dim, M = xjt.shape
    ntiles = mask.shape[0]
    tb = xi.shape[0] // ntiles
    dtype = xi.dtype
    if nsuper != -(-ntiles // G):
        raise ValueError("nsuper must equal ceil(ntiles / G)")
    Mp = _round_up(M, tile_j)
    if Mp != M:
        mj = jnp.pad(mj, ((0, 0), (0, Mp - M)))
        xjt = jnp.pad(xjt, ((0, 0), (0, 0), (0, Mp - M)))
        mask = jnp.pad(mask, ((0, 0), (0, Mp - M)))

    kernel = functools.partial(_group_shared_masked_kernel, dim, float(eps),
                               softening, G)
    out = pl.pallas_call(
        kernel,
        grid=(ntiles, Mp // tile_j),
        in_specs=[
            pl.BlockSpec((tb, dim), lambda t, c: (t, 0)),
            pl.BlockSpec((1, dim, tile_j),
                         lambda t, c: (t // jnp.int32(G), 0, c)),
            pl.BlockSpec((1, 1, tile_j),
                         lambda t, c: (t // jnp.int32(G), 0, c)),
            pl.BlockSpec((1, 1, tile_j), lambda t, c: (t, 0, c)),
        ],
        out_specs=pl.BlockSpec((tb, dim), lambda t, c: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((ntiles * tb, dim), dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(13 * ntiles * tb) * int(Mp),
            bytes_accessed=int(ntiles * (tb + 2 * Mp) * dim * 4),
            transcendentals=int(ntiles * tb) * int(Mp),
        ),
        interpret=interpret,
    )(xi, xjt, mj[:, None, :], mask[:, None, :])
    return out


def _entries_tables_kernel(dim, eps, softening, S, ent_ref, blk_ref,
                           lohi_ref, xi_ref, xjt_ref, mj_ref, init_ref,
                           out_ref):
    """Table-driven entry evaluation (octree fast path): each entry packs
    (tile_id << 16 | gbe); the gbe row of the prefetched tables gives the
    j body-block index and the [lo, hi) body subrange of that block that
    belongs to the entry's cell.  Empty ranges (lo == hi -- the padding
    sentinel) skip all math."""
    e = pl.program_id(0)
    ent = ent_ref[e]
    tid = ent >> 16
    prev = ent_ref[jnp.maximum(e - 1, 0)] >> 16

    @pl.when((e == 0) | (tid != prev))
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    gbe = ent & 0xFFFF
    lohi = lohi_ref[gbe]
    lo = lohi & 0xFFFF
    hi = lohi >> 16

    @pl.when(hi > lo)
    def _():
        xi = xi_ref[:, :]
        eps_v = jnp.asarray(eps, xi.dtype)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
        sel = ((lane >= lo) & (lane < hi)).astype(xi.dtype)
        dx = []
        d2 = None
        for d in range(dim):
            xd = xjt_ref[d, :][None, :] - xi[:, d][:, None]
            dx.append(xd)
            d2 = xd * xd if d2 is None else d2 + xd * xd
        if softening == "poly":
            t = d2 * jnp.sqrt(d2) + eps_v
        else:
            s = jnp.sqrt(d2) + eps_v
            t = s * s * s
        r = pl.reciprocal(t, approx=True)
        r = r * (jnp.asarray(2.0, xi.dtype) - t * r)
        w = (sel * mj_ref[0, :][None, :]) * r
        for d in range(dim):
            out_ref[:, d] += jnp.sum(w * dx[d], axis=1)


def _entries_lohi_kernel(dim, eps, softening, S, skip_empty, epg, sub_width,
                         ent_ref, lohi_ref, xi_ref, *rest):
    """Self-describing entry evaluation (sparse-descent near field): each
    entry carries its own j block id (tile_id << 16 | blk) and [lo, hi)
    subrange (lo | hi << 16) -- no run-table indirection, so entries can
    reference ARBITRARY body subranges (deep-cell ranges straddle block
    boundaries).  lo == hi is the padding sentinel; by default it is
    SKIPPED with pl.when (measured A/B at n=1M 3-D: skipping saves
    ~0.09 s of pad-tail math and, unlike the small-block case where
    pl.when stalled Mosaic 1.6x, costs nothing at 512x1024 blocks).

    sub_width (None = whole block, the default) splits the S-wide pair
    math into S/sub_width pl.when-guarded subwindows evaluated only
    where they overlap the entry's [lo, hi): with a WIDE S (fewer
    entries, fewer grid steps + DMAs) the math still scales with the
    entry's occupied width at sub_width granularity, and the (tb, S)
    pair intermediates that crash the Mosaic compiler at 512x4096 never
    materialize -- each subwindow's live set is (tb, sub_width)."""
    xjt_refs = rest[:epg]
    mj_refs = rest[epg:2 * epg]
    out_ref = rest[2 * epg + 1]
    e = pl.program_id(0)
    ent0 = ent_ref[e * epg]
    tid = ent0 >> 16
    prev = ent_ref[jnp.maximum(e * epg - epg, 0)] >> 16

    @pl.when((e == 0) | (tid != prev))
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    xi = xi_ref[:, :]
    eps_v = jnp.asarray(eps, xi.dtype)
    SUBW = sub_width if sub_width else S
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, SUBW), 1)

    def one(k):
        lohi = lohi_ref[e * epg + k]
        lo = lohi & 0xFFFF
        hi = lohi >> 16

        def body(w0):
            sel = ((lane + w0 >= lo) & (lane + w0 < hi)).astype(xi.dtype)
            dx = []
            d2 = None
            for d in range(dim):
                xd = (xjt_refs[k][d, w0:w0 + SUBW][None, :]
                      - xi[:, d][:, None])
                dx.append(xd)
                d2 = xd * xd if d2 is None else d2 + xd * xd
            if softening == "poly":
                t = d2 * jnp.sqrt(d2) + eps_v
            else:
                s = jnp.sqrt(d2) + eps_v
                t = s * s * s
            r = pl.reciprocal(t, approx=True)
            r = r * (jnp.asarray(2.0, xi.dtype) - t * r)
            w = (sel * mj_refs[k][0, w0:w0 + SUBW][None, :]) * r
            for d in range(dim):
                out_ref[:, d] += jnp.sum(w * dx[d], axis=1)

        for w0 in range(0, S, SUBW):
            fn = functools.partial(body, w0)
            if skip_empty:
                # (hi > lo) also skips nonzero lo == hi pads, exactly as
                # the single-window kernel's guard did
                pl.when((hi > jnp.maximum(lo, w0)) & (lo < w0 + SUBW))(fn)
            else:
                fn()

    for k in range(epg):
        one(k)


def _entries_lohi_packed_kernel(dim, eps, softening, S, skip_empty, epg,
                                sub_width, ent_ref, lohi_ref, xi_ref,
                                *rest):
    """Packed-j variant of _entries_lohi_kernel: coords + mass arrive as
    ONE (4, S) block per entry (rows 0..dim-1 coords, row dim mass) so
    each entry costs a single BlockSpec DMA instead of two (xjt + mj).
    The dma_pipeline microbench structure (probe_dma_pipeline.py kern_a)
    measured this layout at the per-entry ideal; probe_entry_overhead.py
    decomposes the production gap it recovers.  Math is bit-identical to
    the unpacked kernel (same op order).  sub_width: see
    _entries_lohi_kernel."""
    xm_refs = rest[:epg]
    out_ref = rest[epg + 1]
    e = pl.program_id(0)
    ent0 = ent_ref[e * epg]
    tid = ent0 >> 16
    prev = ent_ref[jnp.maximum(e * epg - epg, 0)] >> 16

    @pl.when((e == 0) | (tid != prev))
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    xi = xi_ref[:, :]
    eps_v = jnp.asarray(eps, xi.dtype)
    SUBW = sub_width if sub_width else S
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, SUBW), 1)

    def one(k):
        lohi = lohi_ref[e * epg + k]
        lo = lohi & 0xFFFF
        hi = lohi >> 16

        def body(w0):
            sel = ((lane + w0 >= lo) & (lane + w0 < hi)).astype(xi.dtype)
            xm = xm_refs[k]
            dx = []
            d2 = None
            for d in range(dim):
                xd = xm[d, w0:w0 + SUBW][None, :] - xi[:, d][:, None]
                dx.append(xd)
                d2 = xd * xd if d2 is None else d2 + xd * xd
            if softening == "poly":
                t = d2 * jnp.sqrt(d2) + eps_v
            else:
                s = jnp.sqrt(d2) + eps_v
                t = s * s * s
            r = pl.reciprocal(t, approx=True)
            r = r * (jnp.asarray(2.0, xi.dtype) - t * r)
            w = (sel * xm[dim, w0:w0 + SUBW][None, :]) * r
            for d in range(dim):
                out_ref[:, d] += jnp.sum(w * dx[d], axis=1)

        for w0 in range(0, S, SUBW):
            fn = functools.partial(body, w0)
            if skip_empty:
                pl.when((hi > jnp.maximum(lo, w0)) & (lo < w0 + SUBW))(fn)
            else:
                fn()

    for k in range(epg):
        one(k)


@functools.partial(
    jax.jit, static_argnames=("eps", "S", "tb", "interpret", "softening",
                              "skip_empty", "epg", "packed_j", "sub_width")
)
def entries_lohi_eval_pallas(
    xi: jnp.ndarray,
    mj: jnp.ndarray,
    xjt: jnp.ndarray,
    entries: jnp.ndarray,
    lohis: jnp.ndarray,
    eps: float,
    S: int,
    tb: int,
    interpret: bool = False,
    softening: str = "poly",
    n_real=None,
    skip_empty: bool = True,
    epg: int = 1,
    packed_j: bool = False,
    sub_width: int | None = None,
) -> jnp.ndarray:
    """Chunked self-describing entry evaluation (see the kernel).  entries
    and lohis are 1-D or (nchunks, E); entries must be sorted by tile id,
    with a per-tile sentinel (lo == hi) leading each tile's run.  Chunks
    past n_real are skipped with lax.cond (they are all padding).

    epg packs epg consecutive entries into one grid step (each step pays
    a fixed ~2 us of Mosaic sequencing, so packing divides it by epg);
    requires every tile's entry count to be an epg multiple (see
    merge_contiguous_entries' aligned recompaction) and epg | E.

    packed_j=True repacks the j side into one (4, npad) array (coords
    rows + mass row, zero row padding dim=2) so each entry costs ONE
    BlockSpec DMA instead of two; bit-exact same math.

    sub_width (None = whole block) guards the pair math per sub_width-
    wide subwindow so a wide S pays math only where entries are
    occupied; must divide S and be a multiple of 128."""
    dim = xi.shape[1]
    ntiles = xi.shape[0] // tb
    dtype = xi.dtype
    if sub_width is not None and sub_width >= S:
        sub_width = None
    if sub_width is not None and (S % sub_width or sub_width % 128):
        raise ValueError("sub_width must divide S and be a multiple of 128")
    if entries.ndim == 1:
        entries = entries[None, :]
        lohis = lohis[None, :]
    nchunks, E = entries.shape
    if E % epg:
        raise ValueError("epg must divide the chunk width")

    if packed_j:
        R = 4                       # (4, 128)-tiling-aligned HBM slices
        xm_pack = jnp.concatenate(
            [xjt, mj.reshape(1, -1),
             jnp.zeros((R - dim - 1, xjt.shape[1]), dtype)], axis=0)
        kernel = functools.partial(_entries_lohi_packed_kernel, dim,
                                   float(eps), softening, S, skip_empty,
                                   epg, sub_width)

        def jspec(k):
            return pl.BlockSpec(
                (R, S),
                lambda e, ent, lh, _k=k: (0, ent[e * epg + _k] & 0xFFFF))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(E // epg,),
            in_specs=[
                pl.BlockSpec((tb, dim),
                             lambda e, ent, lh: (ent[e * epg] >> 16, 0)),
                *[jspec(k) for k in range(epg)],
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((tb, dim), lambda e, ent, lh:
                                   (ent[e * epg] >> 16, 0)),
        )

        def one_chunk(ent_chunk, lohi_chunk):
            init = jnp.zeros((ntiles * tb, dim), dtype)
            return pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((ntiles * tb, dim), dtype),
                input_output_aliases={epg + 3: 0},
                cost_estimate=pl.CostEstimate(
                    flops=int(13 * tb) * int(E) * int(S),
                    bytes_accessed=int(E * (tb + S) * dim * 4),
                    transcendentals=int(tb) * int(E) * int(S),
                ),
                interpret=interpret,
            )(ent_chunk.astype(jnp.int32), lohi_chunk.astype(jnp.int32),
              xi, *([xm_pack] * epg), init)

        out = one_chunk(entries[0], lohis[0])
        for c in range(1, nchunks):
            if n_real is None:
                out = out + one_chunk(entries[c], lohis[c])
            else:
                out = jax.lax.cond(
                    jnp.asarray(c * E, jnp.int32) < n_real.astype(jnp.int32),
                    lambda o, ch, lh: o + one_chunk(ch, lh),
                    lambda o, ch, lh: o,
                    out, entries[c], lohis[c],
                )
        return out

    kernel = functools.partial(_entries_lohi_kernel, dim, float(eps),
                               softening, S, skip_empty, epg, sub_width)

    def jspec(k):
        return pl.BlockSpec(
            (dim, S), lambda e, ent, lh, _k=k: (0, ent[e * epg + _k] & 0xFFFF))

    def mspec(k):
        return pl.BlockSpec(
            (1, S), lambda e, ent, lh, _k=k: (0, ent[e * epg + _k] & 0xFFFF))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(E // epg,),
        in_specs=[
            pl.BlockSpec((tb, dim),
                         lambda e, ent, lh: (ent[e * epg] >> 16, 0)),
            *[jspec(k) for k in range(epg)],
            *[mspec(k) for k in range(epg)],
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tb, dim), lambda e, ent, lh:
                               (ent[e * epg] >> 16, 0)),
    )

    def one_chunk(ent_chunk, lohi_chunk):
        init = jnp.zeros((ntiles * tb, dim), dtype)
        mj2 = mj.reshape(1, -1)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ntiles * tb, dim), dtype),
            input_output_aliases={2 * epg + 3: 0},
            cost_estimate=pl.CostEstimate(
                flops=int(13 * tb) * int(E) * int(S),
                bytes_accessed=int(E * (tb + S) * dim * 4),
                transcendentals=int(tb) * int(E) * int(S),
            ),
            interpret=interpret,
        )(ent_chunk.astype(jnp.int32), lohi_chunk.astype(jnp.int32),
          xi, *([xjt] * epg), *([mj2] * epg), init)

    out = one_chunk(entries[0], lohis[0])
    for c in range(1, nchunks):
        if n_real is None:
            out = out + one_chunk(entries[c], lohis[c])
        else:
            out = jax.lax.cond(
                jnp.asarray(c * E, jnp.int32) < n_real.astype(jnp.int32),
                lambda o, ch, lh: o + one_chunk(ch, lh),
                lambda o, ch, lh: o,
                out, entries[c], lohis[c],
            )
    return out


@functools.partial(
    jax.jit, static_argnames=("eps", "S", "tb", "interpret", "softening")
)
def entries_tables_eval_pallas(
    xi: jnp.ndarray,
    mj: jnp.ndarray,
    xjt: jnp.ndarray,
    entries: jnp.ndarray,
    blk_tbl: jnp.ndarray,
    lohi_tbl: jnp.ndarray,
    eps: float,
    S: int,
    tb: int,
    interpret: bool = False,
    softening: str = "sqrt3",
    n_real=None,
) -> jnp.ndarray:
    """Chunked table-driven entry evaluation.  entries may be 1-D (one
    call) or 2-D (nchunks, E_chunk): chunks run as separate grid passes
    over the same tables and their partial outputs are SUMMED -- the
    output is zero-initialized via input/output aliasing so tiles absent
    from a chunk contribute nothing.  Entries must be sorted by tile id
    within and across chunks.

    n_real (traced scalar): number of ranked (non-tail-padding) entries.
    Chunks past it are SKIPPED with lax.cond -- the entry budget E_cap is
    a static worst case, and pad entries, though they skip the math,
    still pay a grid step + block DMA each (measured: the pad tail alone
    dominated the 3-D residual, making every entry-count optimization
    invisible).  With n_real the cost tracks the ACTUAL entry count at
    chunk granularity."""
    dim = xi.shape[1]
    ntiles = xi.shape[0] // tb
    dtype = xi.dtype
    if entries.ndim == 1:
        entries = entries[None, :]
    nchunks, E = entries.shape

    kernel = functools.partial(_entries_tables_kernel, dim, float(eps),
                               softening, S)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(E,),
        in_specs=[
            pl.BlockSpec((tb, dim), lambda e, ent, blk, lh: (ent[e] >> 16, 0)),
            pl.BlockSpec((dim, S),
                         lambda e, ent, blk, lh: (0, blk[ent[e] & 0xFFFF])),
            pl.BlockSpec((1, S),
                         lambda e, ent, blk, lh: (0, blk[ent[e] & 0xFFFF])),
            # zero-init operand: aliased to the output, never read by
            # the kernel -- stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tb, dim), lambda e, ent, blk, lh:
                               (ent[e] >> 16, 0)),
    )

    def one_chunk(ent_chunk):
        init = jnp.zeros((ntiles * tb, dim), dtype)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ntiles * tb, dim), dtype),
            input_output_aliases={6: 0},
            cost_estimate=pl.CostEstimate(
                flops=int(13 * tb) * int(E) * int(S),
                bytes_accessed=int(E * (tb + S) * dim * 4),
                transcendentals=int(tb) * int(E) * int(S),
            ),
            interpret=interpret,
        )(ent_chunk.astype(jnp.int32), blk_tbl.astype(jnp.int32),
          lohi_tbl.astype(jnp.int32), xi, xjt, mj.reshape(1, -1), init)

    out = one_chunk(entries[0])
    for c in range(1, nchunks):
        if n_real is None:
            out = out + one_chunk(entries[c])
        else:
            out = jax.lax.cond(
                jnp.asarray(c * E, jnp.int32) < n_real.astype(jnp.int32),
                lambda o, ch: o + one_chunk(ch),
                lambda o, ch: o,
                out, entries[c],
            )
    return out
