"""Tiled Pallas all-pairs gravity kernel for TPU.

TPU-native replacement for the reference's O(N^2) stdpar hot loop
(src/all_pairs.h:14-27). The pairwise interaction space is tiled into a
(i-tile, j-tile) grid; each i-tile of bodies stays resident while j-tiles
stream through VMEM, accumulating accelerations in fp32 -- the structural
analog of the reference's per-body j-loop, but laid out so the (TI, TJ)
pairwise tiles map onto the 8x128 VPU with bodies along lanes.

Math is the exact reference formula (vec.h:249-252):
    a_i = G * sum_j m_j * (x_j - x_i) / (d2^(3/2) + eps)
The diagonal and padding need no masks: the j == i term has a zero
numerator, and padded bodies carry m = 0.

Layout choices (see /opt/skills/guides/pallas_guide.md):
  * positions are passed twice -- row-major (N, dim) for the stationary
    i-tile (per-dim columns are (TI, 1) sublane vectors) and transposed
    (dim, N) for the streaming j-tile (per-dim rows are (1, TJ) lane
    vectors) -- so no in-kernel transposes are needed;
  * the grid is (ni, nj) with j innermost; the output block depends only on
    i, so XLA revisits it across the j axis and the kernel accumulates
    in-place, initializing at j == 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _allpairs_kernel(dim: int, eps: float, exact: bool, fast: bool,
                     far_thresh: float, softening: str,
                     xi_ref, xjt_ref, mj_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    xi = xi_ref[:, :]          # (TI, dim)
    eps_v = jnp.asarray(eps, xi.dtype)

    # pairwise squared distance, built per-dimension to stay in (TI, TJ)
    # tiles. NOTE: computed from coordinate differences on purpose -- the
    # |xi|^2+|xj|^2-2xi.xj MXU formulation catastrophically cancels for
    # close pairs and r^-3 amplifies the error (measured 100x force errors;
    # round-2 measured the hybrid MXU kernel 2.7x SLOWER anyway -- the
    # dim+1-column matmuls waste ~97% of the MXU lanes).
    dx = []
    d2 = None
    for d in range(dim):
        xd = xjt_ref[d, :][None, :] - xi[:, d][:, None]   # (TI, TJ)
        dx.append(xd)
        d2 = xd * xd if d2 is None else d2 + xd * xd

    def softened_w():
        # w = m_j / (d2*sqrt(d2) + eps); self/coincident pairs -> 0 numerator.
        # softening="sqrt3" uses the octree quirk (sqrt(d2)+eps)^3 instead
        # (octree.h:156-160) -- used by the octree engines' exact fallback.
        if softening == "sqrt3":
            sq = jnp.sqrt(d2) + eps_v
            t = sq * sq * sq
        else:
            t = d2 * jnp.sqrt(d2) + eps_v
        if exact:
            return mj_ref[0, :][None, :] / t
        # approximate reciprocal + one Newton step: <=1 ulp from the exact
        # division (measured 1.7e-7 max relative) at ~30% higher throughput
        r = pl.reciprocal(t, approx=True)
        r = r * (jnp.asarray(2.0, xi.dtype) - t * r)
        return mj_ref[0, :][None, :] * r

    def accumulate(w):
        for d in range(dim):
            out_ref[:, d] += jnp.sum(w * dx[d], axis=1)

    if not fast:
        accumulate(softened_w())
    else:
        # adaptive per-tile: if every pair in the tile satisfies
        # d2^1.5 > eps/tol, dropping the +eps softening changes w by
        # less than tol relative -- use the shorter rsqrt^3 chain.
        d2min = jnp.min(d2)

        @pl.when(d2min > jnp.asarray(far_thresh, xi.dtype))
        def _():
            r = jax.lax.rsqrt(d2)
            accumulate((mj_ref[0, :][None, :] * r) * (r * r))

        @pl.when(d2min <= jnp.asarray(far_thresh, xi.dtype))
        def _():
            accumulate(softened_w())


@functools.partial(
    jax.jit,
    static_argnames=("G", "eps", "tile_i", "tile_j", "interpret", "exact",
                     "fast", "fast_tol"),
)
def allpairs_accel_pallas(
    m: jnp.ndarray,
    x: jnp.ndarray,
    G: float,
    eps: float,
    tile_i: int = 512,
    tile_j: int = 2048,
    interpret: bool = False,
    exact: bool = False,
    fast: bool = False,
    fast_tol: float = 1e-6,
) -> jnp.ndarray:
    """All-pairs accelerations via the tiled Pallas kernel.

    m: (n,), x: (n, dim). Returns (n, dim) in x.dtype. float32 only (the
    TPU has no native f64; double runs use the jnp path). exact=True uses
    a true division for the softened r^-3 instead of the Newton-refined
    reciprocal (1 ulp difference, ~30% slower). fast=True lets tiles whose
    minimum pair distance satisfies d2^1.5 > eps/fast_tol drop the +eps
    softening (per-pair relative error < fast_tol) and use a shorter
    rsqrt^3 chain; near tiles keep the exact softened path, decided per
    tile at runtime.
    """
    n, dim = x.shape
    dtype = x.dtype
    if fast and dim >= 3:
        # the two pl.when branches extend the (TI, TJ) temporaries'
        # liveness; at 512x2048 3-D that is 17 MB of scoped VMEM vs the
        # 16 MB limit (the round-2 BENCH failure: the fast variant never
        # compiled at N=2^20).  Halving TJ keeps both branches resident.
        tile_j = min(tile_j, 1024)
    npad = _round_up(max(n, tile_i, tile_j), max(tile_i, tile_j))
    xp = jnp.pad(x, ((0, npad - n), (0, 0)))
    mp = jnp.pad(m, (0, npad - n)).reshape(1, npad)
    xt = xp.T  # (dim, npad)

    # threshold: d2 > (eps/tol)^(2/3) guarantees eps/d2^1.5 < tol; tiles
    # containing self-pairs (d2=0) always fall back to the softened chain
    far_thresh = float((eps / fast_tol) ** (2.0 / 3.0))
    grid = (npad // tile_i, npad // tile_j)
    kernel = functools.partial(_allpairs_kernel, dim, float(eps), exact,
                               bool(fast), far_thresh, "poly")

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_i, dim), lambda i, j: (i, 0)),
            pl.BlockSpec((dim, tile_j), lambda i, j: (0, j)),
            pl.BlockSpec((1, tile_j), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((tile_i, dim), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((npad, dim), dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(12 * npad) * int(npad),
            bytes_accessed=int(npad * dim * 4 * (2 + grid[0])),
            transcendentals=int(npad) * int(npad),
        ),
        interpret=interpret,
    )(xp, xt, mp)
    return jnp.asarray(G, dtype) * out[:n]


@functools.partial(
    jax.jit,
    static_argnames=("eps", "tile_i", "tile_j", "interpret", "exact", "fast",
                     "softening"),
)
def allpairs_block_pallas(
    xi: jnp.ndarray,
    mj: jnp.ndarray,
    xj: jnp.ndarray,
    eps: float,
    tile_i: int = 512,
    tile_j: int = 2048,
    interpret: bool = False,
    exact: bool = False,
    fast: bool = False,
    softening: str = "poly",
) -> jnp.ndarray:
    """Raw (G-less) accelerations of the `xi` rows against the (mj, xj)
    body block -- the Pallas analog of allpairs.accel_rows_raw, used as
    the per-rotation block force inside the multi-chip ppermute ring
    (parallel/ring.py).  Same per-pair math as the square kernel."""
    ni_, dim = xi.shape
    nj_ = xj.shape[0]
    dtype = xi.dtype
    nip = _round_up(max(ni_, tile_i), tile_i)
    njp = _round_up(max(nj_, tile_j), tile_j)
    xip = jnp.pad(xi, ((0, nip - ni_), (0, 0)))
    xjp = jnp.pad(xj, ((0, njp - nj_), (0, 0)))
    mjp = jnp.pad(mj, (0, njp - nj_)).reshape(1, njp)

    far_thresh = float((eps / 1e-6) ** (2.0 / 3.0))
    kernel = functools.partial(_allpairs_kernel, dim, float(eps), exact,
                               bool(fast), far_thresh, softening)
    out = pl.pallas_call(
        kernel,
        grid=(nip // tile_i, njp // tile_j),
        in_specs=[
            pl.BlockSpec((tile_i, dim), lambda i, j: (i, 0)),
            pl.BlockSpec((dim, tile_j), lambda i, j: (0, j)),
            pl.BlockSpec((1, tile_j), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((tile_i, dim), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nip, dim), dtype),
        interpret=interpret,
    )(xip, xjp.T, mjp)
    return out[:ni_]


def _pe_kernel(eps: float, tile_i: int, tile_j: int, mi_ref, xi_ref, xjt_ref,
               mj_ref, out_ref):
    """Per-body potential-energy partial sums: out_i = m_i * sum_{j != i}
    m_j / (sqrt(d2) + eps). The diagonal is masked explicitly -- unlike the
    force kernel its numerator does not vanish (system.h:67-76 skips j==i)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    xi = xi_ref[:, :]
    dim = xi.shape[1]
    eps_v = jnp.asarray(eps, xi.dtype)
    d2 = None
    for d in range(dim):
        xd = xjt_ref[d, :][None, :] - xi[:, d][:, None]
        d2 = xd * xd if d2 is None else d2 + xd * xd
    r = jnp.sqrt(d2) + eps_v
    w = mj_ref[0, :][None, :] / r
    # mask the diagonal: global row == global col
    rows = i * tile_i + jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)
    cols = j * tile_j + jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
    w = jnp.where(rows == cols, jnp.zeros_like(w), w)
    out_ref[:, 0] += mi_ref[:, 0] * jnp.sum(w, axis=1)


@functools.partial(
    jax.jit, static_argnames=("eps", "tile_i", "tile_j", "interpret")
)
def potential_rowsums_pallas(m, x, eps: float, tile_i: int = 512,
                             tile_j: int = 2048, interpret: bool = False):
    """Returns per-body pe_i = m_i * sum_{j != i} m_j / dist(i, j); the
    total PE is -0.5 * G * sum(pe). Used by calc_energies on TPU."""
    n, dim = x.shape
    dtype = x.dtype
    npad = _round_up(max(n, tile_i, tile_j), max(tile_i, tile_j))
    xp = jnp.pad(x, ((0, npad - n), (0, 0)))
    mp = jnp.pad(m, (0, npad - n))
    grid = (npad // tile_i, npad // tile_j)
    kernel = functools.partial(_pe_kernel, float(eps), tile_i, tile_j)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_i, dim), lambda i, j: (i, 0)),
            pl.BlockSpec((dim, tile_j), lambda i, j: (0, j)),
            pl.BlockSpec((1, tile_j), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((npad, 1), dtype),
        interpret=interpret,
    )(mp.reshape(npad, 1), xp, xp.T, mp.reshape(1, npad))
    return out[:n, 0]
