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
