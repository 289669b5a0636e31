"""Hybrid MXU/VPU all-pairs gravity kernel.

The round-1 kernel (pallas_allpairs.py) computes everything per-dimension
on the VPU: ~13 VPU slots per pair, which caps throughput at ~2e11
interactions/s on a v5e -- 5x short of the 1e12 north star.  This kernel
moves the two O(N^2)-shaped dense contractions onto the MXU for tiles
where that is numerically safe, and decides safety ADAPTIVELY per
(i-tile, j-tile) pair inside the kernel:

  1. pairwise squared distance, via the augmented quadratic form
         d2 = |yi|^2 + |yj|^2 - 2 yi.yj
            = [yi, 1, |yi|^2] @ [[-2 yj], [|yj|^2], [1]]    (one K=dim+2 matmul)
     in coordinates y = x - (c_i + c_j)/2 centered on the MIDPOINT of
     the two tile centroids, so |y|^2 -- and with it the quadratic
     form's cancellation floor eps*|y|^2 -- scales with the tile pair's
     own geometry instead of the absolute position magnitude;
  2. the force accumulation, via
         a_i += (W @ [m yj, m])[:, :dim] - yi * (W @ [m yj, m])[:, dim]
     finalized per tile in the same frame, so no per-dimension (TI, TJ)
     intermediate ever exists.

What stays on the VPU is the irreducible per-pair scalar chain
w = 1 / (d2*sqrt(d2) + eps) (vec.h:249-252, reproduced exactly) plus one
min-reduction.

Adaptive near/far split.  Both MXU forms catastrophically cancel for
CLOSE pairs: the quadratic form's absolute error ~eps*|y|^2 swamps a
tiny d2, and the S1 - yi*S0 accumulation splits a huge near-term
w ~ 1/eps across two cancelling sums (the round-1 builder measured 100x
force errors for a pure-MXU kernel).  So each tile pair computes
d2min = min(d2) and falls back to the fully-exact per-dimension path
(exact Sterbenz dx, direct per-dimension accumulation -- the round-1
kernel's math) whenever

    d2min <= near_factor * eps_f32 * (max|yi|^2 + max|yj|^2).

The trigger is self-referential but safe: d2's own error is a few
eps*|y|^2, orders below the near_factor=1e5 margin.  Pairs just above
the threshold see a d2 relative error of at most ~4/near_factor, i.e.
~4e-5 force error on pairs whose contribution is already sub-dominant.
Because the criterion is per-tile-geometry-relative, it subsumes the
sorted-diagonal band AND Hilbert-seam stragglers, and stays correct on
UNSORTED input (sorting just shrinks how many tiles trip the slow
branch -- from ~all at N=1M unsorted to the near-diagonal few percent
when Hilbert-sorted, so callers should sort for speed, not correctness).

Modes:
  fast=False  (default) far tiles use the exact softened chain and a
              split-fp32 (hi/lo bf16) accumulation: ~2^-16 products.
  fast=True   far tiles with d2min > far_thresh also drop the +eps
              softening (relative error < eps/far_thresh^1.5) and
              accumulate in bf16.

End-to-end accuracy is pinned by tests/test_mxu_kernel.py against an
f64 oracle, alongside the reference binary's own fp32 error at equal N.

Reference semantics: src/all_pairs.h:14-27 (per-body j-loop),
vec.h:249-252 (dist3 softening).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _split_f32(w):
    """Split fp32 into two bf16-representable halves: w = hi + lo with
    |lo| <= 2^-8 |w|.  Two DEFAULT-precision (bf16) matmuls on (hi, lo)
    give ~2^-16-relative products -- fp32-grade for this accumulation --
    at 2 MXU passes instead of HIGHEST's 6."""
    hi = w.astype(jnp.bfloat16).astype(jnp.float32)
    lo = w - hi
    return hi, lo


def _mxu_kernel(dim, eps, tile_i, tile_j, near_factor, fast, far_thresh,
                xi_ref, xjt_ref, mjt_ref, out_ref):
    """Grid (ni, nj), j innermost; out block (TI, dim) revisited over j.

    xi_ref   (TI, dim)   stationary i-tile positions
    xjt_ref  (dim, TJ)   streaming j-tile positions, transposed
    mjt_ref  (1, TJ)     streaming j-tile masses
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    f32 = jnp.float32
    eps_v = jnp.asarray(eps, f32)
    # tile-pair midpoint centering, computed from the resident tiles (any
    # shift is algebraically exact; the midpoint minimizes |y|^2 and with
    # it the quadratic form's eps*|y|^2 cancellation floor).  Padding
    # bodies at the origin only shift c slightly -- harmless.
    ci = jnp.mean(xi_ref[:, :], axis=0)       # (dim,)
    cj = jnp.mean(xjt_ref[:, :], axis=1)      # (dim,)
    c = 0.5 * (ci + cj)                       # (dim,) tile-pair midpoint
    yi = xi_ref[:, :] - c[None, :]            # (TI, dim)
    yjt = xjt_ref[:, :] - c[:, None]          # (dim, TJ)
    mj = mjt_ref[0, :]                        # (TJ,)

    zi = jnp.sum(yi * yi, axis=1)             # (TI,)
    zj = jnp.sum(yjt * yjt, axis=0)           # (TJ,)
    ones_j = jnp.ones((1, tile_j), f32)

    # MXU quadratic form: [yi, 1, zi] @ [[-2 yjt], [zj], [1]]
    a_op = jnp.concatenate(
        [yi, jnp.ones((tile_i, 1), f32), zi[:, None]], axis=1
    )                                          # (TI, dim+2)
    b_op = jnp.concatenate(
        [-2.0 * yjt, zj[None, :], ones_j], axis=0
    )                                          # (dim+2, TJ)
    d2 = jax.lax.dot_general(
        a_op, b_op, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d2min = jnp.min(d2)
    near_lim = jnp.asarray(near_factor * eps, f32) * (
        jnp.max(zi) + jnp.max(zj)
    )
    is_near = d2min <= near_lim

    def compute_w(d2v):
        """w = 1 / (d2^1.5 + eps), self/coincident pairs zeroed."""
        d2c = jnp.maximum(d2v, 0.0)
        t = d2c * jnp.sqrt(d2c) + eps_v
        r = pl.reciprocal(t, approx=True)
        r = r * (2.0 - t * r)                  # one Newton step: <=1 ulp
        return jnp.where(d2c > 0.0, r, 0.0)

    @pl.when(is_near)
    def _():
        # fully exact per-dimension path on the RAW coordinates: for close
        # pairs xj - xi is Sterbenz-exact, and the direct accumulation
        # never splits large near-terms across cancelling sums.  (The
        # centered yi/yjt must NOT be used here: rounding xi - c costs
        # ~ulp(|y|) per coordinate, which swamps a tiny dx -- measured
        # 1.6e-2 force errors on far-from-origin clusters.)
        dx = []
        d2e = None
        for d in range(dim):
            xd = xjt_ref[d, :][None, :] - xi_ref[:, d][:, None]
            dx.append(xd)
            d2e = xd * xd if d2e is None else d2e + xd * xd
        w = compute_w(d2e) * mj[None, :]
        for d in range(dim):
            out_ref[:, d] += jnp.sum(w * dx[d], axis=1)

    bacc = jnp.concatenate(
        [yjt * mj[None, :], mj[None, :] * ones_j], axis=0
    )                                          # (dim+1, TJ)
    dn = (((1,), (1,)), ((), ()))

    def far_accumulate(s):
        # per-tile finalize in the midpoint frame: a += S1 - yi * S0;
        # w is bounded on far tiles so the subtraction is benign
        out_ref[:, :] += s[:, :dim] - yi * s[:, dim:]

    def far_split(d2v):
        w_hi, w_lo = _split_f32(compute_w(d2v))
        s = jax.lax.dot_general(w_hi, bacc, dimension_numbers=dn,
                                preferred_element_type=f32)
        s = s + jax.lax.dot_general(w_lo, bacc, dimension_numbers=dn,
                                    preferred_element_type=f32)
        far_accumulate(s)

    if not fast:
        @pl.when(jnp.logical_not(is_near))
        def _():
            far_split(d2)
    else:
        @pl.when(jnp.logical_not(is_near))
        def _():
            @pl.when(d2min > far_thresh)
            def _():
                # provably-far tile: drop +eps, accumulate in bf16
                r = jax.lax.rsqrt(d2)
                w = r * r * r
                s = jax.lax.dot_general(
                    w.astype(jnp.bfloat16), bacc.astype(jnp.bfloat16),
                    dimension_numbers=dn, preferred_element_type=f32,
                )
                far_accumulate(s)

            @pl.when(d2min <= far_thresh)
            def _():
                far_split(d2)


@functools.partial(
    jax.jit,
    static_argnames=("G", "eps", "tile_i", "tile_j", "near_factor", "fast",
                     "far_thresh", "interpret"),
)
def allpairs_accel_mxu(
    m: jnp.ndarray,
    x: jnp.ndarray,
    G: float,
    eps: float,
    tile_i: int = 512,
    tile_j: int = 1024,
    near_factor: float = 1e5,
    fast: bool = False,
    far_thresh: float = 0.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """All-pairs accelerations via the adaptive hybrid MXU kernel.

    fp32 only (f64 runs use the jnp path).  Correct on any input order;
    Hilbert-sort the bodies first so only a few percent of tiles trip
    the exact near branch.  `far_thresh` is the squared distance above
    which fast=True tiles drop the +eps softening.
    """
    n, dim = x.shape
    if x.dtype != jnp.float32:
        raise ValueError("MXU kernel is fp32-only; use the jnp path for f64")
    npad = _round_up(max(n, tile_i, tile_j), max(tile_i, tile_j))
    xp = jnp.pad(x, ((0, npad - n), (0, 0)))
    mp = jnp.pad(m, (0, npad - n)).reshape(1, npad)
    xt = xp.T

    ni = npad // tile_i
    nj = npad // tile_j

    grid = (ni, nj)
    kernel = functools.partial(
        _mxu_kernel, dim, float(eps), tile_i, tile_j, float(near_factor),
        bool(fast), float(far_thresh),
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_i, dim), lambda i, j: (i, 0)),
            pl.BlockSpec((dim, tile_j), lambda i, j: (0, j)),
            pl.BlockSpec((1, tile_j), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((tile_i, dim), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((npad, dim), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(10 * npad) * int(npad),
            bytes_accessed=int(npad * dim * 4 * (2 + grid[0])),
            transcendentals=int(npad) * int(npad),
        ),
        interpret=interpret,
    )(xp, xt, mp)
    return jnp.asarray(G, jnp.float32) * out[:n]
