"""Vectorized Hilbert/Morton key computation.

Reimplements the reference's Skilling-transform Hilbert encoding
(src/vec.h:266-356) as branch-free uint32 array ops -- the scalar
bit-twiddling loop becomes an unrolled sequence of masked XORs over all
bodies at once (VPU-friendly, no gathers).

Two reference quirks are reproduced deliberately because they only affect
the sort order (locality / FP summation order), not physics:
  * the 3-D branch runs the Gray-code/undo passes with n = 2 (vec.h:328),
    i.e. only the first two axes are transformed, though the final bit
    interleave uses all three axes;
  * 2-D uses 32 bits/dim, 3-D uses 21 bits/dim (bvh.h:33).

Keys are up to 64 bits; TPUs have no fast uint64, so keys are returned as
a (hi, lo) pair of uint32 arrays ordered lexicographically (sort with
jnp.lexsort((lo, hi))).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

HILBERT_BITS = {2: 32, 3: 21}
# cells per dimension: 2^bits - 1 (bvh.h:33: 0xffffffff / 0x1fffff)
HILBERT_CELLS = {2: 0xFFFFFFFF, 3: 0x1FFFFF}


def _u32(v) -> jnp.ndarray:
    return jnp.asarray(v, jnp.uint32)


def skilling_transform(cols: list[jnp.ndarray], dim: int,
                       n_active: int | None = None) -> list[jnp.ndarray]:
    """The transpose-to-Hilbert pass (vec.h:299-356) on quantized coords.
    cols: per-dimension uint32 arrays. n_active=None mirrors the
    reference exactly, including n = 2 active axes in 3-D (the quirk
    above); n_active=dim gives the TRUE Skilling curve (used by the 3-D
    fast path for locality -- see hilbert_sort_perm)."""
    bits = HILBERT_BITS[dim]
    if n_active is None:
        n_active = 2  # the reference uses n=2 for BOTH dims (vec.h:302,328)
    x = [c.astype(jnp.uint32) for c in cols]

    M = 1 << (bits - 1)
    # Inverse undo
    Q = M
    while Q > 1:
        P = _u32(Q - 1)
        Qv = _u32(Q)
        for i in range(n_active):
            cond = (x[i] & Qv) != 0
            if i == 0:
                # if-branch inverts x[0]; else-branch is a no-op (t == 0)
                x[0] = jnp.where(cond, x[0] ^ P, x[0])
            else:
                t = (x[0] ^ x[i]) & P
                x0_new = jnp.where(cond, x[0] ^ P, x[0] ^ t)
                xi_new = jnp.where(cond, x[i], x[i] ^ t)
                x[0], x[i] = x0_new, xi_new
        Q >>= 1

    # Gray encode
    for i in range(1, n_active):
        x[i] = x[i] ^ x[i - 1]
    t = jnp.zeros_like(x[0])
    Q = M
    while Q > 1:
        cond = (x[n_active - 1] & _u32(Q)) != 0
        t = jnp.where(cond, t ^ _u32(Q - 1), t)
        Q >>= 1
    for i in range(n_active):
        x[i] = x[i] ^ t
    return x


def interleave_bits_u32pair(cols: list[jnp.ndarray], dim: int):
    """Bit interleave (vec.h:267-293) producing (hi, lo) uint32 words of
    the 64-bit key. Coordinate 0 occupies the most significant position in
    each bit group (bit_split(x[N-1]) | ... | bit_split(x[0]) << (N-1))."""
    bits = HILBERT_BITS[dim]
    hi = jnp.zeros_like(cols[0], dtype=jnp.uint32)
    lo = jnp.zeros_like(cols[0], dtype=jnp.uint32)
    one = _u32(1)
    for c in range(dim):
        xc = cols[c].astype(jnp.uint32)
        shift = dim - 1 - c
        for b in range(bits):
            p = b * dim + shift
            bit = (xc >> _u32(b)) & one
            if p < 32:
                lo = lo | (bit << _u32(p))
            else:
                hi = hi | (bit << _u32(p - 32))
    return hi, lo


def hilbert_key_u32pair(cell: jnp.ndarray, dim: int,
                        true_curve: bool = False):
    """Hilbert key of quantized cells (n, dim) uint32 -> (hi, lo).
    true_curve=True uses all `dim` axes in the Skilling passes (a real
    3-D Hilbert curve) instead of the reference's n=2 quirk."""
    cols = [cell[:, d] for d in range(dim)]
    cols = skilling_transform(cols, dim, n_active=dim if true_curve else None)
    return interleave_bits_u32pair(cols, dim)


def quantize(x: jnp.ndarray, xmin: jnp.ndarray, lengths: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Bucket positions onto the Hilbert grid (bvh.h:32-44):
    cell = uint32((x - min) / cell_size), cell_size = lengths / cells."""
    cells = jnp.asarray(float(HILBERT_CELLS[dim]), x.dtype)
    cell_size = lengths / cells
    return ((x - xmin[None, :]) / cell_size[None, :]).astype(jnp.uint32)


def hilbert_sort_perm(x: jnp.ndarray, xmin: jnp.ndarray, xmax: jnp.ndarray,
                      true_curve: bool = False) -> jnp.ndarray:
    """Permutation sorting bodies along the Hilbert curve (the TPU analog of
    hilbert_sort's sort-by-key, bvh.h:24-96: argsort + gather instead of a
    zip sort; jnp.lexsort is stable so equal keys keep body order).

    true_curve=True sorts along the REAL 3-D Hilbert curve instead of the
    reference's partial transform (vec.h:328 reuses n=2 in 3-D, so only
    two axes get the Gray-code passes -- a deterministic space-filling
    order but with much worse locality than real Hilbert).  Order only
    affects locality and FP summation order, never physics; the TPU fast
    path uses the true curve in 3-D because its windowed near field and
    node-box tightness are locality-bound.  In 2-D the reference curve
    IS the true curve, so the flag is a no-op."""
    n, dim = x.shape
    cell = quantize(x, xmin, xmax - xmin, dim)
    hi, lo = hilbert_key_u32pair(cell, dim, true_curve=true_curve)
    return jnp.lexsort((lo, hi))


# -- scalar oracle (used by tests) -------------------------------------------

def hilbert_key_scalar(cell: np.ndarray, dim: int,
                       true_curve: bool = False) -> int:
    """Direct scalar transcription of hilbert() (vec.h:299-356) for testing
    the vectorized version. cell: (dim,) uint32."""
    bits = HILBERT_BITS[dim]
    n = dim if true_curve else 2  # default: reference quirk
    x = [int(cell[d]) & 0xFFFFFFFF for d in range(dim)]
    M = 1 << (bits - 1)
    Q = M
    while Q > 1:
        P = Q - 1
        for i in range(n):
            if x[i] & Q:
                x[0] ^= P
            else:
                t = (x[0] ^ x[i]) & P
                x[0] ^= t
                x[i] ^= t
        Q >>= 1
    for i in range(1, n):
        x[i] ^= x[i - 1]
    t = 0
    Q = M
    while Q > 1:
        if x[n - 1] & Q:
            t ^= Q - 1
        Q >>= 1
    for i in range(n):
        x[i] ^= t
    # interleave
    key = 0
    for c in range(dim):
        shift = dim - 1 - c
        for b in range(bits):
            key |= ((x[c] >> b) & 1) << (b * dim + shift)
    return key
