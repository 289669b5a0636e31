"""O(N^2) all-pairs gravity in pure jnp.

TPU-native rewrite of all_pairs_force / all_pairs_collapsed_force
(src/all_pairs.h:14-50). The reference parallelizes over bodies (or over N^2
pairs with atomic accumulation); here the pairwise interaction is a dense
broadcasted computation that XLA tiles over the VPU, evaluated in row-chunks
so memory stays O(n * chunk). The Pallas VMEM-tiled version of the same math
lives in nbody_tpu.ops.pallas_allpairs; this module is also the sequential
oracle (the analog of the reference's -DSEQUENTIAL build, execution.h:4-6).

Math (all_pairs.h:17-26):
    a_i = G * sum_j m_j * (x_j - x_i) / (dist2(i,j)^(3/2) + eps)
The j == i term is exactly zero because the numerator vanishes while the
denominator is eps, so no diagonal masking is needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from nbody_tpu.ops.geometry import dist3_from_d2


def accel_rows_raw(xi: jnp.ndarray, m: jnp.ndarray, x: jnp.ndarray, eps) -> jnp.ndarray:
    """Unscaled (no G) accelerations for query positions xi (k, dim) against
    bodies (m: (n,), x: (n, dim)). Returns (k, dim). Shared by the chunked
    oracle and the ring-sharded partial sums."""
    d = x[None, :, :] - xi[:, None, :]            # (k, n, dim)
    d2 = jnp.sum(d * d, axis=-1)                  # (k, n)
    w = m[None, :] / dist3_from_d2(d2, eps)       # (k, n)
    return jnp.einsum("kn,knd->kd", w, d)         # (k, dim)


def _accel_rows(xi: jnp.ndarray, m: jnp.ndarray, x: jnp.ndarray, G, eps) -> jnp.ndarray:
    return jnp.asarray(G, xi.dtype) * accel_rows_raw(xi, m, x, eps)


def allpairs_accel_dense(m: jnp.ndarray, x: jnp.ndarray, G: float, eps: float) -> jnp.ndarray:
    """Full (n, n) broadcast. O(n^2) memory; the small-n oracle."""
    return _accel_rows(x, m, x, G, eps)


@partial(jax.jit, static_argnames=("G", "eps", "chunk"))
def allpairs_accel(m: jnp.ndarray, x: jnp.ndarray, G: float, eps: float,
                   chunk: int = 1024) -> jnp.ndarray:
    """Row-chunked all-pairs: O(chunk * n) memory, identical values to the
    dense form (same j-summation order per row)."""
    n, dim = x.shape
    if n <= chunk:
        return allpairs_accel_dense(m, x, G, eps)
    npad = -(-n // chunk) * chunk
    xpad = jnp.pad(x, ((0, npad - n), (0, 0)))
    xi_blocks = xpad.reshape(npad // chunk, chunk, dim)
    a_blocks = jax.lax.map(lambda xi: _accel_rows(xi, m, x, G, eps), xi_blocks)
    return a_blocks.reshape(npad, dim)[:n]


def allpairs_collapsed_accel(m: jnp.ndarray, x: jnp.ndarray, a_old: jnp.ndarray,
                             G: float, eps: float, chunk: int = 1024,
                             fix_z: bool = False) -> jnp.ndarray:
    """all-pairs-collapsed (src/all_pairs.h:29-50): same pairwise math,
    expressed pair-parallel in the reference with atomic accumulation. The
    atomics only ever touch components [0] and [1] (all_pairs.h:37-38,47-48),
    so in 3-D the z-acceleration is never updated -- a latent reference
    quirk. We replicate it faithfully by default (z keeps its previous
    value, which stays 0 from initialization); pass fix_z=True for the
    corrected physics. Summation order of the reference's atomics is
    nondeterministic, so only tolerance-level parity is meaningful.
    """
    a_new = allpairs_accel(m, x, G, eps, chunk=chunk)
    if fix_z or x.shape[1] <= 2:
        return a_new
    return jnp.concatenate([a_new[:, :2], a_old[:, 2:]], axis=1)
