"""Kinetic / gravitational energy diagnostics.

System::calc_energies (src/system.h:62-79):
    KE =  0.5     * sum_i m_i * |v_i|^2
    PE = -0.5 * G * sum_i sum_{j != i} m_i * m_j / dist(x_i, x_j)
with dist = sqrt(dist2) + eps (vec.h:243-246). The PE inner loop skips
j == i explicitly in the reference; here the diagonal term m_i^2 / eps is
nonzero, so it is masked.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _pe_rows(idx: jnp.ndarray, xi: jnp.ndarray, mi: jnp.ndarray,
             m: jnp.ndarray, x: jnp.ndarray, eps) -> jnp.ndarray:
    d = x[None, :, :] - xi[:, None, :]
    r = jnp.sqrt(jnp.sum(d * d, axis=-1)) + jnp.asarray(eps, x.dtype)
    pair = mi[:, None] * m[None, :] / r
    n = m.shape[0]
    mask = idx[:, None] != jnp.arange(n)[None, :]
    return jnp.sum(jnp.where(mask, pair, jnp.zeros_like(pair)), axis=1)


@partial(jax.jit, static_argnames=("G", "eps", "chunk"))
def calc_energies(m: jnp.ndarray, x: jnp.ndarray, v: jnp.ndarray,
                  G: float, eps: float, chunk: int = 1024):
    """Returns (kinetic, gravitational) as 0-d arrays of the state dtype.
    On TPU with float32 the O(N^2) potential uses the tiled Pallas kernel;
    otherwise the chunked jnp path."""
    dtype = x.dtype
    ke = jnp.asarray(0.5, dtype) * jnp.sum(m * jnp.sum(v * v, axis=-1))

    from nbody_tpu.ops.pallas_allpairs import (
        pallas_available,
        potential_rowsums_pallas,
    )

    if pallas_available() and dtype == jnp.float32:
        pe_rows = potential_rowsums_pallas(m, x, eps)
        pe = jnp.asarray(-0.5 * G, dtype) * jnp.sum(pe_rows)
        return ke, pe

    n, dim = x.shape
    npad = -(-n // chunk) * chunk
    xpad = jnp.pad(x, ((0, npad - n), (0, 0)))
    mpad = jnp.pad(m, (0, npad - n))
    ipad = jnp.arange(npad)
    rows = (
        ipad.reshape(-1, chunk),
        xpad.reshape(-1, chunk, dim),
        mpad.reshape(-1, chunk),
    )
    pe_rows = jax.lax.map(lambda args: _pe_rows(*args, m, x, eps), rows)
    # padded rows have m = 0 so they contribute nothing
    pe = jnp.asarray(-0.5 * G, dtype) * jnp.sum(pe_rows)
    return ke, pe
