"""Accuracy pins for the hybrid MXU all-pairs kernel (interpret mode).

The MXU kernel (ops/pallas_allpairs_mxu.py) computes far-tile pairwise
distances via the centered quadratic form and accumulates via two
matmuls; near tiles fall back to the exact per-dimension math.  These
tests compare it against an f64 dense oracle and require its error to
stay within a small factor of the plain fp32 reference-math error at the
same N -- i.e. the MXU restructuring must not cost meaningful accuracy,
on sorted AND unsorted inputs (the near/far trigger is geometry-relative,
so correctness may not depend on body order).

Reference math: src/all_pairs.h:14-27, vec.h:249-252.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nbody_tpu.ops.allpairs import allpairs_accel_dense
from nbody_tpu.ops.pallas_allpairs_mxu import allpairs_accel_mxu


def _oracle_and_f32_err(m, x, eps):
    """f64 dense oracle + the error of plain fp32 reference math vs it."""
    a64 = np.asarray(
        allpairs_accel_dense(
            jnp.asarray(m, jnp.float64), jnp.asarray(x, jnp.float64),
            1.0, eps,
        )
    )
    a32 = np.asarray(
        allpairs_accel_dense(jnp.asarray(m), jnp.asarray(x), 1.0, eps)
    ).astype(np.float64)
    scale = np.linalg.norm(a64, axis=1) + np.abs(a64).max() * 1e-3
    err32 = (np.linalg.norm(a32 - a64, axis=1) / scale).max()
    return a64, scale, err32


def _mxu_err(m, x, eps, a64, scale, **kw):
    a = np.asarray(
        allpairs_accel_mxu(
            jnp.asarray(m), jnp.asarray(x), 1.0, eps,
            tile_i=128, tile_j=128, interpret=True, **kw,
        )
    ).astype(np.float64)
    return (np.linalg.norm(a - a64, axis=1) / scale).max()


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("layout", ["uniform", "clustered"])
def test_mxu_matches_f64_oracle(dim, layout, f32_eps):
    rng = np.random.default_rng(3)
    n = 300
    m = rng.uniform(0.1, 1.0, n).astype(np.float32)
    if layout == "uniform":
        x = rng.uniform(-1.0, 1.0, (n, dim)).astype(np.float32)
    else:
        # tight clusters far from the origin: stresses both the
        # quadratic-form cancellation (large |x|, small d) and the
        # centered-frame fix for it
        centers = rng.uniform(-100.0, 100.0, (5, dim))
        x = (centers[rng.integers(0, 5, n)]
             + rng.normal(0.0, 1e-2, (n, dim))).astype(np.float32)
    a64, scale, err32 = _oracle_and_f32_err(m, x, f32_eps)
    err_mxu = _mxu_err(m, x, f32_eps, a64, scale)
    # no more than 4x the plain-fp32 error, with an absolute floor at the
    # kernel's design bound (~4/near_factor relative on pairs just past
    # the near threshold, see pallas_allpairs_mxu.py docstring)
    assert err_mxu <= max(4.0 * err32, 6e-5), (err_mxu, err32)


def test_mxu_correct_on_unsorted_input(f32_eps):
    """Body order must not matter: the near/far split is per-tile-geometry,
    not position-in-array (shuffled bodies => almost every tile mixes near
    and far pairs and must trip the exact branch)."""
    rng = np.random.default_rng(11)
    n = 256
    m = rng.uniform(0.1, 1.0, n).astype(np.float32)
    x = rng.uniform(-1.0, 1.0, (n, 2)).astype(np.float32)
    a64, scale, err32 = _oracle_and_f32_err(m, x, f32_eps)
    perm = rng.permutation(n)
    a_p = np.asarray(
        allpairs_accel_mxu(
            jnp.asarray(m[perm]), jnp.asarray(x[perm]), 1.0, f32_eps,
            tile_i=128, tile_j=128, interpret=True,
        )
    ).astype(np.float64)
    err = (np.linalg.norm(a_p - a64[perm], axis=1) / scale[perm]).max()
    assert err <= max(4.0 * err32, 6e-5), (err, err32)


def test_mxu_fast_mode_bounded_error(f32_eps):
    """fast=True drops +eps softening on provably-far tiles and uses bf16
    accumulation there; error stays within a coarser but bounded budget."""
    rng = np.random.default_rng(7)
    n = 256
    m = rng.uniform(0.1, 1.0, n).astype(np.float32)
    x = rng.uniform(-1.0, 1.0, (n, 3)).astype(np.float32)
    a64, scale, _ = _oracle_and_f32_err(m, x, f32_eps)
    err = _mxu_err(m, x, f32_eps, a64, scale, fast=True, far_thresh=1e-2)
    assert err <= 5e-3, err
