"""All-pairs force engines vs the naive per-pair oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from nbody_tpu.ops.allpairs import (
    allpairs_accel,
    allpairs_accel_dense,
    allpairs_collapsed_accel,
)
from nbody_tpu.ops.pallas_allpairs import allpairs_accel_pallas
from tests.conftest import naive_allpairs


def _random_system(n, dim, dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    m = rng.uniform(0.1, 1.0, n).astype(dtype)
    x = rng.uniform(-1.0, 1.0, (n, dim)).astype(dtype)
    return m, x


@pytest.mark.parametrize("dim", [2, 3])
def test_dense_matches_naive(dim, f32_eps):
    m, x = _random_system(64, dim)
    a_ref = naive_allpairs(m.astype(np.float64), x.astype(np.float64), 1.0,
                           np.float64(f32_eps))
    a = np.asarray(allpairs_accel_dense(jnp.asarray(m), jnp.asarray(x), 1.0, f32_eps))
    scale = np.max(np.abs(a_ref)) + 1e-30
    assert np.max(np.abs(a - a_ref)) / scale < 1e-5


@pytest.mark.parametrize("dim", [2, 3])
def test_chunked_matches_dense(dim, f32_eps):
    m, x = _random_system(200, dim)
    a_d = np.asarray(allpairs_accel_dense(jnp.asarray(m), jnp.asarray(x), 2.5, f32_eps))
    a_c = np.asarray(allpairs_accel(jnp.asarray(m), jnp.asarray(x), 2.5, f32_eps, chunk=64))
    scale = np.max(np.abs(a_d)) + 1e-30
    assert np.max(np.abs(a_c - a_d)) / scale < 1e-6


def test_self_interaction_is_zero(f32_eps):
    """The j == i term must vanish exactly (zero numerator over eps)."""
    m = np.array([5.0], dtype=np.float32)
    x = np.array([[0.3, -0.2]], dtype=np.float32)
    a = np.asarray(allpairs_accel_dense(jnp.asarray(m), jnp.asarray(x), 1.0, f32_eps))
    assert np.all(a == 0.0)


def test_coincident_bodies_no_nan(f32_eps):
    m = np.array([1.0, 2.0], dtype=np.float32)
    x = np.array([[0.5, 0.5], [0.5, 0.5]], dtype=np.float32)
    a = np.asarray(allpairs_accel_dense(jnp.asarray(m), jnp.asarray(x), 1.0, f32_eps))
    assert np.all(np.isfinite(a))
    assert np.all(a == 0.0)


@pytest.mark.parametrize("dim", [2, 3])
def test_pallas_interpret_matches_dense(dim, f32_eps):
    m, x = _random_system(100, dim)
    a_d = np.asarray(allpairs_accel_dense(jnp.asarray(m), jnp.asarray(x), 1.0, f32_eps))
    a_p = np.asarray(
        allpairs_accel_pallas(jnp.asarray(m), jnp.asarray(x), 1.0, f32_eps,
                              tile_i=128, tile_j=128, interpret=True)
    )
    scale = np.max(np.abs(a_d)) + 1e-30
    assert np.max(np.abs(a_p - a_d)) / scale < 1e-5


def test_collapsed_freezes_z(f32_eps):
    """3-D collapsed: z-acceleration keeps its previous value
    (all_pairs.h:37-48 only touch components [0] and [1])."""
    m, x = _random_system(32, 3)
    a_old = np.full((32, 3), 7.0, dtype=np.float32)
    a = np.asarray(
        allpairs_collapsed_accel(jnp.asarray(m), jnp.asarray(x), jnp.asarray(a_old),
                                 1.0, f32_eps)
    )
    a_full = np.asarray(allpairs_accel_dense(jnp.asarray(m), jnp.asarray(x), 1.0, f32_eps))
    assert np.array_equal(a[:, 2], a_old[:, 2])
    assert np.allclose(a[:, :2], a_full[:, :2], rtol=1e-5, atol=1e-6)


def test_collapsed_fix_z(f32_eps):
    m, x = _random_system(32, 3)
    a_old = np.zeros((32, 3), dtype=np.float32)
    a = np.asarray(
        allpairs_collapsed_accel(jnp.asarray(m), jnp.asarray(x), jnp.asarray(a_old),
                                 1.0, f32_eps, fix_z=True)
    )
    a_full = np.asarray(allpairs_accel(jnp.asarray(m), jnp.asarray(x), 1.0, f32_eps))
    assert np.array_equal(a, a_full)


def test_collapsed_2d_same_as_allpairs(f32_eps):
    m, x = _random_system(32, 2)
    a_old = np.zeros((32, 2), dtype=np.float32)
    a = np.asarray(
        allpairs_collapsed_accel(jnp.asarray(m), jnp.asarray(x), jnp.asarray(a_old),
                                 1.0, f32_eps)
    )
    a_full = np.asarray(allpairs_accel(jnp.asarray(m), jnp.asarray(x), 1.0, f32_eps))
    assert np.array_equal(a, a_full)


def test_double_precision(f64_eps):
    m, x = _random_system(48, 2, dtype=np.float64)
    a_ref = naive_allpairs(m, x, 1.0, np.float64(f64_eps))
    a = np.asarray(allpairs_accel_dense(jnp.asarray(m), jnp.asarray(x), 1.0, f64_eps))
    assert a.dtype == np.float64
    scale = np.max(np.abs(a_ref)) + 1e-30
    assert np.max(np.abs(a - a_ref)) / scale < 1e-13


def test_engine_double_never_selects_pallas():
    """--kernel pallas with --precision double must fall back to the jnp
    path: the Pallas kernel is fp32-only (pl.reciprocal rejects f64) --
    round 2 found the TPU NASA pipeline crashing here."""
    from nbody_tpu.models import build_uniform_model
    from nbody_tpu.sim.engines import AllPairsEngine, EngineOptions

    cfg, state = build_uniform_model(32, 2, np.float64)
    step = AllPairsEngine().make_step(cfg, EngineOptions(kernel="pallas"))
    out, aux = step(state, 0)
    assert np.asarray(out.x).dtype == np.float64
    assert np.all(np.isfinite(np.asarray(out.x)))


def test_pallas_fast_mode_matches_dense(f32_eps):
    """fast=True (adaptive rsqrt^3 far tiles) stays within 1e-5 of the
    dense oracle."""
    from nbody_tpu.ops.pallas_allpairs import allpairs_accel_pallas

    m, x = _random_system(1500, 2)
    a_ref = np.asarray(
        allpairs_accel_dense(jnp.asarray(m), jnp.asarray(x), 1.0, f32_eps)
    )
    a = np.asarray(
        allpairs_accel_pallas(jnp.asarray(m), jnp.asarray(x), 1.0, f32_eps,
                              tile_i=256, tile_j=512, interpret=True,
                              fast=True)
    )
    scale = np.abs(a_ref).max() + 1e-30
    assert np.abs(a - a_ref).max() / scale < 1e-5
