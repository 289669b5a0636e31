"""Workload builders: constants, structure, and stream-order invariants
(ref: src/models.h)."""

import numpy as np
import pytest

from nbody_tpu.models import (
    build_galaxy_model,
    build_plummer_model,
    build_uniform_model,
)


def test_uniform_constants_and_ranges():
    cfg, s = build_uniform_model(100, 2, np.float32)
    assert cfg.dt == pytest.approx(1e-1)
    assert cfg.G == 1.0
    m = np.asarray(s.m)
    x = np.asarray(s.x)
    v = np.asarray(s.v)
    assert np.allclose(m, 1.0 / 100)
    assert np.all(np.abs(x) <= 1.0) and np.all(np.abs(v) <= 1.0)
    assert np.all(np.asarray(s.a) == 0) and np.all(np.asarray(s.ao) == 0)


def test_uniform_stream_order():
    """Per body: pos[0], vel[0], pos[1], vel[1], ... (models.h:20-23)."""
    from nbody_tpu.rng import ReferenceDistributions

    cfg, s = build_uniform_model(3, 3, np.float64)
    d = ReferenceDistributions(42)
    draws = d.sym(18)
    x = np.asarray(s.x)
    v = np.asarray(s.v)
    k = 0
    for i in range(3):
        for dim in range(3):
            assert x[i, dim] == draws[k]; k += 1
            assert v[i, dim] == draws[k]; k += 1


def test_plummer_3d_only():
    with pytest.raises(ValueError):
        build_plummer_model(10, 2, np.float32)
    cfg, s = build_plummer_model(50, 3, np.float64)
    assert cfg.G == pytest.approx(6.674e-11)
    assert cfg.dt == 1.0
    assert np.allclose(np.asarray(s.m), 1.0 / 50)
    assert np.all(np.isfinite(np.asarray(s.x)))
    assert np.all(np.isfinite(np.asarray(s.v)))


@pytest.mark.parametrize("dim", [2, 3])
def test_galaxy_structure(dim):
    n = 1000
    cfg, s = build_galaxy_model(n, dim, np.float64)
    assert cfg.dt == pytest.approx(1e1)
    assert cfg.G == pytest.approx(1e-4)
    m = np.asarray(s.m)
    x = np.asarray(s.x)
    # two central masses 1e4 and 1e3 at +-100*(-1, 1/2)
    assert m[0] == pytest.approx(1e4)
    assert m[500] == pytest.approx(1e3)
    np.testing.assert_allclose(x[0][:2], [-100.0, 50.0])
    np.testing.assert_allclose(x[500][:2], [100.0, -50.0])
    # orbiters: total mass ~1 per galaxy, mass 1/499 each
    assert m[1] == pytest.approx(1.0 / 499)
    # orbiter radii in [30, 50] around the centre (2-D exact; 3-D has z-jitter
    # and rotation so only check broad bounds)
    if dim == 2:
        r = np.linalg.norm(x[1:500] - x[0], axis=1)
        assert np.all((r >= 30.0) & (r <= 50.0))


def test_galaxy_odd_n_leaves_zero_body():
    """Odd n: int truncation leaves the final body zero-initialized,
    matching the reference's size_t conversions (models.h:117-133)."""
    cfg, s = build_galaxy_model(101, 2, np.float64)
    assert cfg.n == 101
    m = np.asarray(s.m)
    assert m[-1] == 0.0
    assert np.all(np.asarray(s.x)[-1] == 0.0)
    # bodies 0..99 filled: 1 + 49 + 1 + 49
    assert np.count_nonzero(m) == 100


def test_galaxy_orbit_speed_2d():
    """Orbiter speed = sqrt(G*(M+1)/r) tangential (models.h:93-94)."""
    cfg, s = build_galaxy_model(200, 2, np.float64)
    x = np.asarray(s.x)
    v = np.asarray(s.v)
    rel = x[1:100] - x[0]
    r = np.linalg.norm(rel, axis=1)
    speed = np.linalg.norm(v[1:100], axis=1)
    expect = np.sqrt(cfg.G * (1e4 + 1.0) / r)
    np.testing.assert_allclose(speed, expect, rtol=1e-9)
    # tangential: v . r_hat ~ 0
    dots = np.abs(np.sum(rel * v[1:100], axis=1)) / (r * speed)
    assert np.max(dots) < 1e-9
