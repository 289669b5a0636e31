"""Native C++ runtime vs pure-Python fallbacks: bit-exact parity."""

import os
import time

import numpy as np
import pytest

from nbody_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_native_raw_stream_matches_python():
    from nbody_tpu.rng import MT19937

    got = native.mt19937_raw(42, 3000)
    exp = MT19937(42).raw(3000)
    assert np.array_equal(got, exp)


def test_native_canonical_matches_python():
    from nbody_tpu.rng import MT19937

    got = native.mt19937_canonical(42, 1000)
    exp = MT19937(42).canonical(1000)
    assert np.array_equal(got, exp)


def _python_model(builder, *args):
    os.environ["NBODY_TPU_NO_NATIVE"] = "1"
    try:
        return builder(*args)
    finally:
        del os.environ["NBODY_TPU_NO_NATIVE"]


@pytest.mark.parametrize("dim", [2, 3])
def test_uniform_native_vs_python(dim):
    from nbody_tpu.models import build_uniform_model

    cfg_n, s_n = build_uniform_model(200, dim, np.float64)
    cfg_p, s_p = _python_model(build_uniform_model, 200, dim, np.float64)
    np.testing.assert_array_equal(np.asarray(s_n.m), np.asarray(s_p.m))
    np.testing.assert_array_equal(np.asarray(s_n.x), np.asarray(s_p.x))
    np.testing.assert_array_equal(np.asarray(s_n.v), np.asarray(s_p.v))


def test_plummer_native_vs_python():
    """RNG stream identical; trig/pow differ from numpy by <=2 ulp (libm
    vs npymath rounding), so positions match to ~1e-15 relative."""
    from nbody_tpu.models import build_plummer_model

    cfg_n, s_n = build_plummer_model(100, 3, np.float64)
    cfg_p, s_p = _python_model(build_plummer_model, 100, 3, np.float64)
    np.testing.assert_array_equal(np.asarray(s_n.m), np.asarray(s_p.m))
    np.testing.assert_allclose(np.asarray(s_n.x), np.asarray(s_p.x),
                               rtol=1e-14, atol=1e-18)
    np.testing.assert_allclose(np.asarray(s_n.v), np.asarray(s_p.v),
                               rtol=1e-14, atol=1e-18)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("n", [100, 101])
def test_galaxy_native_vs_python(dim, n):
    from nbody_tpu.models import build_galaxy_model

    cfg_n, s_n = build_galaxy_model(n, dim, np.float64)
    cfg_p, s_p = _python_model(build_galaxy_model, n, dim, np.float64)
    np.testing.assert_array_equal(np.asarray(s_n.m), np.asarray(s_p.m))
    if dim == 2:
        # no trig-dependent rotation: bit-exact
        np.testing.assert_array_equal(np.asarray(s_n.x), np.asarray(s_p.x))
        np.testing.assert_array_equal(np.asarray(s_n.v), np.asarray(s_p.v))
    else:
        np.testing.assert_allclose(np.asarray(s_n.x), np.asarray(s_p.x),
                                   rtol=1e-14, atol=1e-18)
        np.testing.assert_allclose(np.asarray(s_n.v), np.asarray(s_p.v),
                                   rtol=1e-14, atol=1e-18)


def test_native_plummer_speed():
    """The point of the native path: the sequential rejection loop at
    n=20k should complete in well under a second."""
    t0 = time.perf_counter()
    native.build_plummer(20_000)
    assert time.perf_counter() - t0 < 2.0
