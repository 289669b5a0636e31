"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding is exercised without TPU hardware (SURVEY.md section 4:
mesh emulation via xla_force_host_platform_device_count)."""

import jax

# NOTE: this jax build ignores the JAX_PLATFORMS / JAX_ENABLE_X64 /
# XLA_FLAGS environment variables, so everything must go through
# jax.config.update -- and it must happen before the first backend use or
# tests silently run on the remote TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)  # virtual mesh for sharding tests
jax.config.update("jax_enable_x64", True)    # double-precision paths

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def f32_eps():
    return float(np.finfo(np.float32).eps)


@pytest.fixture(scope="session")
def f64_eps():
    return float(np.finfo(np.float64).eps)


def naive_allpairs(m, x, G, eps):
    """Scalar-semantics oracle of all_pairs_force (src/all_pairs.h:14-27),
    computed in the input dtype with the reference's exact j-loop order."""
    n, dim = x.shape
    a = np.zeros_like(x)
    for i in range(n):
        ai = np.zeros(dim, dtype=x.dtype)
        for j in range(n):
            if i == j:
                continue
            d = x[j] - x[i]
            d2 = np.dot(d, d)
            ai += m[j] * d / (d2 ** np.asarray(1.5, x.dtype) + eps)
        a[i] = G * ai
    return a
