"""Leapfrog integrator and energy diagnostics."""

import numpy as np
import jax.numpy as jnp

from nbody_tpu.state import SystemState
from nbody_tpu.ops.integrator import leapfrog_step
from nbody_tpu.ops.energy import calc_energies


def _state(n=16, dim=2, seed=1, dtype=np.float32):
    rng = np.random.default_rng(seed)
    s = SystemState.from_numpy(
        rng.uniform(0.5, 1.0, n).astype(dtype),
        rng.uniform(-1, 1, (n, dim)).astype(dtype),
        rng.uniform(-1, 1, (n, dim)).astype(dtype),
        dtype=dtype,
    )
    import dataclasses
    return dataclasses.replace(
        s,
        a=jnp.asarray(rng.uniform(-1, 1, (n, dim)).astype(dtype)),
        ao=jnp.asarray(rng.uniform(-1, 1, (n, dim)).astype(dtype)),
    )


def test_leapfrog_exact_form():
    """x += dt*v + 0.5*dt^2*ao ; v += 0.5*dt*(a + ao) ; ao = a
    (src/system.h:52-60) -- note x uses the OLD acceleration ao."""
    s = _state()
    dt = 0.1
    x0, v0, a0, ao0 = map(np.asarray, (s.x, s.v, s.a, s.ao))
    s2 = leapfrog_step(s, dt)
    dtf = np.float32(dt)
    half = np.float32(0.5)
    np.testing.assert_array_equal(
        np.asarray(s2.x), x0 + dtf * v0 + half * dtf * dtf * ao0
    )
    np.testing.assert_array_equal(np.asarray(s2.v), v0 + half * dtf * (a0 + ao0))
    np.testing.assert_array_equal(np.asarray(s2.ao), a0)
    np.testing.assert_array_equal(np.asarray(s2.a), a0)  # a untouched


def test_energies_match_naive():
    s = _state(n=40, dim=3)
    G, eps = 2.0, float(np.finfo(np.float32).eps)
    ke, pe = calc_energies(s.m, s.x, s.v, G, eps, chunk=16)
    m = np.asarray(s.m, np.float64)
    x = np.asarray(s.x, np.float64)
    v = np.asarray(s.v, np.float64)
    ke_ref = 0.5 * np.sum(m * np.sum(v * v, axis=1))
    pe_ref = 0.0
    n = len(m)
    for i in range(n):
        for j in range(n):
            if i != j:
                pe_ref += m[i] * m[j] / (np.linalg.norm(x[i] - x[j]) + eps)
    pe_ref *= -0.5 * G
    assert abs(float(ke) - ke_ref) / abs(ke_ref) < 1e-6
    assert abs(float(pe) - pe_ref) / abs(pe_ref) < 1e-5


def test_energy_conservation_two_body_orbit():
    """Physics oracle (SURVEY.md section 4 item 4): a bound two-body circular
    orbit integrated with the leapfrog scheme conserves total energy and
    orbital radius to O((dt*omega)^2)."""
    import dataclasses
    from nbody_tpu.ops.allpairs import allpairs_accel_dense

    dtype = np.float64
    G, dt = 1.0, 1e-3
    eps = float(np.finfo(dtype).eps)
    M, mu = 1.0, 1e-3
    r = 1.0
    vorb = np.sqrt(G * M / r)
    s = SystemState.from_numpy(
        np.array([M, mu], dtype=dtype),
        np.array([[0.0, 0.0], [r, 0.0]], dtype=dtype),
        np.array([[0.0, 0.0], [0.0, vorb]], dtype=dtype),
        dtype=dtype,
    )

    def step(s):
        a = allpairs_accel_dense(s.m, s.x, G, eps)
        s = dataclasses.replace(s, a=a)
        return leapfrog_step(s, dt)

    ke0, pe0 = calc_energies(s.m, s.x, s.v, G, eps)
    e0 = float(ke0) + float(pe0)
    for _ in range(200):
        s = step(s)
    ke1, pe1 = calc_energies(s.m, s.x, s.v, G, eps)
    e1 = float(ke1) + float(pe1)
    # the reference scheme uses the lagged acceleration in the x-update
    # (system.h:56), so its energy oscillation is a bit larger than textbook
    # velocity-Verlet; measured ~4e-4 relative over this horizon.
    assert abs(e1 - e0) / abs(e0) < 1e-3
    # orbital radius preserved
    x = np.asarray(s.x)
    assert abs(np.linalg.norm(x[1] - x[0]) - r) < 1e-3


def test_energy_conservation_galaxy_bvh():
    """Integration oracle: a galaxy run under the BVH engine conserves
    total energy to the approximation level (SURVEY.md section 4 item 4)."""
    from nbody_tpu.models import build_galaxy_model
    from nbody_tpu.sim.engines import EngineOptions
    from nbody_tpu.sim.engines import get_engine

    cfg, s = build_galaxy_model(2000, 2, np.float64)
    step = get_engine("bvh").make_step(cfg, EngineOptions(kernel="jnp"))
    ke0, pe0 = calc_energies(s.m, s.x, s.v, cfg.G, cfg.eps)
    e0 = float(ke0) + float(pe0)
    for k in range(30):
        s, _ = step(s, k)
    ke1, pe1 = calc_energies(s.m, s.x, s.v, cfg.G, cfg.eps)
    e1 = float(ke1) + float(pe1)
    assert abs(e1 - e0) / abs(e0) < 5e-3, (e0, e1)


def test_pallas_pe_matches_jnp():
    """The Pallas potential kernel (interpret mode) == the chunked jnp PE."""
    from nbody_tpu.ops.pallas_allpairs import potential_rowsums_pallas

    rng = np.random.default_rng(8)
    n = 100
    m = jnp.asarray(rng.uniform(0.5, 1.0, n).astype(np.float32))
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)).astype(np.float32))
    eps = float(np.finfo(np.float32).eps)
    rows = np.asarray(
        potential_rowsums_pallas(m, x, eps, tile_i=128, tile_j=128,
                                 interpret=True)
    )
    pe_pallas = -0.5 * 1.0 * rows.sum()
    _, pe_jnp = calc_energies(m, x, jnp.zeros_like(x), 1.0, eps)
    assert abs(pe_pallas - float(pe_jnp)) / abs(float(pe_jnp)) < 1e-5
