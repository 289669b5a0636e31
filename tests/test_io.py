"""Binary file formats: byte-level headers and round-trips (ref: src/saving.h)."""

import struct

import numpy as np

from nbody_tpu.config import SimConfig
from nbody_tpu.state import SystemState
from nbody_tpu.io.saving import Saver, load_system, save_system


def _state(n=8, dim=2, dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    return SystemState.from_numpy(
        rng.uniform(0.5, 1.0, n).astype(dtype),
        rng.uniform(-1, 1, (n, dim)).astype(dtype),
        rng.uniform(-1, 1, (n, dim)).astype(dtype),
        dtype=dtype,
    )


def test_positions_bin_layout(tmp_path):
    n, dim, steps = 8, 2, 5
    cfg = SimConfig(n=n, dim=dim, dtype=np.float32)
    s = _state(n, dim)
    pos = tmp_path / "positions.bin"
    saver = Saver(True, False, n, steps, dim, np.float32, pos_path=str(pos))
    saver.save_all(s, cfg)
    saver.save_all(s, cfg)
    saver.close()
    raw = pos.read_bytes()
    # header: u32 nbodies, u32 nsteps, u32 sizeof(T), u32 dim (saving.h:85-98)
    nb, ns, sz, dm = struct.unpack("<IIII", raw[:16])
    assert (nb, ns, sz, dm) == (n, steps, 4, dim)
    frames = np.frombuffer(raw[16:], dtype=np.float32).reshape(2, n, dim)
    np.testing.assert_array_equal(frames[0], np.asarray(s.x))
    np.testing.assert_array_equal(frames[1], np.asarray(s.x))


def test_energy_bin_layout(tmp_path):
    n, dim, steps = 8, 2, 3
    cfg = SimConfig(n=n, dim=dim, dtype=np.float32, G=1.0)
    s = _state(n, dim)
    epath = tmp_path / "energy.bin"
    saver = Saver(False, True, n, steps, dim, np.float32, energy_path=str(epath))
    saver.save_all(s, cfg)
    saver.close()
    raw = epath.read_bytes()
    ns, sz = struct.unpack("<II", raw[:8])
    assert (ns, sz) == (steps, 4)
    ke, pe = np.frombuffer(raw[8:], dtype=np.float32)
    assert ke > 0 and pe < 0


def test_state_roundtrip(tmp_path):
    cfg = SimConfig(n=8, dim=3, dtype=np.float32, dt=0.25, G=1e-3)
    s = _state(8, 3)
    p = tmp_path / "state.bin"
    save_system(str(p), s, cfg)
    cfg2, s2 = load_system(str(p), 3, np.float32)
    assert cfg2.n == 8 and cfg2.dim == 3
    assert cfg2.dt == np.float32(0.25)
    assert cfg2.G == np.float32(1e-3)
    np.testing.assert_array_equal(np.asarray(s2.m), np.asarray(s.m))
    np.testing.assert_array_equal(np.asarray(s2.x), np.asarray(s.x))
    np.testing.assert_array_equal(np.asarray(s2.v), np.asarray(s.v))


def test_load_dim_mismatch_raises(tmp_path):
    cfg = SimConfig(n=4, dim=2, dtype=np.float32)
    s = _state(4, 2)
    p = tmp_path / "state2d.bin"
    save_system(str(p), s, cfg)
    import pytest

    with pytest.raises(ValueError, match="D=3"):
        load_system(str(p), 3, np.float32)


def test_load_always_float32_on_disk(tmp_path):
    """The loader format stores float32 regardless of run precision
    (saving.h:26-27), upcast on load for double runs."""
    cfg = SimConfig(n=4, dim=2, dtype=np.float64)
    s = _state(4, 2, dtype=np.float64)
    p = tmp_path / "state.bin"
    save_system(str(p), s, cfg)
    cfg2, s2 = load_system(str(p), 2, np.float64)
    assert np.asarray(s2.x).dtype == np.float64
    np.testing.assert_allclose(
        np.asarray(s2.x), np.asarray(s.x).astype(np.float32), rtol=0
    )
