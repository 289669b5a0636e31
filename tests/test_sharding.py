"""Multi-device sharding on the 8-device virtual CPU mesh
(SURVEY.md section 4: mesh emulation without hardware)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nbody_tpu.config import SimConfig
from nbody_tpu.ops.allpairs import allpairs_accel_dense
from nbody_tpu.parallel.mesh import BODY_AXIS, body_mesh
from nbody_tpu.parallel.ring import make_ring_allpairs


def _sys(n, dim, dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    m = rng.uniform(0.1, 1.0, n).astype(dtype)
    x = rng.uniform(-1.0, 1.0, (n, dim)).astype(dtype)
    return jnp.asarray(m), jnp.asarray(x)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n", [64, 100])  # 100: not divisible by 8 -> padding
@pytest.mark.parametrize("dim", [2, 3])
def test_ring_allpairs_matches_dense(n, dim, f32_eps):
    m, x = _sys(n, dim)
    cfg = SimConfig(n=n, dim=dim, dtype=np.float32, G=2.0)
    ring = make_ring_allpairs(cfg, 8)
    a_ring = np.asarray(jax.jit(ring)(m, x))
    a_ref = np.asarray(allpairs_accel_dense(m, x, 2.0, cfg.eps))
    scale = np.abs(a_ref).max() + 1e-30
    assert np.abs(a_ring - a_ref).max() / scale < 1e-5


@pytest.mark.parametrize("n", [64, 100])
def test_ring_allpairs_pallas_block(n, f32_eps):
    """use_pallas=True runs the tiled Pallas block kernel per ring
    rotation (interpret mode on the CPU mesh); values match the dense
    oracle like the jnp block path does."""
    m, x = _sys(n, 2)
    cfg = SimConfig(n=n, dim=2, dtype=np.float32, G=2.0)
    ring = make_ring_allpairs(cfg, 8, use_pallas=True, pallas_interpret=True)
    a_ring = np.asarray(jax.jit(ring)(m, x))
    a_ref = np.asarray(allpairs_accel_dense(m, x, 2.0, cfg.eps))
    scale = np.abs(a_ref).max() + 1e-30
    assert np.abs(a_ring - a_ref).max() / scale < 1e-5


def test_ring_on_sharded_inputs(f32_eps):
    """Ring force with inputs actually placed on the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n, dim = 64, 2
    m, x = _sys(n, dim)
    mesh = body_mesh(8)
    m = jax.device_put(m, NamedSharding(mesh, P(BODY_AXIS)))
    x = jax.device_put(x, NamedSharding(mesh, P(BODY_AXIS, None)))
    cfg = SimConfig(n=n, dim=dim, dtype=np.float32, G=1.0)
    ring = make_ring_allpairs(cfg, 8, mesh=mesh)
    a = np.asarray(jax.jit(ring)(m, x))
    # reference computed on host copies (dense broadcast over a sharded
    # array is illegally sharded)
    a_ref = np.asarray(
        allpairs_accel_dense(jnp.asarray(np.asarray(m)), jnp.asarray(np.asarray(x)),
                             1.0, cfg.eps)
    )
    scale = np.abs(a_ref).max() + 1e-30
    assert np.abs(a - a_ref).max() / scale < 1e-5


def test_dryrun_multichip_entry():
    """The driver's multi-chip dry run: full sharded step on 8 devices."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_clean_interpreter():
    """Run the dryrun EXACTLY the way the driver does: a fresh interpreter
    with no conftest having pre-set jax_platforms.  Guards the
    backend-init-ordering bug (config.update must precede any backend use;
    a jax.devices() probe first makes the update a dead no-op)."""
    import pathlib
    import subprocess
    import sys

    repo = pathlib.Path(__file__).resolve().parents[1]
    proc = subprocess.run(
        [sys.executable, str(repo / "__graft_entry__.py"), "8"],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(repo),
    )
    assert proc.returncode == 0, proc.stderr
    assert "OK" in proc.stdout


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out.x)
    assert out.x.shape == args[0].x.shape


@pytest.mark.parametrize("algo", ["bvh", "octree"])
def test_sharded_tree_step_theta0_parity(algo, f32_eps):
    """--mesh 8 tree step == single-device step at theta=0 (exact direct
    sum on both sides; VERDICT round-1 item 4: mesh wired into trees)."""
    from nbody_tpu.models import build_galaxy_model
    from nbody_tpu.sim.engines import EngineOptions, get_engine

    cfg, state = build_galaxy_model(96, 2, np.float32)
    cfg = cfg.replace(theta=0.0)

    single = get_engine(algo).make_step(cfg, EngineOptions(mesh=1))
    sharded = get_engine(algo).make_step(cfg, EngineOptions(mesh=8))

    s1, aux1 = single(state, 0)
    s8, aux8 = sharded(state, 0)
    assert int(aux8["overflow"]) == 0
    a1 = np.asarray(s1.x)
    a8 = np.asarray(s8.x)
    if algo == "bvh":
        # bvh steps physically reorder bodies; compare as sorted sets
        a1 = a1[np.lexsort(a1.T)]
        a8 = a8[np.lexsort(a8.T)]
    scale = np.abs(a1).max()
    assert np.abs(a1 - a8).max() / scale < 1e-6
    if algo == "octree":
        assert int(aux8["tree_size"]) > 0
    assert np.isclose(
        float(aux8["root_mass"]), float(np.asarray(jnp.sum(state.m))),
        rtol=1e-5,
    )


@pytest.mark.slow
def test_sharded_tree_step_mac_parity():
    """theta=0.5: sharded group evaluation == local group evaluation.  n
    is chosen so neither side pads (4096 = 8 shards x 512 tile =
    bit_ceil(4096)): the trees are bit-identical, the tile set is the
    same, and the rows are merely partitioned over shards."""
    from nbody_tpu.models import build_galaxy_model
    from nbody_tpu.sim.engines import EngineOptions, get_engine

    cfg, state = build_galaxy_model(4096, 2, np.float32)
    cfg = cfg.replace(theta=0.5)
    single = get_engine("bvh").make_step(cfg, EngineOptions(mesh=1))
    sharded = get_engine("bvh").make_step(cfg, EngineOptions(mesh=8))
    s1, _ = single(state, 0)
    s8, _ = sharded(state, 0)
    a1 = np.asarray(s1.x)
    a8 = np.asarray(s8.x)
    a1 = a1[np.lexsort(a1.T)]
    a8 = a8[np.lexsort(a8.T)]
    assert np.abs(a1 - a8).max() / np.abs(a1).max() < 1e-6


@pytest.mark.parametrize("n", [64, 100])
def test_sharded_bvh_matches_local(n, f32_eps):
    """Replicated-tree sharded BVH == single-device group BVH on sorted
    bodies."""
    from nbody_tpu.ops.bvh import build_tree
    from nbody_tpu.ops.bvh_group import compute_force_grouped
    from nbody_tpu.ops.geometry import aabb_of_points
    from nbody_tpu.ops.hilbert import hilbert_sort_perm
    from nbody_tpu.parallel.tree_sharded import make_sharded_bvh_force

    m, x = _sys(n, 2, seed=2)
    xmin, xmax = aabb_of_points(x, f32_eps)
    perm = hilbert_sort_perm(x, xmin, xmax)
    m, x = m[perm], x[perm]
    cfg = SimConfig(n=n, dim=2, dtype=np.float32, G=1.0, theta=0.5)
    sharded = make_sharded_bvh_force(cfg, 8)
    a_sh = np.asarray(jax.jit(sharded)(m, x))
    tree = build_tree(m, x, f32_eps)
    a_loc, _ = compute_force_grouped(tree, m, x, 0.5, 1.0, f32_eps)
    a_loc = np.asarray(a_loc)
    scale = np.abs(a_loc).max() + 1e-30
    assert np.abs(a_sh - a_loc).max() / scale < 1e-5


@pytest.mark.parametrize("n", [64, 700])
def test_sharded_windowed_bvh_matches_local(n, f32_eps):
    """Row-sharded WINDOWED (gather-free) BVH == single-device windowed
    path on sorted bodies (interpret mode on the 8-device CPU mesh)."""
    from nbody_tpu.ops.bvh import build_tree
    from nbody_tpu.ops.bvh_group import compute_force_grouped_windowed
    from nbody_tpu.ops.geometry import aabb_of_points
    from nbody_tpu.ops.hilbert import hilbert_sort_perm
    from nbody_tpu.parallel.tree_sharded import make_sharded_bvh_force

    m, x = _sys(n, 2, seed=3)
    xmin, xmax = aabb_of_points(x, f32_eps)
    perm = hilbert_sort_perm(x, xmin, xmax)
    m, x = m[perm], x[perm]
    cfg = SimConfig(n=n, dim=2, dtype=np.float32, G=1.0, theta=0.5)
    sharded = make_sharded_bvh_force(cfg, 8, use_pallas="interpret")
    a_sh = np.asarray(jax.jit(sharded)(m, x))
    tree = build_tree(m, x, f32_eps)
    a_loc, _ = compute_force_grouped_windowed(tree, m, x, 0.5, 1.0, f32_eps,
                                              interpret=True)
    a_loc = np.asarray(a_loc)
    scale = np.abs(a_loc).max() + 1e-30
    assert np.abs(a_sh - a_loc).max() / scale < 1e-5


def test_sharded_octree_fast_matches_local(f32_eps):
    """Row-sharded octree FAST path == single-device fast path on
    Morton-sorted bodies (interpret mode, 8-device CPU mesh)."""
    import dataclasses as _dc

    from nbody_tpu.ops.geometry import scalar_bounds
    from nbody_tpu.ops.octree import max_depth, morton_keys, octree_step_force
    from nbody_tpu.sim.engines import EngineOptions
    from nbody_tpu.state import SystemState

    n = 700
    m, x = _sys(n, 2, seed=5)
    st = SystemState(m=m, x=x, v=jnp.zeros_like(x), a=jnp.zeros_like(x),
                     ao=jnp.zeros_like(x))
    depth = max_depth(n, 2)
    out_loc, _, _ = octree_step_force(st, 0.5, 1.0, f32_eps, depth,
                                      use_pallas="interpret")

    from nbody_tpu.config import SimConfig
    from nbody_tpu.parallel.tree_sharded import make_sharded_octree_step
    import nbody_tpu.sim.tree_engines as te

    cfg = SimConfig(n=n, dim=2, dtype=np.float32, G=1.0, theta=0.5,
                    dt=1e-3)
    opts = EngineOptions(mesh=8)
    orig = te._use_pallas_eval
    te._use_pallas_eval = lambda *a, **k: "interpret"
    try:
        step = make_sharded_octree_step(cfg, opts)
        out_sh, aux = step(st, 0)
    finally:
        te._use_pallas_eval = orig
    # compare accelerations implied by leapfrog: out_sh already integrated;
    # instead compare the stored new accel field ao after leapfrog? simpler:
    # leapfrog of the local forces
    from nbody_tpu.ops.integrator import leapfrog_step
    out_loc2 = leapfrog_step(out_loc, cfg.dt)
    scale = float(jnp.max(jnp.abs(out_loc2.x))) + 1e-30
    assert float(jnp.max(jnp.abs(out_sh.x - out_loc2.x))) / scale < 1e-5


# ---------------------------------------------------- distributed sort

@pytest.mark.parametrize("n_shards", [2, 8])
@pytest.mark.parametrize("two_keys", [False, True])
@pytest.mark.parametrize("adaptive", [False, True])
def test_distributed_sort_matches_global(n_shards, two_keys, adaptive):
    """Odd-even transposition block sort: concatenated shard blocks must
    equal the globally sorted order (keys AND payload), from an arbitrary
    input distribution."""
    from jax.sharding import PartitionSpec as P

    from nbody_tpu.parallel.distributed_sort import distributed_sort_rows

    rng = np.random.default_rng(3)
    n = 64 * n_shards
    hi = jnp.asarray(rng.integers(0, 4, n, dtype=np.uint32))
    lo = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32))
    pay = jnp.asarray(rng.normal(0, 1, (n, 3)).astype(np.float32))
    keys = [hi, lo] if two_keys else [lo]
    mesh = body_mesh(n_shards)

    def fn(*ops):
        ks, cs = distributed_sort_rows(
            list(ops[:len(keys)]), list(ops[len(keys):]),
            BODY_AXIS, n_shards, adaptive=adaptive)
        return tuple(ks) + tuple(cs)

    mapped = jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=tuple(P(BODY_AXIS) for _ in range(len(keys) + 3)),
        out_specs=tuple(P(BODY_AXIS) for _ in range(len(keys) + 3)),
    ))
    out = mapped(*keys, pay[:, 0], pay[:, 1], pay[:, 2])
    got_keys, got_cols = out[:len(keys)], out[len(keys):]

    if two_keys:
        order = np.lexsort((np.asarray(lo), np.asarray(hi)))
    else:
        order = np.argsort(np.asarray(lo), kind="stable")
    exp_keys = [np.asarray(k)[order] for k in keys]
    exp_pay = np.asarray(pay)[order]
    for g, e in zip(got_keys, exp_keys):
        np.testing.assert_array_equal(np.asarray(g), e)
    got_pay = np.stack([np.asarray(c) for c in got_cols], axis=1)
    # ties in the major key may reorder payload rows; compare the sorted
    # multisets per key-run instead of exact rows
    key_np = exp_keys[-1] if not two_keys else (
        exp_keys[0].astype(np.uint64) << np.uint64(32)) | exp_keys[1].astype(np.uint64)
    assert got_pay.shape == exp_pay.shape
    starts = np.flatnonzero(np.r_[True, key_np[1:] != key_np[:-1]])
    ends = np.r_[starts[1:], len(key_np)]
    for s, e in zip(starts, ends):
        a = np.sort(got_pay[s:e], axis=0)
        b = np.sort(exp_pay[s:e], axis=0)
        np.testing.assert_array_equal(a, b)


# ------------------------------------------- partitioned octree (weak-scaling)

@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("clustered", [False, True])
def test_partitioned_octree_accuracy(dim, clustered, f32_eps):
    """Partitioned step (distributed sort + psum'd coarse heap + halo
    near field + ring-exact beyond field) vs the octree-softened dense
    oracle at theta=0.5: the conservative group MAC must keep the error
    inside the single-chip fast paths' envelope on uniform AND clustered
    (Morton-seam-heavy) distributions."""
    from nbody_tpu.parallel.tree_partitioned import (
        make_partitioned_octree_step,
    )
    from nbody_tpu.state import SystemState

    n = 4096
    rng = np.random.default_rng(5)
    if clustered:
        x = (rng.normal(0, 1, (4, dim))[rng.integers(0, 4, n)] * 30
             + rng.normal(0, 1, (n, dim))).astype(np.float32)
    else:
        x = rng.uniform(-1, 1, (n, dim)).astype(np.float32)
    m = rng.uniform(0.1, 1.0, n).astype(np.float32)
    cfg = SimConfig(n=n, dim=dim, dtype=np.float32, theta=0.5, dt=0.0)
    step = make_partitioned_octree_step(cfg, 8)
    z = jnp.zeros((n, dim), jnp.float32)
    st = SystemState(m=jnp.asarray(m), x=jnp.asarray(x), v=z, a=z, ao=z)
    st2, aux = step(st)
    xs, ms = np.asarray(st2.x), np.asarray(st2.m)
    d = xs[None, :, :] - xs[:, None, :]
    dist = np.sqrt(np.sum(d * d, axis=-1)) + f32_eps
    w = ms[None, :] / (dist * dist * dist)
    a_ref = np.einsum("ij,ijd->id", w, d)
    err = float(np.linalg.norm(np.asarray(st2.a) - a_ref)) / (
        float(np.linalg.norm(a_ref)) + 1e-30)
    assert err < 0.01, (err, int(aux["beyond_halo_cells"]))


def test_partitioned_octree_theta0_exact(f32_eps):
    """theta=0 opens everything: every cell is either in the halo
    interval (exact near field) or beyond (exact ring pass), so the
    partitioned step must reproduce the direct sum to f32 reorder
    noise."""
    from nbody_tpu.parallel.tree_partitioned import (
        make_partitioned_octree_step,
    )
    from nbody_tpu.state import SystemState

    n, dim = 2048, 2
    rng = np.random.default_rng(9)
    x = rng.uniform(-1, 1, (n, dim)).astype(np.float32)
    m = rng.uniform(0.1, 1.0, n).astype(np.float32)
    cfg = SimConfig(n=n, dim=dim, dtype=np.float32, theta=0.0, dt=0.0)
    step = make_partitioned_octree_step(cfg, 8)
    z = jnp.zeros((n, dim), jnp.float32)
    st = SystemState(m=jnp.asarray(m), x=jnp.asarray(x), v=z, a=z, ao=z)
    st2, _ = step(st)
    xs, ms = np.asarray(st2.x), np.asarray(st2.m)
    d = xs[None, :, :] - xs[:, None, :]
    dist = np.sqrt(np.sum(d * d, axis=-1)) + f32_eps
    w = ms[None, :] / (dist * dist * dist)
    a_ref = np.einsum("ij,ijd->id", w, d)
    scale = float(np.max(np.abs(a_ref))) + 1e-30
    assert float(np.max(np.abs(np.asarray(st2.a) - a_ref))) / scale < 1e-4


def test_partitioned_octree_multistep_tracks_engine(f32_eps):
    """Five dt>0 steps of the partitioned stepper vs the single-chip
    octree engine from the same initial state: trajectories must agree
    to the approximation envelope (the partitioned path re-sorts every
    step, so compare position MULTISETS via sorted rows)."""
    from nbody_tpu.models import build_galaxy_model
    from nbody_tpu.parallel.tree_partitioned import (
        make_partitioned_octree_step,
    )
    from nbody_tpu.sim.engines import EngineOptions, get_engine

    cfg, state = build_galaxy_model(2048, 2, np.float32)
    cfg = dataclasses.replace(cfg, theta=0.5)
    pstep = make_partitioned_octree_step(cfg, 8)
    estep = get_engine("octree").make_step(cfg, EngineOptions())
    sp = se = state
    for k in range(5):
        sp, _ = pstep(sp)
        se, _ = estep(se, jnp.zeros((), jnp.int32))
    xp = np.asarray(sp.x)
    xe = np.asarray(se.x)
    # the partitioned path re-sorts every step, so rows are permuted;
    # lexsort pairing is unstable for near-identical coordinates --
    # match every partitioned body to its nearest engine body instead
    d = np.abs(xp[:, None, :] - xe[None, :, :]).sum(-1)
    scale = np.abs(xe).max() + 1e-30
    assert d.min(axis=1).max() / scale < 5e-3


def test_cli_mesh_layout_partitioned(tmp_path, monkeypatch):
    """--mesh 8 --mesh-layout partitioned runs the weak-scaling octree
    end to end through the CLI (save-state round-trips the final state;
    bad layout values exit 1 like every other flag)."""
    import io

    from nbody_tpu.cli import main as cli_main
    from nbody_tpu.io.saving import load_system

    monkeypatch.chdir(tmp_path)
    rc = cli_main([
        "-n", "512", "-s", "2", "--algorithm", "octree",
        "--workload", "galaxy", "--mesh", "8",
        "--mesh-layout", "partitioned",
        "--save-state", "part.bin",
    ], out=io.StringIO())
    assert rc in (0, None)
    _, st = load_system(str(tmp_path / "part.bin"), 2, np.float32)
    assert st.x.shape == (512, 2)
    assert np.isfinite(np.asarray(st.x)).all()

    with pytest.raises(SystemExit):
        cli_main(["--mesh-layout", "bogus"], out=io.StringIO())


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("clustered", [False, True])
def test_partitioned_bvh_accuracy(dim, clustered, f32_eps):
    """Partitioned implicit-BVH step vs the plain-softened dense oracle
    at theta=0.5 (d2^1.5 + eps math, bvh.h:297); n NOT divisible by
    S*tile so the pad path is exercised -- a pad row leaking into the
    real rows would show as a zero mass."""
    from nbody_tpu.parallel.tree_partitioned import (
        make_partitioned_bvh_step,
    )
    from nbody_tpu.state import SystemState

    n = 4000
    rng = np.random.default_rng(5)
    if clustered:
        x = (rng.normal(0, 1, (4, dim))[rng.integers(0, 4, n)] * 30
             + rng.normal(0, 1, (n, dim))).astype(np.float32)
    else:
        x = rng.uniform(-1, 1, (n, dim)).astype(np.float32)
    m = rng.uniform(0.1, 1.0, n).astype(np.float32)
    cfg = SimConfig(n=n, dim=dim, dtype=np.float32, theta=0.5, dt=0.0)
    step = make_partitioned_bvh_step(cfg, 8)
    z = jnp.zeros((n, dim), jnp.float32)
    st = SystemState(m=jnp.asarray(m), x=jnp.asarray(x), v=z, a=z, ao=z)
    st2, aux = step(st)
    ms = np.asarray(st2.m)
    assert (ms > 0).all()          # no zero-mass pad clones in real rows
    xs = np.asarray(st2.x)
    d = xs[None] - xs[:, None]
    d2 = (d * d).sum(-1)
    w = ms[None, :] / (d2 * np.sqrt(d2) + f32_eps)
    a_ref = np.einsum("ij,ijd->id", w, d)
    err = float(np.linalg.norm(np.asarray(st2.a) - a_ref)) / (
        float(np.linalg.norm(a_ref)) + 1e-30)
    assert err < 0.01, (err, int(aux["beyond_halo_cells"]))


def test_partitioned_octree_pad_rows_not_dropped(f32_eps):
    """Regression: pads used to carry a duplicated input-position key and
    sorted MID-stream, so the [:nreal] slice dropped real bodies and kept
    zero-mass clones.  With the flag-major sort the returned state must
    hold every real body (mass multiset preserved) and match the
    oracle."""
    from nbody_tpu.parallel.tree_partitioned import (
        make_partitioned_octree_step,
    )
    from nbody_tpu.state import SystemState

    n, dim = 3000, 2               # npad = 8 * 256 * 2 = 4096 > n
    rng = np.random.default_rng(11)
    x = rng.uniform(-1, 1, (n, dim)).astype(np.float32)
    m = rng.uniform(0.1, 1.0, n).astype(np.float32)
    cfg = SimConfig(n=n, dim=dim, dtype=np.float32, theta=0.5, dt=0.0)
    step = make_partitioned_octree_step(cfg, 8)
    z = jnp.zeros((n, dim), jnp.float32)
    st = SystemState(m=jnp.asarray(m), x=jnp.asarray(x), v=z, a=z, ao=z)
    st2, _ = step(st)
    np.testing.assert_array_equal(np.sort(np.asarray(st2.m)), np.sort(m))
    xs, ms = np.asarray(st2.x), np.asarray(st2.m)
    d = xs[None] - xs[:, None]
    dist = np.sqrt((d * d).sum(-1)) + f32_eps
    w = ms[None, :] / dist**3
    a_ref = np.einsum("ij,ijd->id", w, d)
    err = float(np.linalg.norm(np.asarray(st2.a) - a_ref)) / (
        float(np.linalg.norm(a_ref)) + 1e-30)
    assert err < 0.01, err


@pytest.mark.parametrize("adaptive", [False, True])
def test_distributed_sort_tied_keys_multiset(adaptive):
    """Regression: the merge-split used to concatenate [mine, theirs] on
    BOTH sides of a pair; with tied keys the two stable sorts resolved
    ties by different input positions and the kept halves duplicated/
    dropped rows.  Heavily tied and all-equal keys must preserve the
    payload multiset exactly."""
    from jax.sharding import PartitionSpec as P

    from nbody_tpu.parallel.distributed_sort import distributed_sort_rows

    S, nl = 8, 64
    n = S * nl
    rng = np.random.default_rng(3)
    mesh = body_mesh(S)
    for keys_np in (rng.integers(0, 16, n).astype(np.uint32),
                    np.zeros(n, np.uint32)):
        pay = rng.uniform(0.1, 1.0, n).astype(np.float32)

        def fn(k, mm):
            ks, cs = distributed_sort_rows([k], [mm], BODY_AXIS, S,
                                           adaptive=adaptive)
            return ks[0], cs[0]

        mapped = jax.jit(jax.shard_map(
            fn, mesh=mesh, in_specs=(P(BODY_AXIS),) * 2,
            out_specs=(P(BODY_AXIS),) * 2))
        ko, po = mapped(jnp.asarray(keys_np), jnp.asarray(pay))
        assert (np.diff(np.asarray(ko).astype(np.int64)) >= 0).all()
        np.testing.assert_array_equal(np.sort(np.asarray(po)),
                                      np.sort(pay))


@pytest.mark.parametrize("maker_name", ["octree", "bvh"])
def test_partitioned_pallas_matches_jnp(maker_name, f32_eps):
    """The kernelized partitioned far/near (masked_eval_bits_pallas +
    window_eval_interval_pallas, interpret mode) must match the dense
    jnp path to f32 reorder noise."""
    from nbody_tpu.parallel.tree_partitioned import (
        make_partitioned_bvh_step,
        make_partitioned_octree_step,
    )
    from nbody_tpu.state import SystemState

    maker = (make_partitioned_octree_step if maker_name == "octree"
             else make_partitioned_bvh_step)
    n, dim = 4096, 2
    rng = np.random.default_rng(5)
    x = (rng.normal(0, 1, (4, dim))[rng.integers(0, 4, n)] * 30
         + rng.normal(0, 1, (n, dim))).astype(np.float32)
    m = rng.uniform(0.1, 1.0, n).astype(np.float32)
    cfg = SimConfig(n=n, dim=dim, dtype=np.float32, theta=0.5, dt=0.0)
    z = jnp.zeros((n, dim), jnp.float32)
    st = SystemState(m=jnp.asarray(m), x=jnp.asarray(x), v=z, a=z, ao=z)
    s_jnp, _ = maker(cfg, 8)(st)
    s_pal, _ = maker(cfg, 8, use_pallas="interpret")(st)
    a1, a2 = np.asarray(s_jnp.a), np.asarray(s_pal.a)
    assert np.abs(a1 - a2).max() / (np.abs(a1).max() + 1e-30) < 1e-4


def test_partitioned_beyond_budget_overflow_fallback(f32_eps):
    """A beyond_budget too small for the needed rows must trip the
    replicated overflow flag and route to the exact block-ring fallback
    -- results identical-quality to the exchange path, never truncated."""
    from nbody_tpu.parallel.tree_partitioned import (
        make_partitioned_octree_step,
    )
    from nbody_tpu.state import SystemState

    n, dim = 4096, 3
    rng = np.random.default_rng(5)
    x = (rng.normal(0, 1, (4, dim))[rng.integers(0, 4, n)] * 30
         + rng.normal(0, 1, (n, dim))).astype(np.float32)
    m = rng.uniform(0.1, 1.0, n).astype(np.float32)
    cfg = SimConfig(n=n, dim=dim, dtype=np.float32, theta=0.5, dt=0.0)
    z = jnp.zeros((n, dim), jnp.float32)
    st = SystemState(m=jnp.asarray(m), x=jnp.asarray(x), v=z, a=z, ao=z)
    s_ex, aux = make_partitioned_octree_step(cfg, 8)(st)
    assert int(aux["beyond_halo_cells"]) > 0   # exchange actually used
    s_ring, _ = make_partitioned_octree_step(cfg, 8, beyond_budget=1)(st)
    a1, a2 = np.asarray(s_ex.a), np.asarray(s_ring.a)
    # both paths evaluate the same exact pairs; only summation order
    # differs (exchange buffer order vs ring rotation order)
    assert np.abs(a1 - a2).max() / (np.abs(a1).max() + 1e-30) < 1e-4


@pytest.mark.parametrize("maker_name", ["octree", "bvh"])
def test_partitioned_2d_mesh_matches_1d(maker_name, f32_eps):
    """2-D (body x tile) mesh layout (docs/DISTRIBUTED_TREES.md item 5)
    vs the 1-D layout at identical n_shards: the tile axis only
    row-slices the force evaluation (each tile-shard evaluates its
    1/T rows against the full heap + halo and an all_gather
    reassembles), so per-row results must match the 1-D step to f32
    reduction-order noise."""
    from nbody_tpu.parallel.tree_partitioned import (
        make_partitioned_bvh_step,
        make_partitioned_octree_step,
    )
    from nbody_tpu.state import SystemState

    maker = (make_partitioned_octree_step if maker_name == "octree"
             else make_partitioned_bvh_step)
    n, dim = 4096, 3
    rng = np.random.default_rng(11)
    x = (rng.normal(0, 1, (4, dim))[rng.integers(0, 4, n)] * 30
         + rng.normal(0, 1, (n, dim))).astype(np.float32)
    m = rng.uniform(0.1, 1.0, n).astype(np.float32)
    cfg = SimConfig(n=n, dim=dim, dtype=np.float32, theta=0.5, dt=0.0)
    z = jnp.zeros((n, dim), jnp.float32)
    st = SystemState(m=jnp.asarray(m), x=jnp.asarray(x), v=z, a=z, ao=z)
    s_1d, aux1 = maker(cfg, 4, tile=64)(st)
    s_2d, aux2 = maker(cfg, 4, tile=64, tile_shards=2)(st)
    # the clustered distribution produces beyond-halo opens, so the
    # 2-D need/overflow reductions (psum over BOTH axes) are exercised
    assert int(aux2["beyond_halo_cells"]) > 0
    assert int(aux1["beyond_halo_cells"]) == int(aux2["beyond_halo_cells"])
    np.testing.assert_array_equal(np.asarray(s_1d.x), np.asarray(s_2d.x))
    a1, a2 = np.asarray(s_1d.a), np.asarray(s_2d.a)
    assert np.abs(a1 - a2).max() / (np.abs(a1).max() + 1e-30) < 1e-5


def test_partitioned_2d_mesh_pallas_interpret(f32_eps):
    """The kernelized path on the 2-D mesh: each tile-shard's row slice
    rides the same masked-bits / windowed kernels; must match the jnp
    2-D path."""
    from nbody_tpu.parallel.tree_partitioned import (
        make_partitioned_octree_step,
    )
    from nbody_tpu.state import SystemState

    n, dim = 4096, 2
    rng = np.random.default_rng(12)
    x = rng.uniform(-1, 1, (n, dim)).astype(np.float32)
    m = rng.uniform(0.1, 1.0, n).astype(np.float32)
    cfg = SimConfig(n=n, dim=dim, dtype=np.float32, theta=0.5, dt=0.0)
    z = jnp.zeros((n, dim), jnp.float32)
    st = SystemState(m=jnp.asarray(m), x=jnp.asarray(x), v=z, a=z, ao=z)
    s_jnp, _ = make_partitioned_octree_step(cfg, 2, tile_shards=4)(st)
    s_pal, _ = make_partitioned_octree_step(
        cfg, 2, tile_shards=4, use_pallas="interpret")(st)
    a1, a2 = np.asarray(s_jnp.a), np.asarray(s_pal.a)
    assert np.abs(a1 - a2).max() / (np.abs(a1).max() + 1e-30) < 1e-4


@pytest.mark.parametrize("algo", ["octree", "bvh"])
def test_partitioned_comm_accounting_bound(algo, f32_eps):
    """The docstring's O(n/S + C) communication claim, numerically
    (VERDICT r5 item 7): the step emits a per-shard send-bytes
    accounting (aux["comm"]), and every per-step category OUTSIDE the
    sort bound and the ring fallback must fit a*nl + b*C bytes with
    small constants (a=96 covers f64 halo rows, b=64 covers the
    f64 heap cell payload).  Also pins that the traced total equals the
    static no-sort figure when the compacted beyond-gather (not the
    ring) ran, and that comm_only=True reproduces the same dict without
    touching the mesh."""
    from nbody_tpu.parallel.tree_partitioned import (
        make_partitioned_bvh_step,
        make_partitioned_octree_step,
    )
    from nbody_tpu.state import SystemState

    mk = (make_partitioned_octree_step if algo == "octree"
          else make_partitioned_bvh_step)
    n, dim, S = 4096, 2, 8
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (n, dim)).astype(np.float32)
    m = rng.uniform(0.1, 1.0, n).astype(np.float32)
    cfg = SimConfig(n=n, dim=dim, dtype=np.float32, theta=0.5, dt=0.0)
    z = jnp.zeros((n, dim), jnp.float32)
    st = SystemState(m=jnp.asarray(m), x=jnp.asarray(x), v=z, a=z, ao=z)
    step = mk(cfg, S)
    _, aux = step(st)
    comm = aux["comm"]
    nl = -(-n // S)
    # O(n/S + C) numeric bound on the per-step categories; C recovered
    # from the accounting itself (need-mask psum is exactly 4 bytes/cell)
    C = comm["beyond_need_psum_bytes"] // 4
    assert comm["step_bytes_no_sort"] <= 96 * 2 * nl + 64 * C
    # the traced total must be consistent with the overflow flag: the
    # static no-sort figure, plus the ring payload iff the ring ran
    # (at this small nl the r_budget=256 cap can trip on a uniform box)
    expect = comm["step_bytes_no_sort"] + (
        comm["ring_fallback_bytes"] if bool(aux["beyond_used_ring"]) else 0)
    assert int(aux["comm_bytes_per_shard"]) == expect
    # comm_only reproduces the accounting with no mesh/devices
    comm2 = mk(cfg, S, comm_only=True)
    assert comm2 == comm
    # scaling in n at fixed S: nl-proportional categories double; the
    # heap stays O(C) with C capped at 2^14 cells (_coarse_level), so
    # its payload never exceeds the cap x the per-cell bytes no matter
    # how large n grows
    comm_2n = mk(SimConfig(n=2 * n, dim=dim, dtype=np.float32,
                           theta=0.5, dt=0.0), S, comm_only=True)
    assert comm_2n["halo_bytes"] == 2 * comm["halo_bytes"]
    cell_bytes = 4 + 4 * (1 + 3 * dim)
    for c in (comm, comm_2n):
        assert c["heap_psum_bytes"] <= (1 << 14) * cell_bytes
    # comm_only works beyond this host's device count (feeds the
    # docs/DISTRIBUTED_TREES.md table)
    big = mk(SimConfig(n=1 << 20, dim=3, dtype=np.float32, theta=0.5,
                       dt=0.0), 256, comm_only=True)
    assert big["halo_bytes"] > 0 and big["step_bytes_no_sort"] > 0
