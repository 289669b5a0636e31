"""Offline TPU lowering regression tests.

The CPU suite runs every Pallas kernel in interpret mode, which skips the
Mosaic lowering checks entirely -- round 4 found all eight tree bench
metrics crashing on the (jax 0.9) rule that a BlockSpec's last two block
dims must equal the array dims or be (8, 128)-divisible, while the suite
was green.  These tests lower the production kernels for the REAL tpu
platform via jax.export (no device needed) at shapes that trip the old
layouts (mask rows wider than one j-chunk), so a Pallas/Mosaic API drift
fails on CPU CI instead of on the first TPU measurement of a round.

Each case lowers in a SUBPROCESS: jax.export under jax_enable_x64 (which
conftest.py sets process-wide) hits an unbounded recursion inside jax
0.9's weakref cache-key canonicalization, and the production TPU path is
fp32 anyway.
"""

import subprocess
import sys

import pytest

_PRELUDE = """
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax import export
from nbody_tpu.ops.pallas_group_eval import (
    MASK_TILE_J, masked_eval_bits_pallas, pack_mask_bits,
    window_eval_nodemask_pallas)
eps = float(np.finfo(np.float32).eps)
"""

_CASES = {
    # W > tile_j => several packed j-chunks per tile row: the pre-round-4
    # layout sliced 32 words out of the row per grid step, which jax 0.9's
    # Pallas rejects (block last dim 32 vs array dim W/32).
    "masked_bits_tg1": """
T, tb, dim, W = 8, 64, 3, 4 * MASK_TILE_J
rng = np.random.default_rng(0)
words = pack_mask_bits(jnp.asarray(rng.random((T, W)) < 0.5))
export.export(jax.jit(lambda a, b, c, d: masked_eval_bits_pallas(
    a, b, c, d, eps=eps, tile_group=TG)), platforms=["tpu"])(
    jax.ShapeDtypeStruct((T * tb, dim), jnp.float32),
    jax.ShapeDtypeStruct((W,), jnp.float32),
    jax.ShapeDtypeStruct((dim, W), jnp.float32),
    jax.ShapeDtypeStruct(words.shape, words.dtype))
print("LOWER_OK")
""",
    # window_tiles > wj => several node-mask chunks per tile row (same
    # jax 0.9 rejection: block last dim nv vs array dim wnodes).
    "window_nodemask": """
T, tb, dim, S, wt = 8, 256, 3, 64, 8
nv = tb // S
n = T * tb
export.export(jax.jit(lambda a, b, c, d, e: window_eval_nodemask_pallas(
    a, b, c, d, e, eps=eps, window_tiles=wt, S=S)), platforms=["tpu"])(
    jax.ShapeDtypeStruct((n, dim), jnp.float32),
    jax.ShapeDtypeStruct((n,), jnp.float32),
    jax.ShapeDtypeStruct((dim, n), jnp.float32),
    jax.ShapeDtypeStruct((T, wt * nv), jnp.bool_),
    jax.ShapeDtypeStruct((T,), jnp.int32))
print("LOWER_OK")
""",
}


def _run(code: str) -> None:
    proc = subprocess.run(
        [sys.executable, "-c", _PRELUDE.format(repo=__file__.rsplit(
            "/tests/", 1)[0]) + code],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0 and "LOWER_OK" in proc.stdout, (
        proc.stderr[-2500:])


@pytest.mark.parametrize("tile_group", [1, 2])
def test_masked_bits_lowers_multichunk(tile_group):
    _run(f"TG = {tile_group}" + _CASES["masked_bits_tg1"])


def test_window_nodemask_lowers_multichunk():
    _run(_CASES["window_nodemask"])


# ---- end-to-end: the exact bench.py configs -------------------------------
#
# Kernel-level cases pin the two layouts that broke; these export the FULL
# production engine step (sort + build + traversal + force + integrate) at
# the n=2^20 galaxy bench config for the real tpu platform, so ANY Pallas
# kernel reachable from bench.py's tree metrics is lowering-checked on CPU
# CI before a round spends TPU time on it.

_STEP_CASE = """
import numpy as np
from nbody_tpu.models import build_galaxy_model
from nbody_tpu.sim.engines import EngineOptions, get_engine
cfg, state = build_galaxy_model(1 << 20, DIM, np.float32)
step = get_engine(ALGO).make_step(cfg, EngineOptions())
export.export(jax.jit(lambda s: step(s, 0)[0].x), platforms=["tpu"])(state)
print("LOWER_OK")
"""

# the cocked-knob configs (VERDICT r4 item 3): tile=1024 + 1024-body
# nodes, exported through the same custom steps the TPU knob probes run
_KNOB_OCT_CASE = """
import dataclasses
import numpy as np
from nbody_tpu.models import build_galaxy_model
from nbody_tpu.ops.geometry import scalar_bounds
from nbody_tpu.ops.integrator import leapfrog_step
from nbody_tpu.ops.octree import max_depth, morton_sort, robust_quant_box
from nbody_tpu.ops.octree_group import compute_force_grouped_fast
n = 1 << 20
cfg, state = build_galaxy_model(n, DIM, np.float32)
depth = max_depth(n, DIM)

def step(s):
    lo, hi = scalar_bounds(s.x)
    lo_r, hi_r = robust_quant_box(s.x, lo, hi)
    ms, xs, ks, perm = morton_sort(s.m, s.x, lo_r, hi_r, depth)
    a_s, _ = compute_force_grouped_fast(
        ms, xs, ks, lo_r, hi_r, depth, 0.5, float(cfg.G), cfg.eps,
        tile=1024, s_block=1024, window_tiles=32)
    a = jnp.zeros_like(a_s).at[perm].set(a_s)
    return leapfrog_step(dataclasses.replace(s, a=a), cfg.dt)

export.export(jax.jit(step), platforms=["tpu"])(state)
print("LOWER_OK")
"""

_KNOB_BVH_CASE = """
import dataclasses
import numpy as np
from nbody_tpu.models import build_galaxy_model
from nbody_tpu.ops.bvh import build_tree
from nbody_tpu.ops.bvh_group import compute_force_grouped_windowed
from nbody_tpu.ops.geometry import aabb_of_points
from nbody_tpu.ops.hilbert import hilbert_sort_perm
from nbody_tpu.ops.integrator import leapfrog_step
cfg, state = build_galaxy_model(1 << 20, DIM, np.float32)

def step(s):
    xmin, xmax = aabb_of_points(s.x, cfg.eps)
    perm = hilbert_sort_perm(s.x, xmin, xmax)
    m, x = s.m[perm], s.x[perm]
    tree = build_tree(m, x, cfg.eps)
    a_s, _ = compute_force_grouped_windowed(
        tree, m, x, 0.5, float(cfg.G), cfg.eps,
        tile=1024, s_target=1024, window_tiles=32)
    a = jnp.zeros_like(a_s).at[perm].set(a_s)
    return leapfrog_step(dataclasses.replace(s, a=a), cfg.dt)

export.export(jax.jit(step), platforms=["tpu"])(state)
print("LOWER_OK")
"""


# round-4b knob candidates: packed-j single-DMA near eval ("packedj"),
# compacted far heap ("fheap"), and the combination -- exported at the
# exact n=1M shapes the TPU knob probes run, so a Mosaic rejection (e.g.
# of the packed (4, S) j-block layout) fails here instead of on the TPU
_KNOB_ABLATE_OCT_CASE = _KNOB_OCT_CASE.replace(
    "tile=1024, s_block=1024, window_tiles=32",
    "tile=512, s_block=(1024 if DIM == 3 else 256), window_tiles=32,\n"
    "        ablate=ABLATE")
_KNOB_ABLATE_BVH_CASE = _KNOB_BVH_CASE.replace(
    "tile=1024, s_target=1024, window_tiles=32",
    "tile=512, s_target=512, window_tiles=32, ablate=ABLATE")


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("ablate", ["packedj", "fheap", "fheap,packedj",
                                    "desc1", "nofheap", "winskip"])
def test_knob_octree_ablate_lowers(dim, ablate):
    _run(f"DIM = {dim}\nABLATE = {ablate!r}" + _KNOB_ABLATE_OCT_CASE)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("ablate", ["packedj", "winskip"])
def test_knob_bvh_packedj_lowers(dim, ablate):
    _run(f"DIM = {dim}\nABLATE = {ablate!r}" + _KNOB_ABLATE_BVH_CASE)


@pytest.mark.parametrize("algo", ["bvh", "octree"])
@pytest.mark.parametrize("dim", [2, 3])
def test_bench_config_step_lowers(algo, dim):
    _run(f"ALGO = {algo!r}\nDIM = {dim}" + _STEP_CASE)


# Under x64 (accuracy_study's f64-oracle mode runs the fp32 production
# paths in the SAME process) a bare Python-int divisor in a kernel or
# BlockSpec index map becomes an i64 constant whose i64->i32
# convert_element_type hits unbounded recursion in Mosaic's
# _convert_helper -- round 4 lost all four 1M force-error drain cases to
# it.  These export the full production steps with x64 ON (config set
# after import, before first trace; the env var is ignored by this
# build, CLAUDE.md).
@pytest.mark.parametrize("algo", ["bvh", "octree"])
@pytest.mark.parametrize("dim", [2, 3])
def test_bench_config_step_lowers_under_x64(algo, dim):
    _run(f"jax.config.update('jax_enable_x64', True)\n"
         f"ALGO = {algo!r}\nDIM = {dim}" + _STEP_CASE)


@pytest.mark.parametrize("dim", [2, 3])
def test_knob_octree_step_lowers(dim):
    _run(f"DIM = {dim}" + _KNOB_OCT_CASE)


@pytest.mark.parametrize("dim", [2, 3])
def test_knob_bvh_step_lowers(dim):
    _run(f"DIM = {dim}" + _KNOB_BVH_CASE)


# ---- partitioned / mesh-tile multi-chip paths (VERDICT r5 item 5) ---------
#
# test_sharding.py runs these on the 8-device CPU mesh, which (like
# interpret mode) never exercises Mosaic: a shard_map-wrapped Pallas
# layout could regress at TPU lowering with the suite green, and no TPU
# hardware here will ever catch it.  Export the FULL partitioned steps
# (distributed sort + psum heap + halo near field + ring beyond pass,
# use_pallas=True exactly as _use_pallas_eval selects on TPU) for the
# real tpu platform at a bench-shaped n=2^20 galaxy config, both the 1-D
# body mesh and the 2-D (body x tile) --mesh-tile layout.
_PARTITIONED_CASE = """
jax.config.update("jax_num_cpu_devices", 8)
import numpy as np
from nbody_tpu.models import build_galaxy_model
from nbody_tpu.parallel.tree_partitioned import (
    make_partitioned_bvh_step, make_partitioned_octree_step)
cfg, state = build_galaxy_model(1 << 20, DIM, np.float32)
mk = (make_partitioned_octree_step if ALGO == "octree"
      else make_partitioned_bvh_step)
step = mk(cfg, NS, use_pallas=True, tile_shards=TS)
export.export(jax.jit(lambda s: step(s)[0].x), platforms=["tpu"])(state)
print("LOWER_OK")
"""


@pytest.mark.parametrize("algo", ["bvh", "octree"])
@pytest.mark.parametrize("dim", [2, 3])
def test_partitioned_step_lowers(algo, dim):
    _run(f"ALGO = {algo!r}\nDIM = {dim}\nNS = 8\nTS = 1"
         + _PARTITIONED_CASE)


@pytest.mark.parametrize("algo", ["bvh", "octree"])
def test_partitioned_mesh_tile_step_lowers(algo):
    # (S/2) x 2 layout: 4 body shards x 2 tile shards = 8 devices
    _run(f"ALGO = {algo!r}\nDIM = 3\nNS = 4\nTS = 2"
         + _PARTITIONED_CASE)
