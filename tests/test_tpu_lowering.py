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
