"""Hilbert key computation: vectorized vs scalar transcription of the
reference algorithm (vec.h:266-356)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nbody_tpu.ops.hilbert import (
    hilbert_key_scalar,
    hilbert_key_u32pair,
    hilbert_sort_perm,
    quantize,
)


@pytest.mark.parametrize("dim", [2, 3])
def test_vectorized_matches_scalar(dim):
    rng = np.random.default_rng(7)
    maxv = 0xFFFFFFFF if dim == 2 else 0x1FFFFF
    cells = rng.integers(0, maxv, size=(200, dim), dtype=np.uint32)
    hi, lo = hilbert_key_u32pair(jnp.asarray(cells), dim)
    hi = np.asarray(hi)
    lo = np.asarray(lo)
    for k in range(200):
        expect = hilbert_key_scalar(cells[k], dim)
        got = (int(hi[k]) << 32) | int(lo[k])
        assert got == expect, f"row {k}: {got:x} != {expect:x}"


def test_hilbert_locality_2d():
    """Adjacent cells on the curve are spatially adjacent: walking the key
    order over a small grid never jumps more than 1 cell (the defining
    Hilbert property; also holds for the reference's 2-D branch)."""
    n = 16
    xs, ys = np.meshgrid(np.arange(n, dtype=np.uint32), np.arange(n, dtype=np.uint32))
    cells = np.stack([xs.ravel(), ys.ravel()], axis=1)
    # scale coords up to the full 32-bit grid so the transform sees the
    # same relative order (top bits)
    shift = 32 - 4
    keys = [hilbert_key_scalar((cells[k].astype(np.uint64) << shift).astype(np.uint32), 2)
            for k in range(n * n)]
    order = np.argsort(keys)
    walk = cells[order].astype(np.int64)
    steps = np.abs(np.diff(walk, axis=0)).sum(axis=1)
    assert np.all(steps == 1), f"max step {steps.max()}"


def test_quantize_matches_reference_form():
    """cell = uint32((x - min) / (lengths / cells)) (bvh.h:33-44)."""
    x = jnp.asarray(np.array([[0.0, 0.0], [1.0, 2.0], [0.5, 1.0]], np.float32))
    xmin = jnp.asarray(np.array([0.0, 0.0], np.float32))
    lengths = jnp.asarray(np.array([1.0, 2.0], np.float32))
    cell = np.asarray(quantize(x, xmin, lengths, 2))
    assert cell[0, 0] == 0 and cell[0, 1] == 0
    # midpoint lands at ~half the grid
    assert abs(int(cell[2, 0]) - 0x7FFFFFFF) < 0x01000000


def test_sort_perm_groups_neighbors():
    rng = np.random.default_rng(3)
    # two tight clusters far apart: a Hilbert sort must not interleave them
    a = rng.normal(0.0, 0.01, (50, 2)).astype(np.float32)
    b = rng.normal(5.0, 0.01, (50, 2)).astype(np.float32) + np.array([5.0, 0.0], np.float32)
    x = jnp.asarray(np.concatenate([a, b]))
    xmin = jnp.min(x, axis=0)
    xmax = jnp.max(x, axis=0)
    perm = np.asarray(hilbert_sort_perm(x, xmin, xmax))
    labels = (perm >= 50).astype(int)
    # after sorting, cluster labels form two contiguous runs
    assert np.sum(np.abs(np.diff(labels))) == 1
