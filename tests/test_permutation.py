"""unpermute_rows + payload-carrying morton_sort: bit-exact equivalence
with the scatter / argsort+gather formulations they replaced.

The flip exists for TPU speed (scatter 47 ms vs sort ~3 ms per step at
n=1M, results/r4/morton_sort.jsonl rev 3); these tests pin that it only
MOVES values.  Reference parity: the sorted order and the restored
original order are both user-visible (positions.bin byte-compat,
io/saving.py), so the permutation must be IDENTICAL, not just a valid
sort — duplicate Morton keys (several bodies per deepest cell) force
the stability requirement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.ops.octree import max_depth, morton_keys, morton_sort
from nbody_tpu.ops.permutation import unpermute_rows


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("n", [1, 7, 4096])
def test_unpermute_rows_matches_scatter(dim, n):
    rng = np.random.default_rng(42 + dim + n)
    a = jnp.asarray(rng.standard_normal((n, dim)), jnp.float32)
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    want = jnp.zeros_like(a).at[perm].set(a)
    got = unpermute_rows(a, perm)
    assert (got == want).all()


@pytest.mark.parametrize("dim", [2, 3])
def test_morton_sort_matches_argsort_gather(dim):
    # coarse grid => many duplicate keys => stability is load-bearing
    n = 8192
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(-1.0, 1.0, (n, dim)), jnp.float32)
    m = jnp.asarray(rng.uniform(0.5, 2.0, (n,)), jnp.float32)
    lo = jnp.float32(-1.5)
    hi = jnp.float32(1.5)
    for depth in (2, max_depth(n, dim)):
        keys = morton_keys(x, lo, hi, depth)
        if depth == 2:
            assert len(np.unique(np.asarray(keys))) < n  # ties present
        perm_ref = jnp.argsort(keys)  # stable
        ms, xs, ks, perm = morton_sort(m, x, lo, hi, depth)
        assert (perm == perm_ref).all()
        assert (ms == m[perm_ref]).all()
        assert (xs == x[perm_ref]).all()
        assert (ks == keys[perm_ref]).all()
        # round trip: un-permuting the sorted rows restores the input
        assert (unpermute_rows(xs, perm) == x).all()


def test_unpermute_rows_jit_and_grid_sizes():
    # production shapes are padded to multiples of the tile; make sure
    # non-padded odd sizes work too (probe uses n=1000001)
    n, dim = 1001, 3
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal((n, dim)), jnp.float32)
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    got = jax.jit(unpermute_rows)(a, perm)
    want = jnp.zeros_like(a).at[perm].set(a)
    assert (got == want).all()


@pytest.mark.parametrize("dim", [2, 3])
def test_sort_arrays_by_u32pair_matches_lexsort_gather(dim):
    # the BVH hilbert-sort phase shape: 13 payload columns (m,x,v,a,ao),
    # duplicate (hi, lo) keys force the stability requirement
    from nbody_tpu.ops.permutation import sort_arrays_by_u32pair

    n = 4096
    rng = np.random.default_rng(11 + dim)
    hi = jnp.asarray(rng.integers(0, 4, n, dtype=np.uint32))
    lo = jnp.asarray(rng.integers(0, 16, n, dtype=np.uint32))
    m = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)
    mats = [jnp.asarray(rng.standard_normal((n, dim)), jnp.float32)
            for _ in range(4)]
    perm = jnp.lexsort((lo, hi))
    got = jax.jit(sort_arrays_by_u32pair)(hi, lo, m, *mats)
    assert (got[0] == m[perm]).all()
    for g, a in zip(got[1:], mats):
        assert (g == a[perm]).all()
