"""Row-permutation helpers built on multi-operand lax.sort.

TPU scatters issue near-serially (~100M elem/s through the tunnel,
CLAUDE.md perf rule); XLA's sort is a data-independent network that
carries payload columns through its compare-exchanges at a fraction of
that cost.  probe_morton_sort rev 3 (results/r4/morton_sort.jsonl,
n=1M 3-D): the un-permute SCATTER `zeros.at[perm].set(a)` alone costs
47 ms/step, while the full keys+sort+carry pipeline is ~6.5 ms — so
inverting a permutation is cheaper as a SECOND key sort than as a
scatter.

Reference parity note: these helpers only MOVE values (bit-exact
vs the scatter/gather formulations); the reference has no analog
(its octree inserts bodies in place, octree.h:114-181)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def sort_arrays_by_u32pair(hi: jnp.ndarray, lo: jnp.ndarray,
                           *arrays: jnp.ndarray) -> tuple:
    """Stable-sort 1-D/2-D row arrays by the (hi, lo) u32 key pair via ONE
    multi-operand lax.sort, carrying every column as payload.  Bit-identical
    order to jnp.lexsort((lo, hi)) followed by row gathers (stability pinned
    in tests/test_permutation.py), but without the gathers: the TPU analog
    of the reference's zip sort (bvh.h:24-96).  Returns the arrays in key
    order (keys themselves are not returned)."""
    cols = []
    splits = []  # (ncols, orig_ndim) per array, to re-pack below
    for a in arrays:
        if a.ndim == 1:
            cols.append(a)
            splits.append(1)
        else:
            cols.extend(a[:, d] for d in range(a.shape[1]))
            splits.append(a.shape[1])
    out = lax.sort((hi, lo) + tuple(cols), num_keys=2, is_stable=True)
    res = []
    k = 2
    for a, nc in zip(arrays, splits):
        if a.ndim == 1:
            res.append(out[k])
        else:
            res.append(jnp.stack(out[k:k + nc], axis=1))
        k += nc
    return tuple(res)


def unpermute_rows(a_sorted: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """Invert a row permutation: returns `out` with out[perm[i]] =
    a_sorted[i], exactly like zeros_like(a_sorted).at[perm].set(a_sorted)
    but via one payload-carrying lax.sort (sorting rows by key=perm
    places row i at position perm[i]).  perm must be a permutation of
    0..n-1 (unique keys, so stability is irrelevant).  Bit-exact: values
    are only moved, never recomputed."""
    ops = (perm,) + tuple(a_sorted[:, d] for d in range(a_sorted.shape[1]))
    out = lax.sort(ops, num_keys=1, is_stable=False)
    return jnp.stack(out[1:], axis=1)
