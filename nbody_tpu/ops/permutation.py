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
