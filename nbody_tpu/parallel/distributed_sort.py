"""Distributed (cross-shard) Morton/Hilbert sort -- the enabling piece of
the partitioned-tree design (docs/DISTRIBUTED_TREES.md).

The replicated-tree layout (parallel/tree_sharded.py) keeps every shard's
memory at O(n) because the SORT runs replicated: each shard sorts all n
bodies and evaluates only its row range.  Weak scaling (n growing with S)
needs the sorted body stream itself to be sharded -- each shard holding
only its contiguous Morton range -- which requires sorting ACROSS shards.

Design: odd-even transposition sort at SHARD granularity.

  * each shard first sorts its local rows (one lax.sort);
  * then S compare-exchange rounds: in even rounds shards (0,1), (2,3),
    ... pair up, in odd rounds (1,2), (3,4), ...; each pair exchanges its
    full local block over ICI (lax.ppermute), both sides merge the 2
    blocks (one lax.sort of 2*nl rows), the lower-indexed shard keeps the
    lower half, the higher keeps the upper half;
  * after S rounds the concatenation of shard blocks is globally sorted
    (classic odd-even transposition correctness, applied to blocks: the
    0-1 principle lifts from elements to sorted blocks).

Why this shape for TPU:
  * STATIC everything -- every round moves exactly (nl, F) arrays, so the
    whole sort jits into one program with no data-dependent shapes (a
    sample/bucket sort needs ragged all_to_all, which XLA cannot express
    without worst-case O(n) per-shard padding);
  * total per-shard traffic is S rounds x nl rows = n rows -- the SAME
    order as the one all_gather per step the replicated layout pays, but
    per-shard MEMORY drops from O(n) to O(n/S);
  * merges use multi-operand lax.sort (keys + payload columns sorted
    together): fully vectorized, no row gathers (v5e row gathers run
    ~56M elem/s and would dominate -- CLAUDE.md perf rule).

For an ALMOST-sorted stream (bodies move slowly between steps, so the
per-step re-sort starts from last step's order) the transposition
converges in O(displacement) rounds; a production stepper can run a
fixed small number of rounds and psum a boundary-sortedness check to
early-exit via lax.while_loop.  This module runs the full S rounds --
correct from any input order.

No reference counterpart (the reference is single-device; its sort is
one thrust/oneDPL sort_by_key, bvh.h:122-127) -- this is the rebuild's
own multi-chip design.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _merge_sorted(keys, cols, num_keys):
    """One multi-operand sort: keys (list of (k,) u32, lexicographic
    major-first) and payload cols (list of (k,) float) sorted together."""
    out = jax.lax.sort(tuple(keys) + tuple(cols), dimension=0,
                       num_keys=num_keys)
    return list(out[:num_keys]), list(out[num_keys:])


def distributed_sort_rows(keys, cols, axis_name: str, n_shards: int):
    """Sort rows by key across all shards of `axis_name` (must be called
    INSIDE shard_map / pmap over that axis).

    keys: list of 1 or 2 local (nl,) uint32 arrays, lexicographic with
          keys[0] the major word ((hi, lo) pairs -- no uint64 on TPU).
    cols: list of local (nl,) payload arrays (any float dtype).

    Returns (keys, cols) with shard i holding rows [i*nl, (i+1)*nl) of
    the globally sorted order.  Caller pads rows so every shard holds the
    same nl (pad keys with 0xFFFFFFFF so padding sorts to the top end).
    """
    num_keys = len(keys)
    keys, cols = _merge_sorted(keys, cols, num_keys)   # local sort
    if n_shards == 1:
        return keys, cols
    idx = jax.lax.axis_index(axis_name)
    nl = keys[0].shape[0]

    for r in range(n_shards):
        # partner pattern: even rounds (0,1)(2,3)...; odd rounds (1,2)(3,4)...
        if r % 2 == 0:
            pairs = [(i, i ^ 1) for i in range(n_shards) if (i ^ 1) < n_shards]
        else:
            pairs = []
            for i in range(1, n_shards - 1, 2):
                pairs += [(i, i + 1), (i + 1, i)]
        perm = [(src, dst) for src, dst in pairs]
        partner_of = {src: dst for src, dst in pairs}
        has_partner = jnp.zeros((), jnp.bool_)
        partner = jnp.zeros((), jnp.int32)
        for src, dst in pairs:
            has_partner = has_partner | (idx == src)
            partner = jnp.where(idx == src, dst, partner)

        if not perm:           # S == 1 odd round
            continue
        # exchange full blocks with the partner (one collective per dtype
        # group: keys as a (nl, K) u32 matrix, payload as (nl, F) floats)
        kmat = jnp.stack(keys, axis=1)
        cmat = jnp.stack(cols, axis=1)
        kth = jax.lax.ppermute(kmat, axis_name, perm)
        cth = jax.lax.ppermute(cmat, axis_name, perm)

        mk = [jnp.concatenate([keys[j], kth[:, j]]) for j in range(num_keys)]
        mc = [jnp.concatenate([cols[j], cth[:, j]]) for j in range(len(cols))]
        mk, mc = _merge_sorted(mk, mc, num_keys)
        keep_low = idx < partner
        sel = jnp.where(keep_low, 0, nl)
        new_keys = [jax.lax.dynamic_slice_in_dim(k, sel, nl) for k in mk]
        new_cols = [jax.lax.dynamic_slice_in_dim(c, sel, nl) for c in mc]
        # shards without a partner this round (ends of odd rounds) keep
        # their block -- ppermute zero-fills missing sources, so gate on
        # has_partner rather than trusting the merged result
        keys = [jnp.where(has_partner, nk, k)
                for nk, k in zip(new_keys, keys)]
        cols = [jnp.where(has_partner, nc, c)
                for nc, c in zip(new_cols, cols)]
    return keys, cols
