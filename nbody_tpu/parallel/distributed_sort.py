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

`adaptive=True` wraps the compare-exchange rounds in a lax.while_loop
with a psum'd GLOBAL sortedness check (every block is internally sorted
throughout, so sorted == every shard boundary ordered): an almost-sorted
stream -- the per-step re-sort of a simulation whose bodies move slowly
-- exits after O(displacement) phase pairs instead of paying all S
rounds.  The check costs one tiny ppermute + psum per phase pair.

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


def _phase_perm(n_shards: int, parity: int):
    """Compare-exchange pairs for one phase: even parity (0,1)(2,3)...,
    odd parity (1,2)(3,4)....  Returns (perm, partner_of) with perm
    containing both directions of every pair."""
    if parity % 2 == 0:
        pairs = [(i, i ^ 1) for i in range(n_shards) if (i ^ 1) < n_shards]
    else:
        pairs = []
        for i in range(1, n_shards - 1, 2):
            pairs += [(i, i + 1), (i + 1, i)]
    return pairs


def _one_phase(keys, cols, idx, nl, n_shards, parity, axis_name):
    """One compare-exchange phase (blocks must be locally sorted)."""
    num_keys = len(keys)
    pairs = _phase_perm(n_shards, parity)
    if not pairs:
        return keys, cols
    has_partner = jnp.zeros((), jnp.bool_)
    partner = jnp.zeros((), jnp.int32)
    for src, dst in pairs:
        has_partner = has_partner | (idx == src)
        partner = jnp.where(idx == src, dst, partner)

    # exchange full blocks with the partner (one collective per dtype
    # group: keys as a (nl, K) u32 matrix, payload as (nl, F) floats)
    kmat = jnp.stack(keys, axis=1)
    cmat = jnp.stack(cols, axis=1)
    kth = jax.lax.ppermute(kmat, axis_name, pairs)
    cth = jax.lax.ppermute(cmat, axis_name, pairs)

    # CANONICAL concat order (lower shard's block first on BOTH sides):
    # with ties, the stable merge resolves by input position, so the two
    # sides must sort the IDENTICAL sequence or their kept halves do not
    # partition the union -- [mine, theirs] silently duplicated/dropped
    # tied rows (caught by the mass-multiset regression test)
    keep_low = idx < partner
    mk = [jnp.concatenate([jnp.where(keep_low, keys[j], kth[:, j]),
                           jnp.where(keep_low, kth[:, j], keys[j])])
          for j in range(num_keys)]
    mc = [jnp.concatenate([jnp.where(keep_low, cols[j], cth[:, j]),
                           jnp.where(keep_low, cth[:, j], cols[j])])
          for j in range(len(cols))]
    mk, mc = _merge_sorted(mk, mc, num_keys)
    sel = jnp.where(keep_low, 0, nl)
    new_keys = [jax.lax.dynamic_slice_in_dim(kk, sel, nl) for kk in mk]
    new_cols = [jax.lax.dynamic_slice_in_dim(cc, sel, nl) for cc in mc]
    # shards without a partner this phase (ends of odd phases) keep
    # their block -- ppermute zero-fills missing sources, so gate on
    # has_partner rather than trusting the merged result
    keys = [jnp.where(has_partner, nk, kk) for nk, kk in zip(new_keys, keys)]
    cols = [jnp.where(has_partner, nc, cc) for nc, cc in zip(new_cols, cols)]
    return keys, cols


def _globally_sorted(keys, idx, n_shards, axis_name):
    """True on every shard iff the concatenated blocks are sorted.
    Blocks are internally sorted throughout, so this reduces to every
    shard boundary being ordered: left neighbour's max key <= my min."""
    perm = [(s, s + 1) for s in range(n_shards - 1)]
    prev_hi = [jax.lax.ppermute(k[-1], axis_name, perm) for k in keys]
    lo_my = [k[0] for k in keys]
    # lexicographic prev_hi <= lo_my (shard 0's zero-filled prev passes
    # trivially for uint keys)
    ok = jnp.zeros((), jnp.bool_)
    eq = jnp.ones((), jnp.bool_)
    for ph, lm in zip(prev_hi, lo_my):
        ok = ok | (eq & (ph < lm))
        eq = eq & (ph == lm)
    ok = ok | eq
    n_ok = jax.lax.psum(ok.astype(jnp.int32), axis_name)
    return n_ok == n_shards


def distributed_sort_rows(keys, cols, axis_name: str, n_shards: int,
                          adaptive: bool = False):
    """Sort rows by key across all shards of `axis_name` (must be called
    INSIDE shard_map / pmap over that axis).

    keys: list of 1..3 local (nl,) uint32 arrays, lexicographic with
          keys[0] the major word ((hi, lo) pairs -- no uint64 on TPU).
    cols: list of local (nl,) payload arrays (any float dtype).
    adaptive: early-exit via the global sortedness check (see module
          docstring) -- pays O(phases actually needed) instead of S.

    Returns (keys, cols) with shard i holding rows [i*nl, (i+1)*nl) of
    the globally sorted order.  Caller pads rows so every shard holds the
    same nl (pad keys must sort to the top end -- the partitioned steps
    use a MAJOR pad-flag key word).
    """
    num_keys = len(keys)
    keys, cols = _merge_sorted(keys, cols, num_keys)   # local sort
    if n_shards == 1:
        return keys, cols
    idx = jax.lax.axis_index(axis_name)
    nl = keys[0].shape[0]

    if not adaptive:
        for r in range(n_shards):
            keys, cols = _one_phase(keys, cols, idx, nl, n_shards, r,
                                    axis_name)
        return keys, cols

    # adaptive: pairs of (even, odd) phases under a while_loop; the trip
    # decision (psum'd sortedness) is replicated, so every shard agrees
    n_pairs = (n_shards + 1) // 2 + 1

    def body(carry):
        i, _, keys, cols = carry
        keys, cols = _one_phase(list(keys), list(cols), idx, nl, n_shards,
                                0, axis_name)
        keys, cols = _one_phase(keys, cols, idx, nl, n_shards, 1,
                                axis_name)
        done = _globally_sorted(keys, idx, n_shards, axis_name)
        return (i + 1, done, tuple(keys), tuple(cols))

    def cond(carry):
        i, done, *_ = carry
        return (~done) & (i < n_pairs)

    done0 = _globally_sorted(keys, idx, n_shards, axis_name)
    carry = (jnp.zeros((), jnp.int32), done0, tuple(keys), tuple(cols))
    _, _, keys, cols = jax.lax.while_loop(cond, body, carry)
    return list(keys), list(cols)
