"""Supertile sparse descent below L* for the TPU tree fast paths.

Both gather-free fast paths (ops/bvh_group.py windowed, ops/octree_group.py
fast) stop their dense mask traversal at a cutoff level L* and evaluate
every still-open node's bodies EXACTLY.  Measured at n=1M 3-D galaxy
theta=0.5 that exact mass is ~77k bodies per 512-body tile (72% block
occupancy): the 3-D step is bound by near-field exact pairs that the
reference's per-body walk would evaluate as DEEPER MONOPOLES
(octree.h:236-247, bvh.h:246-324 descend until the MAC passes).

This module descends the open set below L* sparsely -- per-level lists
instead of dense masks, because a dense (tiles, nodes) mask at one level
below L* already costs GBs in 3-D:

  supertile   G consecutive body tiles share one descent (their open sets
              overlap almost entirely); the descent list is the UNION of
              member opens, tracked as a G-bit mask per node.  All
              bookkeeping runs at ntiles/G rows, which is what makes the
              per-level flat gathers affordable (v5e: ~220M elem/s flat,
              ~56M elem/s batched rows -- see CLAUDE.md).
  MAC         per MEMBER tile (the engine callback computes dmin2 against
              each member's bounding box), so acceptance granularity is
              identical to the dense stage above L*.
  accept      children passing their member-tile MAC become that tile's
              deeper MONOPOLES: compacted per level (packed-key sort: the
              node id carries its G accept bits in the low bits, so the
              payload rides the sort key -- no row gathers), then mass/com
              are flat-gathered for the compacted ids only and evaluated
              by pallas_group_eval.group_shared_masked_eval_pallas.
  open        children failing for >=1 member survive to the next level
              (same packed-key compaction).  After the last level the
              engine turns the per-member survivors into exact entries.
  overflow    any cap overflow (open list, monopole list) marks the
              supertile's member tiles for the engines' exact direct-sum
              fallback -- force truncation stays structurally impossible.

Every accepted monopole satisfies width/dist < theta with width >= the
node's true extent and dist <= the true body distance, so the
conservative never-less-accurate guarantee of the group MAC is
preserved level by level.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp

BIG32 = jnp.int32(0x7FFFFFFF)


class DescendResult(NamedTuple):
    mono_mass: jnp.ndarray    # (Ts, Mtot) f32, 0 = padding
    mono_com: jnp.ndarray     # (Ts, Mtot, dim)
    mono_mask: jnp.ndarray    # (Tp, Mtot) f32 per-member-tile accept
    final_ids: jnp.ndarray    # (Ts, Kf) int32 node ids at the last level
    final_bits: jnp.ndarray   # (Ts, Kf) int32 per-member open bits
    final_valid: jnp.ndarray  # (Ts, Kf) bool
    overflow: jnp.ndarray     # (Tp,) bool per member tile


def _compact(key: jnp.ndarray, cap: int):
    """Row-sort ascending, keep the first `cap` columns.  Returns the
    sorted keys (BIG32 = empty) and the per-row real count."""
    cnt = jnp.sum(key != BIG32, axis=1).astype(jnp.int32)
    return jnp.sort(key, axis=1)[:, :cap], cnt


def supertile_descend(
    open0: jnp.ndarray,        # (T, C0) bool per-tile open mask at level 0
    nbranch: int,
    levels: int,
    G: int,
    k0: int,
    k_caps: Sequence[int],     # open-list cap after each level (len >= levels)
    m_caps: Sequence[int],     # monopole cap per level (len >= levels)
    mac_fn: Callable,          # (r, ids (Ts,Kc)) -> dict: see below
    mono_fn: Callable,         # (r, ids (Ts,cap)) -> (mass (Ts,cap),
                               #                       com (Ts,cap,dim))
) -> DescendResult:
    """Run `levels` sparse refinement levels below the cutoff.

    mac_fn(r, ids) returns, for children ids at relative level r (1-based):
      accept (Ts, G, Kc) bool   member-tile MAC pass (width/dist < theta,
                                or exact-single); the descent masks it with
                                the member's openness itself
      alive  (Ts, Kc) bool      node exists / nonempty
      forced (Ts, Kc) bool      never accept (stays open); may be None
    ids passed to the callbacks can contain garbage in padded slots --
    callbacks must clip them for gathers; the descent masks results.
    """
    T, C0 = open0.shape
    Ts = -(-T // G)
    Tp = Ts * G
    if Tp != T:
        open0 = jnp.pad(open0, ((0, Tp - T), (0, 0)))
    dim = None

    id_bits = max(1, (C0 - 1)).bit_length()
    if id_bits + dim_bits_guard(levels, nbranch) + G > 31:
        raise ValueError(
            "supertile_descend: packed sort key overflows int32 "
            f"(C0={C0}, levels={levels}, nbranch={nbranch}, G={G})")

    ob = open0.reshape(Ts, G, C0)
    bits0 = jnp.zeros((Ts, C0), jnp.int32)
    for g in range(G):
        bits0 = bits0 | (ob[:, g, :].astype(jnp.int32) << g)
    ids_all = jnp.arange(C0, dtype=jnp.int32)[None, :]
    key0 = jnp.where(bits0 > 0, (ids_all << G) | bits0, BIG32)
    key, cnt0 = _compact(key0, k0)
    overflow_s = cnt0 > k0

    mono_mass_parts, mono_com_parts, mono_bits_parts = [], [], []
    maskG = (1 << G) - 1
    jj = jnp.arange(nbranch, dtype=jnp.int32)

    for r in range(1, levels + 1):
        Kprev = key.shape[1]
        valid = key != BIG32
        ids = jnp.where(valid, key >> G, 0)
        pbits = jnp.where(valid, key & maskG, 0)

        ch = (ids[:, :, None] * nbranch + jj[None, None, :]) \
            .reshape(Ts, Kprev * nbranch)
        chbits = jnp.repeat(pbits, nbranch, axis=1)       # (Ts, Kc)
        chvalid = jnp.repeat(valid, nbranch, axis=1)

        st = mac_fn(r, ch)
        accept_m = st["accept"]                            # (Ts, G, Kc)
        alive = st["alive"] & chvalid
        forced = st.get("forced")
        if forced is not None:
            accept_m = accept_m & ~forced[:, None, :]

        memb = (chbits[:, None, :] >> jnp.arange(G)[None, :, None]) & 1
        memb = (memb > 0) & alive[:, None, :]              # member-open
        acc_g = memb & accept_m
        open_g = memb & ~accept_m

        accbits = jnp.zeros_like(chbits)
        openbits = jnp.zeros_like(chbits)
        for g in range(G):
            accbits = accbits | (acc_g[:, g, :].astype(jnp.int32) << g)
            openbits = openbits | (open_g[:, g, :].astype(jnp.int32) << g)

        # monopole compaction for this level
        mkey = jnp.where(accbits > 0, (ch << G) | accbits, BIG32)
        mkey, mcnt = _compact(mkey, m_caps[r - 1])
        overflow_s = overflow_s | (mcnt > m_caps[r - 1])
        mvalid = mkey != BIG32
        mids = jnp.where(mvalid, mkey >> G, 0)
        mbits = jnp.where(mvalid, mkey & maskG, 0)
        mm, mcom = mono_fn(r, mids)
        mono_mass_parts.append(jnp.where(mvalid, mm, 0.0))
        mono_com_parts.append(mcom)
        mono_bits_parts.append(mbits)

        # open compaction -> next level (or the final survivor list)
        okey = jnp.where(openbits > 0, (ch << G) | openbits, BIG32)
        cap = k_caps[r - 1]
        okey, ocnt = _compact(okey, cap)
        overflow_s = overflow_s | (ocnt > cap)
        key = okey

    mono_mass = jnp.concatenate(mono_mass_parts, axis=1)
    mono_com = jnp.concatenate(mono_com_parts, axis=1)
    mono_bits = jnp.concatenate(mono_bits_parts, axis=1)   # (Ts, Mtot)
    dtype = mono_mass.dtype
    gvec = jnp.arange(G, dtype=jnp.int32)
    mono_mask = ((mono_bits[:, None, :] >> gvec[None, :, None]) & 1) \
        .astype(dtype).reshape(Tp, -1)

    fvalid = key != BIG32
    final_ids = jnp.where(fvalid, key >> G, 0)
    final_bits = jnp.where(fvalid, key & maskG, 0)
    overflow = jnp.broadcast_to(overflow_s[:, None], (Ts, G)).reshape(Tp)
    return DescendResult(mono_mass, mono_com, mono_mask,
                         final_ids, final_bits, fvalid, overflow)


def dim_bits_guard(levels: int, nbranch: int) -> int:
    """Extra id bits added by `levels` of nbranch-ary descent."""
    return levels * (nbranch - 1).bit_length()
