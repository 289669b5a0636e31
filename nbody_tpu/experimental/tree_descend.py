"""Supertile sparse descent below L* for the TPU tree fast paths.

PARKED (round 3): measured 5.8 s/step vs 1.6 s for the production exact
near field at n=1M 3-D galaxy theta=0.5 (BASELINE.md negative-results
table) -- the emission matrices and 11-field gathers cost more than the
monopole-ized mass saves.  Opt-in via compute_force_grouped_fast's
descend_levels; not reachable from the CLI or engine defaults.

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
              deeper MONOPOLES: compacted per level by a lax.sort whose
              key is the node id and whose PAYLOAD is the G accept bits
              (no batched row gathers), then mass/com are flat-gathered
              for the compacted ids only and evaluated by
              pallas_group_eval.group_shared_masked_eval_pallas.
  open        children failing for >=1 member survive to the next level
              (same key+payload compaction).  After the last level the
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
import numpy as np

# np (not jnp): a module-level jnp scalar becomes a leaked TRACER when the
# module is first imported from inside a traced function (see the
# BIG32_I note in octree_group.py); numpy embeds as a literal.
BIG32 = np.int32(0x7FFFFFFF)


class DescendResult(NamedTuple):
    mono_mass: jnp.ndarray    # (Ts, Mtot) f32, 0 = padding
    mono_com: jnp.ndarray     # (Ts, Mtot, dim)
    mono_mask: jnp.ndarray    # (Tp, Mtot) f32 per-member-tile accept
    final_ids: jnp.ndarray    # (Ts, Kf) int32 node ids at the last level
    final_bits: jnp.ndarray   # (Ts, Kf) int32 per-member open bits
    final_valid: jnp.ndarray  # (Ts, Kf) bool
    overflow: jnp.ndarray     # (Tp,) bool per member tile
    diag: dict                # per-level monopole/open counts (traced)


def _compact(ids: jnp.ndarray, bits: jnp.ndarray, cap: int):
    """Keep the columns with bits != 0, packed left, truncated to `cap`.

    Sorts each row by node id (empty slots pushed to +inf) carrying the
    member-bit payload through lax.sort -- ids stay full int32 range, no
    packed-key width limit.  Returns (ids, bits, real_count)."""
    valid = bits != 0
    key = jnp.where(valid, ids, BIG32)
    pay = jnp.where(valid, bits, 0)
    sk, sp = jax.lax.sort((key, pay), dimension=1, num_keys=1)
    cnt = jnp.sum(valid, axis=1).astype(jnp.int32)
    return sk[:, :cap], sp[:, :cap], cnt


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
    if C0 * nbranch ** levels > (1 << 31):
        raise ValueError("supertile_descend: node ids overflow int32 "
                         f"(C0={C0}, levels={levels}, nbranch={nbranch})")

    ob = open0.reshape(Ts, G, C0)
    bits0 = jnp.zeros((Ts, C0), jnp.int32)
    for g in range(G):
        bits0 = bits0 | (ob[:, g, :].astype(jnp.int32) << g)
    ids0 = jnp.broadcast_to(jnp.arange(C0, dtype=jnp.int32)[None, :],
                            (Ts, C0))
    ids, bits, cnt0 = _compact(ids0, bits0, k0)
    overflow_s = cnt0 > k0
    diag = {"open_0": jnp.sum(cnt0)}

    mono_mass_parts, mono_com_parts, mono_bits_parts = [], [], []
    jj = jnp.arange(nbranch, dtype=jnp.int32)
    gvec = jnp.arange(G, dtype=jnp.int32)

    for r in range(1, levels + 1):
        Kprev = ids.shape[1]
        valid = ids != BIG32
        pids = jnp.where(valid, ids, 0)
        pbits = jnp.where(valid, bits, 0)

        ch = (pids[:, :, None] * nbranch + jj[None, None, :]) \
            .reshape(Ts, Kprev * nbranch)
        chbits = jnp.repeat(pbits, nbranch, axis=1)       # (Ts, Kc)

        st = mac_fn(r, ch)
        accept_m = st["accept"]                            # (Ts, G, Kc)
        alive = st["alive"] & jnp.repeat(valid, nbranch, axis=1)
        forced = st.get("forced")
        if forced is not None:
            accept_m = accept_m & ~forced[:, None, :]

        memb = (chbits[:, None, :] >> gvec[None, :, None]) & 1
        memb = (memb > 0) & alive[:, None, :]              # member-open
        acc_g = memb & accept_m
        open_g = memb & ~accept_m

        accbits = jnp.zeros_like(chbits)
        openbits = jnp.zeros_like(chbits)
        for g in range(G):
            accbits = accbits | (acc_g[:, g, :].astype(jnp.int32) << g)
            openbits = openbits | (open_g[:, g, :].astype(jnp.int32) << g)

        # monopole compaction for this level
        mids, mbits, mcnt = _compact(ch, accbits, m_caps[r - 1])
        overflow_s = overflow_s | (mcnt > m_caps[r - 1])
        mvalid = mids != BIG32
        mm, mcom = mono_fn(r, jnp.where(mvalid, mids, 0))
        mono_mass_parts.append(jnp.where(mvalid, mm, 0.0))
        mono_com_parts.append(mcom)
        mono_bits_parts.append(jnp.where(mvalid, mbits, 0))
        diag[f"mono_{r}"] = jnp.sum(mcnt)

        # open compaction -> next level (or the final survivor list)
        ids, bits, ocnt = _compact(ch, openbits, k_caps[r - 1])
        overflow_s = overflow_s | (ocnt > k_caps[r - 1])
        diag[f"open_{r}"] = jnp.sum(ocnt)

    mono_mass = jnp.concatenate(mono_mass_parts, axis=1)
    mono_com = jnp.concatenate(mono_com_parts, axis=1)
    mono_bits = jnp.concatenate(mono_bits_parts, axis=1)   # (Ts, Mtot)
    mono_mask = ((mono_bits[:, None, :] >> gvec[None, :, None]) & 1) \
        .astype(mono_mass.dtype).reshape(Tp, -1)

    fvalid = ids != BIG32
    final_ids = jnp.where(fvalid, ids, 0)
    final_bits = jnp.where(fvalid, bits, 0)
    overflow = jnp.broadcast_to(overflow_s[:, None], (Ts, G)).reshape(Tp)
    return DescendResult(mono_mass, mono_com, mono_mask,
                         final_ids, final_bits, fvalid, overflow, diag)
