"""Hilbert-sorted implicit BVH (Barnes-Hut) -- TPU-native rebuild of
src/bvh.h.

The reference's design is already level-synchronous and pointer-free, which
makes it the natural first tree on a TPU (SURVEY.md section 2, strategy 6):

  * bodies are sorted along a Hilbert curve (locality);
  * the tree is a complete binary heap over the sorted body array:
    nleafs = bit_ceil(n) (bvh.h:151), node l's children are 2l+1 / 2l+2,
    level l occupies heap slots [2^l - 1, 2^(l+1) - 1);
  * "leaf level" is the body array itself; the deepest stored level pairs
    bodies two-by-two (bvh.h:177-207); zero mass marks dead padding nodes
    (bvh.h:186);
  * refit is one vectorized pass per level, log2(n) passes total
    (bvh.h:210-243) -- here each pass is a reshape + masked reduction over
    contiguous slices instead of a for_each;
  * the force traversal (bvh.h:251-324) is a stackless walk with the MAC
    bw^2 < theta^2 * dist2 and covered-particle-count termination. Here it
    is one lax.while_loop vmapped over bodies: lanes diverge in data but
    share control flow, and Hilbert order keeps neighboring lanes on
    similar paths.

Forces match the reference formula exactly: a += m_j (x_j - x_i) /
(d2^{3/2} + eps) for both accepted monopoles and leaf bodies (bvh.h:297,308).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from nbody_tpu.ops.geometry import aabb_of_points, dist3_from_d2
from nbody_tpu.ops.hilbert import hilbert_key_u32pair, quantize
from nbody_tpu.ops.permutation import sort_arrays_by_u32pair
from nbody_tpu.state import SystemState


def _bit_ceil(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


@dataclasses.dataclass
class BVHTree:
    """Flat heap-ordered node arrays (sized 2^nlevels - 1)."""
    mm: jnp.ndarray   # (nnodes,)     node masses (0 = dead)
    mx: jnp.ndarray   # (nnodes, dim) node centers of mass
    bw: jnp.ndarray   # (nnodes,)     node widths (max aabb side)
    nlevels: int      # levels excluding the leaf (body) level

jax.tree_util.register_dataclass(
    BVHTree, data_fields=["mm", "mx", "bw"], meta_fields=["nlevels"]
)


def build_tree(m: jnp.ndarray, x: jnp.ndarray, eps: float) -> BVHTree:
    """Level-synchronous refit over Hilbert-sorted bodies (bvh.h:174-244)."""
    n, dim = x.shape
    dtype = x.dtype
    nleafs = _bit_ceil(max(n, 2))
    nlevels = nleafs.bit_length() - 1        # countr_zero(nleafs)
    last_level = nlevels - 1
    tol = jnp.asarray(10.0 * float(eps), dtype)

    # deepest stored level: one node per body pair (bvh.h:177-207)
    count = 1 << last_level
    bl = jnp.arange(count) * 2
    br = bl + 1
    has_l = bl < n
    has_r = br < n
    mlb = jnp.where(has_l, m[jnp.clip(bl, 0, n - 1)], jnp.zeros((), dtype))
    mrb = jnp.where(has_r, m[jnp.clip(br, 0, n - 1)], jnp.zeros((), dtype))
    xlb = x[jnp.clip(bl, 0, n - 1)]
    xrb = x[jnp.clip(br, 0, n - 1)]
    mass = mlb + mrb
    # center of mass; single-body nodes use the body position exactly
    com_pair = (mlb[:, None] * xlb + mrb[:, None] * xrb) / jnp.where(
        mass == 0, jnp.ones((), dtype), mass
    )[:, None]
    com = jnp.where(has_r[:, None], com_pair, xlb)
    com = jnp.where(has_l[:, None], com, jnp.zeros((), dtype))
    bmin_pair = jnp.minimum(xlb, xrb) - tol
    bmax_pair = jnp.maximum(xlb, xrb) + tol
    bmin = jnp.where(has_r[:, None], bmin_pair, xlb - tol)
    bmax = jnp.where(has_r[:, None], bmax_pair, xlb + tol)
    width = jnp.where(has_l, jnp.max(bmax - bmin, axis=1), jnp.zeros((), dtype))
    mass = jnp.where(has_l, mass, jnp.zeros((), dtype))

    levels_m = [mass]
    levels_x = [com]
    levels_w = [width]
    levels_bmin = [bmin]
    levels_bmax = [bmax]

    # upward merge, one vectorized pass per level (bvh.h:210-243)
    for _ in range(last_level):
        cm, cx = levels_m[0], levels_x[0]
        cbmin, cbmax, cw = levels_bmin[0], levels_bmax[0], levels_w[0]
        ml, mr = cm[0::2], cm[1::2]
        dead_l = ml == 0
        dead_r = mr == 0
        mass = ml + mr
        com_pair = (
            ml[:, None] * cx[0::2] + mr[:, None] * cx[1::2]
        ) / jnp.where(mass == 0, jnp.ones((), dtype), mass)[:, None]
        com = jnp.where(dead_r[:, None], cx[0::2], com_pair)
        com = jnp.where(dead_l[:, None], jnp.zeros((), dtype), com)
        bmin = jnp.where(dead_r[:, None], cbmin[0::2], jnp.minimum(cbmin[0::2], cbmin[1::2]))
        bmax = jnp.where(dead_r[:, None], cbmax[0::2], jnp.maximum(cbmax[0::2], cbmax[1::2]))
        width = jnp.where(dead_r, cw[0::2], jnp.max(bmax - bmin, axis=1))
        width = jnp.where(dead_l, jnp.zeros((), dtype), width)
        mass = jnp.where(dead_l, jnp.zeros((), dtype), mass)
        levels_m.insert(0, mass)
        levels_x.insert(0, com)
        levels_w.insert(0, width)
        levels_bmin.insert(0, bmin)
        levels_bmax.insert(0, bmax)

    return BVHTree(
        mm=jnp.concatenate(levels_m),
        mx=jnp.concatenate(levels_x),
        bw=jnp.concatenate(levels_w),
        nlevels=nlevels,
    )


def compute_force(tree: BVHTree, m: jnp.ndarray, x: jnp.ndarray,
                  theta: float, G: float, eps: float) -> jnp.ndarray:
    """Stackless MAC traversal (bvh.h:251-324), one while_loop vmapped over
    bodies. Returns accelerations in the sorted body order."""
    n, dim = x.shape
    dtype = x.dtype
    nlevels = tree.nlevels
    leaf_level = nlevels
    nnodes = (1 << nlevels) - 1
    theta2 = jnp.asarray(float(theta) ** 2, dtype)
    epsv = float(eps)
    Gv = jnp.asarray(G, dtype)

    mm, mx, bw = tree.mm, tree.mx, tree.bw

    def traverse_one(i, xi):
        def cond(s):
            _, _, _, covered = s
            return covered < n

        def body(s):
            t, level, acc, covered = s
            parent = (t - 1) // 2
            is_leaf = level == leaf_level

            # --- leaf-level branch: direct sum over the node's <=2 bodies
            bidx = t - nnodes
            acc_leaf = acc
            for k in range(2):
                b = bidx + k
                valid = (b >= 0) & (b < n) & (b != i)
                bc = jnp.clip(b, 0, n - 1)
                xj = x[bc]
                d = xj - xi
                d2 = jnp.sum(d * d)
                w = m[bc] / dist3_from_d2(d2, epsv)
                acc_leaf = acc_leaf + jnp.where(valid, w, jnp.zeros((), dtype)) * d
            covered_leaf = covered + 2
            # force_ascend_right (bvh.h:272-275)
            t_leaf = parent + 1
            lvl_leaf = level - 1

            # --- internal-node branch: MAC test (bvh.h:246-248,304-315)
            tc = jnp.clip(t, 0, nnodes - 1)
            mj = mm[tc]
            xj = mx[tc]
            d = xj - xi
            d2 = jnp.sum(d * d)
            approx = bw[tc] * bw[tc] < theta2 * d2
            w = mj / dist3_from_d2(d2, epsv)
            acc_node = acc + jnp.where(approx, w, jnp.zeros((), dtype)) * d
            contained = jnp.asarray(1, jnp.int32) << (
                jnp.asarray(nlevels, jnp.int32) - level
            )
            covered_node = covered + jnp.where(approx, contained, 0)
            # ascend_right: right child -> parent+1/level-1, else right sibling
            is_right = ((t - 1) % 2) == 1
            t_asc = jnp.where(is_right, parent + 1, t + 1)
            lvl_asc = jnp.where(is_right, level - 1, level)
            # descend_directly
            t_desc = 2 * t + 1
            lvl_desc = level + 1
            t_node = jnp.where(approx, t_asc, t_desc)
            lvl_node = jnp.where(approx, lvl_asc, lvl_desc)

            t_new = jnp.where(is_leaf, t_leaf, t_node)
            lvl_new = jnp.where(is_leaf, lvl_leaf, lvl_node)
            acc_new = jnp.where(is_leaf, acc_leaf, acc_node)
            cov_new = jnp.where(is_leaf, covered_leaf, covered_node)
            return (t_new, lvl_new, acc_new, cov_new)

        init = (
            jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32),
            jnp.zeros((dim,), dtype),
            jnp.asarray(0, jnp.int32),
        )
        _, _, acc, _ = jax.lax.while_loop(cond, body, init)
        return Gv * acc

    if n == 1:
        return jnp.zeros_like(x)
    return jax.vmap(traverse_one)(jnp.arange(n, dtype=jnp.int32), x)


@partial(jax.jit, static_argnames=("theta", "G", "eps", "resort", "traversal",
                                   "group_tile", "use_pallas", "refine",
                                   "window_tiles", "true_curve"))
def bvh_step_force(state: SystemState, theta: float, G: float, eps: float,
                   resort: bool = True, traversal: str = "group",
                   group_tile: int = 512, use_pallas: bool = False,
                   refine: int | None = None, window_tiles: int = 32,
                   true_curve: bool | None = None):
    """One BVH force evaluation: bbox -> hilbert sort -> refit -> traversal
    (the kernel sequence of run_bvh, bvh.h:382-397). Returns the PERMUTED
    state with `a` filled -- like the reference, the sort physically reorders
    the body arrays each step and they stay reordered.

    traversal="group" uses the tile-based interaction-list evaluation
    (nbody_tpu.ops.bvh_group; conservative MAC, never less accurate than
    the reference's); "per-body" is the faithful reference walk.
    """
    if true_curve is None:
        # ALL paths keep the reference's quirk-curve sort order
        # (vec.h:328 partial transform): body order is user-visible
        # (print-state, positions.bin), so the fast path must permute
        # identically to the faithful paths and the reference binary or
        # elementwise output comparisons (ci/check_state.py:43-50) break.
        # The real 3-D curve was measured perf-NEUTRAL on the fast path
        # (1.38 s vs 1.36 s, BASELINE.md design-space table) -- the
        # outside-window opens it was meant to cut are genuine mid-range
        # halo nodes, not curve-seam artifacts.  Opt in via
        # true_curve=True if the honest curve is wanted.
        true_curve = False
    if resort:
        xmin, xmax = aabb_of_points(state.x, eps)
        # payload-carrying lax.sort instead of lexsort + one packed
        # (n, 1+4*dim) row gather: all 13 body columns ride the sort
        # network's compare-exchanges.  Bit-identical order (stable sort,
        # pinned vs lexsort+gather in tests/test_permutation.py) and
        # measured faster at n=1M on v5e: 8.29 vs 9.70 ms/step 3-D,
        # 5.99 vs 9.23 ms 2-D (results/r4/bvh_sort.jsonl).  The packed
        # gather itself had already beaten five separate gathers ~4x.
        n, dim = state.x.shape
        cell = quantize(state.x, xmin, xmax - xmin, dim)
        hi, lo = hilbert_key_u32pair(cell, dim, true_curve=true_curve)
        m, x, v, a, ao = sort_arrays_by_u32pair(
            hi, lo, state.m, state.x, state.v, state.a, state.ao)
        state = SystemState(m=m, x=x, v=v, a=a, ao=ao)
    tree = build_tree(state.m, state.x, eps)
    if traversal == "group":
        from nbody_tpu.ops.bvh_group import (
            compute_force_grouped,
            compute_force_grouped_windowed,
        )

        if use_pallas:
            # gather-free masked/windowed evaluation -- the TPU fast path
            # (list building's batched row gathers run ~56M elem/s on v5e
            # and dominated the step; see compute_force_grouped_windowed)
            a, info = compute_force_grouped_windowed(
                tree, state.m, state.x, theta, G, eps, tile=group_tile,
                window_tiles=window_tiles, refine_levels=refine,
                interpret=(use_pallas == "interpret"),
            )
        else:
            a, info = compute_force_grouped(
                tree, state.m, state.x, theta, G, eps, tile=group_tile,
            )
        overflow = info["node_overflow"].astype(jnp.int32)
    else:
        a = compute_force(tree, state.m, state.x, theta, G, eps)
        overflow = jnp.zeros((), jnp.int32)
    aux = {"overflow": overflow, "root_mass": tree.mm[0]}
    return dataclasses.replace(state, a=a), tree, aux
