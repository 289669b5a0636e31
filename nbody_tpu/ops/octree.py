"""Barnes-Hut octree -- TPU-native re-architecture of src/octree.h.

The reference builds its octree with lock-free CAS insertion, an atomic
bump allocator, and latch-based bottom-up monopole passes
(octree.h:114-224). None of that maps to a TPU (SURVEY.md section 2,
strategy 5), so the tree is rebuilt from scratch as a sort-derived
prefix tree with identical observable semantics:

  * the root box is the reference's square bound: scalar min/max over all
    coordinates (including 0), widened by +-1 (octree.h:93-112);
  * positions are quantized to D bits per dimension; the level-l cell of a
    body is the l-bit prefix of its Morton key, which is exactly the cell
    the reference's recursive center-comparison descent would reach
    (child index = sum_i 2^i * (pos_i > center_i), octree.h:130-137);
  * bodies are sorted by Morton key once; every level's node set, body
    ranges, and monopoles then come from segmented reductions over the
    sorted order -- replacing CAS insertion and latch climbing with
    sort + scan + segment_sum;
  * traversal uses the reference MAC `side/d < theta` with side halving
    per level and the softened distance d = sqrt(d2) + eps, and the same
    force kernel a += m_j (x_j - x) / d^3 (octree.h:236-247; note the
    octree softening (sqrt(d2)+eps)^3 differs from bvh/all-pairs'
    d2^1.5+eps -- replicated faithfully).

Divergence from the reference (documented): the reference subdivides until
every body is alone in a leaf, with unbounded depth; here depth is capped
at D levels (u32 keys), and a level-D cell holding several bodies is a
leaf evaluated by exact direct sum over its (contiguous) body range --
never less accurate than the reference's monopole approximation. A node
holding exactly one body is a body-leaf at any level, exactly like the
reference. Unlike the BVH engine, the octree does NOT reorder the caller's
state (the reference octree never sorts): forces are scattered back to the
original body order.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from nbody_tpu.ops.geometry import scalar_bounds
from nbody_tpu.ops.permutation import unpermute_rows
from nbody_tpu.state import SystemState


def max_depth(n: int, dim: int) -> int:
    """Key depth: enough levels that ~16 bodies per cell on average at the
    deepest level, capped by the u32 key budget (16 levels in 2-D, 10 in
    3-D)."""
    cap = 16 if dim == 2 else 10
    need = 0
    cells = 1
    while cells < 16 * max(n, 2) and need < cap:
        need += 1
        cells <<= dim
    return max(need, 2)


def _level_capacity(level: int, n: int, dim: int) -> int:
    """Static upper bound on node count at `level`: min(2^(level*dim), n)."""
    if level * dim >= max(n, 1).bit_length() + 1:
        return n
    return min(1 << (level * dim), n)


def morton_keys(x: jnp.ndarray, lo, hi, depth: int) -> jnp.ndarray:
    """Quantize positions into the root box [lo, hi] and interleave to
    Morton keys with coordinate i at bit offset i (matching the reference's
    child_pos = sum_i 2^i * (pos_i > center_i), octree.h:130-137)."""
    n, dim = x.shape
    side = hi - lo
    scale = jnp.asarray(1 << depth, x.dtype) / side
    cell = jnp.clip(
        ((x - lo) * scale).astype(jnp.int32), 0, (1 << depth) - 1
    ).astype(jnp.uint32)
    key = jnp.zeros((n,), jnp.uint32)
    for d in range(dim):
        xc = cell[:, d]
        for b in range(depth):
            p = b * dim + d
            key = key | (((xc >> jnp.uint32(b)) & jnp.uint32(1)) << jnp.uint32(p))
    return key


@dataclasses.dataclass
class OctreeLevels:
    """Per-level flattened node arrays (padded to static capacities)."""
    mass: jnp.ndarray         # (total_cap,)
    com: jnp.ndarray          # (total_cap, dim)
    start: jnp.ndarray        # (total_cap,) first sorted-body index
    count: jnp.ndarray        # (total_cap,) bodies in node (0 = padding)
    child_start: jnp.ndarray  # (total_cap,) level-local index of first child
    child_count: jnp.ndarray  # (total_cap,)
    parent: jnp.ndarray       # (total_cap,) level-local index of parent node
    offsets: tuple            # static: flat offset of each level
    caps: tuple               # static: capacity of each level
    depth: int

jax.tree_util.register_dataclass(
    OctreeLevels,
    data_fields=["mass", "com", "start", "count", "child_start", "child_count",
                 "parent"],
    meta_fields=["offsets", "caps", "depth"],
)


def build_octree(m: jnp.ndarray, x: jnp.ndarray, lo, hi, depth: int) -> tuple:
    """Sort bodies by Morton key and derive every level's nodes via
    segmented reductions. Returns (levels, perm) where perm is the sort
    permutation (sorted body order is internal only)."""
    n, dim = x.shape
    dtype = x.dtype
    keys = morton_keys(x, lo, hi, depth)
    perm = jnp.argsort(keys)  # stable
    ks = keys[perm]
    ms = m[perm]
    xs = x[perm]
    mxs = ms[:, None] * xs

    caps = tuple(_level_capacity(l, n, dim) for l in range(depth + 1))
    offsets = tuple(int(sum(caps[:l])) for l in range(depth + 1))
    total = sum(caps)

    mass = jnp.zeros((total,), dtype)
    com = jnp.zeros((total, dim), dtype)
    start = jnp.zeros((total,), jnp.int32)
    count = jnp.zeros((total,), jnp.int32)
    child_start = jnp.zeros((total,), jnp.int32)
    child_count = jnp.zeros((total,), jnp.int32)
    parent = jnp.zeros((total,), jnp.int32)

    ones = jnp.ones((n,), jnp.int32)
    body_idx = jnp.arange(n, dtype=jnp.int32)

    node_id_prev = None
    for l in range(depth + 1):
        cap = caps[l]
        shift = jnp.uint32((depth - l) * dim)
        pfx = ks >> shift
        newseg = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), pfx[1:] != pfx[:-1]]
        )
        node_id = jnp.cumsum(newseg.astype(jnp.int32)) - 1  # (n,)
        nid = jnp.minimum(node_id, cap - 1)
        lmass = jax.ops.segment_sum(ms, nid, num_segments=cap)
        lmx = jax.ops.segment_sum(mxs, nid, num_segments=cap)
        lcount = jax.ops.segment_sum(ones, nid, num_segments=cap)
        lstart = jax.ops.segment_min(body_idx, nid, num_segments=cap)
        lstart = jnp.where(lcount > 0, lstart, 0)
        lcom = lmx / jnp.where(lmass == 0, jnp.ones((), dtype), lmass)[:, None]

        o = offsets[l]
        mass = jax.lax.dynamic_update_slice(mass, lmass, (o,))
        com = jax.lax.dynamic_update_slice(com, lcom, (o, 0))
        start = jax.lax.dynamic_update_slice(start, lstart, (o,))
        count = jax.lax.dynamic_update_slice(count, lcount, (o,))

        if l > 0:
            # children of level l-1 nodes are contiguous runs in this level:
            # child_start = min over this level's node ids grouped by parent,
            # child_count = number of level-l nodes per parent.
            pcap = caps[l - 1]
            pid = jnp.minimum(node_id_prev, pcap - 1)
            # one representative body per level-l node: the segment head
            head = newseg
            lid_of_body = nid
            cs = jax.ops.segment_min(
                jnp.where(head, lid_of_body, jnp.asarray(n, jnp.int32)),
                pid,
                num_segments=pcap,
            )
            cc = jax.ops.segment_sum(head.astype(jnp.int32), pid, num_segments=pcap)
            cs = jnp.where(cc > 0, cs, 0)
            po = offsets[l - 1]
            child_start = jax.lax.dynamic_update_slice(child_start, cs, (po,))
            child_count = jax.lax.dynamic_update_slice(child_count, cc, (po,))
            # parent of each level-l node: its head body's level-(l-1) node
            par = jax.ops.segment_max(
                jnp.where(head, pid, jnp.asarray(-1, jnp.int32)),
                nid, num_segments=cap,
            )
            par = jnp.maximum(par, 0)
            parent = jax.lax.dynamic_update_slice(parent, par, (o,))
        node_id_prev = node_id

    levels = OctreeLevels(
        mass=mass, com=com, start=start, count=count,
        child_start=child_start, child_count=child_count, parent=parent,
        offsets=offsets, caps=caps, depth=depth,
    )
    return levels, perm, ms, xs


def compute_force(levels: OctreeLevels, ms: jnp.ndarray, xs: jnp.ndarray,
                  root_side, theta: float, G: float, eps: float) -> jnp.ndarray:
    """theta-MAC traversal over the prefix tree: per body, a STACKLESS DFS
    using parent pointers and contiguous sibling runs -- the same shape as
    the reference's pointer walk (octree.h:227-255), so the loop state is a
    handful of scalars per body (no stacks, no scatters; the TPU compiler
    chokes on scatter-heavy batched while loops). Same MAC, same force
    kernel as the reference.

    Per-body state machine (one while_loop, vmapped):
      mode VISIT:   evaluate node (lvl, idx): accept monopole / queue a
                    direct-sum range (deepest multi-body cell) / descend to
                    first child; accept & direct switch to ADVANCE.
      mode ADVANCE: move to the next sibling if any, else ascend to the
                    parent and stay in ADVANCE; advancing from the root
                    terminates.
      ds_rem > 0:   drain one queued direct-sum body per iteration first.
    """
    n, dim = xs.shape
    dtype = xs.dtype
    depth = levels.depth
    epsv = jnp.asarray(float(eps), dtype)
    thetav = jnp.asarray(float(theta), dtype)
    Gv = jnp.asarray(G, dtype)
    offsets = jnp.asarray(levels.offsets, jnp.int32)

    mass, com = levels.mass, levels.com
    start, count = levels.start, levels.count
    child_start, child_count = levels.child_start, levels.child_count
    parent = levels.parent
    # side length per level: root_side / 2^l
    side_tbl = root_side / jnp.asarray(
        [float(1 << l) for l in range(depth + 1)], dtype
    )

    VISIT = jnp.asarray(0, jnp.int32)
    ADVANCE = jnp.asarray(1, jnp.int32)
    DONE = jnp.asarray(2, jnp.int32)

    def traverse_one(xi):
        init = (
            jnp.asarray(0, jnp.int32),   # lvl
            jnp.asarray(0, jnp.int32),   # idx (level-local)
            VISIT,                        # mode
            jnp.asarray(0, jnp.int32),   # ds_pos
            jnp.asarray(0, jnp.int32),   # ds_rem
            jnp.zeros((dim,), dtype),    # acc
        )

        def cond(s):
            lvl, idx, mode, ds_pos, ds_rem, acc = s
            return (mode != DONE) | (ds_rem > 0)

        def body(s):
            lvl, idx, mode, ds_pos, ds_rem, acc = s
            flat = offsets[jnp.clip(lvl, 0, depth)] + idx

            # ---- drain one direct-sum body (highest priority)
            b = jnp.clip(ds_pos, 0, n - 1)
            xj_b = xs[b]
            d_b = xj_b - xi
            dx_b = jnp.sqrt(jnp.sum(d_b * d_b)) + epsv
            # guard: TPU-emulated f64 has f32 exponent range, so eps^3
            # UNDERFLOWS to 0 for self-pairs (sqrt(0)+eps)^3 -> m/0*0 = NaN
            den_b = dx_b * dx_b * dx_b
            w_b = jnp.where(den_b > 0, ms[b] / den_b, jnp.zeros((), dtype))
            draining = ds_rem > 0

            # ---- VISIT: evaluate current node
            cnt = count[flat]
            is_single = cnt <= 1
            bfirst = jnp.clip(start[flat], 0, n - 1)
            # 1-body nodes use the body's exact mass/position (the reference
            # stores the body itself in the leaf monopole, octree.h:143)
            mj = jnp.where(is_single, ms[bfirst], mass[flat])
            xj = jnp.where(is_single, xs[bfirst], com[flat])
            d = xj - xi
            dx = jnp.sqrt(jnp.sum(d * d)) + epsv
            side = side_tbl[jnp.clip(lvl, 0, depth)]
            # reference MAC: accept leaves or side/d < theta (octree.h:239-241)
            accept = is_single | (side / dx < thetav)
            at_max = lvl >= depth
            direct = (~accept) & at_max
            descend = (~accept) & (~at_max)
            den = dx * dx * dx
            w = jnp.where(den > 0, mj / den, jnp.zeros((), dtype))
            visiting = (~draining) & (mode == VISIT)

            # ---- ADVANCE: next sibling or ascend
            par = parent[flat]
            par_flat = offsets[jnp.clip(lvl - 1, 0, depth)] + par
            sib_end = child_start[par_flat] + child_count[par_flat]
            has_sib = (idx + 1) < sib_end
            at_root = lvl <= 0
            advancing = (~draining) & (mode == ADVANCE)

            # ---- merge transitions
            acc = acc + jnp.where(
                draining, w_b, jnp.where(visiting & accept, w, jnp.zeros((), dtype))
            ) * jnp.where(draining, d_b, d)

            ds_pos_new = jnp.where(
                draining, ds_pos + 1, jnp.where(visiting & direct, start[flat], ds_pos)
            )
            ds_rem_new = jnp.where(
                draining, ds_rem - 1, jnp.where(visiting & direct, cnt, ds_rem)
            )

            lvl_new = jnp.where(
                visiting & descend, lvl + 1,
                jnp.where(advancing & ~at_root & ~has_sib, lvl - 1, lvl),
            )
            idx_new = jnp.where(
                visiting & descend, child_start[flat],
                jnp.where(
                    advancing & ~at_root,
                    jnp.where(has_sib, idx + 1, par),
                    idx,
                ),
            )
            mode_new = jnp.where(
                draining, mode,
                jnp.where(
                    visiting,
                    jnp.where(descend, VISIT, ADVANCE),
                    # advancing:
                    jnp.where(
                        at_root, DONE, jnp.where(has_sib, VISIT, ADVANCE)
                    ),
                ),
            )
            return (lvl_new, idx_new, mode_new, ds_pos_new, ds_rem_new, acc)

        out = jax.lax.while_loop(cond, body, init)
        return Gv * out[5]

    return jax.vmap(traverse_one)(xs)


def robust_quant_box(x: jnp.ndarray, lo, hi):
    """ROBUST, ANISOTROPIC quantization box for the fast octree path.

    Robust: the min/max box balloons when escaper bodies fly out (dt=10
    galaxy: 13x after 10 steps), collapsing the core into a few cells and
    blowing the entry caps. Quantize over a quantile box instead
    (morton_keys clamps outliers into edge cells); the fast path's MAC
    uses true per-cell extents, so acceptance stays conservative
    regardless.  Never larger than the true per-dim bounds (heavy-tailed
    distributions have quantile boxes ~= the full box, and the margin
    would then just coarsen every cell).

    Anisotropic (returns per-dim (lo, hi) vectors): the reference's cube
    cells are a CPU-pointer-walk convenience; the fast path's MAC never
    uses the nominal cell side -- only true extents -- so per-dim scaling
    is free, and it is what keeps cell occupancy balanced for flattened
    distributions (the reference's 3-D galaxy is a thin disk: cube cells
    there hold area-scaled occupancy, which previously needed an occ=8
    depth hack and still left 1402/1954 tiles falling back)."""
    stride = max(1, x.shape[0] // 16384)
    xs_sub = x[::stride]
    qlo = jnp.quantile(xs_sub, 0.005, axis=0)
    qhi = jnp.quantile(xs_sub, 0.995, axis=0)
    if x.shape[1] == 3:
        # SCALAR (cube) box in 3-D: measured n=1M 3-D galaxy theta=0.5
        # (scripts/probe_r3a.py): scalar 2.12 s / 629k entries vs aniso
        # 2.49 s / 813k.  The anisotropic box balances OCCUPANCY, but the
        # resulting slab cells have larger max-extent widths, so the MAC
        # opens more of them; cube cells are fewer and fatter (~2.6k
        # bodies), which packs the S-block entry list ~25% denser.
        span = jnp.max(qhi - qlo)
        lo_s = jnp.min(x)
        hi_s = jnp.max(x)
        lo_r = jnp.maximum(jnp.min(qlo) - 0.15 * span, lo_s) - 1.0
        hi_r = jnp.minimum(jnp.max(qhi) + 0.15 * span, hi_s) + 1.0
        return (jnp.full((3,), lo_r, x.dtype),
                jnp.full((3,), hi_r, x.dtype))
    span = qhi - qlo                                   # per-dim
    lo_d = jnp.min(x, axis=0)
    hi_d = jnp.max(x, axis=0)
    lo_r = jnp.maximum(qlo - 0.15 * span, lo_d) - 1.0
    hi_r = jnp.minimum(qhi + 0.15 * span, hi_d) + 1.0
    return lo_r, hi_r


def morton_sort(m: jnp.ndarray, x: jnp.ndarray, lo, hi, depth: int):
    """Morton keys + stable sort of (m, x) -- the fast path's analog of
    the reference's insert phase (octree.h:114-181). Returns
    (ms, xs, ks, perm).

    One payload-carrying lax.sort instead of argsort + three row
    gathers: bit-identical output (stable sort with an iota operand IS
    the stable argsort permutation; probe_morton_sort pins equality at
    n=1M galaxy incl. duplicate keys), measured 6.9 -> 3.1 ms at n=1M
    3-D (results/r4/morton_sort.jsonl)."""
    keys = morton_keys(x, lo, hi, depth)
    n, dim = x.shape
    ops = (keys, jnp.arange(n, dtype=jnp.int32), m) + tuple(
        x[:, d] for d in range(dim))
    out = lax.sort(ops, num_keys=1, is_stable=True)
    return out[2], jnp.stack(out[3:], axis=1), out[0], out[1]


def tree_size_from_keys(ks: jnp.ndarray, depth: int, dim: int) -> jnp.ndarray:
    """Occupied-node count per --print-info (octree.h:313-316): the
    per-level count of distinct sorted-key prefixes."""
    size = jnp.ones((), jnp.int32)                   # root
    for l in range(1, depth + 1):
        pre = ks >> jnp.uint32((depth - l) * dim)
        size = size + 1 + jnp.sum((pre[1:] != pre[:-1]).astype(jnp.int32))
    return size


@partial(jax.jit, static_argnames=("theta", "G", "eps", "depth", "traversal", "use_pallas",
                                   "group_tile", "window_tiles",
                                   "descend_levels", "descend_caps"))
def octree_step_force(state: SystemState, theta: float, G: float, eps: float,
                      depth: int, traversal: str = "group",
                      group_tile: int = 512, use_pallas: bool = False,
                      window_tiles: int = 32, descend_levels: int = 0,
                      descend_caps: tuple = (1024, 1024, 2048)):
    """One octree force evaluation: bounds -> morton sort -> segmented build
    -> MAC traversal -> scatter back to original body order (the kernel
    sequence of run_octree, octree.h:321-328, minus clear/insert which do
    not exist in a rebuild-from-sort design). traversal="group" uses the
    tile-based interaction lists (nbody_tpu.ops.octree_group); "per-body"
    is the faithful per-body walk."""
    lo, hi = scalar_bounds(state.x)
    if traversal == "group" and use_pallas:
        # gather-free fast path: no OctreeLevels construction at all --
        # Morton sort + dense prefix heap inside the grouped kernel; the
        # aux tree size (occupied nodes per level, octree.h:313-316) is
        # the per-level count of distinct sorted-key prefixes
        from nbody_tpu.ops.octree_group import compute_force_grouped_fast

        lo_r, hi_r = robust_quant_box(state.x, lo, hi)
        ms, xs, ks, perm = morton_sort(state.m, state.x, lo_r, hi_r, depth)
        a_sorted, info = compute_force_grouped_fast(
            ms, xs, ks, lo_r, hi_r, depth, theta, G, eps, tile=group_tile,
            window_tiles=window_tiles,
            interpret=(use_pallas == "interpret"),
            descend_levels=descend_levels, descend_caps=descend_caps,
        )
        tree_size = tree_size_from_keys(ks, depth, state.x.shape[1])
        a = unpermute_rows(a_sorted, perm)
        aux = {
            "overflow": info["node_overflow"].astype(jnp.int32),
            "tree_size": tree_size,
            "root_mass": jnp.sum(state.m),
        }
        return dataclasses.replace(state, a=a), None, aux
    levels, perm, ms, xs = build_octree(state.m, state.x, lo, hi, depth)
    if traversal == "group":
        from nbody_tpu.ops.octree_group import compute_force_grouped

        a_sorted, info = compute_force_grouped(
            levels, ms, xs, hi - lo, theta, G, eps, tile=group_tile,
        )
        overflow = info["node_overflow"].astype(jnp.int32)
    else:
        a_sorted = compute_force(levels, ms, xs, hi - lo, theta, G, eps)
        overflow = jnp.zeros((), jnp.int32)
    a = unpermute_rows(a_sorted, perm)
    aux = {
        "overflow": overflow,
        # occupied-node count and root monopole mass for --print-info
        # (octree.h:313-316), computed from THIS step's tree
        "tree_size": jnp.sum(levels.count > 0).astype(jnp.int32),
        "root_mass": levels.mass[0],
    }
    return dataclasses.replace(state, a=a), levels, aux
