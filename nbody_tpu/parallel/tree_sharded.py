"""Sharded Barnes-Hut: replicated tree, body-sharded traversal/evaluation.

The tree is O(n) data while force evaluation is the O(n log n) hot part,
so the multi-chip layout is: Hilbert/Morton-sort globally, build the tree
redundantly on every shard (cheap, avoids a distributed tree build), and
evaluate forces only for the shard's OWN contiguous row range of the
sorted bodies via the group traversal's row-range mode
(ops/bvh_group.py / ops/octree_group.py `row_start`/`nrows`) -- so the
O(n log n) list-building AND the dense evaluation are both 1/S per shard.
Collectives ride ICI: one all_gather of the per-shard accelerations per
step, one psum of the overflow counter (SURVEY.md section 2:
"replicated-tree / sharded-leaves Barnes-Hut"; the reference is
single-device, src/bvh.h:327-418 / octree.h:266-347, so this layout is
the rebuild's own design).

Padding contract: bodies are padded to a multiple of n_shards * tile
with ZERO-MASS copies of the last sorted body (position duplication
keeps every bounding box unchanged; zero mass makes the extra bodies
force-invisible).

Scaling ceiling (honest statement): only the force EVALUATION is 1/S per
shard. The Hilbert/Morton sort and the tree build run replicated on
every shard over the full body arrays, each shard holds all n bodies in
HBM, and every step all_gathers the full (n, dim) acceleration array.
So per-shard memory is O(n) (not O(n/S)), the sort/build portion of the
step does not speed up with S, and the all_gather moves n*dim*4 bytes
per step over ICI. For the measured v5e step breakdown (evaluation >>
sort+build at n=1M) this still yields useful speedups to moderate S, but
it is NOT weak scaling: pushing n beyond one chip's HBM, or S past the
point where the replicated sort dominates, needs a distributed sort and
a partitioned tree (future work, not implemented).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from nbody_tpu.config import SimConfig
from nbody_tpu.parallel.mesh import BODY_AXIS, body_mesh
from nbody_tpu.state import SystemState


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except TypeError:  # older spelling
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_rep=False)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_bodies(m, x, npad: int):
    """Append zero-mass copies of the last body (bbox-neutral padding)."""
    n = x.shape[0]
    if npad == n:
        return m, x
    m = jnp.concatenate([m, jnp.zeros((npad - n,), m.dtype)])
    x = jnp.concatenate([x, jnp.broadcast_to(x[-1], (npad - n, x.shape[1]))])
    return m, x


def make_sharded_bvh_force(cfg: SimConfig, n_shards: int,
                           mesh: Mesh | None = None, tile: int = 512,
                           use_pallas: bool = False):
    """accel(m, x) over Hilbert-SORTED body arrays: replicated build,
    row-sharded group evaluation.  The caller sorts (the sort is a global
    op; at multi-chip scale it runs replicated here)."""
    if mesh is None:
        mesh = body_mesh(n_shards)
    from nbody_tpu.ops.bvh import build_tree
    from nbody_tpu.ops.bvh_group import (
        compute_force_grouped,
        compute_force_grouped_windowed,
    )

    theta, G, eps = float(cfg.theta), float(cfg.G), cfg.eps

    def accel(m: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        n = x.shape[0]
        npad = _round_up(n, n_shards * tile)
        nrows = npad // n_shards
        mp, xp = _pad_bodies(m, x, npad)

        def shard_fn(m_all, x_all):
            tree = build_tree(m_all, x_all, eps)
            idx = jax.lax.axis_index(BODY_AXIS)
            if use_pallas:
                a_loc, _ = compute_force_grouped_windowed(
                    tree, m_all, x_all, theta, G, eps, tile=tile,
                    row_start=idx * nrows, nrows=nrows,
                    interpret=(use_pallas == "interpret"),
                )
            else:
                a_loc, _ = compute_force_grouped(
                    tree, m_all, x_all, theta, G, eps, tile=tile,
                    row_start=idx * nrows, nrows=nrows,
                )
            return jax.lax.all_gather(a_loc, BODY_AXIS, tiled=True)

        mapped = _shard_map(
            shard_fn, mesh,
            in_specs=(P(), P(None, None)),
            out_specs=P(None, None),
        )
        return mapped(mp, xp)[:n]

    return accel


def make_sharded_bvh_step(cfg: SimConfig, opts):
    """Full --mesh N BVH step: global Hilbert sort + leapfrog around the
    sharded force.  Returns jitted (state, k) -> (state, aux)."""
    from nbody_tpu.ops.bvh import build_tree
    from nbody_tpu.ops.bvh_group import (
        compute_force_grouped,
        compute_force_grouped_windowed,
    )
    from nbody_tpu.ops.geometry import aabb_of_points
    from nbody_tpu.ops.hilbert import hilbert_key_u32pair, quantize
    from nbody_tpu.ops.integrator import leapfrog_step
    from nbody_tpu.ops.permutation import sort_arrays_by_u32pair

    n_shards = opts.mesh
    tile = opts.group_tile
    mesh = body_mesh(n_shards)
    theta, G, eps = float(cfg.theta), float(cfg.G), cfg.eps
    from nbody_tpu.sim.tree_engines import _use_pallas_eval
    upal = _use_pallas_eval(cfg, opts)

    def shard_fn(m_all, x_all):
        tree = build_tree(m_all, x_all, eps)
        idx = jax.lax.axis_index(BODY_AXIS)
        nrows = x_all.shape[0] // n_shards
        if upal:
            a_loc, info = compute_force_grouped_windowed(
                tree, m_all, x_all, theta, G, eps, tile=tile,
                row_start=idx * nrows, nrows=nrows,
                interpret=(upal == "interpret"),
            )
        else:
            a_loc, info = compute_force_grouped(
                tree, m_all, x_all, theta, G, eps, tile=tile,
                row_start=idx * nrows, nrows=nrows,
            )
        a_all = jax.lax.all_gather(a_loc, BODY_AXIS, tiled=True)
        over = jax.lax.psum(info["node_overflow"].astype(jnp.int32),
                            BODY_AXIS)
        return a_all, over, tree.mm[0]

    mapped = _shard_map(
        shard_fn, mesh,
        in_specs=(P(), P(None, None)),
        out_specs=(P(None, None), P(), P()),
    )

    @jax.jit
    def step(state: SystemState, k):
        n, dim = state.x.shape
        xmin, xmax = aabb_of_points(state.x, eps)
        # same payload-carrying sort as the single-chip resort phase
        # (ops/bvh.py; bit-exact vs lexsort+gather, measured faster)
        hi, lo = hilbert_key_u32pair(
            quantize(state.x, xmin, xmax - xmin, dim), dim)
        m_, x_, v_, a_, ao_ = sort_arrays_by_u32pair(
            hi, lo, state.m, state.x, state.v, state.a, state.ao)
        state = SystemState(m=m_, x=x_, v=v_, a=a_, ao=ao_)
        npad = _round_up(n, n_shards * tile)
        mp, xp = _pad_bodies(state.m, state.x, npad)
        a_all, over, root_mass = mapped(mp, xp)
        state = dataclasses.replace(state, a=a_all[:n])
        aux = {"overflow": over, "root_mass": root_mass}
        return leapfrog_step(state, cfg.dt), aux

    return step


def make_sharded_octree_step(cfg: SimConfig, opts):
    """Full --mesh N octree step: global Morton sort + replicated
    prefix-tree build, row-sharded group evaluation, scatter back."""
    from nbody_tpu.ops.geometry import scalar_bounds
    from nbody_tpu.ops.integrator import leapfrog_step
    from nbody_tpu.ops.octree import build_octree, max_depth, morton_keys
    from nbody_tpu.ops.octree_group import (
        compute_force_grouped,
        compute_force_grouped_fast,
    )

    n_shards = opts.mesh
    tile = opts.group_tile
    mesh = body_mesh(n_shards)
    theta, G, eps = float(cfg.theta), float(cfg.G), cfg.eps
    depth = max_depth(cfg.n, cfg.dim)
    from nbody_tpu.sim.tree_engines import _use_pallas_eval
    upal = _use_pallas_eval(cfg, opts)

    def shard_fn(ms_all, xs_all, side):
        # the tree is rebuilt per shard from the ALREADY-SORTED bodies
        # (keys are recomputed but the argsort is the identity, so the
        # rebuild is pure segmented reductions)
        idx = jax.lax.axis_index(BODY_AXIS)
        nrows = xs_all.shape[0] // n_shards
        if upal:
            ks_all = morton_keys(xs_all, side[0], side[1], depth)
            a_loc, info = compute_force_grouped_fast(
                ms_all, xs_all, ks_all, side[0], side[1], depth,
                theta, G, eps, tile=tile,
                row_start=idx * nrows, nrows=nrows,
                interpret=(upal == "interpret"),
            )
            from nbody_tpu.ops.octree import tree_size_from_keys

            tree_size_l = tree_size_from_keys(ks_all, depth, xs_all.shape[1])
            a_all = jax.lax.all_gather(a_loc, BODY_AXIS, tiled=True)
            over = jax.lax.psum(info["node_overflow"].astype(jnp.int32),
                                BODY_AXIS)
            return a_all, over, tree_size_l, jnp.sum(ms_all)
        levels, _, ms2, xs2 = build_octree(
            ms_all, xs_all, side[0], side[1], depth
        )
        a_loc, info = compute_force_grouped(
            levels, ms2, xs2, side[1] - side[0], theta, G, eps, tile=tile,
            row_start=idx * nrows, nrows=nrows,
        )
        a_all = jax.lax.all_gather(a_loc, BODY_AXIS, tiled=True)
        over = jax.lax.psum(info["node_overflow"].astype(jnp.int32),
                            BODY_AXIS)
        tree_size = jnp.sum(levels.count > 0).astype(jnp.int32)
        return a_all, over, tree_size, levels.mass[0]

    mapped = _shard_map(
        shard_fn, mesh,
        in_specs=(P(), P(None, None), P()),
        out_specs=(P(None, None), P(), P(), P()),
    )

    @jax.jit
    def step(state: SystemState, k):
        n, dim = state.x.shape
        lo, hi = scalar_bounds(state.x)
        if upal:
            # fast path needs only the sorted order, not the level build;
            # robust quantization box (see octree.robust_quant_box)
            from nbody_tpu.ops.octree import robust_quant_box

            lo, hi = robust_quant_box(state.x, lo, hi)
            perm = jnp.argsort(morton_keys(state.x, lo, hi, depth))
            ms, xs = state.m[perm], state.x[perm]
        else:
            # global Morton sort once; shards rebuild segmented-only
            levels, perm, ms, xs = build_octree(
                state.m, state.x, lo, hi, depth
            )
            del levels
        npad = _round_up(n, n_shards * tile)
        mp, xp = _pad_bodies(ms, xs, npad)
        a_all, over, tree_size, root_mass = mapped(
            mp, xp, jnp.stack([lo, hi])
        )
        a_sorted = a_all[:n]
        from nbody_tpu.ops.permutation import unpermute_rows
        a = unpermute_rows(a_sorted, perm)
        state = dataclasses.replace(state, a=a)
        aux = {"overflow": over, "tree_size": tree_size,
               "root_mass": root_mass}
        return leapfrog_step(state, cfg.dt), aux

    return step
