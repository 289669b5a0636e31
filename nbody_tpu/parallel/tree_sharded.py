"""Sharded Barnes-Hut: replicated tree, body-sharded traversal/evaluation.

The tree is O(n) data while force evaluation is the O(n log n) hot part,
so the multi-chip layout is: all-gather the (Hilbert-sorted) body arrays,
build the tree redundantly on every shard (cheap, avoids a distributed
tree build), and evaluate forces only for the shard's own contiguous tile
range -- collectives ride ICI once per step (the all_gather), traversal
and evaluation are purely local (SURVEY.md section 2: "replicated-tree /
sharded-leaves Barnes-Hut").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from nbody_tpu.config import SimConfig
from nbody_tpu.parallel.mesh import BODY_AXIS, body_mesh


def make_sharded_bvh_force(cfg: SimConfig, n_shards: int,
                           mesh: Mesh | None = None):
    """Build accel(m, x) over Hilbert-SORTED sharded body arrays. The
    caller is responsible for sorting (the sort itself is a global op; at
    multi-chip scale it runs as a replicated computation here)."""
    if mesh is None:
        mesh = body_mesh(n_shards)
    from nbody_tpu.ops.bvh import build_tree
    from nbody_tpu.ops.bvh_group import compute_force_grouped

    theta, G, eps = float(cfg.theta), float(cfg.G), cfg.eps

    def shard_fn(m_loc, x_loc):
        # replicate bodies: one all_gather per step over ICI
        m_all = jax.lax.all_gather(m_loc, BODY_AXIS, tiled=True)
        x_all = jax.lax.all_gather(x_loc, BODY_AXIS, tiled=True)
        tree = build_tree(m_all, x_all, eps)
        a_all, _ = compute_force_grouped(tree, m_all, x_all, theta, G, eps)
        # keep only this shard's rows
        idx = jax.lax.axis_index(BODY_AXIS)
        nl = x_loc.shape[0]
        return jax.lax.dynamic_slice_in_dim(a_all, idx * nl, nl, axis=0)

    try:
        mapped = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(BODY_AXIS), P(BODY_AXIS, None)),
            out_specs=P(BODY_AXIS, None),
            check_vma=False,
        )
    except TypeError:
        mapped = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(BODY_AXIS), P(BODY_AXIS, None)),
            out_specs=P(BODY_AXIS, None),
            check_rep=False,
        )

    def shard_fn_gathered(m_loc, x_loc):
        out = shard_fn(m_loc, x_loc)
        return jax.lax.all_gather(out, BODY_AXIS, tiled=True)

    try:
        mapped_gathered = jax.shard_map(
            shard_fn_gathered, mesh=mesh,
            in_specs=(P(BODY_AXIS), P(BODY_AXIS, None)),
            out_specs=P(None, None),
            check_vma=False,
        )
    except TypeError:
        mapped_gathered = jax.shard_map(
            shard_fn_gathered, mesh=mesh,
            in_specs=(P(BODY_AXIS), P(BODY_AXIS, None)),
            out_specs=P(None, None),
            check_rep=False,
        )

    def accel(m: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        n = x.shape[0]
        npad = -(-n // n_shards) * n_shards
        if npad == n:
            return mapped(m, x)
        # non-divisible: pad with massless bodies; gather the result
        # replicated so it can be sliced back to n rows
        m = jnp.pad(m, (0, npad - n))
        x = jnp.pad(x, ((0, npad - n), (0, 0)))
        return mapped_gathered(m, x)[:n]

    return accel
