"""Ring-streamed sharded all-pairs force.

Bodies are sharded over the mesh's body axis. Each shard keeps its i-block
stationary and accumulates partial accelerations while the (m_j, x_j)
blocks rotate around the ring with lax.ppermute -- structurally identical
to ring attention (stationary query block, rotating key/value block), which
is the honest TPU analog of the reference's implicit unified-memory
all-to-all traffic (SURVEY.md section 2, "Distributed communication
backend"). After S rotations every shard has summed contributions from all
bodies; the collectives ride ICI and overlap with the per-block compute.

The per-block math is the exact all-pairs formula, so results equal the
single-device engine up to FP summation order (blocks are summed in ring
order instead of j order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nbody_tpu.config import SimConfig
from nbody_tpu.ops.allpairs import accel_rows_raw
from nbody_tpu.parallel.mesh import BODY_AXIS, body_mesh


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _ring_shard_fn(n_shards: int, eps: float, G: float, block_force,
                   m_loc, x_loc):
    """Runs inside shard_map: m_loc (nl,), x_loc (nl, dim) are this shard's
    bodies. Returns this shard's accelerations (nl, dim).  block_force
    (xi, mj, xj) -> raw accel is the per-rotation kernel -- the jnp block
    fallback or the tiled Pallas kernel."""
    perm = [(s, (s + 1) % n_shards) for s in range(n_shards)]

    def body(carry, _):
        acc, mj, xj = carry
        acc = acc + block_force(x_loc, mj, xj)
        mj = jax.lax.ppermute(mj, BODY_AXIS, perm)
        xj = jax.lax.ppermute(xj, BODY_AXIS, perm)
        return (acc, mj, xj), None

    acc0 = jnp.zeros_like(x_loc)
    (acc, _, _), _ = jax.lax.scan(
        body, (acc0, m_loc, x_loc), None, length=n_shards
    )
    return jnp.asarray(G, x_loc.dtype) * acc


def make_ring_allpairs(cfg: SimConfig, n_shards: int, use_pallas: bool = False,
                       mesh: Mesh | None = None,
                       pallas_interpret: bool = False,
                       tile_i: int = 512, tile_j: int = 2048):
    """Build an accel(m, x) callable that shards bodies over `n_shards`
    devices and computes all-pairs via the ppermute ring. Global-view:
    takes and returns unsharded (n,)-shaped arrays; jit + shard_map place
    the per-shard compute.  use_pallas=True runs the tiled Pallas block
    kernel per rotation (fp32 only) so sharded throughput scales the
    single-chip kernel number; pallas_interpret runs it in interpreter
    mode (CPU-mesh tests)."""
    if mesh is None:
        mesh = body_mesh(n_shards)

    eps = cfg.eps
    if use_pallas and np.dtype(cfg.dtype) == np.float32:
        from nbody_tpu.ops.pallas_allpairs import allpairs_block_pallas

        # per-shard blocks are n/n_shards rows; cap tiles accordingly
        nl = max(1, _round_up(cfg.n, n_shards) // n_shards)
        ti = min(tile_i, _round_up(nl, 8))
        tj = min(tile_j, _round_up(nl, 128))

        def block_force(xi, mj, xj):
            return allpairs_block_pallas(xi, mj, xj, eps, tile_i=ti,
                                         tile_j=tj,
                                         interpret=pallas_interpret)
    else:
        def block_force(xi, mj, xj):
            return accel_rows_raw(xi, mj, xj, eps)

    shard_fn = functools.partial(_ring_shard_fn, n_shards, cfg.eps, cfg.G,
                                 block_force)
    try:
        # check_vma off: pallas_call outputs don't carry vma annotations
        mapped = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(BODY_AXIS), P(BODY_AXIS, None)),
            out_specs=P(BODY_AXIS, None),
            check_vma=False,
        )
    except TypeError:  # older spelling
        mapped = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(BODY_AXIS), P(BODY_AXIS, None)),
            out_specs=P(BODY_AXIS, None),
            check_rep=False,
        )

    def shard_fn_gathered(m_loc, x_loc):
        # all-gather the per-shard results so the output is replicated and
        # can be sliced to a non-divisible body count
        out = shard_fn(m_loc, x_loc)
        return jax.lax.all_gather(out, BODY_AXIS, tiled=True)

    try:
        mapped_gathered = jax.shard_map(
            shard_fn_gathered,
            mesh=mesh,
            in_specs=(P(BODY_AXIS), P(BODY_AXIS, None)),
            out_specs=P(None, None),
            check_vma=False,  # all_gather output is replicated by construction
        )
    except TypeError:  # older spelling
        mapped_gathered = jax.shard_map(
            shard_fn_gathered,
            mesh=mesh,
            in_specs=(P(BODY_AXIS), P(BODY_AXIS, None)),
            out_specs=P(None, None),
            check_rep=False,
        )

    def accel(m: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        n = x.shape[0]
        npad = _round_up(n, n_shards)
        if npad == n:
            return mapped(m, x)
        # non-divisible body count: pad with massless bodies; results come
        # back replicated (slicing a sharded axis to a non-divisible size
        # is unsupported)
        mp = jnp.pad(m, (0, npad - n))
        xp = jnp.pad(x, ((0, npad - n), (0, 0)))
        return mapped_gathered(mp, xp)[:n]

    return accel


def ring_allpairs_accel(m, x, G: float, eps: float, mesh: Mesh | None = None):
    """One-shot convenience wrapper (used by tests)."""
    if mesh is None:
        mesh = body_mesh()
    n_shards = mesh.devices.size
    cfg = SimConfig(n=x.shape[0], dim=x.shape[1], dtype=x.dtype, G=G)
    # override eps in case caller's dtype-derived eps differs
    fn = make_ring_allpairs(
        SimConfig(n=x.shape[0], dim=x.shape[1], dtype=x.dtype, G=G), n_shards,
        mesh=mesh,
    )
    del cfg
    return fn(m, x)
