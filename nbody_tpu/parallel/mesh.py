"""Device-mesh helpers."""

from __future__ import annotations

import jax
from jax.sharding import Mesh


BODY_AXIS = "bodies"
TILE_AXIS = "tiles"


def body_tile_mesh(n_body: int, n_tile: int) -> Mesh:
    """A 2-D (body-shards x tile-shards) mesh for the partitioned trees
    (docs/DISTRIBUTED_TREES.md item 5).  The body axis carries the
    distributed sort, the replicated-heap psum and the halo ppermutes;
    the tile axis row-shards the force evaluation (each tile-shard
    evaluates 1/n_tile of its body shard's rows against the full
    heap/halo and one all_gather along the tile axis reassembles the
    accelerations).  On hardware, lay the tile axis on the faster ICI
    ring: its all_gather moves (n/S, dim) rows every step, while the
    body axis moves O(C) heap cells plus the halo blocks."""
    devs = jax.devices()
    need = n_body * n_tile
    if need > len(devs):
        raise ValueError(
            f"requested {n_body}x{n_tile} mesh but only {len(devs)} devices"
        )
    return jax.make_mesh((n_body, n_tile), (BODY_AXIS, TILE_AXIS),
                         devices=devs[:need])


def body_mesh(n_devices: int | None = None) -> Mesh:
    """A 1-D mesh over which body arrays are sharded. All force engines
    shard the body axis; trees are replicated (they are O(N) small compared
    to the O(N^2)/O(N log N) interaction work)."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(
            f"requested mesh of {n_devices} devices but only {len(devs)} available"
        )
    return jax.make_mesh((n_devices,), (BODY_AXIS,), devices=devs[:n_devices])
