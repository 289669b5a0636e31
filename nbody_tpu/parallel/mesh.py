"""Device-mesh helpers."""

from __future__ import annotations

import jax
from jax.sharding import Mesh


BODY_AXIS = "bodies"


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
