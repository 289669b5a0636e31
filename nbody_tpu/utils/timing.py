"""Device synchronization for timing.

jax.block_until_ready does NOT reliably wait for execution on the axon
TPU tunnel backend (dispatch returns immediately; only a host transfer
forces completion). sync() pulls one scalar element from each array leaf,
which forces the producing computation to finish with negligible transfer
cost -- the moral equivalent of the reference's per-kernel device sync
when it reads timers (timer.h:6-11).
"""

from __future__ import annotations

import jax
import numpy as np


def sync(tree) -> None:
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ndim"):
            try:
                idx = (0,) * leaf.ndim
                np.asarray(jax.device_get(leaf[idx] if leaf.ndim else leaf))
            except Exception:
                # mesh-sharded leaves reject scalar gathers outside jit
                # (ShardingTypeError); pull EVERY addressable shard --
                # one shard would only barrier its own device and
                # under-report multi-device step times
                shards = getattr(leaf, "addressable_shards", None)
                if shards:
                    for sh in shards:
                        np.asarray(sh.data)
                else:
                    np.asarray(jax.device_get(leaf))
