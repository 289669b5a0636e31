"""SoA body-state pytree.

The analog of the reference's System<T,N> SoA arrays m, x, v, a, ao
(src/system.h:18-19) and its state_t raw-pointer capture (src/system.h:41-50).
As a registered dataclass pytree it flows through jit/scan/shard_map without
any host round trips; `ao` is the previous step's acceleration used by the
leapfrog scheme (src/system.h:52-60).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SystemState:
    m: jax.Array   # (n,)       masses
    x: jax.Array   # (n, dim)   positions
    v: jax.Array   # (n, dim)   velocities
    a: jax.Array   # (n, dim)   accelerations (current step)
    ao: jax.Array  # (n, dim)   accelerations (previous step)

    @property
    def n(self) -> int:
        return self.m.shape[0]

    @property
    def dim(self) -> int:
        return self.x.shape[1]

    @staticmethod
    def zeros(n: int, dim: int, dtype) -> "SystemState":
        """Fresh zero state, like System's zero-initialized vectors
        (src/system.h:27-36)."""
        return SystemState(
            m=jnp.zeros((n,), dtype=dtype),
            x=jnp.zeros((n, dim), dtype=dtype),
            v=jnp.zeros((n, dim), dtype=dtype),
            a=jnp.zeros((n, dim), dtype=dtype),
            ao=jnp.zeros((n, dim), dtype=dtype),
        )

    @staticmethod
    def from_numpy(m, x, v, dtype=None) -> "SystemState":
        """Build device state from host arrays (a = ao = 0)."""
        m = np.asarray(m)
        x = np.asarray(x)
        v = np.asarray(v)
        if dtype is None:
            dtype = x.dtype
        n, dim = x.shape
        return SystemState(
            m=jnp.asarray(m, dtype=dtype),
            x=jnp.asarray(x, dtype=dtype),
            v=jnp.asarray(v, dtype=dtype),
            a=jnp.zeros((n, dim), dtype=dtype),
            ao=jnp.zeros((n, dim), dtype=dtype),
        )

    def block_until_ready(self) -> "SystemState":
        jax.block_until_ready((self.m, self.x, self.v, self.a, self.ao))
        return self


def format_state(state: SystemState) -> str:
    """Human dump of the state, byte-for-byte matching System::print()
    (src/system.h:90-97): one line per body, only the first two components
    of p/v/f are printed even in 3-D."""
    m = np.asarray(state.m)
    x = np.asarray(state.x)
    v = np.asarray(state.v)
    a = np.asarray(state.a)
    lines = []
    for i in range(m.shape[0]):
        lines.append(
            "{:02}: m={: .3e}, p=({: .3e}, {: .3e}), v=({: .3e}, {: .3e}), "
            "f=({: .3e}, {: .3e})".format(
                i, m[i], x[i, 0], x[i, 1], v[i, 0], v[i, 1], a[i, 0], a[i, 1]
            )
        )
    return "\n".join(lines)
