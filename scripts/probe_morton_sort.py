#!/usr/bin/env python
"""TPU probe: Morton-sort cost decomposition at n=1M + multi-operand
lax.sort A/B.

The octree step's largest non-force item is the Morton sort (~0.10-0.11 s
at n=1M, BASELINE.md remainder decomposition).  Today's morton_sort is
argsort (= lax.sort over (key, iota)) followed by three flat GATHERS
(m[perm], x[perm], keys[perm]).  The alternative carries the payload
columns THROUGH the sort network (lax.sort over (key, iota, m, x...),
num_keys=1, stable) -- no gathers, but every compare-exchange moves
3-5 extra f32 columns.  This probe times, per variant, chained in a
scan so XLA cannot overlap iterations:

  argsortgather  current production morton_sort
  multisort      payload-carrying stable lax.sort
  keysonly       argsort alone (sort-network floor)
  keyscalc       Morton key computation alone (bit-interleave floor)

Feeds: BASELINE.md remainder decomposition (round-4b) + any flip record.

Usage: probe_morton_sort.py OUT [dim] [n]
"""

import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OUT = sys.argv[1]
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 3
N = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
PLATFORM = os.environ.get("PROBE_PLATFORM", "")


def log(obj):
    with open(OUT, "a") as fh:
        fh.write(json.dumps(obj) + "\n")
    print(obj, flush=True)


def main():
    import jax

    if PLATFORM:
        jax.config.update("jax_platforms", PLATFORM)
    import jax.numpy as jnp
    from jax import lax

    from nbody_tpu.models import build_galaxy_model
    from nbody_tpu.ops.geometry import scalar_bounds
    from nbody_tpu.ops.octree import max_depth, morton_keys, robust_quant_box
    from nbody_tpu.utils.measure import scan_seconds_per_step

    cfg, state = build_galaxy_model(N, DIM, np.float32)
    depth = max_depth(N, DIM)
    lo, hi = scalar_bounds(state.x)
    lo_r, hi_r = robust_quant_box(state.x, lo, hi)
    m0, x0 = state.m, state.x
    iota = jnp.arange(N, dtype=jnp.int32)

    def v_argsortgather(m, x):
        keys = morton_keys(x, lo_r, hi_r, depth)
        perm = jnp.argsort(keys)
        return m[perm], x[perm], keys[perm]

    def v_multisort(m, x):
        keys = morton_keys(x, lo_r, hi_r, depth)
        ops = (keys, iota, m) + tuple(x[:, d] for d in range(DIM))
        out = lax.sort(ops, num_keys=1, is_stable=True)
        xs = jnp.stack(out[3:], axis=1)
        return out[2], xs, out[0]

    def v_keysonly(m, x):
        keys = morton_keys(x, lo_r, hi_r, depth)
        perm = jnp.argsort(keys)
        return m, x, perm.astype(jnp.uint32)

    def v_keyscalc(m, x):
        keys = morton_keys(x, lo_r, hi_r, depth)
        return m, x, keys

    variants = {
        "argsortgather": v_argsortgather,
        "multisort": v_multisort,
        "keysonly": v_keysonly,
        "keyscalc": v_keyscalc,
    }

    # equivalence pin (host-side, once): multisort == argsort+gather
    ms_a, xs_a, ks_a = jax.jit(v_argsortgather)(m0, x0)
    ms_b, xs_b, ks_b = jax.jit(v_multisort)(m0, x0)
    eq = bool((ms_a == ms_b).all()) and bool((xs_a == xs_b).all()) \
        and bool((ks_a == ks_b).all())

    for name, fn in variants.items():
        @partial(jax.jit, static_argnames=("iters",))
        def loop(m, x, iters, fn=fn):
            def body(c, _):
                mm, xx, kk = fn(c[0], c[1])
                # fold the sorted output back so the next iteration
                # depends on it (kk folded via a cheap xor-derived jitter
                # that is always zero-valued: keeps the chain honest
                # without changing positions)
                jit_zero = (kk ^ kk).astype(xx.dtype)[:, None]
                return (mm, xx + jit_zero), None

            return lax.scan(body, (m, x), None, length=iters)[0][1]

        try:
            dtv = scan_seconds_per_step(loop, (m0, x0), iters_short=2,
                                        iters_long=10, repeats=2)
            log({"probe": "mortonsort", "variant": name, "dim": DIM,
                 "n": N, "sec": dtv, "equal": eq})
        except Exception as e:  # noqa: BLE001
            log({"probe": "mortonsort", "variant": name, "dim": DIM,
                 "n": N, "error": str(e)[:300]})


if __name__ == "__main__":
    main()
