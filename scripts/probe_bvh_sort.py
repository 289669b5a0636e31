"""BVH Hilbert-sort phase A/B: lexsort+packed-gather vs payload sort.

Feeds: BASELINE.md "Morton/Hilbert sort" entry (round-4c).

Today's bvh_step_force sort phase (ops/bvh.py:244-251) is
  keys -> jnp.lexsort((lo, hi)) -> ONE packed (n, 1+4*dim) row gather.
The octree flip (ops/permutation.py) showed payload-carrying lax.sort
beats scatter by 10x and argsort+gathers by ~2x at 4 operands; here the
trade is different -- 13 payload columns ride the sort network vs one
contiguous row gather -- so measure, don't assume:

  lexgather    production today: lexsort + iota payload -> packed gather
  multisort    lax.sort((hi, lo, m, x.., v.., a.., ao..), num_keys=2)
               carrying all 13 body columns (stable; bit-identical order
               to lexsort, pinned host-side below)

Usage: probe_bvh_sort.py OUT.jsonl DIM N
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


OUT = sys.argv[1]
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 3
N = int(sys.argv[3]) if len(sys.argv) > 3 else 1000001


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nbody_tpu.models import build_galaxy_model
    from nbody_tpu.ops.geometry import aabb_of_points
    from nbody_tpu.ops.hilbert import hilbert_key_u32pair, quantize
    from nbody_tpu.utils.measure import scan_seconds_per_step

    cfg, state = build_galaxy_model(N, DIM, np.float32)
    eps = cfg.eps
    dim = DIM

    def keys_of(x):
        xmin, xmax = aabb_of_points(x, eps)
        cell = quantize(x, xmin, xmax - xmin, dim)
        return hilbert_key_u32pair(cell, dim)

    def v_lexgather(st):
        hi, lo = keys_of(st[1])
        perm = jnp.lexsort((lo, hi))
        packed = jnp.concatenate(
            [st[0][:, None], st[1], st[2], st[3], st[4]], axis=1)[perm]
        return (packed[:, 0], packed[:, 1:1 + dim],
                packed[:, 1 + dim:1 + 2 * dim],
                packed[:, 1 + 2 * dim:1 + 3 * dim],
                packed[:, 1 + 3 * dim:1 + 4 * dim])

    def v_multisort(st):
        hi, lo = keys_of(st[1])
        cols = (st[0],) + tuple(
            a[:, d] for a in st[1:] for d in range(dim))
        out = jax.lax.sort((hi, lo) + cols, num_keys=2, is_stable=True)
        m = out[2]
        arrs = [jnp.stack(out[3 + i * dim:3 + (i + 1) * dim], axis=1)
                for i in range(4)]
        return (m, arrs[0], arrs[1], arrs[2], arrs[3])

    st0 = (state.m, state.x, state.v,
           jnp.zeros_like(state.x), jnp.zeros_like(state.x))

    # equality pin (once, host-side): identical permutation incl. ties
    a_ = jax.jit(v_lexgather)(st0)
    b_ = jax.jit(v_multisort)(st0)
    eq = all(bool((u == v).all()) for u, v in zip(a_, b_))

    variants = {"lexgather": v_lexgather, "multisort": v_multisort}
    for name, fn in variants.items():
        # feed the output forward but keep input-order dependence by
        # re-keying from the (permuted) positions each iteration --
        # iteration 2+ sorts presorted data for BOTH variants equally;
        # the galaxy's Hilbert order is what production re-sorts anyway
        # (positions drift slowly between steps)
        def body(c, _):
            return fn(c), None

        def loop(c, iters):
            return jax.lax.scan(body, c, None, length=iters)[0][1]

        loop = jax.jit(loop, static_argnames=("iters",))
        try:
            dtv = scan_seconds_per_step(loop, (st0,), iters_short=2,
                                        iters_long=10, repeats=2)
            log({"probe": "bvhsort", "variant": name, "dim": DIM, "n": N,
                 "sec": dtv, "equal": eq})
        except Exception as e:  # noqa: BLE001
            log({"probe": "bvhsort", "variant": name, "dim": DIM, "n": N,
                 "error": str(e)[:300]})


if __name__ == "__main__":
    main()
