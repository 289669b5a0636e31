#!/usr/bin/env python
"""TPU probe: Morton-sort cost decomposition at n=1M + multi-operand
lax.sort A/B.

The octree step's largest non-force item is the Morton sort phase
(~0.10-0.11 s at n=1M, BASELINE.md round-4b remainder decomposition).
Production (octree fast path) each step: morton_keys on the ORIGINAL
user-visible body order -> argsort -> three flat gathers (m/x/keys) ->
... -> one scatter un-permuting the sorted accel back.  Variants here
reproduce that phase shape, each ending with the un-permute scatter so
the scan carry returns to original order every iteration (genuine loop
dependence, production-representative input order; rev 1 of this probe
fed the SORTED output forward, so iterations 2..k sorted presorted
data, and its zero-add dependence trick was constant-folded):

  argsortgather  keys -> argsort -> 3 gathers -> scatter   (pre-flip)
  multisort      keys -> payload-carrying stable lax.sort -> scatter
  scatteronly    reverse-gather + reverse-scatter (scatter/gather floor,
                 no sort, no keys)
  sortunperm     production POST-FLIP phase: morton_sort (payload sort)
                 + unpermute_rows (second payload sort) -- no scatter
                 anywhere (rev 4; validates the ops/permutation.py flip
                 on hardware)

rev 1 results (presorted input, no scatter) stay in the jsonl for the
record: argsortgather 6.9 ms, multisort 3.1 ms at n=1M 3-D -- the
payload-carrying sort wins 2.2x there.

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
    from nbody_tpu.ops.octree import (max_depth, morton_keys, morton_sort,
                                      robust_quant_box)
    from nbody_tpu.ops.permutation import unpermute_rows
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
        xs = x[perm]
        xb = jnp.zeros_like(xs).at[perm].set(xs)   # accel un-permute analog
        return m, xb

    def v_multisort(m, x):
        keys = morton_keys(x, lo_r, hi_r, depth)
        ops = (keys, iota, m) + tuple(x[:, d] for d in range(DIM))
        out = lax.sort(ops, num_keys=1, is_stable=True)
        xs = jnp.stack(out[3:], axis=1)
        xb = jnp.zeros_like(xs).at[out[1]].set(xs)
        return m, xb

    def v_scatteronly(m, x):
        xr = x[::-1, :]
        xb = jnp.zeros_like(x).at[iota[::-1]].set(xr)
        return m, xb

    def v_sortunperm(m, x):
        # the flipped production phase end-to-end: payload-carrying sort
        # in, payload-carrying sort out (xb == x bit-exactly)
        ms, xs, ks, perm = morton_sort(m, x, lo_r, hi_r, depth)
        return m, unpermute_rows(xs, perm)

    variants = {
        "argsortgather": v_argsortgather,
        "multisort": v_multisort,
        "scatteronly": v_scatteronly,
        "sortunperm": v_sortunperm,
    }

    # equivalence pin (host-side, once): multisort == argsort+gather on
    # the SORTED tuple (permutation identity is what the flip relies on)
    def sorted_a(m, x):
        keys = morton_keys(x, lo_r, hi_r, depth)
        perm = jnp.argsort(keys)
        return m[perm], x[perm], keys[perm]

    def sorted_b(m, x):
        keys = morton_keys(x, lo_r, hi_r, depth)
        ops = (keys, iota, m) + tuple(x[:, d] for d in range(DIM))
        out = lax.sort(ops, num_keys=1, is_stable=True)
        return out[2], jnp.stack(out[3:], axis=1), out[0]

    ms_a, xs_a, ks_a = jax.jit(sorted_a)(m0, x0)
    ms_b, xs_b, ks_b = jax.jit(sorted_b)(m0, x0)
    eq = bool((ms_a == ms_b).all()) and bool((xs_a == xs_b).all()) \
        and bool((ks_a == ks_b).all())

    for name, fn in variants.items():
        @partial(jax.jit, static_argnames=("iters",))
        def loop(m, x, iters, fn=fn):
            def body(c, _):
                return fn(c[0], c[1]), None

            return lax.scan(body, (m, x), None, length=iters)[0][1]

        try:
            dtv = scan_seconds_per_step(loop, (m0, x0), iters_short=2,
                                        iters_long=10, repeats=2)
            log({"probe": "mortonsort", "rev": 4, "variant": name,
                 "dim": DIM, "n": N, "sec": dtv, "equal": eq})
        except Exception as e:  # noqa: BLE001
            log({"probe": "mortonsort", "rev": 4, "variant": name,
                 "dim": DIM, "n": N, "error": str(e)[:300]})


if __name__ == "__main__":
    main()
