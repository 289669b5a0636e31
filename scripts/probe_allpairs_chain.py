#!/usr/bin/env python
"""One-off TPU probe: op-by-op cost attribution for the all-pairs VPU
kernel chain.  Variants add one link of the per-pair op chain at a time;
the time delta between consecutive variants is that link's cost at
(TI x TJ) tile scale.  This is the measured version of the "remaining
gap is Mosaic's per-op scheduling" claim: if the cumulative per-op costs
reproduce the full kernel's time, the kernel is issue-bound on the chain
itself and no scheduling trick can recover the gap.

Writes JSON lines to argv[1]; argv[2] = dim (2 or 3); argv[3] = log2 n.
"""

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_chain.json"
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 3
LOGN = int(sys.argv[3]) if len(sys.argv) > 3 else 19

VARIANTS = ("dx_acc", "d2", "sqrt", "soft_t", "recip", "newton", "full")


def log(obj):
    with open(OUT, "a") as fh:
        fh.write(json.dumps(obj) + "\n")
    print(obj, flush=True)


def make_kernel(dim, eps, variant):
    def kernel(xi_ref, xjt_ref, mj_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:, :] = jnp.zeros_like(out_ref)

        xi = xi_ref[:, :]
        eps_v = jnp.asarray(eps, xi.dtype)
        dx = []
        d2 = None
        for d in range(dim):
            xd = xjt_ref[d, :][None, :] - xi[:, d][:, None]
            dx.append(xd)
            if variant != "dx_acc":
                d2 = xd * xd if d2 is None else d2 + xd * xd
        if variant == "dx_acc":
            w = None
        elif variant == "d2":
            w = d2
        elif variant == "sqrt":
            w = jnp.sqrt(d2)
        else:
            t = d2 * jnp.sqrt(d2) + eps_v
            if variant == "soft_t":
                w = t
            else:
                r = pl.reciprocal(t, approx=True)
                if variant == "recip":
                    w = r
                else:
                    r = r * (jnp.asarray(2.0, xi.dtype) - t * r)
                    if variant == "newton":
                        w = r
                    else:                       # full
                        w = mj_ref[0, :][None, :] * r
        for d in range(dim):
            acc = dx[d] if w is None else w * dx[d]
            out_ref[:, d] += jnp.sum(acc, axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "n", "dim", "iters"))
def run(x, m, variant, n, dim, iters):
    ti, tj = 512, 2048
    xt = x.T
    mp = m.reshape(1, n)
    kern = make_kernel(dim, 1e-6, variant)

    def one(c, _):
        out = pl.pallas_call(
            kern,
            grid=(n // ti, n // tj),
            in_specs=[
                pl.BlockSpec((ti, dim), lambda i, j: (i, 0)),
                pl.BlockSpec((dim, tj), lambda i, j: (0, j)),
                pl.BlockSpec((1, tj), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((ti, dim), lambda i, j: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n, dim), x.dtype),
            cost_estimate=pl.CostEstimate(
                flops=int(12 * n) * int(n),
                bytes_accessed=int(n * dim * 4 * (2 + n // ti)),
                transcendentals=int(n) * int(n),
            ),
        )(c, xt, mp)
        return c + 1e-30 * out, None  # not foldable: kernel stays live

    return jax.lax.scan(one, x, None, length=iters)[0]


def main():
    n = 1 << LOGN
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (n, DIM), jnp.float32)
    m = jnp.ones((n,), jnp.float32)

    prev = None
    for variant in VARIANTS:
        ts = []
        for _ in range(3):
            run(x, m, variant, n, DIM, 1).block_until_ready()
            t0 = time.perf_counter()
            r1 = run(x, m, variant, n, DIM, 1)
            jax.device_get(r1[0, 0])
            t1 = time.perf_counter()
            r3 = run(x, m, variant, n, DIM, 4)
            jax.device_get(r3[0, 0])
            t2 = time.perf_counter()
            ts.append(((t2 - t1) - (t1 - t0)) / 3.0)
        dt = min(ts)
        ips = n * n / dt
        log({"probe": "chain", "dim": DIM, "n": n, "variant": variant,
             "sec": dt, "int_per_s": ips,
             "delta_vs_prev": None if prev is None else dt - prev})
        prev = dt
    log({"probe": "chain_done", "dim": DIM})


if __name__ == "__main__":
    main()
