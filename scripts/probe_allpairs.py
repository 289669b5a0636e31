#!/usr/bin/env python
"""One-off TPU probe: all-pairs kernel ablations (VERDICT round-2 item 2).

The exact kernel sits at ~34% of a 15-slot-op VPU roofline model.  These
ablations decide WHERE the other 2.3x goes by swapping single links of
the per-pair chain and re-measuring at N=2^20 3-D:

  exact        production chain (d2*sqrt(d2)+eps, Newton reciprocal)
  fast         adaptive rsqrt^3 chain (1 transcendental instead of 2)
  notrans      sqrt/recip replaced by 1 multiply each (WRONG math, same
               op graph otherwise) -- if the rate jumps, the kernel is
               transcendental-issue-bound, not ALU-bound
  nosum        per-pair math kept, j-reduction dropped (out = last col)
  floor        subtract + accumulate only (known ALU issue-rate floor)
  unroll2      exact chain, two independent half-j-tiles interleaved
  semantics    exact chain + dimension_semantics=("arbitrary","arbitrary")

JSON lines to argv[1] (default /tmp/probe_allpairs.json).
"""

import functools
import json
import sys

import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_allpairs.json"
N = 1 << 20
DIM = 3


def log(obj):
    with open(OUT, "a") as fh:
        fh.write(json.dumps(obj) + "\n")
    print(obj, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from nbody_tpu.utils.measure import scan_seconds_per_step

    eps = float(np.finfo(np.float32).eps)
    rng = np.random.default_rng(0)
    m = jnp.asarray(rng.uniform(0.1, 1.0, N).astype(np.float32))
    x = jnp.asarray(rng.uniform(-1.0, 1.0, (N, DIM)).astype(np.float32))

    def make_kernel(variant):
        def kernel(xi_ref, xjt_ref, mj_ref, out_ref):
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                out_ref[:, :] = jnp.zeros_like(out_ref)

            xi = xi_ref[:, :]
            eps_v = jnp.asarray(eps, xi.dtype)

            def chain(sl):
                dx = []
                d2 = None
                for d in range(DIM):
                    xd = xjt_ref[d, sl][None, :] - xi[:, d][:, None]
                    dx.append(xd)
                    d2 = xd * xd if d2 is None else d2 + xd * xd
                mj = mj_ref[0, sl][None, :]
                if variant == "floor":
                    w = mj + d2
                elif variant == "notrans":
                    t = d2 * (d2 * jnp.asarray(1.0001, xi.dtype)) + eps_v
                    r = t * jnp.asarray(0.9999, xi.dtype)
                    r = r * (jnp.asarray(2.0, xi.dtype) - t * r)
                    w = mj * r
                elif variant == "fast":
                    r = jax.lax.rsqrt(d2 + eps_v)
                    w = (mj * r) * (r * r)
                else:  # exact
                    t = d2 * jnp.sqrt(d2) + eps_v
                    r = pl.reciprocal(t, approx=True)
                    r = r * (jnp.asarray(2.0, xi.dtype) - t * r)
                    w = mj * r
                return w, dx

            if variant == "unroll2":
                TJ = xjt_ref.shape[1]
                h = TJ // 2
                w0, dx0 = chain(slice(0, h))
                w1, dx1 = chain(slice(h, TJ))
                for d in range(DIM):
                    out_ref[:, d] += (jnp.sum(w0 * dx0[d], axis=1)
                                      + jnp.sum(w1 * dx1[d], axis=1))
            elif variant == "nosum":
                w, dx = chain(slice(None))
                for d in range(DIM):
                    out_ref[:, d] += (w * dx[d])[:, -1]
            else:
                w, dx = chain(slice(None))
                for d in range(DIM):
                    out_ref[:, d] += jnp.sum(w * dx[d], axis=1)

        return kernel

    def build(variant, tile_i=512, tile_j=2048, semantics=None):
        npad = N
        grid = (npad // tile_i, npad // tile_j)
        kwargs = {}
        if semantics:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=semantics)

        @jax.jit
        def accel(m, x):
            xt = x.T
            mp = m.reshape(1, npad)
            return pl.pallas_call(
                make_kernel(variant),
                grid=grid,
                in_specs=[
                    pl.BlockSpec((tile_i, DIM), lambda i, j: (i, 0)),
                    pl.BlockSpec((DIM, tile_j), lambda i, j: (0, j)),
                    pl.BlockSpec((1, tile_j), lambda i, j: (0, j)),
                ],
                out_specs=pl.BlockSpec((tile_i, DIM), lambda i, j: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((npad, DIM), jnp.float32),
                **kwargs,
            )(x, xt, mp)

        return accel

    cases = [
        ("exact", {}),
        ("fast", {}),
        ("notrans", {}),
        ("nosum", {}),
        ("floor", {}),
        ("unroll2", {}),
        ("exact", {"semantics": ("arbitrary", "arbitrary"),
                   "label": "semantics"}),
        ("exact", {"tile_i": 256, "tile_j": 4096, "label": "exact_256x4096"}),
        ("exact", {"tile_i": 1024, "tile_j": 1024,
                   "label": "exact_1024x1024"}),
        ("fast", {"tile_i": 256, "tile_j": 4096, "label": "fast_256x4096"}),
    ]
    for variant, kw in cases:
        label = kw.pop("label", variant)
        try:
            accel = build(variant, **kw)

            @functools.partial(jax.jit, static_argnames=("iters",))
            def loop(m, x, iters, _accel=accel):
                def body(c, _):
                    a = _accel(m, c)
                    return c + jnp.asarray(1e-12, c.dtype) * a, None

                return jax.lax.scan(body, x, None, length=iters)[0]

            dt = scan_seconds_per_step(loop, (m, x), iters_short=1,
                                       iters_long=3, repeats=2)
            rate = N * (N - 1) / dt
            log({"probe": "allpairs", "variant": label, "sec_per_step": dt,
                 "int_per_s": rate})
        except Exception as e:
            log({"probe": "allpairs", "variant": label,
                 "error": str(e)[:300]})
    log({"probe": "allpairs_done"})


if __name__ == "__main__":
    main()
