#!/usr/bin/env python
"""Robust all-pairs kernel throughput measurement on the live backend.

Feeds: BASELINE.md all-pairs throughput numbers (robust variant of bench.py's metric).

The axon TPU tunnel has multi-second latency spikes (worker restarts,
recompiles), so single differential timings go haywire (negative deltas
were observed).  Methodology here:

  * the timed unit is a jitted lax.scan of `iters` force evaluations
    chained through the positions (nothing can be elided);
  * each configuration is timed as MIN over `repeats` runs of both a
    short and a long scan -- min filters latency spikes, the long/short
    difference cancels the constant dispatch cost;
  * completion is forced with nbody_tpu.utils.timing.sync (a full-array
    np.asarray does NOT reliably block on this backend).

Prints one JSON line per configuration:
  {"kernel": ..., "dim": ..., "n": ..., "sec_per_step": ..., "int_per_s": ...}

Usage: python scripts/kernel_bench.py [--n 1048576] [--dims 2,3]
       [--kernels exact,...] [--repeats 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ITERS_SHORT = 2
ITERS_LONG = 10


def build_loop(kernel_name: str, m, x, eps):
    import jax
    import jax.numpy as jnp
    from functools import partial

    from nbody_tpu.ops.pallas_allpairs import allpairs_accel_pallas
    from nbody_tpu.ops.pallas_allpairs_mxu import allpairs_accel_mxu
    from nbody_tpu.ops.allpairs import allpairs_accel

    def accel(mv, xv):
        if kernel_name == "jnp":
            return allpairs_accel(mv, xv, 1.0, eps, chunk=4096)
        if kernel_name == "exact":
            return allpairs_accel_pallas(mv, xv, 1.0, eps, exact=True)
        if kernel_name == "newton":
            return allpairs_accel_pallas(mv, xv, 1.0, eps, exact=False)
        if kernel_name == "fast":
            return allpairs_accel_pallas(mv, xv, 1.0, eps, exact=False,
                                         fast=True)
        if kernel_name == "mxu":
            return allpairs_accel_mxu(mv, xv, 1.0, eps)
        if kernel_name == "mxu-fast":
            return allpairs_accel_mxu(mv, xv, 1.0, eps, fast=True,
                                      far_thresh=1e-2)
        raise ValueError(kernel_name)

    @partial(jax.jit, static_argnames=("iters",))
    def loop(mv, xv, iters):
        def body(c, _):
            a = accel(mv, c)
            return c + jnp.asarray(1e-12, c.dtype) * a, None

        return jax.lax.scan(body, xv, None, length=iters)[0]

    return loop


def measure(kernel_name: str, n: int, dim: int, repeats: int) -> dict:
    import jax.numpy as jnp

    from nbody_tpu.utils.timing import sync

    eps = float(np.finfo(np.float32).eps)
    rng = np.random.default_rng(0)
    m = jnp.asarray(rng.uniform(0.1, 1.0, n).astype(np.float32))
    x = jnp.asarray(rng.uniform(-1.0, 1.0, (n, dim)).astype(np.float32))
    loop = build_loop(kernel_name, m, x, eps)

    def timed(iters: int) -> float:
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = loop(m, x, iters)
            sync(out)
            best = min(best, time.perf_counter() - t0)
        return best

    # warm/compile both shapes
    sync(loop(m, x, ITERS_SHORT))
    sync(loop(m, x, ITERS_LONG))
    t_short = timed(ITERS_SHORT)
    t_long = timed(ITERS_LONG)
    dt = max((t_long - t_short) / (ITERS_LONG - ITERS_SHORT), 1e-9)
    return {
        "kernel": kernel_name,
        "dim": dim,
        "n": n,
        "sec_per_step": dt,
        "int_per_s": n * (n - 1) / dt,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--dims", default="2,3")
    ap.add_argument("--kernels", default="newton,exact,fast")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--one", action="store_true",
                    help="measure in-process (single kernel x dim)")
    args = ap.parse_args(argv)
    configs = [(k, int(d)) for k in args.kernels.split(",")
               for d in args.dims.split(",")]
    if args.one:
        for kernel, dim in configs:
            print(json.dumps(measure(kernel, args.n, dim, args.repeats)),
                  flush=True)
        return 0
    # each config in a fresh interpreter: a TPU-worker crash (they happen)
    # poisons the jax backend for the rest of the process, so isolate
    import subprocess

    for kernel, dim in configs:
        cmd = [sys.executable, __file__, "--one", "--n", str(args.n),
               "--dims", str(dim), "--kernels", kernel,
               "--repeats", str(args.repeats)]
        err = "no output"
        for attempt in range(3):
            try:
                proc = subprocess.run(cmd, capture_output=True, text=True,
                                      timeout=1800)
                line = [ln for ln in proc.stdout.splitlines()
                        if ln.startswith("{")]
                if proc.returncode == 0 and line:
                    print(line[-1], flush=True)
                    break
                err = (proc.stderr or "no output")[-160:]
            except subprocess.TimeoutExpired:
                err = "timeout"
            # worker crashes take a while to recover from -- back off
            time.sleep(60 * (attempt + 1))
        else:
            print(json.dumps({"kernel": kernel, "dim": dim, "err": err}),
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
