#!/usr/bin/env python
"""Divergence-growth probe: fp32-fast vs f64-group, stepped in lockstep.

Feeds: BASELINE.md accuracy tables (the footnote interpreting the
n=131072 multi-step L1 numbers).

The accuracy study's 10-step position L1 conflates three things: the
single-step force error of the fast path (tile-granular conservative MAC
vs the group oracle's per-group MAC — different monopole/exact splits),
fp32 arithmetic, and chaotic amplification of whichever of those seeds
the divergence.  The reference binary's own float-vs-double leg only
shows precision amplification (identical algorithm in both legs).  This
probe separates the pieces: it steps BOTH of our legs side by side from
the identical start and logs, per step,

  pos_l1   sum|x32 - x64| / sum|x64|
  acc_l1   sum|a32 - a64| / sum|a64|     (force error at the same epoch)

Step-1 acc_l1 is the honest single-step force error at scale; the growth
rate of pos_l1 over steps is the Lyapunov amplification.  A healthy fast
path shows acc_l1 ~ 1e-3 (theta=0.5 monopole-set difference) at step 1;
a bug shows 1e-1+.

Usage: probe_acc_growth.py [n] [steps] [--dim 3] [--algos bvh,octree]
                           [--out FILE.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

THETA = 0.5


def main():
    p = argparse.ArgumentParser()
    p.add_argument("n", nargs="?", type=int, default=131072)
    p.add_argument("steps", nargs="?", type=int, default=10)
    p.add_argument("--dim", type=int, default=3)
    p.add_argument("--algos", default="bvh,octree")
    p.add_argument("--out", default="acc_growth.jsonl")
    a = p.parse_args()

    import accuracy_study as st

    st._jax_setup()
    from nbody_tpu.models import build_galaxy_model

    out = open(a.out, "a")
    for algo in a.algos.split(","):
        cfg64, s64 = build_galaxy_model(a.n, a.dim, np.float64)
        cfg64 = cfg64.replace(theta=THETA)
        cfg32, s32 = build_galaxy_model(a.n, a.dim, np.float32)
        cfg32 = cfg32.replace(theta=THETA)
        step64 = st._make_step(algo, cfg64, np.float64, fast=False)
        step32 = st._make_step(algo, cfg32, np.float32, fast=True)
        for k in range(a.steps):
            s64, _ = step64(s64, k)
            s32, _ = step32(s32, k)
            x64 = np.asarray(s64.x, np.float64)
            x32 = np.asarray(s32.x, np.float64)
            a64 = np.asarray(s64.a, np.float64)
            a32 = np.asarray(s32.a, np.float64)
            row = {
                "algo": algo, "dim": a.dim, "n": a.n, "step": k + 1,
                "pos_l1": float(np.abs(x32 - x64).sum()
                                / np.abs(x64).sum()),
                "acc_l1": float(np.abs(a32 - a64).sum()
                                / np.abs(a64).sum()),
            }
            print(json.dumps(row), flush=True)
            out.write(json.dumps(row) + "\n")
            out.flush()
    out.close()


if __name__ == "__main__":
    main()
