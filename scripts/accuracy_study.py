#!/usr/bin/env python
"""fp32-fast-path accuracy study (VERDICT round-2 item 4).

The reference's benchmark matrix runs 3-D double; the TPU fast paths are
fp32.  This study justifies fp32 as the TPU-native equivalent by putting
our fp32-fast-path error side by side with the reference binary's own
float-vs-double error at EQUAL config (galaxy, theta=0.5, 25 steps):

  ref float-vs-double   L1(ref --precision float, ref --precision double)
  ours fp32-vs-f64      L1(our fp32 fast path,     our f64 group path)
  ref double vs oracle  L1(ref double,  f64 all-pairs oracle)
  ours fp32 vs oracle   L1(our fp32 fast path, f64 all-pairs oracle)

All L1s are final-frame position sums normalized by sum(|x_oracle|)
(check_state.py:43-50 metric).  The reference binary runs sequentially
(tests/ref_oracle.py); our runs use the in-process engines -- fp32 on
whatever backend this script runs on (run on TPU for the honest
production numbers; interpret mode is used automatically on CPU).

Usage: scripts/accuracy_study.py [n] [steps] -- writes markdown rows to
stdout and JSON to accuracy_study.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 25
THETA = 0.5


def evolve_ours(algo, n, dim, dtype, steps, theta, fast):
    import jax

    if os.environ.get("ACC_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ACC_PLATFORM"])
    # f64 legs are real doubles only under x64 (env var ignored by this
    # jax build; without this the "oracle" silently truncates to f32)
    jax.config.update("jax_enable_x64", True)

    from nbody_tpu.models import build_galaxy_model
    from nbody_tpu.sim.engines import EngineOptions, get_engine
    import nbody_tpu.sim.tree_engines as te

    cfg, state = build_galaxy_model(n, dim, dtype)
    cfg = cfg.replace(theta=theta)
    if fast:
        on_tpu = jax.default_backend() == "tpu"
        opts = EngineOptions(kernel="auto" if on_tpu else "jnp")
        orig = te._use_pallas_eval
        if not on_tpu:
            te._use_pallas_eval = lambda *a, **k: "interpret"
    else:
        opts = EngineOptions(kernel="jnp")
        orig = None
    try:
        step = get_engine(algo).make_step(cfg, opts)
        for k in range(steps):
            state, _ = step(state, k)
    finally:
        if orig is not None:
            te._use_pallas_eval = orig
    return np.asarray(state.x, np.float64)


def ref_final(dim, algo, prec, n, steps, theta, workdir):
    from tests import ref_oracle as ro

    d = os.path.join(workdir, f"{algo}_{prec}_{dim}")
    os.makedirs(d, exist_ok=True)
    ro.run_reference(dim, [
        "-n", str(n), "-s", str(steps), "--theta", str(theta),
        "--algorithm", algo, "--workload", "galaxy",
        "--precision", prec, "--save", "pos", "--csv-detailed",
    ], cwd=d)
    return np.asarray(ro.read_positions(os.path.join(d, "positions.bin"))[-1],
                      np.float64)


def main():
    import tempfile

    rows = []
    with tempfile.TemporaryDirectory() as tmp:
        for dim in (2, 3):
            for algo in ("bvh", "octree"):
                print(f"# {algo} {dim}-D n={N} steps={STEPS} ...",
                      file=sys.stderr, flush=True)
                x_oracle = evolve_ours("all-pairs", N, dim, np.float64,
                                       STEPS, 0.0, fast=False)
                scale = float(np.abs(x_oracle).sum())

                ref_d = ref_final(dim, algo, "double", N, STEPS, THETA, tmp)
                ref_f = ref_final(dim, algo, "float", N, STEPS, THETA, tmp)
                our_64 = evolve_ours(algo, N, dim, np.float64, STEPS, THETA,
                                     fast=False)
                our_32 = evolve_ours(algo, N, dim, np.float32, STEPS, THETA,
                                     fast=True)

                def l1(a, b):
                    return float(np.abs(a - b).sum()) / scale

                rows.append({
                    "dim": dim, "algo": algo, "n": N, "steps": STEPS,
                    "theta": THETA,
                    "ref_float_vs_double": l1(ref_f, ref_d),
                    "ours_fp32fast_vs_f64group": l1(our_32, our_64),
                    "ref_double_vs_oracle": l1(ref_d, x_oracle),
                    "ours_fp32fast_vs_oracle": l1(our_32, x_oracle),
                    "ours_f64group_vs_oracle": l1(our_64, x_oracle),
                })
                print(json.dumps(rows[-1]), flush=True)

    with open("accuracy_study.json", "w") as fh:
        json.dump(rows, fh, indent=1)

    print("\n| dim | algo | ref float-vs-double | ours fp32-vs-f64 | "
          "ref double vs oracle | ours fp32 vs oracle |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['dim']} | {r['algo']} | {r['ref_float_vs_double']:.2e} "
              f"| {r['ours_fp32fast_vs_f64group']:.2e} "
              f"| {r['ref_double_vs_oracle']:.2e} "
              f"| {r['ours_fp32fast_vs_oracle']:.2e} |")


if __name__ == "__main__":
    main()
