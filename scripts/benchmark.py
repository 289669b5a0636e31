#!/usr/bin/env python
"""Benchmark matrix runner -- the TPU equivalent of the reference's
ci/benchmark + ci/benchmark_detailed + ci/data.py: runs the standard
configuration matrix (galaxy, 3-D, double, 200 steps; all four algorithms
at N=100k, trees at N=1M -- ci/benchmark:13-24,52-99), captures each run's
CSV row, joins hardware metadata, and writes one merged CSV.

Usage:
  scripts/benchmark.py [--quick] [--detailed] [--out results.csv]

--quick shrinks the matrix (N=10k/100k, 20 steps) for smoke runs.
--detailed adds the per-phase (csv-detailed) tree runs
  (ci/benchmark_detailed:11-14).
"""

from __future__ import annotations

import argparse
import csv
import io
import os
import platform
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

HEADERS = "algorithm,dim,precision,nsteps,nbodies,total [s]"


def hardware_metadata() -> dict:
    meta = {
        "hostname": platform.node(),
        "cpu": platform.processor() or platform.machine(),
    }
    try:
        import jax

        devs = jax.devices()
        meta["accelerator"] = str(devs[0].device_kind) if devs else "none"
        meta["n_devices"] = len(devs)
        meta["backend"] = jax.default_backend()
    except Exception as e:  # pragma: no cover
        meta["accelerator"] = f"error: {e}"
    return meta


def run_config(algorithm: str, n: int, steps: int, dim: int, precision: str,
               detailed: bool = False, theta: float = 0.5) -> list[dict]:
    from nbody_tpu.cli import main as cli_main

    buf = io.StringIO()
    args = [
        "-n", str(n), "-s", str(steps), "-d", str(dim),
        "--precision", precision, "--algorithm", algorithm,
        "--workload", "galaxy", "--theta", str(theta),
        "--csv-detailed" if detailed else "--csv-total",
    ]
    t0 = time.time()
    cli_main(args, out=buf)
    wall = time.time() - t0
    rows = []
    lines = [l for l in buf.getvalue().splitlines() if l and not l.startswith("algorithm,")]
    header_line = next(
        (l for l in buf.getvalue().splitlines() if l.startswith("algorithm,")),
        HEADERS,
    )
    cols = header_line.split(",")
    for line in lines:
        vals = line.split(",")
        row = dict(zip(cols, vals))
        row["wall [s]"] = f"{wall:.2f}"
        rows.append(row)
    return rows


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--detailed", action="store_true")
    p.add_argument("--precision", default="double", choices=["double", "float"],
                   help="reference matrix uses double (ci/benchmark); float "
                        "runs the TPU-native fast path")
    p.add_argument("--out", default="benchmark_results.csv")
    p.add_argument("--steps", type=int, default=None,
                   help="override the standard-matrix step count")
    p.add_argument("--big-steps", type=int, default=None,
                   help="override the N=1M tree runs' step count (the f64 "
                        "list path costs tens of seconds/step at 1M on "
                        "emulated TPU f64; per-step rate is what transfers)")
    a = p.parse_args(argv)

    if a.quick:
        n_std, n_big, steps = 10_000, 100_000, 20
    else:
        # the reference's standard matrix (ci/benchmark:13-24)
        n_std, n_big, steps = 100_000, 1_000_000, 200
    if a.steps is not None:
        steps = a.steps
    big_steps = a.big_steps if a.big_steps is not None else steps

    matrix = [
        ("all-pairs", n_std, steps),
        ("all-pairs-collapsed", n_std, steps),
        ("octree", n_std, steps),
        ("bvh", n_std, steps),
        ("octree", n_big, big_steps),
        ("bvh", n_big, big_steps),
    ]

    meta = hardware_metadata()
    print(f"# hardware: {meta}", file=sys.stderr)

    if a.precision == "double" and meta.get("backend") == "tpu":
        # the gather-free tree fast paths and the Pallas all-pairs kernel
        # are fp32-only (the TPU has no native f64); double runs fall back
        # to the chunked jnp list paths, which at N=1M cost tens of
        # seconds PER STEP on emulated f64 (see BASELINE.md) -- a full
        # non-quick double matrix is an hours-long run
        print(
            "# WARNING: precision=double leaves the TPU fp32 fast paths; "
            "tree runs fall back to the f64 list path (~100x slower at "
            "N=1M). Use --precision float for the TPU-native numbers, or "
            "--quick to bound the cost.",
            file=sys.stderr,
        )

    all_rows = []
    for algo, n, s in matrix:
        print(f"# running {algo} n={n} steps={s} ...", file=sys.stderr, flush=True)
        try:
            rows = run_config(algo, n, s, dim=3, precision=a.precision)
        except Exception as e:
            print(f"#   FAILED: {e}", file=sys.stderr)
            rows = [{"algorithm": algo, "nbodies": str(n), "error": str(e)[:200]}]
        all_rows.extend(rows)

    if a.detailed:
        for algo in ("octree", "bvh"):
            print(f"# running detailed {algo} ...", file=sys.stderr, flush=True)
            try:
                all_rows.extend(
                    run_config(algo, n_std, steps, dim=3, precision=a.precision,
                               detailed=True)
                )
            except Exception as e:
                print(f"#   FAILED: {e}", file=sys.stderr)

    fieldnames = sorted({k for r in all_rows for k in r} | set(meta))
    with open(a.out, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=fieldnames)
        w.writeheader()
        for r in all_rows:
            w.writerow({**meta, **r})
    print(f"# wrote {a.out} ({len(all_rows)} rows)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
