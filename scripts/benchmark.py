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
        row["provenance"] = "measured (full chained run)"
        rows.append(row)
    return rows


# ---- --scan mode (VERDICT r5 item 6) --------------------------------------
#
# The full-CSV runs dispatch `steps` chained device steps; at N=1M (or in
# emulated f64) one such dispatch exceeds the axon tunnel worker's ~45 s
# device-time kill and crashes it -- every 1M/double row of the round-4
# matrix died that way (error text preserved in results/r4/benchmark_*.csv).
# --scan derives the same rows from differenced short-dispatch scans (the
# method BASELINE.md trusts for every headline number) with a provenance
# column: "scan" (differenced 1-vs-k iteration scans), "single-dispatch"
# (step too costly to chain, one timed step), or "extrapolated" (one step
# at the target N would itself exceed the worker budget -- projected from
# two reduced-N single-dispatch measurements at the fitted power law, the
# same method as BASELINE.md's f64-at-scale table).

SAFE_DISPATCH_S = 18.0      # one timed dispatch stays well under ~45 s
WORKER_BUDGET_S = 35.0      # never attempt a step projected above this


def _engine_loop(algorithm: str, n: int, dim: int, precision: str):
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nbody_tpu.models import build_galaxy_model
    from nbody_tpu.sim.engines import EngineOptions, get_engine

    dtype = np.float64 if precision == "double" else np.float32
    cfg, state = build_galaxy_model(n, dim, dtype)
    step = get_engine(algorithm).make_step(cfg, EngineOptions())

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop(state, iters):
        def body(s, k):
            return step(s, k)[0], None

        return jax.lax.scan(body, state, jnp.arange(iters))[0].x

    return loop, state


def _single_step_s(algorithm: str, n: int, dim: int, precision: str,
                   repeats: int = 2) -> float:
    from nbody_tpu.utils.timing import sync

    loop, state = _engine_loop(algorithm, n, dim, precision)
    sync(loop(state, 1))                     # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        sync(loop(state, 1))
        best = min(best, time.perf_counter() - t0)
    return best


def scan_config(algorithm: str, n: int, steps: int, dim: int,
                precision: str, theta: float = 0.5) -> dict:
    """One matrix row via the scan method.  Returns the reference CSV
    schema (algorithm,dim,precision,nsteps,nbodies,total [s]) plus
    sec_per_step and provenance."""
    import math

    from nbody_tpu.utils.measure import scan_seconds_per_step

    row = {"algorithm": algorithm, "dim": str(dim), "precision": precision,
           "nsteps": str(steps), "nbodies": str(n)}

    def _fill(dt: float, provenance: str) -> dict:
        row["sec_per_step"] = f"{dt:.6f}"
        row["total [s]"] = f"{dt * steps:.2f}"
        row["provenance"] = provenance
        return row

    # doubles (and any unknown-cost config) get a reduced-N cost ladder
    # first: project the per-step cost at the fitted power law before
    # risking a dispatch at the target N
    ladder = []                              # [(n_i, t_i)] measured

    def _extrapolate(reason: str) -> dict:
        if len(ladder) < 2:
            n2x = max(2 * ladder[0][0], n // 8) if ladder else n // 16
            try:
                ladder.append((n2x, _single_step_s(algorithm, n2x, dim,
                                                   precision, repeats=1)))
            except Exception as e:  # noqa: BLE001
                return _fill(float("nan"),
                             f"error ({reason}; ladder also failed: "
                             f"{str(e)[:120]})")
        (n1x, t1x), (n2x, t2x) = ladder[-2], ladder[-1]
        g = math.log(max(t2x, 1e-9) / max(t1x, 1e-9)) / math.log(n2x / n1x)
        proj = t2x * (n / n2x) ** g
        return _fill(proj, (
            f"extrapolated ({reason}; fitted t~n^{g:.2f} from measured "
            f"N={n1x}: {t1x:.2f}s, N={n2x}: {t2x:.2f}s)"))

    if precision == "double":
        n1, n2 = max(10_000, n // 16), max(20_000, n // 4)
        t1 = _single_step_s(algorithm, n1, dim, precision, repeats=1)
        ladder.append((n1, t1))
        if t1 * (n / n1) > WORKER_BUDGET_S:   # conservative linear floor
            t2 = _single_step_s(algorithm, n2, dim, precision, repeats=1)
            ladder.append((n2, t2))
            g = math.log(max(t2, 1e-9) / max(t1, 1e-9)) / math.log(n2 / n1)
            proj = t2 * (n / n2) ** g
            if proj > WORKER_BUDGET_S:
                return _extrapolate(
                    f"one step at N={n} projected {proj:.0f}s > "
                    f"{WORKER_BUDGET_S:.0f}s tunnel-worker budget")

    from nbody_tpu.utils.timing import sync

    # the at-target measurement can fail without warning from the
    # ladder (e.g. the f64 list path's O(chunk x n) broadcast exceeds
    # device memory only above some N: observed f32[8,2048,100000,3] =
    # 19.6 GB at octree double 100k).  Fall back to a labeled
    # extrapolation instead of an error row (VERDICT r5 item 6: every
    # row populated, measured or scan-derived).
    try:
        loop, state = _engine_loop(algorithm, n, dim, precision)
        sync(loop(state, 1))                 # compile
        t_one = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            sync(loop(state, 1))
            t_one = min(t_one, time.perf_counter() - t0)
    except Exception as e:  # noqa: BLE001
        return _extrapolate(f"at-N measurement failed: {str(e)[:160]}")
    if t_one > SAFE_DISPATCH_S:
        return _fill(t_one, "single-dispatch (step too costly to chain; "
                            "dispatch floor ~40ms is negligible here)")
    iters_long = max(2, min(6, int(SAFE_DISPATCH_S / max(t_one, 1e-3))))
    dt = scan_seconds_per_step(loop, (state,), iters_short=1,
                               iters_long=iters_long, repeats=2)
    return _fill(dt, f"scan (differenced 1-vs-{iters_long} iteration "
                     "dispatches, min of 2 repeats)")


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--detailed", action="store_true")
    p.add_argument("--scan", action="store_true",
                   help="derive rows from differenced short-dispatch scans "
                        "instead of full chained runs (tunnel-safe; adds a "
                        "provenance column)")
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

    if a.scan and a.precision == "double":
        # the scan path bypasses cli_main's x64 switch; this build
        # ignores JAX_ENABLE_X64 (CLAUDE.md), set before backend init
        import jax

        jax.config.update("jax_enable_x64", True)

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
        for attempt in (0, 1):
            try:
                if a.scan:
                    rows = [scan_config(algo, n, s, dim=3,
                                        precision=a.precision)]
                else:
                    rows = run_config(algo, n, s, dim=3,
                                      precision=a.precision)
                break
            except Exception as e:
                # transient tunnel compile-helper crashes warrant ONE
                # retry; a repeat failure is recorded in the row
                print(f"#   FAILED (attempt {attempt}): {e}",
                      file=sys.stderr)
                rows = [{"algorithm": algo, "nbodies": str(n),
                         "error": str(e)[:200]}]
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
