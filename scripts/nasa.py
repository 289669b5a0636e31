#!/usr/bin/env python
"""NASA asteroid-dataset validation pipeline -- the equivalent of the
reference's ci/thuering harness (fetch JPL SBDB data, convert, simulate,
cross-validate final positions).

The reference pipeline (ci/thuering:29-56):
  1. curl the JPL Small-Body DataBase -> sim_sbdb.csv
  2. conv_csv.py -> sim_sbdb_mid.bin (AU/day units, G rescaled, dt = 1 h)
  3. run the simulator: --workload load sim_sbdb_mid.bin --theta 0.6
     --precision double, 25 steps (= 1 day)
  4. check_state.py: L1 final-position diff vs an external SYCL simulator.

This environment has no network access, so step 1 accepts a local CSV
(--csv) or generates a synthetic asteroid-belt dataset in the same schema
(--synthetic N); and step 4 cross-validates between two of OUR engines
(octree vs all-pairs) instead of an external simulator -- the same
methodology (independent force algorithms agreeing on final positions).
If you have the real dataset and the external simulator's lastState.csv,
pass them via --csv / --external.

Usage:
  scripts/nasa.py --synthetic 2000 [--steps 25] [--workdir /tmp/nasa]
  scripts/nasa.py --csv sim_sbdb.csv [--external lastState.csv]
"""

from __future__ import annotations

import argparse
import csv as csv_mod
import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, HERE)
sys.path.insert(0, REPO)


def make_synthetic_csv(path: str, n: int, seed: int = 7) -> None:
    """Synthetic main-belt-like dataset in the Thuering CSV schema:
    columns [id, name, class, mass, x, y, z, vx, vy, vz] (AU, AU/day)."""
    rng = np.random.default_rng(seed)
    rows = []
    # Sun at origin (column layout mirrors the real dataset: first row is
    # the massive primary)
    GM_SUN_AU_DAY = 2.9591220828559093e-4  # G*Msun in AU^3/day^2
    from conv_csv import gravitational_constant_au_day

    G = float(gravitational_constant_au_day())
    m_sun = GM_SUN_AU_DAY / G
    rows.append((0, "Sun", "STA", m_sun, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    for i in range(1, n):
        a = rng.uniform(2.1, 3.3)          # semi-major axis [AU]
        ang = rng.uniform(0, 2 * np.pi)
        z = rng.normal(0, 0.05)
        pos = np.array([a * np.cos(ang), a * np.sin(ang), z])
        vnorm = np.sqrt(GM_SUN_AU_DAY / a)  # circular orbit speed [AU/day]
        vel = vnorm * np.array([-np.sin(ang), np.cos(ang), 0.0])
        mass = rng.uniform(1e8, 1e15)       # kg-ish scale, tiny vs Sun
        rows.append((i, f"ast{i}", "MBA", mass, *pos, *vel))
    with open(path, "w", newline="") as fh:
        w = csv_mod.writer(fh)
        w.writerow(["id", "name", "class", "mass", "x", "y", "z", "vx", "vy", "vz"])
        w.writerows(rows)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--csv", help="real SBDB CSV (Thuering schema)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate a synthetic belt of N bodies instead")
    p.add_argument("--external", help="external simulator lastState.csv to compare")
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--workdir", default="nasa_work")
    a = p.parse_args(argv)

    os.makedirs(a.workdir, exist_ok=True)
    csv_path = a.csv
    if not csv_path:
        n = a.synthetic or 2000
        csv_path = os.path.join(a.workdir, "sim_sbdb.csv")
        print(f"# generating synthetic dataset ({n} bodies) -> {csv_path}")
        make_synthetic_csv(csv_path, n)

    import conv_csv

    bin_path = os.path.join(a.workdir, "sim_sbdb_mid.bin")
    conv_csv.convert(csv_path, bin_path)

    # run two independent engines at the reference's NASA config
    # (ci/run:155-165: theta 0.6, double, 25 steps)
    from nbody_tpu.cli import main as cli_main

    outputs = {}
    for algo in ("octree", "all-pairs"):
        outdir = os.path.join(a.workdir, algo.replace("-", "_"))
        os.makedirs(outdir, exist_ok=True)
        cwd = os.getcwd()
        os.chdir(outdir)
        try:
            print(f"# running {algo} ...")
            cli_main([
                "-s", str(a.steps), "-d", "3", "--precision", "double",
                "--algorithm", algo, "--theta", "0.6",
                "--workload", "load", os.path.abspath(bin_path),
                "--csv-detailed", "--save", "pos",
            ], out=sys.stderr)
        finally:
            os.chdir(cwd)
        outputs[algo] = os.path.join(outdir, "positions.bin")

    # cross-IMPLEMENTATION check: build and run the reference binary
    # (g++ -DSEQUENTIAL) on the same .bin -- the true ci/thuering
    # methodology, no network required
    ref_positions = None
    try:
        sys.path.insert(0, os.path.join(REPO, "tests"))
        import ref_oracle

        if ref_oracle.reference_available():
            refdir = os.path.join(a.workdir, "reference")
            os.makedirs(refdir, exist_ok=True)
            print("# running the reference binary (sequential oracle) ...")
            ref_oracle.run_reference(3, [
                "-s", str(a.steps), "--precision", "double",
                "--algorithm", "octree", "--theta", "0.6",
                "--workload", "load", os.path.abspath(bin_path),
                "--csv-detailed", "--save", "pos",
            ], cwd=refdir)
            ref_positions = os.path.join(refdir, "positions.bin")
    except Exception as e:  # reference toolchain optional
        print(f"# reference oracle unavailable: {e}", file=sys.stderr)

    import check_state

    print("# octree vs all-pairs final positions:")
    check_state.main([outputs["octree"], outputs["all-pairs"]])
    if ref_positions:
        print("# octree vs REFERENCE BINARY final positions:")
        check_state.main([outputs["octree"], ref_positions])
    if a.external:
        print("# octree vs external simulator:")
        check_state.main([outputs["octree"], a.external])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
