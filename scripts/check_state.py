#!/usr/bin/env python
"""Compare final states of two n-body simulations (cross-simulator
validation, the reference's scripts/thuering_nbody/check_state.py).

Accepts:
  *.bin -- a positions.bin trajectory (this framework or the reference
           binary); the LAST frame is compared;
  *.csv -- a TimThuering/N-Body-Simulation lastState.csv (rows of
           positions).

Prints the total and per-body L1 position difference.
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np

sys.path.append(os.path.dirname(os.path.abspath(__file__)))
from plotter import read_points  # noqa: E402


def load_csv_state(path: str) -> np.ndarray:
    rows = []
    with open(path, newline="") as fh:
        reader = csv.reader(fh)
        next(reader)
        for row in reader:
            rows.append([float(v) for v in row])
    return np.array(rows)


def get_state(path: str) -> np.ndarray:
    if path.endswith(".bin"):
        return read_points(path)[-1]  # (dim, nbodies)
    if path.endswith(".csv"):
        return load_csv_state(path)
    raise ValueError("Unknown file type")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Compare the output of different n-body simulators"
    )
    p.add_argument("f1", help="Path to a state file (.bin trajectory)")
    p.add_argument("f2", help="Path to a state file (.bin or .csv)")
    a = p.parse_args(argv)

    s1 = get_state(a.f1)
    if a.f1.endswith(".bin"):
        s1 = s1.swapaxes(0, 1)  # -> (nbodies, dim)
    s2 = get_state(a.f2)
    if a.f2.endswith(".bin"):
        s2 = s2.swapaxes(0, 1)

    err = np.abs(s1 - s2).sum()
    print(f"Total absolute difference is {err}")
    print(f"Absolute difference per body is {err / s1.shape[0]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
