#!/usr/bin/env python
"""Convert a TimThuering/N-Body-Simulation CSV (NASA JPL SBDB asteroid
dataset) into the loadable binary state format.

Capability-equivalent rewrite of the reference's
scripts/thuering_nbody/conv_csv.py against the same formats and unit
conventions: simulation in AU and days, G rescaled from SI to AU^3/day^2,
dt = 1/24 day (1 hour). Exactly-coincident positions are nudged apart with
nextafter; NaN rows become massless random bodies (random.seed(42)).

One deliberate fix over the reference: with --prop < 1 the reference writes
the FULL row count in the header but only prop*N bodies of data
(conv_csv.py:63-75), producing an unloadable file; here the header matches
the written body count.

Usage: conv_csv.py input.csv output.bin [--prop P]
"""

from __future__ import annotations

import argparse
import csv
import random
import struct

import numpy as np

random.seed(42)
f32 = np.float32


def gravitational_constant_au_day() -> np.float32:
    """G in AU^3 / (unit-mass * day^2)."""
    G_SI = 6.67428e-11
    meter_per_au = 1.0 / 1.49597870691e11
    second_per_day = 1.0 / 86400.0
    return f32(G_SI * meter_per_au**3 / second_per_day**2)


def convert(input_csv: str, output_bin: str, prop: float = 1.0) -> dict:
    skip_count = 0
    move_count = 0
    seen = set()
    rows = []
    with open(input_csv, newline="") as fh:
        reader = csv.reader(fh)
        next(reader)  # header
        for row in reader:
            mass = f32(row[3])
            pos = (f32(row[4]), f32(row[5]), f32(row[6]))
            vel = (f32(row[7]), f32(row[8]), f32(row[9]))
            while pos in seen:
                pos = (np.nextafter(pos[0], f32(np.inf)), pos[1], pos[2])
                move_count += 1
            seen.add(pos)
            rec = np.array((mass, *pos, *vel), dtype=np.float32)
            if np.any(np.isnan(rec)):
                rec = np.array(
                    (0.0, random.random(), 0.0, 0.0, 0.0, 0.0, 0.0), np.float32
                )
                skip_count += 1
            rows.append(rec)

    row_count = int(prop * len(rows))
    rows = rows[:row_count]
    total_mass = float(np.sum([r[0] for r in rows]))
    with open(output_bin, "wb") as out:
        out.write(struct.pack("<ii", row_count, 3))
        out.write(struct.pack("<ff", 1.0 / 24.0, float(gravitational_constant_au_day())))
        np.stack(rows).astype(np.float32).tofile(out)

    print(f"Saved {row_count} bodies")
    print(f"Total mass saved: {total_mass:.60g}")
    print(f"Replaced {skip_count} NaN bodies")
    print(f"Adjusted {move_count} bodies")
    return {
        "bodies": row_count,
        "total_mass": total_mass,
        "nan_replaced": skip_count,
        "moved": move_count,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Read n-body CSV and write to binary file.")
    p.add_argument("input_csv")
    p.add_argument("output_bin")
    p.add_argument("--prop", type=float, default=1.0,
                   help="Proportion of dataset to use (default 1)")
    a = p.parse_args(argv)
    convert(a.input_csv, a.output_bin, a.prop)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
