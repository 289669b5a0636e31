#!/usr/bin/env python
"""One-off TPU probe: production ENGINE step timing (the bench.py tree
metric) for one (algo, dim, evolved) case per process.
Usage: probe_engine_step.py OUT algo,dim,evolve_steps

Feeds: BASELINE.md authoritative shipped-defaults table (same configs as bench.py).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

OUT = sys.argv[1]
algo, dim, ev = sys.argv[2].split(",")
dim, ev = int(dim), int(ev)


def main():
    import bench

    try:
        sec = bench.measure_tree(algo, evolve_steps=ev, dim=dim)
        out = {"probe": "engine", "algo": algo, "dim": dim,
               "evolve": ev, "sec": sec}
    except Exception as e:
        out = {"probe": "engine", "algo": algo, "dim": dim,
               "evolve": ev, "error": str(e)[:300]}
    with open(OUT, "a") as fh:
        fh.write(json.dumps(out) + "\n")
    print(out, flush=True)


if __name__ == "__main__":
    main()
