#!/usr/bin/env python
"""Multi-chip scaling table on the virtual 8-device CPU mesh.

Feeds: BASELINE.md multi-chip scaling table (VERDICT r4 item 7).

Measures step wall-clock vs shard count S for:
  * ring all-pairs          (parallel/ring.py)
  * sharded BVH             (parallel/tree_sharded.py, replicated tree)
  * sharded octree          (parallel/tree_sharded.py)
  * partitioned octree      (parallel/tree_partitioned.py, weak-scaling)

CPU devices share the host's cores, so ABSOLUTE times are meaningless;
what transfers to real ICI hardware is (a) whether the per-step graph
partitions without replicating the O(n^2)/O(n log n) work (it does:
relative time should DROP with S for the strong-scaling rows), and
(b) the collective pattern (one all_gather per step for the replicated
trees; ppermute rings for the rest).  Strong scaling: n fixed.  The
partitioned row also reports the WEAK configuration (n grows with S).

Usage: python scripts/probe_mesh_scaling.py [--n 32768] [--steps 3]
Writes JSON lines to stdout and a markdown table to --out.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=32768)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--out", default=None)
    a = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    import jax.numpy as jnp

    from nbody_tpu.config import SimConfig
    from nbody_tpu.models import build_galaxy_model
    from nbody_tpu.parallel.ring import make_ring_allpairs
    from nbody_tpu.parallel.tree_partitioned import (
        make_partitioned_octree_step,
    )
    from nbody_tpu.parallel.tree_sharded import (
        make_sharded_bvh_step,
        make_sharded_octree_step,
    )
    from nbody_tpu.sim.engines import EngineOptions

    n = a.n
    rows = []

    def timed(fn, *args, reps=a.steps):
        jax.block_until_ready(fn(*args))   # compile + warm, fully retired
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)     # CPU: real barrier
        return (time.perf_counter() - t0) / reps

    cfg2, state = build_galaxy_model(n, 2, np.float32)

    for S in (1, 2, 4, 8):
        rec = {"S": S, "n": n}
        # ring all-pairs: accel only (the step is accel + elementwise)
        ring = jax.jit(make_ring_allpairs(cfg2, S))
        rec["ring_allpairs_s"] = timed(ring, state.m, state.x)

        opts = EngineOptions(mesh=S)
        bstep = make_sharded_bvh_step(cfg2, opts)
        k = jnp.zeros((), jnp.int32)
        rec["sharded_bvh_s"] = timed(lambda s=state: bstep(s, k)[0].x)

        ostep = make_sharded_octree_step(cfg2, opts)
        rec["sharded_octree_s"] = timed(lambda s=state: ostep(s, k)[0].x)

        pstep = make_partitioned_octree_step(cfg2, S)
        rec["partitioned_octree_s"] = timed(
            lambda s=state: pstep(s)[0].x)

        # 2-D (body x tile) layout at the same device count: total work
        # = 1-D force work (rows divide across T) + (T-1) extra
        # replicated sort/heap copies -- this row measures that overhead
        # (on real chips the tile axis buys 1/T force wall-clock)
        if S >= 4:
            pstep2 = make_partitioned_octree_step(cfg2, S // 2,
                                                  tile_shards=2)
            rec["partitioned_2d_s"] = timed(lambda s=state: pstep2(s)[0].x)

        # weak configuration: n scales with S (per-shard n/S constant)
        nw = n * S // 8
        cfgw, statew = build_galaxy_model(nw, 2, np.float32)
        pstepw = make_partitioned_octree_step(cfgw, S)
        rec["partitioned_weak_n"] = nw
        rec["partitioned_weak_s"] = timed(lambda s=statew: pstepw(s)[0].x)

        print(json.dumps(rec), flush=True)
        rows.append(rec)

    if a.out:
        with open(a.out, "w") as fh:
            fh.write("| S | ring all-pairs | sharded bvh | sharded octree "
                     "| partitioned octree | partitioned 2-D (S/2 x 2) "
                     "| partitioned weak (n=n*S/8) |\n")
            fh.write("|---|---|---|---|---|---|---|\n")
            for r in rows:
                p2 = (f"{r['partitioned_2d_s']:.3f} s"
                      if "partitioned_2d_s" in r else "-")
                fh.write(
                    f"| {r['S']} | {r['ring_allpairs_s']:.3f} s "
                    f"| {r['sharded_bvh_s']:.3f} s "
                    f"| {r['sharded_octree_s']:.3f} s "
                    f"| {r['partitioned_octree_s']:.3f} s "
                    f"| {p2} "
                    f"| {r['partitioned_weak_s']:.3f} s "
                    f"(n={r['partitioned_weak_n']}) |\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
