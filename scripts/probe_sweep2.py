#!/usr/bin/env python
"""One-off TPU sweep 2: BVH 3-D full step -- group_tile x true_curve x
refine, at n=1M galaxy theta=0.5 fp32.  JSON lines to argv[1]."""

import json
import sys
from functools import partial

import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_sweep2.json"
N = 1_000_000


def log(obj):
    with open(OUT, "a") as fh:
        fh.write(json.dumps(obj) + "\n")
    print(obj, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from nbody_tpu.models import build_galaxy_model
    from nbody_tpu.ops.bvh import bvh_step_force
    from nbody_tpu.ops.integrator import leapfrog_step
    from nbody_tpu.utils.measure import scan_seconds_per_step

    cfg, state = build_galaxy_model(N, 3, np.float32)
    theta, G, eps = 0.5, float(cfg.G), cfg.eps

    cases = [
        # (group_tile, window_tiles, refine, true_curve)
        (256, 64, 0, True),
        (1024, 16, 0, True),
        (512, 32, 2, True),
        (512, 32, 3, True),
        (256, 64, 2, True),
    ]
    for gt, wt, ref, tc in cases:
        @partial(jax.jit, static_argnames=("iters",))
        def loop(s, iters, _gt=gt, _wt=wt, _ref=ref, _tc=tc):
            def body(c, _):
                c2, _tree, _aux = bvh_step_force(
                    c, theta, G, eps, use_pallas=True, group_tile=_gt,
                    true_curve=_tc, window_tiles=_wt, refine=_ref)
                return leapfrog_step(c2, cfg.dt), None

            return jax.lax.scan(body, s, None, length=iters)[0].x

        try:
            dt = scan_seconds_per_step(loop, (state,), iters_short=1,
                                       iters_long=4, repeats=2)

            @jax.jit
            def fb(s, _gt=gt, _wt=wt, _ref=ref, _tc=tc):
                _s, _t, aux = bvh_step_force(
                    s, theta, G, eps, use_pallas=True, group_tile=_gt,
                    true_curve=_tc, window_tiles=_wt, refine=_ref)
                return aux["overflow"]

            log({"probe": "s2", "tile": gt, "window": wt, "refine": ref,
                 "true_curve": tc, "sec": dt, "overflow": int(fb(state))})
        except Exception as e:
            log({"probe": "s2", "tile": gt, "window": wt, "refine": ref,
                 "true_curve": tc, "error": str(e)[:300]})
    log({"probe": "s2_done"})


if __name__ == "__main__":
    main()
