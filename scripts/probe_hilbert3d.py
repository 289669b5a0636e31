#!/usr/bin/env python
"""One-off TPU probe: true 3-D Hilbert curve vs the reference's partial
transform, full BVH fast step at n=1M 3-D galaxy theta=0.5.

JSON lines to argv[1] (default /tmp/probe_h3d.json).
"""

import json
import sys
from functools import partial

import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_h3d.json"
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

    for tc in (True, False):
        for wt in ((32, 64, 96) if tc else (32,)):
            @partial(jax.jit, static_argnames=("iters",))
            def loop(s, iters, _tc=tc, _wt=wt):
                def body(c, _):
                    c2, _tree, _aux = bvh_step_force(
                        c, theta, G, eps, use_pallas=True,
                        true_curve=_tc, window_tiles=_wt)
                    return leapfrog_step(c2, cfg.dt), None

                return jax.lax.scan(body, s, None, length=iters)[0].x

            try:
                dt = scan_seconds_per_step(loop, (state,), iters_short=1,
                                           iters_long=4, repeats=2)

                @jax.jit
                def fb(s, _tc=tc, _wt=wt):
                    _s, _t, aux = bvh_step_force(
                        s, theta, G, eps, use_pallas=True,
                        true_curve=_tc, window_tiles=_wt)
                    return aux["overflow"]

                log({"probe": "h3d", "true_curve": tc, "window": wt,
                     "sec": dt, "overflow": int(fb(state))})
            except Exception as e:
                log({"probe": "h3d", "true_curve": tc, "window": wt,
                     "error": str(e)[:300]})
    log({"probe": "h3d_done"})


if __name__ == "__main__":
    main()
