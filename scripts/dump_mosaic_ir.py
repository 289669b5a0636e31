#!/usr/bin/env python
"""Dump the Mosaic (pre-scheduling) vector IR of the all-pairs kernel.

Lowers allpairs_accel_pallas for the TPU platform OFFLINE via jax.export
(no TPU needed), extracts the tpu_custom_call's serialized Mosaic module,
and writes the round-tripped MLIR text -- the op-level evidence for the
BASELINE.md all-pairs roofline analysis (VERDICT round-3 item 7).

Usage: scripts/dump_mosaic_ir.py [out.mlir] [--fast]
"""

import base64
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mosaic_kernel.mlir"
    fast = "--fast" in sys.argv

    from jax import export

    from nbody_tpu.ops.pallas_allpairs import allpairs_accel_pallas

    N, dim = 1 << 20, 3
    eps = float(np.finfo(np.float32).eps)
    m = jax.ShapeDtypeStruct((N,), jnp.float32)
    x = jax.ShapeDtypeStruct((N, dim), jnp.float32)
    exp = export.export(
        jax.jit(lambda m, x: allpairs_accel_pallas(m, x, 1.0, eps,
                                                   fast=fast)),
        platforms=["tpu"],
    )(m, x)
    txt = exp.mlir_module()

    # backend_config JSON is MLIR-escaped; pull the base64 body manually
    import re

    mm = re.search(r'backend_config = "(.*?)"\}', txt, re.S)
    cfg = mm.group(1).replace("\\\\22", '"').replace("\\22", '"')
    i = cfg.find('"body": "')
    j = cfg.find('"', i + len('"body": "'))
    body = cfg[i + len('"body": "'):j]
    raw = base64.b64decode(body + "=" * (-len(body) % 4))

    from jax._src.lib.mlir import ir

    ctx = ir.Context()
    ctx.allow_unregistered_dialects = True
    mod = ir.Module.parse(raw, ctx)
    with open(out, "w") as fh:
        fh.write(str(mod))
    print(f"wrote {out} ({len(str(mod))} chars)")

    # op census over the full-width (TI, TJ) vectors
    import collections

    census = collections.Counter()
    for line in str(mod).splitlines():
        mm = re.search(r'"stable_mosaic\.([a-z_.]+)"', line)
        if mm and "512x2048" in line or (mm and "512x1024" in line):
            census[mm.group(1)] += 1
    for op, cnt in census.most_common():
        print(f"  {cnt:3d}  {op}")


if __name__ == "__main__":
    main()
