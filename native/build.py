#!/usr/bin/env python
"""Build the native runtime library (g++ -O3 -shared -fPIC).

Output: native/libnbody_native.so. Idempotent: skips the build when the
library is newer than the source. Invoked on demand by nbody_tpu.native.
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "nbody_native.cpp")
OUT = os.path.join(HERE, "libnbody_native.so")


def build(force: bool = False) -> str:
    if (
        not force
        and os.path.exists(OUT)
        and os.path.getmtime(OUT) >= os.path.getmtime(SRC)
    ):
        return OUT
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", OUT, SRC,
    ]
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
