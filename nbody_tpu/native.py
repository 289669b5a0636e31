"""ctypes bridge to the native C++ runtime (native/nbody_native.cpp).

Loads (building on demand) libnbody_native.so and exposes the workload
builders. Every entry point has a pure-Python fallback in
nbody_tpu.models.builders / nbody_tpu.rng that produces bit-identical
output; the native path exists because the reference also does its model
construction in native code (src/models.h) and the Plummer rejection loop
is sequential -- Python pays ~10us per draw, C++ ~10ns.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_LOAD_FAILED = False


def _load():
    global _LIB, _LOAD_FAILED
    if _LIB is not None or _LOAD_FAILED:
        return _LIB
    try:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys_path = os.path.join(here, "native")
        import sys

        sys.path.insert(0, sys_path)
        try:
            from build import build  # type: ignore
        finally:
            sys.path.pop(0)
        lib_path = build()
        lib = ctypes.CDLL(lib_path)
        u32 = ctypes.c_uint32
        dbl = ctypes.c_double
        pd = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        pu = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        lib.build_uniform.argtypes = [u32, u32, pd, pd, pd]
        lib.build_plummer.argtypes = [u32, pd, pd, pd]
        lib.build_galaxy.argtypes = [
            u32, u32, dbl, dbl, pd, pd, pd, ctypes.POINTER(u32)
        ]
        lib.mt19937_raw.argtypes = [u32, u32, pu]
        lib.mt19937_canonical.argtypes = [u32, u32, pd]
        _LIB = lib
    except Exception:
        _LOAD_FAILED = True
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def build_uniform(n: int, dim: int):
    lib = _load()
    m = np.empty(n, np.float64)
    x = np.empty((n, dim), np.float64)
    v = np.empty((n, dim), np.float64)
    lib.build_uniform(n, dim, m, x, v)
    return m, x, v


def build_plummer(n: int):
    lib = _load()
    m = np.empty(n, np.float64)
    x = np.empty((n, 3), np.float64)
    v = np.empty((n, 3), np.float64)
    lib.build_plummer(n, m, x, v)
    return m, x, v


def build_galaxy(n: int, dim: int, G: float, eps: float):
    lib = _load()
    size = int(2 * (n / 2.0))
    m = np.empty(size, np.float64)
    x = np.empty((size, dim), np.float64)
    v = np.empty((size, dim), np.float64)
    filled = ctypes.c_uint32(0)
    lib.build_galaxy(n, dim, G, eps, m, x, v, ctypes.byref(filled))
    return m, x, v


def mt19937_raw(seed: int, count: int) -> np.ndarray:
    lib = _load()
    out = np.empty(count, np.uint32)
    lib.mt19937_raw(seed, count, out)
    return out


def mt19937_canonical(seed: int, count: int) -> np.ndarray:
    lib = _load()
    out = np.empty(count, np.float64)
    lib.mt19937_canonical(seed, count, out)
    return out
