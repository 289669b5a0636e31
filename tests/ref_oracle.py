"""Build-and-run helpers for the reference implementation as a true
cross-implementation oracle.

The reference (/root/reference) builds sequentially with plain g++: with
-DSEQUENTIAL both execution policies rebind to std::execution::seq
(execution.h:4-6) so no TBB is needed, and -DFMT_FORMAT_WORKAROUND routes
std::format through a header-only fmt (format.h:3-8) -- we point the
include path at the fmt bundled with the installed torch wheel.

Binaries are cached under <repo>/.build/ref_oracle/ keyed by dimension so
the ~12 s compile happens once per checkout, not once per test.
"""

from __future__ import annotations

import pathlib
import re
import shutil
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
REF_SRC = pathlib.Path("/root/reference/src/main.cpp")
BUILD_DIR = REPO / ".build" / "ref_oracle"

_FMT_INCLUDE_CANDIDATES = [
    "/opt/venv/lib/python3.12/site-packages/torch/include",
]


def _fmt_include() -> str | None:
    for cand in _FMT_INCLUDE_CANDIDATES:
        if pathlib.Path(cand, "fmt/core.h").exists():
            return cand
    # fall back to searching the live torch installation
    try:
        import torch  # noqa: F401

        inc = pathlib.Path(torch.__file__).parent / "include"
        if (inc / "fmt/core.h").exists():
            return str(inc)
    except Exception:
        pass
    return None


def reference_available() -> bool:
    return REF_SRC.exists() and shutil.which("g++") is not None and _fmt_include() is not None


def build_reference(dim: int) -> pathlib.Path:
    """Compile the sequential-oracle reference binary for `dim`; cached."""
    exe = BUILD_DIR / f"nbody_ref_d{dim}"
    if exe.exists():
        return exe
    BUILD_DIR.mkdir(parents=True, exist_ok=True)
    cmd = [
        "g++", "-std=c++23", "-O2",
        "-DSEQUENTIAL", f"-DDIM_SIZE={dim}", "-DFMT_FORMAT_WORKAROUND",
        f"-I{_fmt_include()}",
        "-o", str(exe), str(REF_SRC),
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True, timeout=300)
    return exe


def run_reference(dim: int, args: list[str], cwd=None) -> str:
    exe = build_reference(dim)
    proc = subprocess.run(
        [str(exe), *args], capture_output=True, text=True, timeout=600,
        cwd=cwd,
    )
    assert proc.returncode == 0, proc.stderr or proc.stdout
    return proc.stdout


def run_ours(dim: int, args: list[str], cwd=None) -> str:
    proc = subprocess.run(
        [sys.executable, "-m", "nbody_tpu.cli", "-d", str(dim),
         "--kernel", "jnp", *args],
        capture_output=True, text=True, timeout=600, cwd=cwd,
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root", "NBODY_TPU_PLATFORM": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr or proc.stdout
    return proc.stdout


def read_positions(path):
    """Read a positions.bin trajectory (saving.h:85-98 header: 4 x u32
    {nbodies, nsteps, sizeof(T), dim}) into (frames, nbodies, dim)."""
    import numpy as np

    with open(path, "rb") as fh:
        header = np.fromfile(fh, dtype=np.uint32, count=4)
        nbodies, _nsteps, tsize, dim = (int(v) for v in header)
        dtype = np.float64 if tsize == 8 else np.float32
        data = np.fromfile(fh, dtype=dtype)
    return data.reshape(-1, nbodies, dim)


_STATE_RE = re.compile(
    r"^\d+: m=\s*(\S+), p=\(\s*(\S+),\s*(\S+)\), v=\(\s*(\S+),\s*(\S+)\), "
    r"f=\(\s*(\S+),\s*(\S+)\)$"
)


def parse_states(out: str):
    """Parse --print-state output into (start, final) float arrays of
    shape (n, 7): m, p01, v01, f01 (the reference prints only components
    [0] and [1] even in 3-D, system.h:90-97)."""
    import numpy as np

    blocks, cur = [], None
    for line in out.splitlines():
        if line.strip() in ("Starting state:", "Final state:"):
            cur = []
            blocks.append(cur)
            continue
        m = _STATE_RE.match(line.strip())
        if m and cur is not None:
            cur.append([float(g) for g in m.groups()])
    return [np.asarray(b) for b in blocks]
