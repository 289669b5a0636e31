"""Cross-IMPLEMENTATION validation against the reference binary.

The reference source builds sequentially with g++ (-DSEQUENTIAL rebinds
both policies to seq, execution.h:4-6) into a true independent oracle --
the same methodology as the reference's own NASA pipeline (ci/thuering:
40-56), but CI-checked: shared integrator/RNG/softening bugs between our
engines are visible here where self-comparison (scripts/nasa.py) is blind.

Covers: theta=0 print-state parity for every algorithm x workload x
precision x dim, and a positions.bin final-frame L1 check (the
check_state.py metric, scripts/thuering_nbody/check_state.py:43-50).
"""

import numpy as np
import pytest

from tests import ref_oracle as ro

pytestmark = pytest.mark.skipif(
    not ro.reference_available(), reason="reference toolchain unavailable"
)


def _compare_states(out_ref: str, out_ours: str, rtol: float):
    ref_blocks = ro.parse_states(out_ref)
    our_blocks = ro.parse_states(out_ours)
    assert len(ref_blocks) == len(our_blocks) == 2
    for ref, ours in zip(ref_blocks, our_blocks):
        assert ref.shape == ours.shape
        # column scales differ wildly (m vs f); normalize per column
        scale = np.abs(ref).max(axis=0) + 1e-300
        err = (np.abs(ref - ours) / scale).max()
        assert err < rtol, f"max col-relative err {err}"


CASES = [
    # (dim, algorithm, workload, precision, n, steps, rtol)
    (2, "all-pairs", "uniform", "float", 10, 5, 2e-3),
    (2, "all-pairs", "uniform", "double", 10, 5, 1e-6),
    (2, "all-pairs", "galaxy", "double", 64, 5, 1e-6),
    (2, "all-pairs-collapsed", "uniform", "double", 10, 5, 1e-6),
    (2, "bvh", "uniform", "double", 10, 5, 1e-6),
    (2, "bvh", "galaxy", "double", 64, 5, 1e-6),
    (2, "octree", "uniform", "double", 10, 5, 1e-6),
    (2, "octree", "galaxy", "double", 64, 5, 1e-6),
    (3, "all-pairs", "uniform", "double", 10, 5, 1e-6),
    (3, "all-pairs", "galaxy", "double", 64, 5, 1e-6),
    (3, "all-pairs", "plummer", "double", 32, 3, 1e-6),
    (3, "bvh", "galaxy", "double", 64, 5, 1e-6),
    (3, "octree", "galaxy", "double", 64, 5, 1e-6),
    (3, "all-pairs-collapsed", "galaxy", "double", 64, 5, 1e-6),
]


@pytest.mark.parametrize("dim,algo,workload,prec,n,steps,rtol", CASES)
def test_theta0_print_state_parity(dim, algo, workload, prec, n, steps, rtol):
    """README.md:122-129 oracle: at theta=0 every algorithm degenerates to
    the exact direct sum, and --print-state must agree with the reference
    binary run with identical flags (bit-exact mt19937 workloads make the
    initial conditions identical)."""
    flags = [
        "-n", str(n), "-s", str(steps), "--theta", "0",
        "--algorithm", algo, "--workload", workload,
        "--precision", prec, "--print-state",
    ]
    out_ref = ro.run_reference(dim, flags)
    out_ours = ro.run_ours(dim, flags)
    _compare_states(out_ref, out_ours, rtol)


@pytest.mark.parametrize("theta", [0.5, 1.0])
def test_mac_print_state_parity(theta):
    """Non-zero theta: same tree, same MAC, same forces (group traversal
    is conservative => at least as accurate; compare at the per-body walk
    which replicates reference traversal semantics exactly)."""
    flags = [
        "-n", "64", "-s", "3", "--theta", str(theta),
        "--algorithm", "bvh", "--workload", "galaxy",
        "--precision", "double", "--print-state",
    ]
    out_ref = ro.run_reference(2, flags)
    out_ours = ro.run_ours(2, flags + ["--traversal", "per-body"])
    _compare_states(out_ref, out_ours, 1e-6)


def test_positions_bin_l1(tmp_path):
    """check_state.py-style final-frame L1 comparison of positions.bin
    written by both implementations (--csv-detailed saves every step,
    saving.h:85-114)."""
    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    ref_dir.mkdir()
    our_dir.mkdir()
    flags = [
        "-n", "64", "-s", "5", "--theta", "0.5", "--algorithm", "bvh",
        "--workload", "galaxy", "--precision", "double",
        "--save", "pos", "--csv-detailed",
    ]
    ro.run_reference(2, flags, cwd=ref_dir)
    ro.run_ours(2, flags + ["--traversal", "per-body"], cwd=our_dir)

    def read_positions(path):
        with open(path, "rb") as fh:
            header = np.fromfile(fh, dtype=np.uint32, count=4)
            nbodies, nsteps, tsize, dim = (int(v) for v in header)
            dtype = np.float64 if tsize == 8 else np.float32
            data = np.fromfile(fh, dtype=dtype)
        frames = data.reshape(-1, nbodies, dim)
        return frames

    ref_frames = read_positions(ref_dir / "positions.bin")
    our_frames = read_positions(our_dir / "positions.bin")
    assert ref_frames.shape == our_frames.shape
    ref_last, our_last = ref_frames[-1], our_frames[-1]
    l1 = np.abs(ref_last - our_last).sum()
    scale = np.abs(ref_last).sum()
    assert l1 / scale < 1e-9, f"relative L1 {l1 / scale}"
