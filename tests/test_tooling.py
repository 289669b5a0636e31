"""Analysis tooling: plotter / conv_csv / check_state against real output
files (the reference's L7 layer, byte-compatible formats)."""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from nbody_tpu.cli import main as cli_main


@pytest.fixture()
def traj_files(tmp_path, monkeypatch):
    """Run a small simulation producing positions.bin + energy.bin."""
    monkeypatch.chdir(tmp_path)
    cli_main(
        ["-n", "16", "-s", "3", "--algorithm", "all-pairs", "--kernel", "jnp",
         "--workload", "galaxy", "--csv-detailed", "--save", "all"],
        out=io.StringIO(),
    )
    return tmp_path


def test_read_points_shape(traj_files):
    from plotter import read_points

    data = read_points(str(traj_files / "positions.bin"))
    # csv-detailed writes 1 initial + 3 per-step frames; header says 3
    # frames and the reader honors the header (reference behavior)
    assert data.shape == (3, 2, 16)


def test_read_energy(traj_files):
    from plotter import read_energy

    e = read_energy(str(traj_files / "energy.bin"))
    assert e.shape[0] == 2
    assert np.all(np.isfinite(e))


def test_energy_plot_png(traj_files):
    import matplotlib

    matplotlib.use("Agg")
    from plotter import plot_energy

    out = traj_files / "energy.png"
    plot_energy(str(traj_files / "energy.bin"), str(out))
    assert out.stat().st_size > 1000


def test_galaxy_animation_gif(traj_files):
    import matplotlib

    matplotlib.use("Agg")
    import plotter

    ani = plotter.animate_galaxy(str(traj_files / "positions.bin"))
    writer, ext = plotter._writer(mp4=False, fps=10)
    ani.save(str(traj_files / "anim.gif"), writer=writer)
    assert (traj_files / "anim.gif").stat().st_size > 100


def test_conv_csv_roundtrip(tmp_path):
    """Synthetic Thuering CSV -> .bin -> load_system."""
    import conv_csv

    csv_path = tmp_path / "sim.csv"
    rows = ["id,a,b,mass,x,y,z,vx,vy,vz"]
    rows.append("0,_,_,1.5,1.0,2.0,3.0,0.1,0.2,0.3")
    rows.append("1,_,_,2.5,1.0,2.0,3.0,0.0,0.0,0.0")  # coincident -> nudged
    rows.append("2,_,_,nan,9.0,9.0,9.0,0.0,0.0,0.0")  # NaN -> massless random
    csv_path.write_text("\n".join(rows) + "\n")
    out_bin = tmp_path / "sim.bin"
    stats = conv_csv.convert(str(csv_path), str(out_bin))
    assert stats == {
        "bodies": 3,
        "total_mass": pytest.approx(4.0),
        "nan_replaced": 1,
        "moved": 1,
    }

    from nbody_tpu.io.saving import load_system

    cfg, state = load_system(str(out_bin), 3, np.float32)
    assert cfg.n == 3
    assert cfg.dt == pytest.approx(np.float32(1 / 24))
    # G in AU^3/day^2 ~ 1.488e-34 * ... just check positive & tiny
    assert 0 < cfg.G < 1e-30
    m = np.asarray(state.m)
    assert m[0] == pytest.approx(1.5)
    assert m[2] == 0.0  # NaN row became massless
    x = np.asarray(state.x)
    assert x[1, 0] != x[0, 0]  # nudged apart
    assert x[1, 0] == pytest.approx(1.0)


def test_check_state_identical(traj_files, capsys):
    import check_state

    pos = str(traj_files / "positions.bin")
    check_state.main([pos, pos])
    out = capsys.readouterr().out
    assert "Total absolute difference is 0" in out


def test_check_state_bin_vs_csv(traj_files, tmp_path, capsys):
    import check_state
    from plotter import read_points

    last = read_points(str(traj_files / "positions.bin"))[-1].T  # (n, dim)
    csv_path = tmp_path / "lastState.csv"
    lines = ["x,y"] + [f"{r[0]},{r[1]}" for r in last]
    csv_path.write_text("\n".join(lines) + "\n")
    check_state.main([str(traj_files / "positions.bin"), str(csv_path)])
    out = capsys.readouterr().out
    assert "difference per body is" in out
    per_body = float(out.strip().splitlines()[-1].split()[-1])
    assert per_body < 1e-5


def test_nasa_pipeline_synthetic(tmp_path, capsys):
    """The ci/thuering-equivalent pipeline: synthetic SBDB csv -> convert ->
    two independent engines at theta=0.6 -> L1 comparison."""
    import nasa

    nasa.main(["--synthetic", "150", "--steps", "3",
               "--workdir", str(tmp_path / "nasa")])
    out = capsys.readouterr().out
    line = [l for l in out.splitlines() if "per body" in l][-1]
    per_body = float(line.split()[-1])
    assert per_body < 1e-10


def test_benchmark_scan_config_row():
    """--scan mode (VERDICT r5 item 6): scan_config must produce a row in
    the reference CSV schema (ci/benchmark:78-99, ci/data.py:10-60) with
    a sec_per_step and a provenance string, derived from differenced
    short-dispatch scans rather than a full chained run."""
    import benchmark

    row = benchmark.scan_config("octree", 4096, 20, dim=2,
                                precision="float")
    assert row["algorithm"] == "octree"
    assert row["nbodies"] == "4096" and row["nsteps"] == "20"
    dt = float(row["sec_per_step"])
    assert 0 < dt < 60
    assert abs(float(row["total [s]"]) - dt * 20) < 0.05 * dt * 20 + 0.01
    assert row["provenance"].startswith(("scan", "single-dispatch"))
