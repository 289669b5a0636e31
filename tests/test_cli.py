"""CLI surface and run-loop protocol (ref: src/arguments.h, run loops)."""

import io
import os

import numpy as np
import pytest

from nbody_tpu.cli import main, parse_args


def test_defaults_match_reference():
    a = parse_args([])
    assert a["size"] == 1000
    assert a["steps"] == 1
    assert a["warmup_steps"] == 10
    assert a["precision"] == "float"
    assert a["workload"] == "uniform"
    assert a["algorithm"] == "octree"
    assert a["theta"] == 0.5


def test_unknown_flag_exits():
    with pytest.raises(SystemExit):
        parse_args(["--frobnicate"])
    with pytest.raises(SystemExit):
        parse_args(["--precision", "half"])
    with pytest.raises(SystemExit):
        parse_args(["--algorithm", "fmm"])
    with pytest.raises(SystemExit):
        parse_args(["--workload", "sphere"])
    with pytest.raises(SystemExit):
        parse_args(["--save", "everything"])


def test_csv_modes_mutually_exclusive():
    with pytest.raises(SystemExit):
        parse_args(["--csv-detailed", "--csv-total"])


def test_csv_total_run():
    out = io.StringIO()
    main(
        ["-n", "32", "-s", "12", "--algorithm", "all-pairs", "--kernel", "jnp",
         "--csv-total"],
        out=out,
    )
    lines = out.getvalue().strip().splitlines()
    assert lines[0] == "algorithm,dim,precision,nsteps,nbodies,total [s]"
    fields = lines[1].split(",")
    assert fields[0] == "all-pairs"
    assert fields[1] == "2"
    assert fields[2] == "32"
    assert fields[3] == "2"  # 12 steps - 10 warmup
    assert fields[4] == "32"
    float(fields[5])


def test_csv_detailed_run():
    out = io.StringIO()
    main(
        ["-n", "16", "-s", "3", "--algorithm", "all-pairs-collapsed",
         "--kernel", "jnp", "--csv-detailed"],
        out=out,
    )
    lines = out.getvalue().strip().splitlines()
    # all-pairs prints no header in detailed mode (all_pairs.h:58-66)
    fields = lines[-1].split(",")
    assert fields[0] == "all-pairs-collapsed"
    assert fields[3] == "3"  # detailed mode times all steps
    assert len(fields) == 8  # + force, accel


def test_print_state_format():
    out = io.StringIO()
    main(["-n", "4", "-s", "1", "--algorithm", "all-pairs", "--kernel", "jnp",
          "--print-state"], out=out)
    text = out.getvalue()
    assert "Starting state:" in text
    assert "Final state:" in text
    # System::print line shape (system.h:90-97)
    line = [l for l in text.splitlines() if l.startswith("00:")][0]
    assert line.startswith("00: m=")
    assert "p=(" in line and "v=(" in line and "f=(" in line


def test_csv_total_excludes_output():
    with pytest.raises(RuntimeError):
        main(["-n", "8", "-s", "1", "--algorithm", "all-pairs",
              "--csv-total", "--print-state"], out=io.StringIO())


def test_save_and_reload(tmp_path):
    os.chdir(tmp_path)
    out = io.StringIO()
    main(["-n", "16", "-s", "2", "--algorithm", "all-pairs", "--kernel", "jnp",
          "--save-state", str(tmp_path / "ckpt.bin")], out=out)
    out = io.StringIO()
    main(["-s", "1", "--algorithm", "all-pairs", "--kernel", "jnp",
          "--workload", "load", str(tmp_path / "ckpt.bin"), "--print-state"],
         out=out)
    assert "Final state:" in out.getvalue()


def test_save_pos_writes_initial_frame(tmp_path):
    os.chdir(tmp_path)
    out = io.StringIO()
    main(["-n", "8", "-s", "2", "--algorithm", "all-pairs", "--kernel", "jnp",
          "--save", "pos"], out=out)
    import struct

    raw = (tmp_path / "positions.bin").read_bytes()
    nb, ns, sz, dm = struct.unpack("<IIII", raw[:16])
    assert (nb, sz, dm) == (8, 4, 2)
    # non-detailed mode writes only the initial frame (all_pairs.h:55,81)
    assert len(raw) == 16 + 8 * 2 * 4


def test_octree_cli_run():
    out = io.StringIO()
    main(["-n", "64", "-s", "12", "--algorithm", "octree", "--csv-total"], out=out)
    lines = out.getvalue().strip().splitlines()
    assert lines[0] == "algorithm,dim,precision,nsteps,nbodies,total [s]"
    assert lines[1].startswith("octree,2,32,2,64,")


def test_bvh_cli_detailed():
    out = io.StringIO()
    main(["-n", "32", "-s", "2", "--algorithm", "bvh", "--csv-detailed"], out=out)
    lines = out.getvalue().strip().splitlines()
    # bvh prints the header in detailed mode too (bvh.h:340-344)
    assert lines[0] == (
        "algorithm,dim,precision,nsteps,nbodies,total [s]"
        ",force [s],accel [s],bbox [s],sort [s],multipoles [s],force approx [s]"
    )
    assert lines[1].startswith("bvh,2,32,2,32,")
    assert len(lines[1].split(",")) == 12


def test_octree_print_info():
    out = io.StringIO()
    main(["-n", "16", "-s", "1", "--algorithm", "octree", "--csv-detailed",
          "--print-info"], out=out)
    text = out.getvalue()
    assert "Tree init complete\n" in text   # octree.h:287, pre-loop banner
    assert "Tree size: " in text
    assert "Total mass: " in text


def test_bvh_3d_double():
    out = io.StringIO()
    main(["-n", "24", "-s", "1", "-d", "3", "--precision", "double",
          "--algorithm", "bvh", "--workload", "galaxy", "--csv-detailed"], out=out)
    line = out.getvalue().strip().splitlines()[-1]
    assert line.startswith("bvh,3,64,1,24,")
