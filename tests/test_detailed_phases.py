"""--csv-detailed must time the PRODUCTION implementation (VERDICT round-2
item 3): octree detailed mode previously built OctreeLevels and timed the
list path while default mode ran the gather-free fast path.  Pin that both
modes now run the same implementation by comparing their results exactly."""

import numpy as np
import pytest

from nbody_tpu.models import build_galaxy_model
from nbody_tpu.sim.engines import EngineOptions
import nbody_tpu.sim.tree_engines as te

OCTREE_PHASES = ("clear", "bbox", "insert", "multipoles", "force approx",
                 "force", "accel")


@pytest.mark.parametrize("dim", [2, 3])
def test_octree_detailed_times_fast_path(monkeypatch, dim):
    """With the Pallas fast path active, one detailed step and one default
    step produce IDENTICAL accelerations (same robust box, same Morton
    sort, same grouped fast eval), and the reference's per-phase keys
    (octree.h:280-282) are all present."""
    monkeypatch.setattr(te, "_use_pallas_eval", lambda *a, **k: "interpret")
    cfg, state = build_galaxy_model(384, dim, np.float32)
    eng = te.OctreeEngine()
    opts = EngineOptions()

    s_default, _ = eng.make_step(cfg, opts)(state, 0)
    s_detailed, phases, aux = eng.make_detailed(cfg, opts)(state)

    np.testing.assert_array_equal(np.asarray(s_default.a),
                                  np.asarray(s_detailed.a))
    np.testing.assert_array_equal(np.asarray(s_default.x),
                                  np.asarray(s_detailed.x))
    assert set(OCTREE_PHASES) <= set(phases)
    assert int(np.asarray(aux["tree_size"])) > 0
    assert int(np.asarray(aux["overflow"])) == 0


def test_bvh_detailed_times_fast_path(monkeypatch):
    """Same pin for BVH (already fixed in round 2, kept pinned): detailed
    mode's force-approx phase runs the windowed fast path."""
    monkeypatch.setattr(te, "_use_pallas_eval", lambda *a, **k: "interpret")
    cfg, state = build_galaxy_model(384, 2, np.float32)
    eng = te.BVHEngine()
    opts = EngineOptions()

    s_default, _ = eng.make_step(cfg, opts)(state, 0)
    s_detailed, phases, aux = eng.make_detailed(cfg, opts)(state)

    np.testing.assert_array_equal(np.asarray(s_default.a),
                                  np.asarray(s_detailed.a))
    assert set(("bbox", "sort", "multipoles", "force approx", "force",
                "accel")) <= set(phases)
