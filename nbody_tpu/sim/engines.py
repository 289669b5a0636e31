"""Force-engine registry.

Each engine owns one force algorithm and mirrors one of the reference's
run_* entry points (src/all_pairs.h:108-116, src/octree.h:266, src/bvh.h:327):

  make_step(cfg, opts)     -> jitted (state, k) -> (state, aux)   (force +
                              leapfrog, the unit of the fast scan loop).
                              aux is a dict of per-step scalars computed
                              inside the jitted step: always "overflow"
                              (int32 count of truncated interaction-list
                              tiles; 0 for exact engines), plus
                              "tree_size"/"root_mass" for tree engines so
                              --print-info reports the step's REAL tree
                              (octree.h:313-316) in every mode.
  make_detailed(cfg, opts) -> state -> (state, {phase: seconds}, aux) for
                              the --csv-detailed per-phase timing mode
  csv_phases               -> extra CSV columns after force/accel
  info(state, cfg, aux)    -> per-step --print-info lines (or None)

The step order is force-then-integrate exactly as the reference kernels()
lambdas: the force engine fills `a` from current positions, then leapfrog
advances x/v and rolls ao <- a.
"""

from __future__ import annotations

import dataclasses
import time as _time
from typing import Callable

import jax
import jax.numpy as jnp

from nbody_tpu.config import SimConfig
from nbody_tpu.state import SystemState
from nbody_tpu.ops.allpairs import allpairs_accel, allpairs_collapsed_accel
from nbody_tpu.ops.integrator import leapfrog_step


def no_aux() -> dict:
    """aux dict for engines that cannot truncate forces."""
    return {"overflow": jnp.zeros((), jnp.int32)}


@dataclasses.dataclass
class EngineOptions:
    """Runtime knobs that do not exist in the reference CLI."""
    kernel: str = "auto"        # auto|pallas|jnp : all-pairs force backend
    chunk: int = 2048           # row-chunk for the jnp fallback path
    fix_z: bool = False         # fix the collapsed-force z-freeze quirk
    mesh: int = 1               # number of devices to shard bodies over
    mesh_layout: str = "replicated"  # replicated|partitioned tree layout
    mesh_tile: int = 1          # partitioned 2-D mesh: tile-axis shards
    sort_every: int = 1         # re-sort cadence for tree engines
    traversal: str = "group"    # group|per-body : BVH traversal strategy
    group_tile: int = 512       # bodies per tile in group traversal
    refine: int = -1            # BVH residual refinement levels (-1 = auto)
    window_tiles: int = 32      # BVH near-field window width (body tiles)


def _timed(fn: Callable, *args):
    from nbody_tpu.utils.timing import sync

    t0 = _time.perf_counter()
    out = fn(*args)
    sync(out)  # block_until_ready does not block on the axon tunnel
    return out, _time.perf_counter() - t0


class AllPairsEngine:
    """O(N^2) direct sum (src/all_pairs.h:14-27)."""

    name = "all-pairs"
    csv_phases: tuple = ()
    header_in_detailed = False  # all-pairs prints the CSV header only in
    # --csv-total mode (all_pairs.h:58-66), unlike octree/bvh.

    def __init__(self):
        pass

    def _accel_fn(self, cfg: SimConfig, opts: EngineOptions):
        import numpy as np

        from nbody_tpu.ops.pallas_allpairs import allpairs_accel_pallas, pallas_available

        # the Pallas kernel is fp32-only (the TPU has no native f64 and
        # pl.reciprocal rejects it); double runs always take the jnp path
        is_f32 = np.dtype(cfg.dtype) == np.float32
        use_pallas = is_f32 and (
            opts.kernel == "pallas"
            or (opts.kernel == "auto" and pallas_available())
        )
        if opts.mesh > 1:
            from nbody_tpu.parallel.ring import make_ring_allpairs

            return make_ring_allpairs(cfg, opts.mesh, use_pallas=use_pallas)
        if use_pallas:
            return lambda m, x: allpairs_accel_pallas(m, x, cfg.G, cfg.eps)
        return lambda m, x: allpairs_accel(m, x, cfg.G, cfg.eps, chunk=opts.chunk)

    def make_step(self, cfg: SimConfig, opts: EngineOptions):
        accel = self._accel_fn(cfg, opts)

        @jax.jit
        def step(state: SystemState, k):
            a = accel(state.m, state.x)
            state = dataclasses.replace(state, a=a)
            return leapfrog_step(state, cfg.dt), no_aux()

        return step

    def make_detailed(self, cfg: SimConfig, opts: EngineOptions):
        accel = jax.jit(self._accel_fn(cfg, opts))
        integrate = jax.jit(lambda s: leapfrog_step(s, cfg.dt))

        def detailed(state: SystemState):
            a, t_force = _timed(accel, state.m, state.x)
            state = dataclasses.replace(state, a=a)
            state, t_accel = _timed(integrate, state)
            return state, {"force": t_force, "accel": t_accel}, no_aux()

        return detailed

    def info(self, state, cfg, aux=None):
        return None


class AllPairsCollapsedEngine(AllPairsEngine):
    """Pair-parallel direct sum (src/all_pairs.h:29-50). Same math; the
    reference's atomic accumulation touches only components [0] and [1], so
    by default the z-acceleration is frozen (see allpairs_collapsed_accel)."""

    name = "all-pairs-collapsed"

    def _accel_fn(self, cfg: SimConfig, opts: EngineOptions):
        base = super()._accel_fn(cfg, opts)

        def accel(m, x, a_old):
            a = base(m, x)
            if cfg.dim <= 2 or opts.fix_z:
                return a
            import jax.numpy as jnp

            return jnp.concatenate([a[:, :2], a_old[:, 2:]], axis=1)

        return accel

    def make_step(self, cfg: SimConfig, opts: EngineOptions):
        accel = self._accel_fn(cfg, opts)

        @jax.jit
        def step(state: SystemState, k):
            a = accel(state.m, state.x, state.a)
            state = dataclasses.replace(state, a=a)
            return leapfrog_step(state, cfg.dt), no_aux()

        return step

    def make_detailed(self, cfg: SimConfig, opts: EngineOptions):
        accel = jax.jit(self._accel_fn(cfg, opts))
        integrate = jax.jit(lambda s: leapfrog_step(s, cfg.dt))

        def detailed(state: SystemState):
            a, t_force = _timed(accel, state.m, state.x, state.a)
            state = dataclasses.replace(state, a=a)
            state, t_accel = _timed(integrate, state)
            return state, {"force": t_force, "accel": t_accel}, no_aux()

        return detailed


def get_engine(name: str):
    try:
        return ENGINES[name]()
    except KeyError:
        raise ValueError(
            f'Unknown algorithm: "{name}". '
            "Options are: all-pairs, all-pairs-collapsed, bvh, octree (default)."
        )


def _bvh_engine():
    from nbody_tpu.sim.tree_engines import BVHEngine

    return BVHEngine()


def _octree_engine():
    from nbody_tpu.sim.tree_engines import OctreeEngine

    return OctreeEngine()


ENGINES = {
    "all-pairs": AllPairsEngine,
    "all-pairs-collapsed": AllPairsCollapsedEngine,
    "bvh": _bvh_engine,
    "octree": _octree_engine,
}
