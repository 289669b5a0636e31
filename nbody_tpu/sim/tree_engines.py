"""Barnes-Hut engines (bvh, octree) wired into the runner interface.

Phase breakdown mirrors the reference's --csv-detailed columns:
  bvh:    force, accel, bbox, sort, multipoles, force approx  (bvh.h:342)
  octree: force, accel, clear, bbox, insert, multipoles, force approx
          (octree.h:280-282) -- in the rebuild-from-sort design there is no
          clear pass (reported as 0.00) and `insert` maps to the Morton
          key + sort + topology derivation that replaces CAS insertion.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from nbody_tpu.ops.permutation import unpermute_rows
import numpy as np

from nbody_tpu.config import SimConfig
from nbody_tpu.state import SystemState
from nbody_tpu.ops.integrator import leapfrog_step
from nbody_tpu.sim.engines import EngineOptions, _timed, no_aux


def _use_pallas_eval(cfg: SimConfig, opts: EngineOptions) -> bool:
    """Group-eval backend choice: the batched Pallas kernel is fp32-only
    (same constraint as the all-pairs kernel); auto picks it on TPU."""
    import numpy as np

    from nbody_tpu.ops.pallas_allpairs import pallas_available

    return np.dtype(cfg.dtype) == np.float32 and (
        opts.kernel == "pallas"
        or (opts.kernel == "auto" and pallas_available())
    )


class BVHEngine:
    """Hilbert-sorted implicit BVH (ref: src/bvh.h)."""

    name = "bvh"
    csv_phases = ("bbox", "sort", "multipoles", "force approx")
    header_in_detailed = True

    def make_step(self, cfg: SimConfig, opts: EngineOptions):
        from nbody_tpu.ops.bvh import bvh_step_force

        theta, G, eps = float(cfg.theta), float(cfg.G), cfg.eps
        sort_every = max(1, opts.sort_every)
        trav = opts.traversal
        gtile = opts.group_tile
        refine = None if opts.refine < 0 else opts.refine
        wt = opts.window_tiles
        upal = _use_pallas_eval(cfg, opts)

        if opts.mesh > 1:
            return self._make_step_sharded(cfg, opts)

        if sort_every == 1:
            @jax.jit
            def step(state: SystemState, k):
                state, _, aux = bvh_step_force(state, theta, G, eps,
                                               traversal=trav,
                                               group_tile=gtile,
                                               use_pallas=upal,
                                               refine=refine,
                                               window_tiles=wt)
                return leapfrog_step(state, cfg.dt), aux

            return step

        # re-sort cadence > 1 (TPU extension; divergence from the reference,
        # which re-sorts every step -- positions drift slowly, so the tree
        # built over a slightly stale sort order is still valid, only its
        # aabbs grow a little). The cadence is a traced cond on the step
        # index so it works inside the runner's lax.scan.
        @jax.jit
        def step(state: SystemState, k):
            state, _, aux = jax.lax.cond(
                jnp.mod(k, sort_every) == 0,
                lambda s: bvh_step_force(s, theta, G, eps, resort=True,
                                         traversal=trav, group_tile=gtile,
                                         use_pallas=upal, refine=refine,
                                         window_tiles=wt),
                lambda s: bvh_step_force(s, theta, G, eps, resort=False,
                                         traversal=trav, group_tile=gtile,
                                         use_pallas=upal, refine=refine,
                                         window_tiles=wt),
                state,
            )
            return leapfrog_step(state, cfg.dt), aux

        return step

    def _make_step_sharded(self, cfg: SimConfig, opts: EngineOptions):
        """--mesh N: replicated Hilbert sort + tree build, body-sharded
        group evaluation over the device mesh (the rebuild's own north
        star; the reference is single-device).  --mesh-layout partitioned
        switches to the weak-scaling distributed-sort layout."""
        if opts.mesh_layout == "partitioned":
            from nbody_tpu.parallel.tree_partitioned import (
                make_partitioned_bvh_step,
            )

            inner = make_partitioned_bvh_step(
                cfg, opts.mesh, tile_shards=opts.mesh_tile,
                use_pallas=_use_pallas_eval(cfg, opts))

            def step(state, k):
                st, aux = inner(state, k)
                aux = dict(aux)
                aux.setdefault("overflow", no_aux()["overflow"])
                return st, aux

            return step
        from nbody_tpu.parallel.tree_sharded import make_sharded_bvh_step

        return make_sharded_bvh_step(cfg, opts)

    def make_detailed(self, cfg: SimConfig, opts: EngineOptions):
        from nbody_tpu.ops.bvh import (
            build_tree,
            compute_force,
        )
        from nbody_tpu.ops.geometry import aabb_of_points
        from nbody_tpu.ops.hilbert import hilbert_key_u32pair, quantize
        from nbody_tpu.ops.permutation import sort_arrays_by_u32pair

        theta, G, eps = float(cfg.theta), float(cfg.G), cfg.eps

        bbox_fn = jax.jit(lambda x: aabb_of_points(x, eps))
        # same payload-carrying sort as the production step (ops/bvh.py
        # resort phase) so detailed timings stay representative
        keys_fn = jax.jit(lambda x, xmin, xmax: hilbert_key_u32pair(
            quantize(x, xmin, xmax - xmin, x.shape[1]), x.shape[1]))

        @jax.jit
        def sort_state_fn(state, hi, lo):
            m, x, v, a, ao = sort_arrays_by_u32pair(
                hi, lo, state.m, state.x, state.v, state.a, state.ao)
            return dataclasses.replace(state, m=m, x=x, v=v, a=a, ao=ao)

        build_fn = jax.jit(lambda m, x: build_tree(m, x, eps))
        if opts.traversal == "group":
            from nbody_tpu.ops.bvh_group import (
                compute_force_grouped,
                compute_force_grouped_windowed,
            )

            upal = _use_pallas_eval(cfg, opts)
            if upal:
                # the windowed fast path is a drop-in "force approx"
                # phase: build/sort/bbox stay separately timed above it
                refine = None if opts.refine < 0 else opts.refine
                force_fn = jax.jit(
                    lambda tree, m, x: compute_force_grouped_windowed(
                        tree, m, x, theta, G, eps, tile=opts.group_tile,
                        window_tiles=opts.window_tiles, refine_levels=refine,
                        interpret=(upal == "interpret"),
                    )
                )
            else:
                force_fn = jax.jit(
                    lambda tree, m, x: compute_force_grouped(
                        tree, m, x, theta, G, eps, tile=opts.group_tile,
                    )
                )
        else:
            force_fn = jax.jit(
                lambda tree, m, x: (
                    compute_force(tree, m, x, theta, G, eps),
                    {"node_overflow": jnp.zeros((), jnp.int32)},
                )
            )
        integrate = jax.jit(lambda s: leapfrog_step(s, cfg.dt))

        def detailed(state: SystemState):
            phases = {}
            (xmin, xmax), phases["bbox"] = _timed(bbox_fn, state.x)
            (hi, lo), t_keys = _timed(keys_fn, state.x, xmin, xmax)
            state, t_sort = _timed(sort_state_fn, state, hi, lo)
            phases["sort"] = t_keys + t_sort
            tree, phases["multipoles"] = _timed(build_fn, state.m, state.x)
            (a, finfo), phases["force approx"] = _timed(
                force_fn, tree, state.m, state.x
            )
            state = dataclasses.replace(state, a=a)
            phases["force"] = sum(
                phases[k] for k in ("bbox", "sort", "multipoles", "force approx")
            )
            state, phases["accel"] = _timed(integrate, state)
            aux = {
                "overflow": finfo["node_overflow"],
                "root_mass": tree.mm[0],
            }
            return state, phases, aux

        return detailed

    def info(self, state, cfg, aux=None) -> str:
        """--print-info: total mass = root monopole mass (bvh.h:377)."""
        if aux is not None and "root_mass" in aux:
            root_mass = float(np.asarray(aux["root_mass"]))
        else:
            root_mass = float(np.asarray(jnp.sum(state.m)))
        return f"Total mass: {root_mass: .5f}\n"


class OctreeEngine:
    """Prefix-derived Barnes-Hut octree (ref: src/octree.h)."""

    name = "octree"
    csv_phases = ("clear", "bbox", "insert", "multipoles", "force approx")
    header_in_detailed = True
    pre_info = "Tree init complete\n"   # octree.h:287, once before the loop

    def make_step(self, cfg: SimConfig, opts: EngineOptions):
        from nbody_tpu.ops.octree import max_depth, octree_step_force

        theta, G, eps = float(cfg.theta), float(cfg.G), cfg.eps
        depth = max_depth(cfg.n, cfg.dim)
        trav = opts.traversal
        gtile = opts.group_tile
        upal = _use_pallas_eval(cfg, opts)

        if opts.mesh > 1:
            if opts.mesh_layout == "partitioned":
                # weak-scaling layout: sharded bodies, distributed sort,
                # O(n/S + C) per shard (parallel/tree_partitioned.py)
                from nbody_tpu.parallel.tree_partitioned import (
                    make_partitioned_octree_step,
                )

                inner = make_partitioned_octree_step(
                    cfg, opts.mesh, tile_shards=opts.mesh_tile,
                    use_pallas=_use_pallas_eval(cfg, opts))

                def step(state, k):
                    st, aux = inner(state, k)
                    aux = dict(aux)
                    aux.setdefault("overflow", no_aux()["overflow"])
                    return st, aux

                return step
            from nbody_tpu.parallel.tree_sharded import make_sharded_octree_step

            return make_sharded_octree_step(cfg, opts)

        wt = opts.window_tiles

        @jax.jit
        def step(state: SystemState, k):
            state, _, aux = octree_step_force(state, theta, G, eps, depth,
                                              traversal=trav, group_tile=gtile,
                                              use_pallas=upal,
                                              window_tiles=wt)
            return leapfrog_step(state, cfg.dt), aux

        return step

    def make_detailed(self, cfg: SimConfig, opts: EngineOptions):
        from nbody_tpu.ops.geometry import scalar_bounds
        from nbody_tpu.ops.octree import (
            build_octree,
            compute_force,
            max_depth,
        )

        theta, G, eps = float(cfg.theta), float(cfg.G), cfg.eps
        depth = max_depth(cfg.n, cfg.dim)

        bounds_fn = jax.jit(scalar_bounds)
        build_fn = jax.jit(
            lambda m, x, lo, hi: build_octree(m, x, lo, hi, depth)
        )
        upal = _use_pallas_eval(cfg, opts)
        if opts.traversal == "group" and upal:
            # time the PRODUCTION fast path (same implementation default
            # mode runs, octree_step_force's use_pallas branch), phased
            # per the reference contract (octree.h:278-283): `insert` =
            # robust box + Morton keys + sort (what replaces CAS
            # insertion), multipoles fused into the traversal's dense
            # heap build, `force approx` = grouped fast eval + scatter
            return self._make_detailed_fast(cfg, opts, depth)
        if opts.traversal == "group":
            from nbody_tpu.ops.octree_group import (
                compute_force_grouped as octree_grouped,
            )

            force_fn = jax.jit(
                lambda levels, ms, xs, side: octree_grouped(
                    levels, ms, xs, side, theta, G, eps,
                    tile=opts.group_tile, use_pallas=upal,
                )
            )
        else:
            force_fn = jax.jit(
                lambda levels, ms, xs, side: (
                    compute_force(levels, ms, xs, side, theta, G, eps),
                    {"node_overflow": jnp.zeros((), jnp.int32)},
                )
            )

        @jax.jit
        def scatter_fn(a_sorted, perm):
            return unpermute_rows(a_sorted, perm)

        integrate = jax.jit(lambda s: leapfrog_step(s, cfg.dt))

        def detailed(state: SystemState):
            phases = {"clear": 0.0}
            (lo, hi), phases["bbox"] = _timed(bounds_fn, state.x)
            (levels, perm, ms, xs), phases["insert"] = _timed(
                build_fn, state.m, state.x, lo, hi
            )
            # monopoles are fused into the build (segmented reductions);
            # report them under "multipoles" as a separate timing of zero
            phases["multipoles"] = 0.0
            (a_sorted, finfo), phases["force approx"] = _timed(
                force_fn, levels, ms, xs, hi - lo
            )
            a, t_scatter = _timed(scatter_fn, a_sorted, perm)
            phases["force approx"] += t_scatter
            state = dataclasses.replace(state, a=a)
            phases["force"] = sum(
                phases[k]
                for k in ("clear", "bbox", "insert", "multipoles", "force approx")
            )
            state, phases["accel"] = _timed(integrate, state)
            aux = {
                "overflow": finfo["node_overflow"],
                "tree_size": jnp.sum(levels.count > 0).astype(jnp.int32),
                "root_mass": levels.mass[0],
            }
            return state, phases, aux

        return detailed

    def _make_detailed_fast(self, cfg: SimConfig, opts: EngineOptions,
                            depth: int):
        from nbody_tpu.ops.geometry import scalar_bounds
        from nbody_tpu.ops.octree import (
            morton_sort,
            robust_quant_box,
            tree_size_from_keys,
        )
        from nbody_tpu.ops.octree_group import compute_force_grouped_fast

        theta, G, eps = float(cfg.theta), float(cfg.G), cfg.eps
        upal = _use_pallas_eval(cfg, opts)
        dim = cfg.dim

        bounds_fn = jax.jit(scalar_bounds)

        @jax.jit
        def sort_fn(m, x, lo, hi):
            lo_r, hi_r = robust_quant_box(x, lo, hi)
            ms, xs, ks, perm = morton_sort(m, x, lo_r, hi_r, depth)
            return lo_r, hi_r, ms, xs, ks, perm

        force_fn = jax.jit(
            lambda ms, xs, ks, lo_r, hi_r: compute_force_grouped_fast(
                ms, xs, ks, lo_r, hi_r, depth, theta, G, eps,
                tile=opts.group_tile, window_tiles=opts.window_tiles,
                interpret=(upal == "interpret"),
            )
        )

        @jax.jit
        def scatter_fn(a_sorted, perm):
            return unpermute_rows(a_sorted, perm)

        tsize_fn = jax.jit(lambda ks: tree_size_from_keys(ks, depth, dim))
        integrate = jax.jit(lambda s: leapfrog_step(s, cfg.dt))

        def detailed(state: SystemState):
            phases = {"clear": 0.0, "multipoles": 0.0}
            (lo, hi), phases["bbox"] = _timed(bounds_fn, state.x)
            (lo_r, hi_r, ms, xs, ks, perm), phases["insert"] = _timed(
                sort_fn, state.m, state.x, lo, hi
            )
            (a_sorted, finfo), phases["force approx"] = _timed(
                force_fn, ms, xs, ks, lo_r, hi_r
            )
            a, t_scatter = _timed(scatter_fn, a_sorted, perm)
            phases["force approx"] += t_scatter
            state = dataclasses.replace(state, a=a)
            phases["force"] = sum(
                phases[k]
                for k in ("clear", "bbox", "insert", "multipoles", "force approx")
            )
            state, phases["accel"] = _timed(integrate, state)
            aux = {
                "overflow": finfo["node_overflow"],
                "tree_size": tsize_fn(ks),
                "root_mass": jnp.sum(state.m),
            }
            return state, phases, aux

        return detailed

    def info(self, state, cfg, aux=None) -> str:
        """--print-info: tree size and root mass (octree.h:313-316),
        computed from the step's ACTUAL tree via the aux scalars the
        jitted step returns (round 1 printed 'Tree size: 0' in default
        mode because the tree only existed inside the jit)."""
        if aux is not None and "tree_size" in aux:
            size = int(np.asarray(aux["tree_size"]))
            root_mass = float(np.asarray(aux["root_mass"]))
        else:
            size = 0
            root_mass = float(np.asarray(jnp.sum(state.m)))
        return f"Tree size: {size}\nTotal mass: {root_mass: .5f}\n"
