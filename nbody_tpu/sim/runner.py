"""Simulation driver: warmup protocol, timing, CSV, saving, print modes.

Faithful to the reference's run loops (all_pairs.h:52-106, octree.h:266-347,
bvh.h:327-418) and run_simulation wrapper (main.cpp:20-40):

* default mode: `warmup_steps` untimed iterations, then `steps - warmup`
  timed iterations; the reported nsteps is steps - warmup. Note the
  reference always runs the full warmup loop even when steps < warmup (so
  `-s 5` actually runs 10 steps); we replicate that.
* --csv-detailed: every step is timed per phase and saved; all `steps`
  iterations are timed.
* --csv-total with any print/save flag aborts (all_pairs.h:58-62).
* CSV schema: algorithm,dim,precision,nsteps,nbodies,total [s][,phases...]
  with seconds formatted {:.2f}.

The TPU twist: in the default (non-detailed, non-printing) mode the timed
portion is a single jitted lax.scan -- zero host round trips per step,
unlike the reference's per-kernel device sync.
"""

from __future__ import annotations

import dataclasses
import sys
import time as _time

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.config import SimConfig
from nbody_tpu.state import SystemState, format_state
from nbody_tpu.io.saving import Saver
from nbody_tpu.sim.engines import EngineOptions, get_engine
from nbody_tpu.utils.timing import sync


@dataclasses.dataclass
class RunOptions:
    """The reference's Arguments (src/arguments.h:23-38) minus model fields."""
    steps: int = 1
    warmup_steps: int = 10
    print_state: bool = False
    print_info: bool = False
    save_pos: bool = False
    save_energy: bool = False
    csv_detailed: bool = False
    csv_total: bool = False
    engine_opts: EngineOptions = dataclasses.field(default_factory=EngineOptions)
    out: object = None  # output stream; defaults to sys.stdout

    def __post_init__(self):
        if self.out is None:
            self.out = sys.stdout


def _precision_bits(dtype) -> int:
    return np.dtype(dtype).itemsize * 8


def _make_scan(step_fn, count: int, k0: int):
    """Jitted scan of `count` steps (no per-step host sync). step_fn(state,
    k) receives the global step index (tree engines use it for re-sort
    cadence) and returns (state, aux); the scan returns (state, stacked
    aux) so per-step diagnostics (overflow counters) survive the scan."""

    @jax.jit
    def run(s):
        ks = k0 + jnp.arange(count)
        return jax.lax.scan(lambda c, k: step_fn(c, k), s, ks)

    return run


def _check_overflow(aux) -> None:
    """Fail loudly on interaction-list truncation: a nonzero overflow means
    tiles beyond the exact-fallback budget LOST force contributions."""
    if not aux or "overflow" not in aux:
        return
    total = int(np.asarray(jnp.sum(aux["overflow"])))
    if total > 0:
        print(
            f"WARNING: interaction-list overflow on {total} tile-step(s); "
            "some forces were truncated. Increase --group-tile or the list "
            "caps, or use --traversal per-body.",
            file=sys.stderr,
        )


def run_algorithm(algo_name: str, cfg: SimConfig, state: SystemState,
                  opts: RunOptions) -> SystemState:
    """The analog of one run_* entry point: owns the Saver, the step loop,
    and the CSV emission."""
    engine = get_engine(algo_name)
    out = opts.out

    if opts.csv_total:
        # csv-total excludes every other output (all_pairs.h:58-62 abort()s)
        if opts.print_state or opts.print_info or opts.save_pos or opts.save_energy:
            raise RuntimeError(
                "--csv-total cannot be combined with printing or saving"
            )

    print_header = (opts.csv_total or opts.csv_detailed) if getattr(
        engine, "header_in_detailed", True
    ) else opts.csv_total
    if print_header:
        cols = "algorithm,dim,precision,nsteps,nbodies,total [s]"
        if opts.csv_detailed:
            cols += ",force [s],accel [s]"
            cols += "".join(f",{p} [s]" for p in engine.csv_phases)
        print(cols, file=out)

    saver = Saver(opts.save_pos, opts.save_energy, cfg.n, opts.steps, cfg.dim,
                  cfg.dtype)
    saver.save_all(state, cfg)

    if opts.print_info:
        # pre-loop engine banner (octree prints "Tree init complete" after
        # allocating the tree, octree.h:287; our functional rebuild has no
        # alloc step, so it marks the same point: before the first step)
        pre = getattr(engine, "pre_info", "")
        if pre:
            print(pre, file=out, end="")

    reported_steps = opts.steps
    phase_totals: dict[str, float] = {}

    if opts.csv_detailed:
        detailed = engine.make_detailed(cfg, opts.engine_opts)
        overflow_total = 0
        t0 = _time.perf_counter()
        for _ in range(opts.steps):
            state, phases, aux = detailed(state)
            for k, v in phases.items():
                phase_totals[k] = phase_totals.get(k, 0.0) + v
            if aux and "overflow" in aux:
                overflow_total += int(np.asarray(aux["overflow"]))
            if opts.print_info:
                msg = engine.info(state, cfg, aux)
                if msg:
                    print(msg, file=out, end="")
            saver.save_all(state, cfg)
        sync(state)
        dt_total = _time.perf_counter() - t0
        _check_overflow({"overflow": jnp.asarray(overflow_total)})
    else:
        step_fn = engine.make_step(cfg, opts.engine_opts)
        per_step_host = opts.print_info  # host output forces per-step sync
        timed = max(0, opts.steps - opts.warmup_steps)

        def run_per_step(s: SystemState, count: int, k0: int) -> SystemState:
            nonlocal host_overflow
            for k in range(k0, k0 + count):
                s, aux = step_fn(s, k)
                if aux and "overflow" in aux:
                    host_overflow += int(np.asarray(aux["overflow"]))
                msg = engine.info(s, cfg, aux)
                if msg:
                    print(msg, file=out, end="")
            return s

        host_overflow = 0
        if per_step_host:
            state = run_per_step(state, opts.warmup_steps, 0)
            sync(state)
            t0 = _time.perf_counter()
            state = run_per_step(state, timed, opts.warmup_steps)
            sync(state)
            dt_total = _time.perf_counter() - t0
            _check_overflow({"overflow": jnp.asarray(host_overflow)})
        else:
            # precompile the timed block BEFORE the timer so the reported
            # seconds measure execution, not XLA compilation (the reference
            # binary is compiled ahead of time too)
            warm_run = _make_scan(step_fn, opts.warmup_steps, 0)
            timed_run = _make_scan(step_fn, timed, opts.warmup_steps) if timed else None
            if timed_run is not None:
                timed_run = timed_run.lower(state).compile()
            aux_w = aux_t = None
            if opts.warmup_steps > 0:
                state, aux_w = warm_run(state)
            sync(state)
            t0 = _time.perf_counter()
            if timed_run is not None:
                state, aux_t = timed_run(state)
            sync(state)
            dt_total = _time.perf_counter() - t0
            for aux in (aux_w, aux_t):
                if aux is not None:
                    _check_overflow(aux)
        reported_steps = opts.steps - opts.warmup_steps

    if opts.csv_detailed or opts.csv_total:
        row = (
            f"{engine.name},{cfg.dim},{_precision_bits(cfg.dtype)},"
            f"{reported_steps},{cfg.n},{dt_total:.2f}"
        )
        if opts.csv_detailed:
            row += f",{phase_totals.get('force', 0.0):.2f}"
            row += f",{phase_totals.get('accel', 0.0):.2f}"
            for p in engine.csv_phases:
                row += f",{phase_totals.get(p, 0.0):.2f}"
        print(row, file=out)

    saver.close()
    return state


def run_simulation(algo_name: str, cfg: SimConfig, state: SystemState,
                   opts: RunOptions) -> SystemState:
    """run_simulation (main.cpp:20-40): optional state dumps and wall time
    around the algorithm run."""
    out = opts.out
    if opts.print_state:
        print("Starting state:", file=out)
        print(format_state(state), file=out)
    quiet = opts.csv_total or opts.csv_detailed
    if not quiet:
        print("Starting simulation", file=out)
    t0 = _time.perf_counter()
    state = run_algorithm(algo_name, cfg, state, opts)
    dt_ms = (_time.perf_counter() - t0) * 1e3
    if opts.print_state:
        print("Final state:", file=out)
        print(format_state(state), file=out)
    if not quiet:
        print(f"Done simulation\nTotal time: {dt_ms:.2f} ms", file=out)
    return state
