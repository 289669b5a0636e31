"""Step-loop runners, warmup/timing protocol, CSV emission (ref: run_* loops)."""

from nbody_tpu.sim.engines import get_engine, ENGINES
from nbody_tpu.sim.runner import run_simulation, RunOptions

__all__ = ["get_engine", "ENGINES", "run_simulation", "RunOptions"]
