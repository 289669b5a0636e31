"""tpu-nbody: a TPU-native N-body simulation framework.

Built from scratch in JAX/XLA/Pallas with the same capabilities as
UoB-HPC/stdpar-nbody (reference at /root/reference): four force algorithms
(all-pairs, all-pairs-collapsed, octree, bvh), leapfrog integration,
2-D/3-D x float/double, uniform/plummer/galaxy/file workloads,
byte-compatible positions.bin/energy.bin output, and multi-chip scaling
via jax.sharding meshes.

Layer map (TPU-first, see SURVEY.md section 7):
  config/state  - static sim config + SoA body-state pytree (ref: src/system.h)
  rng           - bit-exact std::mt19937 + libstdc++ uniform_real_distribution
                  replication for workload-generation parity (ref: src/system.h:22-25)
  ops/          - force engines and kernels (ref: src/{all_pairs,octree,bvh}.h)
  models/       - workload generators (ref: src/models.h)
  io/           - binary trajectory/energy/state formats (ref: src/saving.h)
  sim/          - step-loop runners, warmup protocol, CSV (ref: run_* loops)
  parallel/     - device-mesh sharding: ring all-pairs, sharded trees
"""

__version__ = "0.1.0"

from nbody_tpu.config import SimConfig, precision_dtype
from nbody_tpu.state import SystemState

__all__ = ["SimConfig", "SystemState", "precision_dtype", "__version__"]
