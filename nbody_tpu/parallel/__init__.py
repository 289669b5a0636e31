"""Multi-chip sharding over jax.sharding meshes.

The reference is single-process/single-device (SURVEY.md section 2); its
"where does code run" abstraction is the execution-policy constant. The
TPU-native equivalent is a device Mesh with sharded body arrays and XLA
collectives over ICI: ppermute rings for streaming j-body blocks through
the all-pairs interaction (the i-stationary / j-rotating structure of ring
attention), psum for reductions, all_gather for small tree broadcasts.
"""

from nbody_tpu.parallel.mesh import body_mesh
from nbody_tpu.parallel.ring import make_ring_allpairs, ring_allpairs_accel

__all__ = ["body_mesh", "make_ring_allpairs", "ring_allpairs_accel"]
