"""Force engines and compute kernels (the TPU analog of src/{all_pairs,octree,bvh}.h)."""

from nbody_tpu.ops.geometry import dist, dist2, dist3_from_d2
from nbody_tpu.ops.allpairs import (
    allpairs_accel,
    allpairs_accel_dense,
    allpairs_collapsed_accel,
)
from nbody_tpu.ops.integrator import leapfrog_step
from nbody_tpu.ops.energy import calc_energies

__all__ = [
    "dist",
    "dist2",
    "dist3_from_d2",
    "allpairs_accel",
    "allpairs_accel_dense",
    "allpairs_collapsed_accel",
    "leapfrog_step",
    "calc_energies",
]
