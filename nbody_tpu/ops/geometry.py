"""Vector geometry: distances with epsilon softening, AABBs.

Reproduces the semantics of src/vec.h:
  dist2(a, b) = sum_i (a_i - b_i)^2                    (vec.h:232-240)
  dist(a, b)  = sqrt(dist2) + eps                      (vec.h:243-246)
  dist3(a, b) = dist2^(3/2) + eps                      (vec.h:249-252)
where eps = numeric_limits<T>::epsilon(). The epsilon softening means the
self-interaction term is exactly zero (0/eps * m = 0), so pairwise kernels
need no diagonal masking in the exact-math path.

All functions broadcast over leading axes; the last axis is the spatial
dimension.
"""

from __future__ import annotations

import jax.numpy as jnp


def dist2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d = a - b
    return jnp.sum(d * d, axis=-1)


def dist(a: jnp.ndarray, b: jnp.ndarray, eps: float) -> jnp.ndarray:
    return jnp.sqrt(dist2(a, b)) + jnp.asarray(eps, a.dtype)


def dist3_from_d2(d2: jnp.ndarray, eps: float) -> jnp.ndarray:
    """dist2^(3/2) + eps, computed as d2*sqrt(d2) + eps (equal in exact
    arithmetic to the reference's pow(d2, 1.5), differs by <=1 ulp)."""
    return d2 * jnp.sqrt(d2) + jnp.asarray(eps, d2.dtype)


def aabb_of_points(x: jnp.ndarray, eps: float):
    """Bounding box of a point set including the origin, with the reference's
    10*eps point tolerance, matching bounding_box() (bvh.h:16-22) whose
    transform_reduce init value is the point-aabb of the origin
    (aabb(from_points, splat(0)), vec.h:388-392).

    Returns (xmin, xmax), each of shape (dim,).
    """
    tol = jnp.asarray(10.0 * eps, x.dtype)
    xmin = jnp.minimum(jnp.min(x, axis=0), jnp.zeros((x.shape[1],), x.dtype)) - tol
    xmax = jnp.maximum(jnp.max(x, axis=0), jnp.zeros((x.shape[1],), x.dtype)) + tol
    return xmin, xmax


def scalar_bounds(x: jnp.ndarray):
    """Scalar min/max over all coordinates of all bodies, the octree root
    bound (octree.h:93-112). The reference's transform_reduce init value is
    the tuple (0, 0) so the bounds always include zero; the result is then
    widened by +-1. Returns (min - 1, max + 1)."""
    zero = jnp.asarray(0.0, x.dtype)
    one = jnp.asarray(1.0, x.dtype)
    lo = jnp.minimum(jnp.min(x), zero) - one
    hi = jnp.maximum(jnp.max(x), zero) + one
    return lo, hi
