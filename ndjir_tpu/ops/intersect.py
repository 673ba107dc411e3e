"""Ray / bounding-volume intersection ops.

Branch-free jnp re-designs of the reference CUDA kernels
(reference: csrc/intersection/ray_sphere_intersection_cuda.cu:39-77 and
csrc/intersection/ray_aabb_intersection_cuda.cu:39-142).  On TPU these are a
handful of fused VPU ops inside the jitted sampler — no kernel needed, and
unlike the reference they are differentiable for free (though the sampler
treats them as data generation).

Shapes: camloc (B, 3), raydir (B, R, 3) -> t_near/t_far/n_hits (B, R, 1).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def ray_sphere_intersection(camloc: jax.Array, raydir: jax.Array,
                            radius: float = 1.0
                            ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Quadratic ray-sphere solve; t_near clamped to >= 0.

    n_hits is 0 (miss), 1 (tangent, or camera inside: t_near < 0), or 2.
    Semantics parity: csrc/intersection/ray_sphere_intersection_cuda.cu:39-77.
    """
    c = camloc[:, None, :]  # (B, 1, 3)
    cv = jnp.sum(c * raydir, axis=-1, keepdims=True)
    vv = jnp.sum(raydir * raydir, axis=-1, keepdims=True)
    cc = jnp.sum(c * c, axis=-1, keepdims=True)
    X = -cv
    Y = cv * cv - vv * (cc - radius * radius)
    Z_inv = 1.0 / vv

    Y_sqrt = jnp.sqrt(jnp.maximum(Y, 0.0))
    t_near2 = (X - Y_sqrt) * Z_inv
    t_far2 = (X + Y_sqrt) * Z_inv
    pos = (t_near2 >= 0.0).astype(camloc.dtype)

    two = Y > 0.0
    tangent = Y == 0.0
    t_near = jnp.where(two, pos * t_near2, jnp.where(tangent, X * Z_inv, 0.0))
    t_far = jnp.where(two, t_far2, jnp.where(tangent, X * Z_inv, 0.0))
    n_hits = jnp.where(two, 2.0 - (1.0 - pos),
                       jnp.where(tangent, 1.0, 0.0)).astype(camloc.dtype)
    return t_near, t_far, n_hits


def ray_aabb_intersection(camloc: jax.Array, raydir: jax.Array,
                          box_min: Sequence[float], box_max: Sequence[float]
                          ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Six-face slab candidate test with numerical-error snapping.

    For each axis-aligned face plane, the candidate point has its plane
    coordinate snapped exactly to the face before the inside-test — the same
    robustness trick as the reference
    (csrc/intersection/ray_aabb_intersection_cuda.cu:60-67).  t_near/t_far
    come from the first/last hit in face order (max.x, max.y, max.z, min.x,
    min.y, min.z), sorted; a single hit means the camera is inside the box
    (t_near = 0).
    """
    dtype = camloc.dtype
    bmin = jnp.asarray(box_min, dtype=dtype)
    bmax = jnp.asarray(box_max, dtype=dtype)
    c = camloc[:, None, :]  # (B, 1, 3)
    inv_d = 1.0 / raydir     # inf on axis-parallel rays, handled below

    t_max = (bmax - c) * inv_d  # (B, R, 3)
    t_min = (bmin - c) * inv_d
    t_list = jnp.concatenate([t_max, t_min], axis=-1)  # (B, R, 6)

    x = c[..., None, :] + t_list[..., :, None] * raydir[..., None, :]  # (B,R,6,3)
    # Snap the defining plane coordinate of each candidate to kill the
    # round-trip error of t = (plane - c) / d followed by c + t * d.
    face_axis = jnp.array([0, 1, 2, 0, 1, 2])
    face_value = jnp.stack([bmax[0], bmax[1], bmax[2], bmin[0], bmin[1], bmin[2]])
    axis_onehot = jax.nn.one_hot(face_axis, 3, dtype=dtype)  # (6, 3)
    x = x * (1.0 - axis_onehot) + face_value[:, None] * axis_onehot

    inside = ((x >= bmin) & (x <= bmax)).all(axis=-1)  # (B, R, 6)
    cond = inside & (t_list >= 0.0) & jnp.isfinite(t_list)

    n_hits = jnp.sum(cond, axis=-1, keepdims=True).astype(dtype)

    idx6 = jnp.arange(6)
    first = jnp.argmax(cond, axis=-1)                       # first hit face
    last = 5 - jnp.argmax(cond[..., ::-1], axis=-1)         # last hit face
    del idx6
    ta = jnp.take_along_axis(t_list, first[..., None], axis=-1)
    tb = jnp.take_along_axis(t_list, last[..., None], axis=-1)

    t_near2 = jnp.minimum(ta, tb)
    t_far2 = jnp.maximum(ta, tb)
    t_near = jnp.where(n_hits >= 2, t_near2, 0.0)
    t_far = jnp.where(n_hits >= 2, t_far2,
                      jnp.where(n_hits == 1, ta, 0.0))
    return t_near, t_far, n_hits
