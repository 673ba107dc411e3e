"""Hemisphere light-direction sampling (uniform + GGX importance).

Pure-jnp re-design of the reference inverse-transform CUDA kernel
(reference: csrc/sampling/inverse_transform_cuda.cu:30-136,
python/sampler.py:317-408).  Given per-pixel CDF samples for theta
(n_thetas,) and phi (n_phis,), directions form the outer product grid
M = n_thetas * n_phis, rotated into the tangent frame of the surface normal.

These live inside the jitted render step and are treated as
non-differentiable sample generation (stop_gradient at the call site mirrors
the reference's PythonFunction with no backward).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _tangent_frame(normal: jax.Array, eps: float):
    """Build (x_axis, y_axis, z_axis) rows of the tangent->world rotation.

    z = normalize(n + eps); x = normalize([-n.y, n.x, 0]); y = z cross x.
    Parity: csrc/sampling/inverse_transform_cuda.cu:58-61.  A tiny floor on
    the norms avoids inf when n is degenerate (the reference divides by 0).
    """
    n = normal + eps
    def _normalize(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    z_axis = _normalize(n)
    # Degenerate guard (improvement over the reference, which divides by zero
    # when n is axis-aligned with +-z): fall back to the world x axis.
    xa = jnp.stack([-n[..., 1], n[..., 0], jnp.zeros_like(n[..., 0])], axis=-1)
    degenerate = jnp.linalg.norm(xa, axis=-1, keepdims=True) < 1e-9
    fallback = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0], dtype=n.dtype), xa.shape)
    x_axis = _normalize(jnp.where(degenerate, fallback, xa))
    y_axis = jnp.cross(z_axis, x_axis)
    return x_axis, y_axis, z_axis


def _orient(local_dirs: jax.Array, normal: jax.Array, eps: float) -> jax.Array:
    """Rotate local (tangent-space) directions (..., M, 3) into world space."""
    x_axis, y_axis, z_axis = _tangent_frame(normal, eps)
    return (local_dirs[..., 0:1] * x_axis[..., None, :]
            + local_dirs[..., 1:2] * y_axis[..., None, :]
            + local_dirs[..., 2:3] * z_axis[..., None, :])


def _outer_grid(cdf_the: jax.Array, cdf_phi: jax.Array):
    """Expand (..., n_the) x (..., n_phi) to the flat (..., M) light grid.

    Light m = (m_the, m_phi) with m_the = m // n_phis — theta-major order,
    matching csrc/sampling/inverse_transform_cuda.cu:42-46.
    """
    n_the = cdf_the.shape[-1]
    n_phi = cdf_phi.shape[-1]
    the = jnp.repeat(cdf_the, n_phi, axis=-1)          # (..., M)
    phi = jnp.tile(cdf_phi, (1,) * (cdf_phi.ndim - 1) + (n_the,))
    return the, phi


def sample_uniform_directions(normal: jax.Array, cdf_the: jax.Array,
                              cdf_phi: jax.Array, eps: float = 0.0) -> jax.Array:
    """Uniform-in-cos-theta hemisphere directions around ``normal``.

    normal (B, R, 3); cdf_the (B, R, n_thetas); cdf_phi (B, R, n_phis)
    -> (B, R, M, 3) with cos(theta) = cdf_the (NOT cosine-weighted: the
    integrand multiplies cos explicitly, reference renderer.py:117-118).
    """
    the, phi_u = _outer_grid(cdf_the, cdf_phi)
    phi = 2.0 * jnp.pi * phi_u
    cos_the = the
    sin_the = jnp.sqrt(jnp.maximum(1.0 - cos_the * cos_the, 0.0))
    local_dirs = jnp.stack(
        [sin_the * jnp.cos(phi), sin_the * jnp.sin(phi), cos_the], axis=-1)
    return _orient(local_dirs, normal, eps)


def sample_importance_directions(normal: jax.Array, cdf_the: jax.Array,
                                 cdf_phi: jax.Array, alpha: jax.Array,
                                 eps: float = 0.0) -> jax.Array:
    """GGX-NDF importance-sampled directions.

    cos(theta) = sqrt((1 - u) / ((a^2 - 1) u + 1)) with a = per-pixel
    roughness ``alpha`` (B, R, 1).  Parity:
    csrc/sampling/inverse_transform_cuda.cu:113-117.
    """
    the, phi_u = _outer_grid(cdf_the, cdf_phi)
    phi = 2.0 * jnp.pi * phi_u
    a2 = (alpha * alpha)  # (B, R, 1) broadcasts over M
    cos_the = jnp.sqrt(jnp.clip((1.0 - the) / ((a2 - 1.0) * the + 1.0),
                                0.0, 1.0))
    sin_the = jnp.sqrt(jnp.maximum(1.0 - cos_the * cos_the, 0.0))
    local_dirs = jnp.stack(
        [sin_the * jnp.cos(phi), sin_the * jnp.sin(phi), cos_the], axis=-1)
    return _orient(local_dirs, normal, eps)
