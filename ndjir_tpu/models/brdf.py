"""Specular microfacet BRDFs (Filament and UE4 variants).

Math parity with reference python/specular_brdf.py:40-191; white
(monochromatic) light assumption.  In the importance-sampled branch the GGX
NDF D cancels against the GGX sampling pdf, leaving V * F * (4 voh / noh)
(Filament) or G * F * voh / (noh * nov) (UE4); the uniform branch keeps D
and multiplies by pi (the uniform-hemisphere pdf's inverse).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def masked_dot(u: jax.Array, v: jax.Array, eps: float = 1e-8,
               with_mask: bool = False):
    """Clamped dot product with optional positivity mask
    (reference: specular_brdf.py:23-37)."""
    uv = jnp.sum(u * v, axis=-1, keepdims=True)
    mask = jax.lax.stop_gradient((uv > eps).astype(uv.dtype))
    uv = jnp.maximum(uv, eps)
    if with_mask:
        return uv, mask
    return uv


def _broadcast_inputs(normal, view_dir, roughness, specular_color, M, channels):
    """(B, R, C) -> (B, R, M, C) broadcasts shared by both models."""
    def bc(x, C):
        return jnp.broadcast_to(x.reshape(*x.shape[:-1], 1, C)
                                if x.ndim == 3 else x,
                                (*x.shape[:2], M, C))
    return (bc(normal, 3), bc(view_dir.reshape(view_dir.shape[0],
                                               view_dir.shape[1], 3), 3),
            bc(roughness, 1), bc(specular_color, channels))


def filament_specular_brdf(normal, view_dir, light_dir, roughness,
                           specular_color, conf) -> Tuple[jax.Array, jax.Array]:
    """GGX D + Smith height-correlated V + Schlick F
    (reference: specular_brdf.py:40-118)."""
    M = light_dir.shape[2]
    channels = conf.specular_reflectance_network.channels
    normal, view_dir, roughness, specular_color = _broadcast_inputs(
        normal, view_dir, roughness, specular_color, M, channels)

    half_dir = light_dir + view_dir
    half_dir = half_dir / jnp.linalg.norm(half_dir, axis=-1, keepdims=True)

    a2 = roughness ** 2
    eps_dot = conf.renderer.eps_dot
    eps = 1e-6

    nol, mask_nol = masked_dot(normal, light_dir, eps_dot, True)
    nov, mask_nov = masked_dot(normal, view_dir, eps_dot, True)
    noh, mask_noh = masked_dot(normal, half_dir, eps_dot, True)

    def specular_D():
        return a2 / (np.pi * (noh ** 2 * (a2 - 1.0) + 1.0) ** 2 + eps)

    def specular_V1(nou):
        return 1.0 / (nou + jnp.sqrt(a2 + (1.0 - a2) * nou ** 2) + eps)

    def specular_F():
        voh = masked_dot(view_dir, half_dir, eps_dot)
        return specular_color + (1.0 - specular_color) * (1.0 - voh) ** 5

    if conf.specular_brdf.sampling == "importance":
        V = specular_V1(nol) * specular_V1(nov)
        Fs = specular_F()
        voh = masked_dot(view_dir, half_dir, eps_dot)
        noh_u = masked_dot(normal, half_dir, eps_dot)
        sBRDF = V * Fs * (4.0 * voh / noh_u)
    else:  # uniform
        sBRDF = np.pi * specular_D() * specular_V1(nol) * specular_V1(nov) \
            * specular_F()
    sBRDF = sBRDF * (mask_nol * mask_nov * mask_noh)
    return sBRDF, nol


def ue4_specular_brdf(normal, view_dir, light_dir, roughness, specular_color,
                      conf) -> Tuple[jax.Array, jax.Array]:
    """UE4 k-remapped Smith G + spherical-gaussian Schlick F
    (reference: specular_brdf.py:121-191)."""
    M = light_dir.shape[2]
    channels = conf.specular_reflectance_network.channels
    normal, view_dir, roughness, specular_color = _broadcast_inputs(
        normal, view_dir, roughness, specular_color, M, channels)

    half_dir = light_dir + view_dir
    half_dir = half_dir / jnp.linalg.norm(half_dir, axis=-1, keepdims=True)

    a = roughness ** 2
    a2 = a ** 2
    eps_dot = conf.renderer.eps_dot
    eps = 1e-6

    nol, mask_nol = masked_dot(normal, light_dir, eps_dot, True)
    nov, mask_nov = masked_dot(normal, view_dir, eps_dot, True)
    noh, mask_noh = masked_dot(normal, half_dir, eps_dot, True)

    def specular_D():
        noh_u = masked_dot(normal, half_dir, eps_dot)
        return a2 / (np.pi * (noh_u ** 2 * (a2 - 1.0) + 1.0) ** 2 + eps)

    k = (roughness + 1.0) ** 2 / 8.0

    def specular_G1(nou):
        return nou / (nou * (1.0 - k) + k + eps)

    def specular_F():
        voh = masked_dot(view_dir, half_dir, eps_dot)
        power = (-5.55473 * voh - 6.98316) * voh
        return specular_color + (1.0 - specular_color) * 2.0 ** power

    if conf.specular_brdf.sampling == "importance":
        G = specular_G1(nol) * specular_G1(nov)
        Fs = specular_F()
        voh = masked_dot(view_dir, half_dir, eps_dot)
        noh_u = masked_dot(normal, half_dir, eps_dot)
        sBRDF = G * Fs * (voh / (noh_u * nov))
    else:
        sBRDF = np.pi * specular_D() * specular_G1(nol) * specular_G1(nov) \
            * specular_F() / (4.0 * nov * nol)
    sBRDF = sBRDF * (mask_nol * mask_nov * mask_noh)
    return sBRDF, nol


def specular_brdf_model(normal, view_dir, light_dir, roughness,
                        specular_color, conf):
    models = dict(filament=filament_specular_brdf, ue4=ue4_specular_brdf)
    return models[conf.specular_brdf.model](
        normal, view_dir, light_dir, roughness, specular_color, conf)
