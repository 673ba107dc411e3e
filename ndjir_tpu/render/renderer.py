"""Physically-based volumetric renderer (the heart of the framework).

Re-design of ``pb_render`` (reference: python/renderer.py:32-209) as a pure
function of (params, sampled points, rays, schedules, Monte-Carlo CDFs) — the
whole render, including the ∇_x SDF normal (via jax.vjp instead of nnabla's
registered-backward nn.grad machinery), lives inside one jitted program so
XLA fuses the shading chain and overlaps the gather-heavy grid queries with
the MXU-bound MLP stack.

Pipeline: SDF+feature+normal at fg samples -> NeuS section alpha with
annealed iter_cos -> NeRF++ background alpha -> joint transmittance ->
volume-rendered pixel quantities -> hemisphere-MC diffuse light (env x soft
visibility x cos + implicit illumination) -> GGX importance-sampled specular
-> photogrammetric-light composition (entangled or not) -> + background.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ndjir_tpu.models.brdf import masked_dot, specular_brdf_model
from ndjir_tpu.models.fields import (
    background_apply,
    base_color_apply,
    environment_light_apply,
    geometric_apply,
    geometric_apply_corners,
    geometric_gather_corners,
    geometric_supports_shared_gather,
    implicit_illumination_apply,
    photogrammetric_apply,
    roughness_apply,
    soft_visibility_apply,
    specular_reflectance_apply,
)
from ndjir_tpu.ops.directions import (
    sample_importance_directions,
    sample_uniform_directions,
)
from ndjir_tpu.render.sampler import _exclusive_cumprod


def sdf_value_and_spatial_grad(params, x, conf, with_tv=False, tv_sym=True):
    """One forward for (sdf, feature, gain[, tv]) plus the spatial gradient
    d sdf / d x via vjp — the reference's nn.grad double-backward path
    (reference: renderer.py:51-52) collapses to this."""
    if with_tv:
        (sdf, feature, gain, tv), vjp_fn = jax.vjp(
            lambda x_: geometric_apply(params["geometric-network"], x_, conf,
                                       with_tv=True, tv_sym=tv_sym), x)
        grad_x = vjp_fn((jnp.ones_like(sdf), jnp.zeros_like(feature),
                         jnp.zeros_like(gain), jnp.zeros_like(tv)))[0]
        return sdf, feature, gain, grad_x, tv
    (sdf, feature, gain), vjp_fn = jax.vjp(
        lambda x_: geometric_apply(params["geometric-network"], x_, conf), x)
    grad_x = vjp_fn((jnp.ones_like(sdf), jnp.zeros_like(feature),
                     jnp.zeros_like(gain)))[0]
    return sdf, feature, gain, grad_x, None


def make_mc_cdfs(conf, B, R, step: Optional[jax.Array] = None,
                 dtype=jnp.float32) -> Dict[str, jax.Array]:
    """Monte-Carlo CDF inputs for light-direction sampling.

    With ``renderer.fixed_graph_seeds`` (the reference's behaviour —
    fixed-seed F.rand nodes baked into the graph, config/default.yaml:117-124)
    the same uniforms are used every iteration; otherwise they are folded
    with the step index for fresh samples.
    """
    r = conf.renderer
    n_the, n_phi = r.n_thetas, 2 * r.n_thetas

    def u(seed, shape):
        k = jax.random.PRNGKey(seed)
        if not r.fixed_graph_seeds and step is not None:
            k = jax.random.fold_in(k, step)
        return jax.random.uniform(k, shape, dtype)

    return dict(
        diffuse_the=u(r.diffuse_cdf_the_seed, (B, R, n_the)),
        diffuse_phi=u(r.diffuse_cdf_phi_seed, (B, R, n_phi)),
        specular_the=u(r.specular_cdf_the_seed, (B, R, n_the)),
        specular_phi=u(r.specular_cdf_phi_seed, (B, R, n_phi)),
        stratified=u(r.stratified_sample_seed,
                     (B, R, r.n_samples0, 1)),
        background=1e-5 + (1 - 1e-5) * u(r.background_sample_seed,
                                         (B, R, r.n_bg_samples + 1, 1)),
        upsample=[u(r.stratified_sample_seed + 1000 + i,
                    (B, R, r.n_samples1))
                  for i in range(r.n_upsamples)],
        perturb=jax.random.normal(
            jax.random.PRNGKey(conf.train.base_color_perturb_seed)
            if r.fixed_graph_seeds or step is None
            else jax.random.fold_in(
                jax.random.PRNGKey(conf.train.base_color_perturb_seed), step),
            (B, R, r.n_samples0 + r.n_samples1 * r.n_upsamples, 3), dtype),
    )


def pb_render(params, x_fg, t_fg, x_bg, t_bg, camloc, raydir, mask,
              cos_anneal_ratio, lv_gain, cdfs, conf) -> Dict[str, jax.Array]:
    """Render a batch of rays to pixel radiance + auxiliary loss terms.

    Args mirror reference renderer.py:32-43; ``cos_anneal_ratio`` and
    ``lv_gain`` are traced scalars (the reference pushes them into graph
    parameters per epoch, solver.py:100-119), ``cdfs`` from make_mc_cdfs.

    ``train.remat_heads`` rematerializes the material/light head networks in
    the backward pass instead of storing their (B, R, N|M, width) hidden
    activations — ~GBs at the G=512 reference workload — trading ~1 forward
    recompute of those heads for the HBM (jax.checkpoint).
    """
    B, R, N, _ = x_fg.shape
    if conf.train.get("remat_heads", False):
        rm = jax.checkpoint
        base_color_f = rm(base_color_apply, static_argnums=(4,))
        soft_vis_f = rm(soft_visibility_apply, static_argnums=(5,))
        env_f = rm(environment_light_apply, static_argnums=(2,))
        photo_f = rm(photogrammetric_apply, static_argnums=(7,))
        implicit_f = rm(implicit_illumination_apply, static_argnums=(4,))
        rough_f = rm(roughness_apply, static_argnums=(4,))
        spec_f = rm(specular_reflectance_apply, static_argnums=(4,))
        bg_f = rm(background_apply, static_argnums=(4,))
    else:
        base_color_f = base_color_apply
        soft_vis_f = soft_visibility_apply
        env_f = environment_light_apply
        photo_f = photogrammetric_apply
        implicit_f = implicit_illumination_apply
        rough_f = roughness_apply
        spec_f = specular_reflectance_apply
        bg_f = background_apply
    raydir_r = raydir.reshape(B, R, 1, 3)
    view_dir = -raydir_r
    eps_normal = conf.renderer.eps_normal

    # geometry + spatial gradient (normal field); the grid TV map rides the
    # same corner gather when the loss needs it
    want_tv = (conf.geometric_network.voxel.type != "none"
               and conf.train.tv_weight > 0.0)
    # Perturbed-prior gather fusion: the base-color smoothness pair
    # re-queries the geometric network at x + noise (reference:
    # renderer.py:187-193).  The main and perturbed queries share ONE
    # ``gather_rows`` call, so the training backward issues ONE fused grid
    # scatter for both (2x ~20 ms separate scatters -> ~29 ms fused at the
    # default workload), while the spatial-gradient vjp machinery — the
    # expensive part of a naive 2N-point fusion — still runs only over the
    # N real samples.  Numerically identical to two separate queries.
    fuse_ptb = bool(conf.renderer.get("fuse_perturbed_query", True)) \
        and geometric_supports_shared_gather(params["geometric-network"],
                                             conf)
    Gsz = conf.geometric_network.voxel.grid_size
    r_sphere = conf.renderer.bounding_sphere_radius
    x_ptb = x_fg + cdfs["perturb"] * (np.sqrt(3) * 2 * r_sphere / Gsz)
    if fuse_ptb:
        geo = params["geometric-network"]
        corners_fg, corners_ptb = geometric_gather_corners(
            geo, [x_fg, x_ptb], conf)
        tv_sym = conf.train.tv_sym_backward

        def fgeo(xm):
            return geometric_apply_corners(geo, xm, corners_fg, conf,
                                           with_tv=want_tv, tv_sym=tv_sym)

        if want_tv:
            (sdf_x_fg, feature_x_fg, gain, tv_map), vjp_fn = jax.vjp(
                fgeo, x_fg)
            grad_x_fg = vjp_fn(
                (jnp.ones_like(sdf_x_fg), jnp.zeros_like(feature_x_fg),
                 jnp.zeros_like(gain), jnp.zeros_like(tv_map)))[0]
        else:
            (sdf_x_fg, feature_x_fg, gain), vjp_fn = jax.vjp(fgeo, x_fg)
            grad_x_fg = vjp_fn(
                (jnp.ones_like(sdf_x_fg), jnp.zeros_like(feature_x_fg),
                 jnp.zeros_like(gain)))[0]
            tv_map = None
        _, feature_ptb, _ = geometric_apply_corners(
            geo, x_ptb, corners_ptb, conf)
    else:
        sdf_x_fg, feature_x_fg, gain, grad_x_fg, tv_map = \
            sdf_value_and_spatial_grad(params, x_fg, conf, with_tv=want_tv,
                                       tv_sym=conf.train.tv_sym_backward)
        _, feature_ptb, _ = geometric_apply(
            params["geometric-network"], x_ptb, conf)

    # Diagnostic knob (scripts/roofline_data.py `detach_normals` ablation):
    # stop-grad the spatial SDF gradient so the backward pass drops the
    # entire second-order chain (d grad_x / d params through the gather +
    # MLP).  NOT a training mode — eikonal and normal-dependent shading
    # gradients vanish; it exists to measure what double-backward costs.
    if conf.train.get("debug_detach_normals", False):
        grad_x_fg = jax.lax.stop_gradient(grad_x_fg)

    # NeuS section-based alpha with annealed iter_cos (renderer.py:55-67)
    car = jnp.asarray(cos_anneal_ratio, x_fg.dtype)
    true_cos = jnp.sum(raydir_r * grad_x_fg, axis=-1, keepdims=True)
    iter_cos = -(jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - car)
                 + jax.nn.relu(-true_cos) * car)  # always non-positive
    delta_t_fg = t_fg[:, :, 1:, :] - t_fg[:, :, :-1, :]
    sdf1 = sdf_x_fg + iter_cos * delta_t_fg * 0.5
    sdf0 = sdf_x_fg - iter_cos * delta_t_fg * 0.5
    g = gain.reshape((1,) * sdf_x_fg.ndim)
    cdf0 = jax.nn.sigmoid(g * sdf0)
    cdf1 = jax.nn.sigmoid(g * sdf1)
    alpha_fg = jnp.clip((cdf0 - cdf1 + 1e-5) / (cdf0 + 1e-5), 0.0, 1.0)

    # background alpha/color (NeRF++ or constant; renderer.py:70-77)
    if conf.background_modeling:
        delta_bg = jax.lax.stop_gradient(
            t_bg[:, :, 1:, :] - t_bg[:, :, :-1, :])
        alpha_bg, color_bg = bg_f(
            params["background-network"], x_bg, view_dir, delta_bg, conf)
    else:
        alpha_bg = jnp.ones((B, R, 1, 1), x_fg.dtype)
        color_bg = jnp.full((B, R, 1, 3), conf.background_color, x_fg.dtype)

    # joint fg+bg transmittance (renderer.py:79-84)
    alpha = jnp.concatenate([alpha_fg * mask, alpha_bg], axis=2)
    trans = _exclusive_cumprod(1.0 - alpha, axis=2)
    weights = alpha * trans
    trans_fg = trans[:, :, :N, :]
    weights_fg = weights[:, :, :N, :]
    weights_bg = weights[:, :, N:, :]

    def VR(v, w=weights_fg):
        return jnp.sum(w * v, axis=2)

    # pixel normal (renderer.py:90-91)
    grad_pixel = VR(grad_x_fg) + eps_normal
    normal_pixel = grad_pixel / jnp.linalg.norm(grad_pixel, axis=-1,
                                                keepdims=True)

    n_the = conf.renderer.n_thetas
    n_phi = 2 * n_the
    M = n_the * n_phi
    D = feature_x_fg.shape[-1]
    # per-pixel conditioning stays at (B, R, 1, .): the soft-visibility net's
    # split first affine projects these once per pixel and broadcast-adds
    # over the M light dirs (no (B, R, M, 256+) materialization)
    x_pixel = VR(x_fg).reshape(B, R, 1, 3)
    feature_pixel = VR(feature_x_fg).reshape(B, R, 1, D)
    normal_pixel_M = normal_pixel[:, :, None, :]

    sg = jax.lax.stop_gradient

    # diffuse: uniform hemisphere MC of env * soft-vis * cos (renderer.py:94-119)
    uniform_dirs = sg(sample_uniform_directions(
        normal_pixel, cdfs["diffuse_the"], cdfs["diffuse_phi"]))
    env_int = env_f(
        params["environment-light-network"], uniform_dirs, conf)
    soft_vis = soft_vis_f(
        params["soft-visibility-light-network"], x_pixel, uniform_dirs,
        feature_pixel, normal_pixel_M, conf)
    implicit_int = implicit_f(
        params.get("implicit-illumination-network"), x_fg, feature_x_fg,
        grad_x_fg, conf)
    implicit_pixel = VR(implicit_int)

    cos = masked_dot(normal_pixel_M, uniform_dirs)
    diffuse_env = jnp.mean(soft_vis * env_int * cos, axis=2)
    diffuse_light_pixel = diffuse_env + implicit_pixel
    base_color = base_color_f(
        params["base-color-network"], x_fg, feature_x_fg, grad_x_fg, conf)

    # materials (renderer.py:122-128)
    roughness, std_roughness = rough_f(
        params["roughness-network"], x_fg, feature_x_fg, grad_x_fg, conf)
    roughness_pixel = VR(roughness)
    specular_reflectance, std_specular = spec_f(
        params.get("specular-reflectance-network"), x_fg, feature_x_fg,
        grad_x_fg, conf)
    specular_pixel = VR(specular_reflectance)

    # specular MC (renderer.py:131-157)
    if conf.specular_brdf.sampling == "importance":
        spec_dirs = sg(sample_importance_directions(
            normal_pixel, cdfs["specular_the"], cdfs["specular_phi"],
            roughness_pixel))
    else:
        spec_dirs = sg(sample_uniform_directions(
            normal_pixel, cdfs["specular_the"], cdfs["specular_phi"]))
    sBRDF, cos_s = specular_brdf_model(
        normal_pixel, view_dir, spec_dirs, roughness_pixel, specular_pixel,
        conf)
    env_int_s = env_f(
        params["environment-light-network"], spec_dirs, conf)
    soft_vis_s = soft_vis_f(
        params["soft-visibility-light-network"], x_pixel, spec_dirs,
        feature_pixel, normal_pixel_M, conf)

    if conf.specular_brdf.use_split_sum:
        specular_color_pixel = jnp.mean(soft_vis_s * env_int_s, axis=2) \
            * jnp.mean(sBRDF * cos_s, axis=2)
    else:
        specular_color_pixel = jnp.mean(
            sBRDF * soft_vis_s * env_int_s * cos_s, axis=2)

    ii = conf.implicit_illumination_network
    if ii.use_me and ii.use_me_on_specular:
        specular_color_pixel = specular_color_pixel + jnp.mean(
            sBRDF * implicit_pixel[:, :, :, None], axis=2)

    specular_color_pixel = conf.specular_brdf.weight * specular_color_pixel

    # composition with photogrammetric light (renderer.py:159-176)
    if conf.photogrammetric_light_network.use_me:
        photo_int = photo_f(
            params["photogrammetric-light-network"], x_fg, camloc, view_dir,
            feature_x_fg, grad_x_fg, lv_gain, conf)
        photo_pixel = VR(photo_int)
        if conf.diffuse_brdf.entangle:
            diffuse_color_pixel = VR(base_color * photo_int)
            color_fg = diffuse_color_pixel * diffuse_light_pixel \
                + photo_pixel * specular_color_pixel
        else:
            diffuse_color_pixel = VR(base_color) * diffuse_light_pixel
            color_fg = photo_pixel * (diffuse_color_pixel
                                      + specular_color_pixel)
    else:
        color_fg = VR(base_color) + specular_color_pixel

    color_bg_pixel = VR(color_bg, weights_bg)
    color_pixel = color_fg + color_bg_pixel

    # predicted object mask (renderer.py:183-185)
    if conf.train.mask_weight > 0.0:
        obj_mask_pred = jnp.sum(alpha_fg * trans_fg, axis=2)
    else:
        obj_mask_pred = jnp.zeros((B, R, 1), x_fg.dtype)

    # base-color smoothness pair from the (fused) perturbed re-query
    # (renderer.py:187-193)
    base_color_ptb = base_color_f(
        params["base-color-network"], x_ptb, feature_ptb, None, conf)

    return dict(
        color_pixel=color_pixel,
        sdf_x_fg=sdf_x_fg,
        grad_x_fg=grad_x_fg,
        alpha_fg=alpha_fg,
        trans_fg=trans_fg,
        obj_mask_pred=obj_mask_pred,
        base_color=base_color,
        base_color_ptb=base_color_ptb,
        roughness=roughness,
        specular_reflectance=specular_reflectance,
        std_roughness=std_roughness,
        std_specular_reflectance=std_specular,
        normal_pixel=normal_pixel,
        gain=gain,
        tv_map=tv_map,
    )
