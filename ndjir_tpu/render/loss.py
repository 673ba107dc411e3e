"""Total training loss (reference: python/loss.py:27-192).

One pure function: sample points -> pb_render -> nine weighted terms
(RGB, eikonal, TV, mask BCE, base-color smoothness prior, roughness /
specular aleatoric priors + their log-std regularizers).  Runs fully inside
the jitted/shard_mapped train step; per-term values are returned for
monitoring.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ndjir_tpu.render.renderer import make_mc_cdfs, pb_render
from ndjir_tpu.render.sampler import sample_points


def total_loss(params, camloc, raydir, color_gt, obj_mask, cos_anneal_ratio,
               lv_gain, conf, step: Optional[jax.Array] = None,
               cdfs: Optional[Dict[str, jax.Array]] = None,
               proposal_grid: Optional[jax.Array] = None
               ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Returns (scalar loss, dict of per-term monitors).

    camloc (B, 3); raydir (B, R, 3); color_gt (B, R, 3); obj_mask (B, R, 1).
    ``cdfs`` lets the caller pass precomputed Monte-Carlo uniforms: with the
    reference's fixed graph seeds they are step-invariant, so generating them
    once outside the step saves the per-step threefry work (~1.3M uniforms).
    """
    B, R, _ = color_gt.shape
    tr = conf.train

    if cdfs is None:
        cdfs = make_mc_cdfs(conf, B, R, step=step, dtype=color_gt.dtype)
    x_fg, t_fg, x_bg, t_bg, mask = sample_points(
        params, camloc, raydir, cdfs["stratified"], cdfs["background"], conf,
        rand_u=cdfs["upsample"], proposal_grid=proposal_grid)
    res = pb_render(params, x_fg, t_fg, x_bg, t_bg, camloc, raydir, mask,
                    cos_anneal_ratio, lv_gain, cdfs, conf)

    N = x_fg.shape[2]
    zero = jnp.zeros((), color_gt.dtype)

    # RGB (loss.py:59-66)
    err = jnp.abs(res["color_pixel"] - color_gt) if tr.rgb_loss == "l1" \
        else (res["color_pixel"] - color_gt) ** 2
    if tr.mask_weight > 0.0:
        denorm = jnp.sum(obj_mask) + 1e-5
        loss_rgb = jnp.sum(err * obj_mask) / denorm
    else:
        loss_rgb = jnp.sum(err) / (B * R)

    # eikonal (loss.py:69-76)
    if tr.eikonal_weight > 0.0:
        gn = jnp.linalg.norm(res["grad_x_fg"], axis=-1, keepdims=True)
        denorm = jnp.sum(mask) * N + 1e-5
        loss_eikonal = jnp.sum(((gn - 1.0) * mask) ** 2) / denorm
    else:
        loss_eikonal = zero

    # TV over grid features (loss.py:79-105) — the map comes fused out of
    # the renderer's main grid query (shared corner gather)
    gtype = conf.geometric_network.voxel.type
    if gtype != "none" and tr.tv_weight > 0.0:
        denorm = jnp.sum(mask) * N + 1e-5
        loss_tv = jnp.sum(res["tv_map"] * mask) / denorm
    else:
        loss_tv = zero

    # mask BCE (loss.py:107-115)
    if tr.mask_weight > 0.0:
        denorm = jnp.sum(mask) + 1e-5
        p = jnp.clip(res["obj_mask_pred"], 1e-3, 1.0 - 1e-3)
        bce = -(obj_mask * jnp.log(p) + (1.0 - obj_mask) * jnp.log(1.0 - p))
        loss_mask = jnp.sum(bce) / denorm
    else:
        loss_mask = zero

    denorm_prior = jnp.sum(mask) * N + 1e-5

    # base-color smoothness prior (loss.py:121-129)
    if tr.base_color_prior_weight > 0.0:
        bc = res["base_color"]
        if not tr.base_color_prior_sym_backward:
            bc = jax.lax.stop_gradient(bc)
        prior_base_color = jnp.sum(
            jnp.abs(bc - res["base_color_ptb"]) * mask) / denorm_prior
    else:
        prior_base_color = zero

    # roughness aleatoric prior + log-std reg (loss.py:132-147)
    if tr.roughness_prior_weight > 0.0:
        pv = conf.roughness_network.prior_value
        prior_roughness = jnp.sum(
            jnp.abs(res["roughness"] - pv) / res["std_roughness"] * mask
        ) / denorm_prior
        reg_std_roughness = jnp.sum(
            jnp.clip(jnp.log(res["std_roughness"]), 1e-5, 1e5) * mask
        ) / denorm_prior
    else:
        prior_roughness = reg_std_roughness = zero

    # specular reflectance prior + reg (loss.py:149-165)
    if tr.specular_reflectance_prior_weight > 0.0:
        pv = conf.specular_reflectance_network.prior_value
        prior_specular = jnp.sum(
            jnp.abs(res["specular_reflectance"] - pv)
            / res["std_specular_reflectance"] * mask) / denorm_prior
        reg_std_specular = jnp.sum(
            jnp.clip(jnp.log(res["std_specular_reflectance"]), 1e-5, 1e5)
            * mask) / denorm_prior
    else:
        prior_specular = reg_std_specular = zero

    loss = (loss_rgb
            + tr.eikonal_weight * loss_eikonal
            + tr.tv_weight * loss_tv
            + tr.mask_weight * loss_mask
            + tr.base_color_prior_weight * prior_base_color
            + tr.roughness_prior_weight * prior_roughness
            + tr.specular_reflectance_prior_weight * prior_specular
            + tr.roughness_prior_weight * reg_std_roughness
            + tr.specular_reflectance_prior_weight * reg_std_specular)

    monitors = dict(
        loss=loss,
        loss_rgb=loss_rgb,
        loss_eikonal=loss_eikonal,
        loss_tv=loss_tv,
        loss_mask=loss_mask,
        prior_base_color=prior_base_color,
        prior_roughness=prior_roughness,
        prior_specular_reflectance=prior_specular,
        reg_std_roughness=reg_std_roughness,
        reg_std_specular_reflectance=reg_std_specular,
        gain=res["gain"][0],
    )
    return loss, monitors
