"""Mesh extraction: SDF volume -> iso-surface -> attribute meshes.

Re-design of reference python/extract_by_mc.py:37-288.  The SDF volume and
all per-vertex attribute queries run on-device as large jitted batches
(50k-point chunks of pure matmul+gather work); iso-surfacing and mesh
bookkeeping run in the native C++ library (csrc/marching_cubes.cpp).

Outputs per extraction (parity with save_attributed_mesh,
extract_by_mc.py:197-223): OBJ meshes with vertex colors for base color,
implicit illumination, roughness, specular reflectance, and both aleatoric
stds, plus an equirect environment-map PNG; for final extractions, mask-
trimmed connected-component meshes (top 5 by face count).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ndjir_tpu.extract.native import (
    connected_components,
    marching_cubes,
)
from ndjir_tpu.models import fields
from ndjir_tpu.utils.mesh_io import save_obj
from ndjir_tpu.utils.monitor import logger


@partial(jax.jit, static_argnames=("conf",))
def _sdf_batch(params, pts, conf):
    sdf, _, _ = fields.geometric_apply(params["geometric-network"], pts, conf)
    return sdf[..., 0]


def compute_sdf_volume(params, conf, G: int) -> np.ndarray:
    """Dense SDF evaluation on the G^3 grid over the bounding box, batched
    (reference: compute_pts_vol, extract_by_mc.py:47-73)."""
    radius = conf.renderer.bounding_sphere_radius
    lin = np.linspace(-radius, radius, G).astype(np.float32)
    X, Y, Z = np.meshgrid(lin, lin, lin, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)
    B = conf.extraction.batch_size
    # pad to a whole number of batches so one compiled shape serves all
    n = pts.shape[0]
    n_pad = (-n) % B
    if n_pad:
        pts = np.concatenate([pts, np.zeros((n_pad, 3), np.float32)])
    out = []
    for b in range(0, len(pts), B):
        out.append(np.asarray(_sdf_batch(params, jnp.asarray(pts[b:b + B]),
                                         conf)))
    vol = np.concatenate(out)[:n]
    return vol.reshape(G, G, G)


def mesh_from_volume(vol: np.ndarray, level: float, radius: float,
                     gradient_direction: str = "descent"):
    """Iso-surface + rescale voxel coords to world (reference:
    create_mesh_from_volume, extract_by_mc.py:37-43)."""
    field = vol if gradient_direction == "descent" else -vol
    lvl = level if gradient_direction == "descent" else -level
    verts, tris = marching_cubes(field, lvl)
    G = vol.shape[0]
    verts = verts * (2 * radius) / (G - 1) - radius
    return verts.astype(np.float32), tris


@partial(jax.jit, static_argnames=("conf", "attr"))
def _attr_batch(params, pts, conf, attr: str):
    """Per-vertex attribute query with the spatial-gradient normal."""
    geo = params["geometric-network"]
    (sdf, feature, gain), vjp_fn = jax.vjp(
        lambda x: fields.geometric_apply(geo, x, conf), pts)
    normal = vjp_fn((jnp.ones_like(sdf), jnp.zeros_like(feature),
                     jnp.zeros_like(gain)))[0]
    if attr == "base_color":
        return fields.base_color_apply(
            params["base-color-network"], pts, feature, normal, conf)
    if attr == "implicit_illumination":
        return fields.implicit_illumination_apply(
            params.get("implicit-illumination-network"), pts, feature,
            normal, conf)
    if attr in ("roughness", "roughness_std"):
        v, s = fields.roughness_apply(
            params["roughness-network"], pts, feature, normal, conf)
        return v if attr == "roughness" else s
    if attr in ("specular_reflectance", "specular_reflectance_std"):
        v, s = fields.specular_reflectance_apply(
            params.get("specular-reflectance-network"), pts, feature, normal,
            conf)
        return v if attr == "specular_reflectance" else s
    raise ValueError(attr)


def compute_vertex_attribute(params, conf, verts: np.ndarray,
                             attr: str) -> np.ndarray:
    B = conf.extraction.batch_size
    n = len(verts)
    n_pad = (-n) % B
    v = np.concatenate([verts, np.zeros((n_pad, 3), np.float32)]) if n_pad \
        else verts
    out = []
    for b in range(0, len(v), B):
        out.append(np.asarray(_attr_batch(
            params, jnp.asarray(v[b:b + B]), conf, attr)))
    return np.concatenate(out)[:n]


def _to_rgb(color: np.ndarray, fill_dim: int) -> np.ndarray:
    """1-channel attributes fill a single RGB dim (reference:
    create_rgb_color, extract_by_mc.py:187-194)."""
    if fill_dim == -1:
        return np.clip(color, 0.0, 1.0)
    rgb = np.zeros((color.shape[0], 3), np.float32)
    rgb[:, fill_dim:fill_dim + 1] = np.clip(color[:, :1], 0.0, 1.0)
    return rgb


_ATTR_SPECS = [
    # (attr name, fill dim when the value is 1-channel, is_std) — fill dims
    # match reference extract_by_mc.py:199-207 (illum -> blue, roughness ->
    # green, 1-channel specular -> red)
    ("base_color", -1, False),
    ("implicit_illumination", 2, False),
    ("roughness", 1, False),
    ("specular_reflectance", 0, False),
    ("roughness_std", 1, True),
    ("specular_reflectance_std", 0, True),
]


def save_attributed_meshes(params, conf, dirname, fname, verts, tris,
                           mesh_type: str, idx: int, train: bool) -> str:
    G = conf.extraction.rough_grid_size if train else conf.extraction.grid_size
    fpath = ""
    for attr, fill_dim_1ch, is_std in _ATTR_SPECS:
        vc = compute_vertex_attribute(params, conf, verts, attr)
        fill = fill_dim_1ch if vc.shape[-1] == 1 else -1
        colors = _to_rgb(vc, fill)
        # stds normalize AFTER the [0,1] clip (reference order,
        # extract_by_mc.py:213-216)
        if is_std and colors.max() > 0:
            colors = colors / colors.max()
        fpath = os.path.join(
            dirname, f"{fname}_{G}grid_{mesh_type}_{attr}_mesh{idx:02d}.obj")
        save_obj(fpath, verts, tris, colors)
    logger.info(f"#vertices = {len(verts)}  #triangles = {len(tris)}")
    return fpath


def extract_environment_map(params, conf, dirname: str) -> None:
    """Equirect env-light export (reference: extract_by_mc.py:226-261,
    including its angle-grid convention)."""
    import imageio.v2 as imageio

    H = 256
    W = 2 * H
    thetas = np.linspace(0, np.pi, H)
    phis = np.linspace(-np.pi, np.pi, W)
    the, phi = np.meshgrid(phis, thetas)  # reference swaps the names
    x = np.cos(phi) * np.sin(the)
    y = np.sin(phi) * np.sin(the)
    z = np.cos(the)
    dirs = np.stack([x, y, z], axis=-1).reshape(-1, 3).astype(np.float32)

    vals = np.asarray(fields.environment_light_apply(
        params["environment-light-network"], jnp.asarray(dirs), conf))
    M, m = vals.max(), vals.min()
    if conf.environment_light_network.act_last == "sigmoid":
        img = vals * 255.0
    elif m != M:
        img = vals / M * 255.0
    else:
        img = 255.0 * np.ones_like(vals)
    ch = img.shape[-1]
    img = img.reshape((H, W, 3) if ch == 3 else (H, W))
    img = np.clip(img, 0, 255).astype(np.uint8)
    imageio.imwrite(os.path.join(dirname, "environment_map.png"), img)
    with open(os.path.join(dirname, "environment_map_min_max.txt"), "w") as f:
        f.write(f"min, max = {m}, {M}")


def clean_points_by_mask(points: np.ndarray, dataset, conf) -> np.ndarray:
    """Visibility trim: a vertex survives if it projects inside every view's
    dilated mask (reference: clean_points_by_mask, extract_by_mc.py:77-102 —
    which hardcodes DTU's 1600x1200; we use the dataset's true size)."""
    import cv2

    margin = conf.valid.dtumvs.pixel_margin
    kernel = cv2.getStructuringElement(
        cv2.MORPH_ELLIPSE, (margin * 2 + 1, margin * 2 + 1))
    inside = np.ones(len(points), bool)
    H, W = dataset.H, dataset.W
    for i in range(dataset.size):
        pose = dataset.poses[i]
        R = np.linalg.inv(pose[:3, :3])
        t = -R @ pose[:3, 3:]
        K = dataset.intrinsics[i]
        pts_img = (K @ (R @ points.T + t)).T
        pts_img = pts_img / pts_img[:, 2:]
        pts_img = np.round(pts_img).astype(np.int32) + 1

        mask = dataset.masks[i][..., 0].astype(np.float32)
        mask = cv2.dilate(mask, kernel, iterations=1)
        mask = (mask >= 0.5).astype(np.int32)
        # 1-pixel all-ones border so out-of-view points survive
        mask = np.pad(mask, 1, constant_values=1)
        cur = mask[pts_img[:, 1].clip(0, H + 1), pts_img[:, 0].clip(0, W + 1)]
        inside &= cur.astype(bool)
    return inside


def largest_component_meshes(verts, tris, top_k: int = 3):
    """Top-k components by surface AREA (reference: create_largest_meshes,
    extract_by_mc.py:131-140)."""
    labels = connected_components(tris, len(verts))
    tri_v = verts[tris]
    areas = 0.5 * np.linalg.norm(
        np.cross(tri_v[:, 1] - tri_v[:, 0], tri_v[:, 2] - tri_v[:, 0]),
        axis=-1)
    comp_area = np.bincount(labels, weights=areas)
    order = np.argsort(comp_area)[::-1][:top_k]
    out = []
    for comp in order:
        cmask = labels == comp
        ctris = tris[cmask]
        used = np.unique(ctris)
        remap = np.full(len(verts), -1, np.int64)
        remap[used] = np.arange(len(used))
        out.append((verts[used].copy(), remap[ctris]))
    return out


def trimmed_component_meshes(verts, tris, keep_mask: np.ndarray, top_k=5):
    """Drop masked-out vertices, split into components, largest first
    (reference: create_trimmed_meshes, extract_by_mc.py:106-128)."""
    idx_map = np.full(len(verts), -1, np.int64)
    idx_map[keep_mask] = np.arange(keep_mask.sum())
    fmask = keep_mask[tris[:, 0]] & keep_mask[tris[:, 1]] & keep_mask[tris[:, 2]]
    new_tris = idx_map[tris[fmask]]
    new_verts = verts[keep_mask]
    if len(new_tris) == 0:
        return []
    labels = connected_components(new_tris, len(new_verts))
    counts = np.bincount(labels)
    order = np.argsort(counts)[::-1][:top_k]
    out = []
    for comp in order:
        cmask = labels == comp
        ctris = new_tris[cmask]
        used = np.unique(ctris)
        remap = np.full(len(new_verts), -1, np.int64)
        remap[used] = np.arange(len(used))
        out.append((new_verts[used].copy(), remap[ctris]))
    return out


def extract(params, conf, dirname: str, fname: str, dataset=None,
            final: bool = False, train: bool = False) -> str:
    """Full extraction pipeline (reference: extract, extract_by_mc.py:263-288)."""
    os.makedirs(dirname, exist_ok=True)
    extract_environment_map(params, conf, dirname)

    radius = conf.renderer.bounding_sphere_radius
    G = conf.extraction.rough_grid_size if train else conf.extraction.grid_size
    logger.info(f"Extracting mesh at {G}^3")
    vol = compute_sdf_volume(params, conf, G)
    verts, tris = mesh_from_volume(vol, conf.extraction.level, radius,
                                   conf.extraction.gradient_direction)
    if len(verts) == 0:
        logger.info("Empty iso-surface; skipping mesh export")
        return ""
    fpath = save_attributed_meshes(params, conf, dirname, fname, verts, tris,
                                   "raw", 0, train)

    if final and dataset is not None:
        logger.info("Trimming mesh by mask")
        keep = clean_points_by_mask(verts, dataset, conf)
        comps = trimmed_component_meshes(verts, tris, keep, top_k=5)
        for k in range(len(comps) - 1, -1, -1):
            cv_, ct_ = comps[k]
            fpath = save_attributed_meshes(params, conf, dirname, fname,
                                           cv_, ct_, "trimmed", k, train)
    return fpath


def extract_mesh_for_validation(params, conf, monitor_path: str, epoch: int,
                                final: bool = False, dataset=None) -> str:
    return extract(params, conf, monitor_path, f"model_{epoch:05d}",
                   dataset=dataset, final=final, train=not final)
