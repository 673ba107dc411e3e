"""Synthetic IDR-format scene generator (analytic lambert-shaded sphere).

Gives tests, CLI drives, and benchmarks a dataset with exactly the IDR
layout the reference consumes (image/, mask/, cameras.npz with
world_mat_i / scale_mat_i) without needing DTU data on disk.
"""

from __future__ import annotations

import os

import imageio.v2 as imageio
import numpy as np


def _look_at(eye: np.ndarray) -> np.ndarray:
    """World-to-camera rotation looking at the origin (z forward)."""
    fwd = -eye / np.linalg.norm(eye)
    up = np.array([0.0, 0.0, 1.0])
    if abs(fwd @ up) > 0.99:
        up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    Rwc = np.stack([right, down, fwd], axis=0)  # rows: camera axes
    return Rwc


def make_synthetic_scene(out_dir: str, n_views: int = 8, H: int = 64,
                         W: int = 64, radius: float = 0.5,
                         cam_dist: float = 2.5, seed: int = 0) -> str:
    """Render a lambert sphere of ``radius`` from cameras on a tilted circle;
    writes IDR-format files and returns ``out_dir``."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(out_dir, "image"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "mask"), exist_ok=True)

    f = 0.8 * max(H, W)
    K = np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]])
    light_dir = np.array([0.5, 0.3, 0.8])
    light_dir /= np.linalg.norm(light_dir)
    albedo = np.array([0.8, 0.45, 0.25])

    cams = {}
    for i in range(n_views):
        th = 2 * np.pi * i / n_views
        eye = cam_dist * np.array(
            [np.cos(th) * 0.9, np.sin(th) * 0.9, 0.45 + 0.1 * np.sin(3 * th)])
        Rwc = _look_at(eye)
        t = -Rwc @ eye
        P34 = K @ np.concatenate([Rwc, t[:, None]], axis=1)
        world_mat = np.eye(4, dtype=np.float32)
        world_mat[:3, :4] = P34

        # per-pixel rays in world space
        xx, yy = np.meshgrid(np.arange(W) + 0.0, np.arange(H) + 0.0)
        pix = np.stack([xx, yy, np.ones_like(xx)], axis=-1).reshape(-1, 3)
        dirs_cam = (np.linalg.inv(K) @ pix.T).T
        dirs = (Rwc.T @ dirs_cam.T).T
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

        # analytic ray-sphere
        cv = dirs @ eye
        cc = eye @ eye
        disc = cv ** 2 - (cc - radius ** 2)
        hit = disc > 0
        tt = -cv - np.sqrt(np.maximum(disc, 0.0))
        x = eye[None, :] + tt[:, None] * dirs
        n = x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-9)
        lam = np.clip(n @ light_dir, 0.0, 1.0)
        shade = 0.15 + 0.85 * lam
        img = np.where(hit[:, None], albedo[None, :] * shade[:, None], 0.05)
        img = (np.clip(img, 0, 1).reshape(H, W, 3) * 255).astype(np.uint8)
        mask = (hit.reshape(H, W) * 255).astype(np.uint8)

        imageio.imwrite(os.path.join(out_dir, "image", f"{i:06d}.png"), img)
        imageio.imwrite(os.path.join(out_dir, "mask", f"{i:06d}.png"), mask)
        cams[f"world_mat_{i}"] = world_mat
        cams[f"scale_mat_{i}"] = np.eye(4, dtype=np.float32)

    np.savez(os.path.join(out_dir, "cameras.npz"), **cams)
    return out_dir


# ---------------------------------------------------------------------------
# hard synthetic benchmark scene (textured + specular + shadowed blobby)
# ---------------------------------------------------------------------------

def _blobby_sdf(x: np.ndarray) -> np.ndarray:
    """Smooth-min union of three spheres (analytic, Lipschitz ~1).

    x (..., 3) -> sdf (...).  The smooth minimum uses the polynomial smin
    with k=0.1, giving a blobby genus-0 surface with concavities — a harder
    reconstruction target than a sphere.
    """
    centers = np.array([[0.18, 0.0, 0.05], [-0.2, 0.12, -0.08],
                        [-0.02, -0.22, 0.12]])
    radii = np.array([0.3, 0.26, 0.22])
    k = 0.1
    d = None
    for c, r in zip(centers, radii):
        di = np.linalg.norm(x - c, axis=-1) - r
        if d is None:
            d = di
        else:
            h = np.clip(0.5 + 0.5 * (di - d) / k, 0.0, 1.0)
            d = di * (1 - h) + d * h - k * h * (1 - h)
    return d


def _blobby_normal(x: np.ndarray, h: float = 1e-5) -> np.ndarray:
    g = np.stack([
        _blobby_sdf(x + np.array([h, 0, 0])) - _blobby_sdf(x - np.array([h, 0, 0])),
        _blobby_sdf(x + np.array([0, h, 0])) - _blobby_sdf(x - np.array([0, h, 0])),
        _blobby_sdf(x + np.array([0, 0, h])) - _blobby_sdf(x - np.array([0, 0, h])),
    ], axis=-1)
    return g / np.maximum(np.linalg.norm(g, axis=-1, keepdims=True), 1e-12)


def _sphere_trace(eye, dirs, t0, t1, iters=96):
    """Vectorized sphere tracing of the blobby SDF; returns (t, hit)."""
    t = t0.copy()
    for _ in range(iters):
        x = eye[None, :] + t[:, None] * dirs
        d = _blobby_sdf(x)
        t = t + 0.9 * d
        t = np.minimum(t, t1)
    x = eye[None, :] + t[:, None] * dirs
    hit = (_blobby_sdf(x) < 1.5e-3) & (t < t1 - 1e-6)
    return t, hit


def _soft_shadow(x, light_dir, k=16.0, t_max=1.2):
    """SDF soft-shadow factor in [0, 1] along the light ray."""
    res = np.ones(x.shape[:-1])
    t = np.full(x.shape[:-1], 2e-2)
    for _ in range(48):
        p = x + t[..., None] * light_dir
        d = _blobby_sdf(p)
        res = np.minimum(res, np.clip(k * d / np.maximum(t, 1e-6), 0.0, 1.0))
        t = t + np.clip(d, 5e-3, 0.08)
        t = np.minimum(t, t_max)
    return res


def _albedo_texture(x: np.ndarray) -> np.ndarray:
    """Procedural 3-D albedo: two-tone stripes + color blotches."""
    s = 0.5 + 0.5 * np.sin(21.0 * x[..., 0] + 13.0 * x[..., 2])
    blotch = 0.5 + 0.5 * np.sin(9.0 * x[..., 1] + 6.0 * x[..., 0] * x[..., 2])
    a = np.stack([0.75 * s + 0.15, 0.25 + 0.5 * blotch,
                  0.6 - 0.35 * s], axis=-1)
    return np.clip(a, 0.05, 0.95)


def make_hard_synthetic_scene(out_dir: str, n_views: int = 16, H: int = 96,
                              W: int = 96, cam_dist: float = 2.5,
                              seed: int = 0) -> str:
    """Hard quality-benchmark scene: blobby SDF, procedural texture, GGX-ish
    specular highlight, SDF soft shadows, constant ambient.

    Writes the IDR layout + ``gt_sdf.npz`` (a dense SDF lattice from which
    the ground-truth mesh is extracted for Chamfer evaluation).
    """
    os.makedirs(os.path.join(out_dir, "image"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "mask"), exist_ok=True)

    f = 1.6 * max(H, W)
    K = np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]])
    light_dir = np.array([0.45, 0.35, 0.82])
    light_dir /= np.linalg.norm(light_dir)

    cams = {}
    for i in range(n_views):
        th = 2 * np.pi * i / n_views
        ele = 0.35 + 0.25 * np.sin(2.0 * th + 0.7)
        eye = cam_dist * np.array(
            [np.cos(th) * np.cos(ele), np.sin(th) * np.cos(ele), np.sin(ele)])
        Rwc = _look_at(eye)
        t = -Rwc @ eye
        P34 = K @ np.concatenate([Rwc, t[:, None]], axis=1)
        world_mat = np.eye(4, dtype=np.float32)
        world_mat[:3, :4] = P34

        xx, yy = np.meshgrid(np.arange(W) + 0.0, np.arange(H) + 0.0)
        pix = np.stack([xx, yy, np.ones_like(xx)], axis=-1).reshape(-1, 3)
        dirs = (Rwc.T @ (np.linalg.inv(K) @ pix.T)).T
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

        cv = dirs @ eye
        cc = eye @ eye
        disc = cv ** 2 - (cc - 0.55 ** 2)   # bounding sphere r=0.55
        near = np.where(disc > 0, -cv - np.sqrt(np.maximum(disc, 0)), 1e9)
        far = np.where(disc > 0, -cv + np.sqrt(np.maximum(disc, 0)), 1e9)
        tt, hit = _sphere_trace(eye, dirs, near, far)

        x = eye[None, :] + tt[:, None] * dirs
        n = _blobby_normal(x)
        view = -dirs
        albedo = _albedo_texture(x)
        lam = np.clip(n @ light_dir, 0.0, 1.0)
        shadow = _soft_shadow(x, light_dir)
        half = light_dir[None, :] + view
        half /= np.maximum(np.linalg.norm(half, axis=-1, keepdims=True), 1e-9)
        noh = np.clip(np.sum(n * half, axis=-1), 0.0, 1.0)
        spec = 0.6 * noh ** 64 * shadow * (lam > 0)
        shade = (0.12 + 0.88 * lam * shadow)[:, None] * albedo \
            + spec[:, None]
        img = np.where(hit[:, None], shade, 0.04)
        img = (np.clip(img, 0, 1).reshape(H, W, 3) * 255).astype(np.uint8)
        mask = (hit.reshape(H, W) * 255).astype(np.uint8)

        imageio.imwrite(os.path.join(out_dir, "image", f"{i:06d}.png"), img)
        imageio.imwrite(os.path.join(out_dir, "mask", f"{i:06d}.png"), mask)
        cams[f"world_mat_{i}"] = world_mat
        cams[f"scale_mat_{i}"] = np.eye(4, dtype=np.float32)
    np.savez(os.path.join(out_dir, "cameras.npz"), **cams)

    # ground-truth SDF lattice for the Chamfer reference mesh
    G = 192
    lin = np.linspace(-0.6, 0.6, G).astype(np.float32)
    X, Y, Z = np.meshgrid(lin, lin, lin, indexing="ij")
    sdf = _blobby_sdf(np.stack([X, Y, Z], axis=-1)).astype(np.float32)
    np.savez_compressed(os.path.join(out_dir, "gt_sdf.npz"), sdf=sdf,
                        vmin=-0.6, vmax=0.6)
    return out_dir
