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
