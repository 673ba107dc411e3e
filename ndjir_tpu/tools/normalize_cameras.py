"""IDR-style scene normalization: visual-hull scale_mat estimation.

Parity with reference scripts/preprocess_cameras.py:134-258: build a 100^3
candidate grid, count per-point mask observations across views, keep points
seen in >= min(n_views, 5) masks (the visual hull), then scale_mat = translate
to the hull centroid and scale by 3x the RMS radius so the object fits the
unit sphere.  Writes ``cameras_new.npz`` with the shared scale mat.

Run: python -m ndjir_tpu.tools.normalize_cameras --source_dir <scene_dir>
"""

from __future__ import annotations

import glob
import os

import numpy as np


def load_masks(masks_dir: str) -> np.ndarray:
    import imageio.v2 as imageio

    files = sorted(glob.glob(os.path.join(masks_dir, "*")))
    masks = []
    for f in files:
        m = np.asarray(imageio.imread(f))
        if m.ndim == 3:
            m = m.mean(axis=-1)
        masks.append((m > 127.5).astype(np.float32))
    return np.asarray(masks)


def visual_hull(masks: np.ndarray, Ps: np.ndarray, scale: float = 3.0,
                center=(0.0, 0.0, 0.0), grid_size: int = 100,
                min_views: int | None = None):
    """Count mask observations of a centered grid; returns
    (centroid, normalization radius = 3 * RMS, hull points)."""
    n_cam, H, W = masks.shape
    min_views = min(min_views or 5, n_cam)
    lin = np.linspace(-scale, scale, grid_size)
    xx, yy, zz = np.meshgrid(lin, lin, lin)
    pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()])
    pts = pts + np.asarray(center)[:, None]
    n = pts.shape[1]
    appears = np.zeros(n)
    hom = np.concatenate([pts, np.ones((1, n))], axis=0)
    for i in range(n_cam):
        proj = Ps[i] @ hom
        depth = proj[2]
        with np.errstate(divide="ignore", invalid="ignore"):
            uv = np.round(proj[:2] / depth).astype(np.int64)
        ok = (uv[0] >= 0) & (uv[0] < W) & (uv[1] >= 0) & (uv[1] < H) \
            & (depth > 0)
        idx = np.where(ok)[0]
        on = masks[i][uv[1, idx], uv[0, idx]] > 0.5
        appears[idx[on]] += 1
    hull = pts[:, appears >= min_views]
    if hull.shape[1] == 0:
        raise RuntimeError("Visual hull empty — check masks/cameras")
    centroid = hull.mean(axis=1)
    rms = np.sqrt(((hull - centroid[:, None]) ** 2).sum(axis=0)).mean() * 3
    return centroid, rms, hull.T


def normalize_cameras(scene_dir: str, grid_scale: float = 3.0) -> str:
    cameras = np.load(os.path.join(scene_dir, "cameras.npz"))
    n = len([k for k in cameras.files if k.startswith("world_mat_")
             and "inv" not in k])
    Ps = np.stack([cameras[f"world_mat_{i}"][:3, :4] for i in range(n)])
    masks = load_masks(os.path.join(scene_dir, "mask"))

    centroid, radius, _ = visual_hull(masks, Ps, scale=grid_scale)
    norm = np.eye(4)
    norm[0, 0] = norm[1, 1] = norm[2, 2] = radius
    norm[:3, 3] = centroid

    out = {}
    for i in range(n):
        out[f"scale_mat_{i}"] = norm
        wm = np.eye(4, dtype=np.float32)
        wm[:3, :4] = Ps[i]
        out[f"world_mat_{i}"] = wm
    path = os.path.join(scene_dir, "cameras_new.npz")
    np.savez(path, **out)
    print(f"normalization:\n{norm}")
    return path


def main():
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source_dir", required=True)
    p.add_argument("--grid_scale", type=float, default=3.0)
    p.add_argument("--replace", action="store_true",
                   help="overwrite cameras.npz instead of cameras_new.npz")
    args = p.parse_args()
    path = normalize_cameras(args.source_dir, args.grid_scale)
    if args.replace:
        os.replace(path, os.path.join(args.source_dir, "cameras.npz"))


if __name__ == "__main__":
    main()
