"""Offscreen mesh / camera / attribute visualization (matplotlib-based).

Replaces the reference's open3d viewers (scripts/viewer.py, viewer_pbr.py,
render_pbr_meshes_with_camera_params.py, show_cameras_npy.py,
show_colmap_results.py, analyze_roughness_specular_distribution.py) with
dependency-free offscreen renders: a painter's-algorithm triangle rasterizer
for vertex-colored meshes (incl. turntable image sequences with Slerp-like
interpolation), camera-frustum pose plots, and attribute histograms.

Run: python -m ndjir_tpu.tools.viewers <mesh|turntable|cameras|histogram> ...
"""

from __future__ import annotations

import os

import numpy as np

from ndjir_tpu.utils.mesh_io import load_obj


def _look_at_rotation(eye: np.ndarray, target=None) -> np.ndarray:
    target = np.zeros(3) if target is None else target
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, 0.0, 1.0])
    if abs(fwd @ up) > 0.99:
        up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    return np.stack([right, down, fwd])


def render_mesh_view(verts, faces, colors, eye, res=512, fov=45.0):
    """Painter's-algorithm software rasterize -> (res, res, 3) uint8."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.collections import PolyCollection

    R = _look_at_rotation(np.asarray(eye, float))
    cam = (verts - eye) @ R.T  # x right, y down, z forward
    f = 1.0 / np.tan(np.radians(fov) / 2)
    z = np.maximum(cam[:, 2], 1e-6)
    x = f * cam[:, 0] / z
    y = -f * cam[:, 1] / z

    tz = cam[:, 2][faces].mean(axis=1)
    order = np.argsort(-tz)  # far to near
    polys = np.stack([x[faces], y[faces]], axis=-1)[order]
    if colors is not None:
        n = cam[:, 2][faces].mean(axis=1)
        fc = colors[faces].mean(axis=1)[order]
    else:
        # simple headlight shading from face normals
        v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
        nrm = np.cross(v1 - v0, v2 - v0)
        nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)
        lam = np.abs(nrm @ (R[2]))
        fc = np.stack([lam] * 3, axis=-1)[order] * 0.8 + 0.1

    fig = plt.figure(figsize=(res / 100, res / 100), dpi=100)
    ax = fig.add_axes([0, 0, 1, 1])
    ax.set_xlim(-1, 1)
    ax.set_ylim(-1, 1)
    ax.axis("off")
    ax.add_collection(PolyCollection(polys, facecolors=np.clip(fc, 0, 1),
                                     edgecolors="none"))
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return buf


def view_mesh(fpath: str, out_path: str | None = None, res=512,
              cam_dist=2.0):
    V, F, C = load_obj(fpath)
    center = V.mean(axis=0)
    Vc = V - center
    scale = np.abs(Vc).max()
    img = render_mesh_view(Vc / scale, F, C,
                           eye=np.array([1.2, -1.2, 0.8]) * cam_dist / 1.9,
                           res=res)
    import imageio.v2 as imageio

    out_path = out_path or os.path.splitext(fpath)[0] + "_view.png"
    imageio.imwrite(out_path, img)
    return out_path


def turntable(fpath: str, out_dir: str | None = None, n_views=60, res=512,
              cam_dist=2.0, elevation=0.5):
    """Orbit image sequence (reference viewer_pbr.py camera-path videos)."""
    import imageio.v2 as imageio

    V, F, C = load_obj(fpath)
    center = V.mean(axis=0)
    Vc = (V - center)
    Vc = Vc / np.abs(Vc).max()
    out_dir = out_dir or os.path.splitext(fpath)[0] + "_turntable"
    os.makedirs(out_dir, exist_ok=True)
    for i in range(n_views):
        th = 2 * np.pi * i / n_views
        eye = cam_dist * np.array(
            [np.cos(th), np.sin(th), elevation]) / np.sqrt(1 + elevation ** 2)
        img = render_mesh_view(Vc, F, C, eye, res=res)
        imageio.imwrite(os.path.join(out_dir, f"{i:04d}.png"), img)
    return out_dir


def render_with_camera_params(mesh_path: str, cameras_npz: str,
                              out_dir: str | None = None, res=512,
                              indices=None):
    """Offscreen renders of a mesh from dataset camera poses (reference:
    render_pbr_meshes_with_camera_params.py)."""
    import imageio.v2 as imageio

    from ndjir_tpu.data.cameras import load_K_Rt_from_P

    V, F, C = load_obj(mesh_path)
    cams = np.load(cameras_npz)
    n = len([k for k in cams.files if k.startswith("world_mat_")
             and "inv" not in k])
    out_dir = out_dir or os.path.splitext(mesh_path)[0] + "_views"
    os.makedirs(out_dir, exist_ok=True)
    idxs = indices if indices is not None else range(n)
    outs = []
    for i in idxs:
        S = cams[f"scale_mat_{i}"] if f"scale_mat_{i}" in cams.files \
            else np.eye(4)
        P = (cams[f"world_mat_{i}"] @ S)[:3]
        _, pose = load_K_Rt_from_P(P)
        eye = pose[:3, 3]
        img = render_mesh_view(V, F, C, eye, res=res)
        p = os.path.join(out_dir, f"{i:06d}.png")
        imageio.imwrite(p, img)
        outs.append(p)
    return outs


def frames_to_gif(frame_dir: str, out_path: str | None = None, fps: int = 20):
    """Assemble an image sequence into a GIF (reference viewer_pbr.py writes
    camera-path videos; GIF avoids an ffmpeg dependency)."""
    import glob as _glob

    import imageio.v2 as imageio

    frames = [imageio.imread(f)
              for f in sorted(_glob.glob(os.path.join(frame_dir, "*.png")))]
    out_path = out_path or frame_dir.rstrip("/") + ".gif"
    imageio.mimwrite(out_path, frames, duration=1.0 / fps, loop=0)
    return out_path


def export_cameras_json(cameras_npz: str, out_path: str | None = None):
    """cameras.npz -> portable JSON (per-view K, R_c2w, camera center);
    generic replacement for the reference's O3D-specific exporter
    (create_o3d_camera_parameters.py)."""
    import json

    from ndjir_tpu.data.cameras import load_K_Rt_from_P

    cams = np.load(cameras_npz)
    n = len([k for k in cams.files if k.startswith("world_mat_")
             and "inv" not in k])
    out = []
    for i in range(n):
        S = cams[f"scale_mat_{i}"] if f"scale_mat_{i}" in cams.files \
            else np.eye(4)
        P = (cams[f"world_mat_{i}"] @ S)[:3]
        intrinsic, pose = load_K_Rt_from_P(P)
        out.append(dict(index=i,
                        K=intrinsic[:3, :3].tolist(),
                        R_c2w=pose[:3, :3].tolist(),
                        center=pose[:3, 3].tolist()))
    out_path = out_path or os.path.splitext(cameras_npz)[0] + "_cameras.json"
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    return out_path


def show_cameras(cameras_npz: str, out_path: str | None = None):
    """Camera-frustum pose plot (reference show_cameras_npy.py)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ndjir_tpu.data.cameras import load_K_Rt_from_P

    cams = np.load(cameras_npz)
    n = len([k for k in cams.files if k.startswith("world_mat_")
             and "inv" not in k])
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")
    for i in range(n):
        S = cams[f"scale_mat_{i}"] if f"scale_mat_{i}" in cams.files \
            else np.eye(4)
        P = (cams[f"world_mat_{i}"] @ S)[:3]
        _, pose = load_K_Rt_from_P(P)
        c = pose[:3, 3]
        fwd = pose[:3, 2]
        ax.scatter(*c, c="b", s=10)
        ax.quiver(*c, *(0.3 * fwd), color="r", linewidth=0.5)
        ax.text(*c, str(i), fontsize=6)
    ax.scatter([0], [0], [0], c="k", marker="x")
    out_path = out_path or os.path.splitext(cameras_npz)[0] + "_poses.png"
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path


def attribute_histogram(mesh_paths: list[str], out_path: str,
                        labels=None, bins=64):
    """Roughness/specular distribution heat histograms (reference
    analyze_roughness_specular_distribution.py)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, len(mesh_paths),
                             figsize=(4 * len(mesh_paths), 3), squeeze=False)
    for ax, mp, lbl in zip(axes[0], mesh_paths,
                           labels or [os.path.basename(m) for m in mesh_paths]):
        _, _, C = load_obj(mp)
        vals = C.max(axis=-1) if C is not None else np.zeros(1)
        ax.hist(vals, bins=bins, color="#444", density=True)
        ax.set_title(lbl, fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path


def main():
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    v = sub.add_parser("mesh")
    v.add_argument("mesh")
    v.add_argument("--out")
    t = sub.add_parser("turntable")
    t.add_argument("mesh")
    t.add_argument("--views", type=int, default=60)
    c = sub.add_parser("cameras")
    c.add_argument("npz")
    cr = sub.add_parser("render-views")
    cr.add_argument("mesh")
    cr.add_argument("npz")
    g = sub.add_parser("gif")
    g.add_argument("frame_dir")
    g.add_argument("--fps", type=int, default=20)
    ej = sub.add_parser("export-cameras")
    ej.add_argument("npz")
    h = sub.add_parser("histogram")
    h.add_argument("meshes", nargs="+")
    h.add_argument("--out", default="histogram.png")
    args = p.parse_args()
    if args.cmd == "mesh":
        print(view_mesh(args.mesh, args.out))
    elif args.cmd == "turntable":
        print(turntable(args.mesh, n_views=args.views))
    elif args.cmd == "cameras":
        print(show_cameras(args.npz))
    elif args.cmd == "render-views":
        print(render_with_camera_params(args.mesh, args.npz))
    elif args.cmd == "gif":
        print(frames_to_gif(args.frame_dir, fps=args.fps))
    elif args.cmd == "export-cameras":
        print(export_cameras_json(args.npz))
    elif args.cmd == "histogram":
        print(attribute_histogram(args.meshes, args.out))


if __name__ == "__main__":
    main()
