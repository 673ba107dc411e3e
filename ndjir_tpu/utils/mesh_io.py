"""Minimal mesh IO: OBJ / PLY writers with per-vertex colors.

Replaces the reference's trimesh export dependency (reference:
extract_by_mc.py:197-223 exports per-attribute OBJ meshes with vertex
colors; evaluate_chamfer writes colored PLY point clouds).  DCC tools
(Blender, MeshLab) read the ``v x y z r g b`` OBJ vertex-color extension.
"""

from __future__ import annotations

import struct

import numpy as np


def save_obj(path: str, vertices: np.ndarray, faces: np.ndarray,
             vertex_colors: np.ndarray | None = None) -> None:
    v = np.asarray(vertices, np.float32)
    f = np.asarray(faces, np.int64)
    lines = []
    if vertex_colors is not None:
        c = np.clip(np.asarray(vertex_colors, np.float32), 0.0, 1.0)
        if c.shape[-1] == 1:
            c = np.repeat(c, 3, axis=-1)
        for p, col in zip(v, c):
            lines.append(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                         f"{col[0]:.6f} {col[1]:.6f} {col[2]:.6f}")
    else:
        for p in v:
            lines.append(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}")
    for tri in f + 1:  # OBJ is 1-indexed
        lines.append(f"f {tri[0]} {tri[1]} {tri[2]}")
    with open(path, "w") as fp:
        fp.write("\n".join(lines) + "\n")


def load_obj(path: str):
    """Reads v/f lines (with optional vertex colors). Returns (V, F, C|None)."""
    verts, faces, colors = [], [], []
    with open(path) as fp:
        for line in fp:
            t = line.split()
            if not t:
                continue
            if t[0] == "v":
                verts.append([float(x) for x in t[1:4]])
                if len(t) >= 7:
                    colors.append([float(x) for x in t[4:7]])
            elif t[0] == "f":
                faces.append([int(x.split("/")[0]) - 1 for x in t[1:4]])
    V = np.asarray(verts, np.float32)
    F = np.asarray(faces, np.int64)
    C = np.asarray(colors, np.float32) if colors else None
    return V, F, C


def save_ply_points(path: str, points: np.ndarray,
                    colors: np.ndarray | None = None) -> None:
    """Binary little-endian PLY point cloud, optionally with uint8 colors."""
    pts = np.asarray(points, np.float32)
    n = len(pts)
    has_c = colors is not None
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}",
              "property float x", "property float y", "property float z"]
    if has_c:
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
    header += ["end_header"]
    with open(path, "wb") as fp:
        fp.write(("\n".join(header) + "\n").encode())
        if has_c:
            c = np.clip(np.asarray(colors), 0, 1)
            c8 = (c * 255).astype(np.uint8)
            for p, col in zip(pts, c8):
                fp.write(struct.pack("<fffBBB", p[0], p[1], p[2],
                                     col[0], col[1], col[2]))
        else:
            fp.write(pts.astype("<f4").tobytes())


def save_ply_mesh(path: str, vertices: np.ndarray, faces: np.ndarray,
                  vertex_colors: np.ndarray | None = None) -> None:
    v = np.asarray(vertices, np.float32)
    f = np.asarray(faces, np.int32)
    has_c = vertex_colors is not None
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {len(v)}",
              "property float x", "property float y", "property float z"]
    if has_c:
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
    header += [f"element face {len(f)}",
               "property list uchar int vertex_indices", "end_header"]
    with open(path, "wb") as fp:
        fp.write(("\n".join(header) + "\n").encode())
        if has_c:
            c8 = (np.clip(np.asarray(vertex_colors), 0, 1) * 255).astype(np.uint8)
            if c8.shape[-1] == 1:
                c8 = np.repeat(c8, 3, axis=-1)
            for p, col in zip(v, c8):
                fp.write(struct.pack("<fffBBB", p[0], p[1], p[2],
                                     col[0], col[1], col[2]))
        else:
            fp.write(v.astype("<f4").tobytes())
        for tri in f:
            fp.write(struct.pack("<Biii", 3, tri[0], tri[1], tri[2]))
