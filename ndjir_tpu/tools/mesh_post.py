"""Mesh postprocessing: smoothing, illumination rebake, texture baking.

Parity surface with reference scripts/smooth_mesh.py,
rebake_implicit_illumination.py, bake_vertex_attribute_to_texture.py — all
rebuilt dependency-free (the reference needs open3d + Blender bpy):
smoothing is our umbrella laplacian; texture baking uses a per-face triangle
atlas (every triangle gets a right-triangle patch in a grid atlas, vertex
colors interpolated barycentrically) with matching OBJ UVs + MTL, readable
by any DCC tool.

Run: python -m ndjir_tpu.tools.mesh_post <smooth|rebake|bake> ...
"""

from __future__ import annotations

import os

import numpy as np

from ndjir_tpu.eval.chamfer import laplacian_smooth
from ndjir_tpu.utils.mesh_io import load_obj, save_obj


def smooth_mesh(fpath: str, iterations: int = 2) -> str:
    """reference: smooth_mesh.py (open3d filter_smooth_simple)."""
    V, F, C = load_obj(fpath)
    V2 = laplacian_smooth(V, F, iterations)
    out = os.path.splitext(fpath)[0] + "_smoothed.obj"
    save_obj(out, V2, F, C)
    return out


def rebake_implicit_illumination(base_color_path: str, illum_path: str,
                                 num_lerps: int = 3) -> list[str]:
    """Multiply the implicit-illumination channel into the base-color mesh
    plus alpha-blended variants (reference:
    rebake_implicit_illumination.py:22-47; illumination lives in the blue
    channel of the attribute mesh)."""
    V0, F0, C0 = load_obj(base_color_path)
    _, _, C1 = load_obj(illum_path)
    if C0 is None or C1 is None:
        raise ValueError("Both meshes must carry vertex colors")
    illum = np.repeat(C1[:, 2:3], 3, axis=1)  # blue channel -> gray
    baked = C0 * illum

    stem = os.path.splitext(base_color_path)[0]
    outs = []
    p = f"{stem}_ilbaked.obj"
    save_obj(p, V0, F0, baked)
    outs.append(p)
    for alpha in np.linspace(0.0, 1.0, num_lerps + 2)[1:]:
        pa = f"{stem}_ilbaked_{alpha}.obj"
        save_obj(pa, V0, F0, (1 - alpha) * C0 + alpha * baked)
        outs.append(pa)
    return outs


def bake_vertex_colors_to_texture(fpath: str, texture_size: int = 1024,
                                  patch_px: int | None = None) -> str:
    """Bake per-vertex colors into a texture with a per-face triangle atlas.

    Each triangle gets an axis-aligned right-triangle patch in a grid atlas;
    UVs point into the patch and colors are interpolated barycentrically with
    a 1px gutter.  Output: <stem>_textured.obj + .mtl + .png.
    (The reference shells out to headless Blender Cycles for this,
    bake_vertex_attribute_to_texture.py:24-52.)
    """
    import imageio.v2 as imageio

    V, F, C = load_obj(fpath)
    if C is None:
        raise ValueError("Mesh has no vertex colors to bake")
    nf = len(F)
    per_row = int(np.ceil(np.sqrt(nf)))
    patch = patch_px or max(4, texture_size // per_row)
    tex_size = per_row * patch
    tex = np.zeros((tex_size, tex_size, 3), np.float32)

    uvs = np.zeros((nf, 3, 2), np.float32)
    yy, xx = np.mgrid[0:patch, 0:patch]
    # barycentric coords of the right triangle (0,0), (1,0), (0,1) in patch
    u = (xx + 0.25) / patch
    v = (yy + 0.25) / patch
    inside = u + v <= 1.0 + 1.5 / patch  # gutter: fill slightly beyond edge
    w0 = np.clip(1 - u - v, 0, 1)[..., None]
    w1 = np.clip(u, 0, 1)[..., None]
    w2 = np.clip(v, 0, 1)[..., None]

    for i, tri in enumerate(F):
        r, c = divmod(i, per_row)
        y0, x0 = r * patch, c * patch
        c0, c1, c2 = C[tri[0]], C[tri[1]], C[tri[2]]
        colors = w0 * c0 + w1 * c1 + w2 * c2
        block = tex[y0:y0 + patch, x0:x0 + patch]
        block[inside] = colors[inside]
        # UVs (image y axis flipped for OBJ convention)
        base_u, base_v = x0 / tex_size, 1.0 - y0 / tex_size
        du = patch / tex_size
        uvs[i, 0] = (base_u, base_v)
        uvs[i, 1] = (base_u + du * (1 - 1.0 / patch), base_v)
        uvs[i, 2] = (base_u, base_v - du * (1 - 1.0 / patch))

    stem = os.path.splitext(fpath)[0]
    tex_path = f"{stem}_texture.png"
    imageio.imwrite(tex_path, (np.clip(tex, 0, 1) * 255).astype(np.uint8))

    mtl_path = f"{stem}_textured.mtl"
    with open(mtl_path, "w") as f:
        f.write("newmtl baked\nKa 1 1 1\nKd 1 1 1\n"
                f"map_Kd {os.path.basename(tex_path)}\n")

    obj_path = f"{stem}_textured.obj"
    with open(obj_path, "w") as f:
        f.write(f"mtllib {os.path.basename(mtl_path)}\nusemtl baked\n")
        for p in V:
            f.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        for i in range(nf):
            for k in range(3):
                f.write(f"vt {uvs[i, k, 0]:.6f} {uvs[i, k, 1]:.6f}\n")
        for i, tri in enumerate(F):
            a, b, c = tri + 1
            t = 3 * i + 1
            f.write(f"f {a}/{t} {b}/{t + 1} {c}/{t + 2}\n")
    return obj_path


def bake_with_blender(fpath: str, texture_size: int = 1024) -> str:
    """Headless-Blender Cycles bake when bpy is available (the reference
    path); raises ImportError otherwise."""
    import bpy  # noqa: F401

    raise NotImplementedError(
        "Blender bpy is not shipped in this image; use "
        "bake_vertex_colors_to_texture (per-face atlas) instead")


def main():
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("smooth")
    s.add_argument("mesh")
    s.add_argument("--iters", type=int, default=2)
    r = sub.add_parser("rebake")
    r.add_argument("-f0", "--base_color", required=True)
    r.add_argument("-f1", "--illumination", required=True)
    r.add_argument("-n", "--num_lerps", type=int, default=3)
    b = sub.add_parser("bake")
    b.add_argument("mesh")
    b.add_argument("--size", type=int, default=1024)
    args = p.parse_args()
    if args.cmd == "smooth":
        print(smooth_mesh(args.mesh, args.iters))
    elif args.cmd == "rebake":
        print(rebake_implicit_illumination(args.base_color,
                                           args.illumination, args.num_lerps))
    elif args.cmd == "bake":
        print(bake_vertex_colors_to_texture(args.mesh, args.size))


if __name__ == "__main__":
    main()
