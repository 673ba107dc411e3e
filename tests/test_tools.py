"""Pre/post tooling: COLMAP conversion, normalization, mesh post, viewers."""

import os

import numpy as np
import pytest

from ndjir_tpu.extract.native import marching_cubes
from ndjir_tpu.utils.mesh_io import load_obj, save_obj


@pytest.fixture(scope="module")
def sphere_mesh(tmp_path_factory):
    G = 32
    lin = np.linspace(-1, 1, G).astype(np.float32)
    X, Y, Z = np.meshgrid(lin, lin, lin, indexing="ij")
    vol = np.sqrt(X ** 2 + Y ** 2 + Z ** 2) - 0.5
    verts, tris = marching_cubes(vol, 0.0)
    w = (verts * 2 / (G - 1) - 1).astype(np.float32)
    colors = (w * 0.5 + 0.5).astype(np.float32)
    p = str(tmp_path_factory.mktemp("mesh") / "sphere.obj")
    save_obj(p, w, tris, colors)
    return p


def test_colmap_conversion_roundtrip(tmp_path, rng):
    """world_mat from COLMAP quats/trans must decompose back to the same
    camera center and orientation via load_K_Rt_from_P."""
    from ndjir_tpu.data.cameras import load_K_Rt_from_P
    from ndjir_tpu.tools.colmap import convert_colmap_to_npz, qvec2rotmat

    sp = tmp_path / "sparse" / "0"
    sp.mkdir(parents=True)
    (tmp_path / "image").mkdir()
    (tmp_path / "mask").mkdir()

    with open(sp / "cameras.txt", "w") as f:
        f.write("# comment\n1 PINHOLE 640 480 500 510 320 240\n")
    # two views with random unit quats
    quats, centers = [], []
    with open(sp / "images.txt", "w") as f:
        for i in range(2):
            q = rng.randn(4)
            q /= np.linalg.norm(q)
            R = qvec2rotmat(q)
            center = rng.randn(3) + np.array([0, 0, 4.0])
            t = -R @ center
            f.write(f"{i + 1} {q[0]} {q[1]} {q[2]} {q[3]} "
                    f"{t[0]} {t[1]} {t[2]} 1 im{i:03d}.png\n")
            f.write("0.0 0.0 -1\n")
            quats.append(R)
            centers.append(center)

    params = convert_colmap_to_npz(str(tmp_path), remove_dropped=False)
    for i in range(2):
        P = params[f"world_mat_{i}"][:3, :4]
        _, pose = load_K_Rt_from_P(P)
        np.testing.assert_allclose(pose[:3, 3], centers[i], atol=1e-4)
        np.testing.assert_allclose(pose[:3, :3], quats[i].T, atol=1e-5)


def test_normalize_cameras_recovers_offset_sphere(tmp_path):
    """Visual-hull normalization on a synthetic scene whose object is
    off-center must place scale_mat translation near the true center."""
    from ndjir_tpu.data.synthetic import make_synthetic_scene
    from ndjir_tpu.tools.normalize_cameras import normalize_cameras

    scene = make_synthetic_scene(str(tmp_path / "s"), n_views=8, H=48, W=48,
                                 radius=0.5)
    out = normalize_cameras(scene, grid_scale=2.0)
    cams = np.load(out)
    S = cams["scale_mat_0"]
    np.testing.assert_allclose(S[:3, 3], 0.0, atol=0.15)   # centered object
    assert 0.5 < S[0, 0] < 3.0                              # sane radius


def test_smooth_and_rebake_and_bake(sphere_mesh, tmp_path):
    from ndjir_tpu.tools.mesh_post import (
        bake_vertex_colors_to_texture,
        rebake_implicit_illumination,
        smooth_mesh,
    )

    sm = smooth_mesh(sphere_mesh, iterations=2)
    V0, _, _ = load_obj(sphere_mesh)
    V1, _, _ = load_obj(sm)
    assert V0.shape == V1.shape
    # smoothing a sphere keeps it a (slightly shrunken) sphere
    r1 = np.linalg.norm(V1, axis=1)
    assert r1.std() < 0.02
    assert 0.3 < r1.mean() < 0.5

    outs = rebake_implicit_illumination(sphere_mesh, sphere_mesh, num_lerps=1)
    assert all(os.path.exists(p) for p in outs)
    _, _, C0 = load_obj(sphere_mesh)
    _, _, Cb = load_obj(outs[0])
    np.testing.assert_allclose(Cb, C0 * C0[:, 2:3], atol=2e-2)

    obj = bake_vertex_colors_to_texture(sphere_mesh, texture_size=256)
    assert os.path.exists(obj)
    assert os.path.exists(obj.replace("_textured.obj", "_texture.png"))
    with open(obj) as f:
        content = f.read()
    assert "vt " in content and "mtllib" in content


def test_viewers(sphere_mesh, tmp_path):
    from ndjir_tpu.data.synthetic import make_synthetic_scene
    from ndjir_tpu.tools.viewers import attribute_histogram, show_cameras, view_mesh

    png = view_mesh(sphere_mesh)
    assert os.path.exists(png)
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(png))
    assert img.shape[0] >= 256 and img.std() > 1.0  # actually drew something

    scene = make_synthetic_scene(str(tmp_path / "s"), n_views=4, H=24, W=24)
    pose_png = show_cameras(os.path.join(scene, "cameras.npz"))
    assert os.path.exists(pose_png)

    hist = attribute_histogram([sphere_mesh], str(tmp_path / "h.png"))
    assert os.path.exists(hist)


def test_apply_mask(tmp_path, rng):
    import imageio.v2 as imageio

    from ndjir_tpu.tools.images import apply_mask_to_images

    (tmp_path / "img").mkdir()
    (tmp_path / "msk").mkdir()
    im = (rng.uniform(0, 255, (16, 16, 3))).astype(np.uint8)
    mk = np.zeros((16, 16), np.uint8)
    mk[4:12, 4:12] = 255
    imageio.imwrite(str(tmp_path / "img" / "0.png"), im)
    imageio.imwrite(str(tmp_path / "msk" / "0.png"), mk)
    apply_mask_to_images(str(tmp_path / "img"), str(tmp_path / "msk"),
                         str(tmp_path / "out"))
    out = np.asarray(imageio.imread(str(tmp_path / "out" / "0.png")))
    assert out[0, 0].sum() == 0
    assert (out[8, 8] == im[8, 8]).all()


def test_camera_renders_gif_and_json(sphere_mesh, tmp_path):
    import json

    from ndjir_tpu.data.synthetic import make_synthetic_scene
    from ndjir_tpu.tools.viewers import (
        export_cameras_json,
        frames_to_gif,
        render_with_camera_params,
        turntable,
    )

    scene = make_synthetic_scene(str(tmp_path / "s"), n_views=3, H=24, W=24)
    npz = os.path.join(scene, "cameras.npz")
    outs = render_with_camera_params(sphere_mesh, npz, indices=[0, 1])
    assert len(outs) == 2 and all(os.path.exists(p) for p in outs)

    frames = turntable(sphere_mesh, n_views=4, res=128)
    gif = frames_to_gif(frames, fps=10)
    assert os.path.exists(gif) and os.path.getsize(gif) > 0

    j = export_cameras_json(npz)
    data = json.load(open(j))
    assert len(data) == 3 and "K" in data[0] and "center" in data[0]


def test_largest_component_by_area():
    import numpy as np

    from ndjir_tpu.extract.mc import largest_component_meshes
    from ndjir_tpu.extract.native import marching_cubes

    G = 36
    lin = np.linspace(-1, 1, G).astype(np.float32)
    X, Y, Z = np.meshgrid(lin, lin, lin, indexing="ij")
    # big + small sphere
    vol = np.minimum(np.sqrt((X - 0.4) ** 2 + Y ** 2 + Z ** 2) - 0.35,
                     np.sqrt((X + 0.55) ** 2 + Y ** 2 + Z ** 2) - 0.15)
    verts, tris = marching_cubes(vol, 0.0)
    comps = largest_component_meshes(verts, tris, top_k=2)
    assert len(comps) == 2
    # first component is the larger-area sphere
    assert len(comps[0][1]) > len(comps[1][1])
