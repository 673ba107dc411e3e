"""The v2 quality-benchmark scene's GT image formation must match the
framework's own estimators (VERDICT r4 item 5).

The v2 scene (ndjir_tpu/data/synthetic.py:make_hard_synthetic_scene_v2)
claims its GT shading is the CONVERGED value of the framework's forward
family: uniform-in-cos-theta diffuse MC (ops/directions.py:63-77) and
GGX-importance Filament specular (ops/directions.py:80-97 +
models/brdf.py:42-82).  These tests check that claim numerically — same
points, same environment light, same soft-shadow visibility, estimators
evaluated through the FRAMEWORK ops on one side and through the scene
generator's numpy on the other — plus scene-generation determinism.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndjir_tpu.data import synthetic as syn


def _surface_points(n, seed=3):
    """Points on the blobby surface with analytic normals and views."""
    rng = np.random.RandomState(seed)
    d = rng.normal(size=(n * 4, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # project radially onto the zero level set by bisection along the ray
    lo = np.zeros(len(d))
    hi = np.full(len(d), 0.6)
    for _ in range(40):
        mid = 0.5 * (lo + hi)
        s = syn._blobby_sdf(mid[:, None] * d)
        lo = np.where(s < 0, mid, lo)
        hi = np.where(s < 0, hi, mid)
    x = (0.5 * (lo + hi))[:, None] * d
    ok = np.abs(syn._blobby_sdf(x)) < 1e-3
    x = x[ok]
    n_ = syn._blobby_normal(x)
    eye = np.array([1.3, -0.9, 1.1])
    view = eye[None, :] - x
    view /= np.linalg.norm(view, axis=-1, keepdims=True)
    # keep front-facing points (the renderer only shades those)
    front = np.sum(view * n_, axis=-1) > 0.15
    return (x[front][:n].astype(np.float32), n_[front][:n].astype(np.float32),
            view[front][:n].astype(np.float32))


def test_tangent_frame_matches_framework():
    from ndjir_tpu.ops.directions import _tangent_frame

    rng = np.random.RandomState(0)
    n = rng.normal(size=(64, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    # avoid the +-z degenerate branch (guarded differently on both sides)
    n = n[np.abs(n[:, 2]) < 0.98]
    xa_np, ya_np, za_np = syn._tangent_frame_np(n)
    xa_j, ya_j, za_j = _tangent_frame(jnp.asarray(n, jnp.float32), 0.0)
    np.testing.assert_allclose(xa_np, np.asarray(xa_j), atol=2e-6)
    np.testing.assert_allclose(ya_np, np.asarray(ya_j), atol=2e-6)
    np.testing.assert_allclose(za_np, np.asarray(za_j), atol=2e-6)


def test_shade_v2_matches_framework_estimators():
    """_shade_v2 == albedo * diffuse + specular with both terms computed by
    the FRAMEWORK's sampling + BRDF ops at matched sample counts."""
    from ndjir_tpu.config import load_config
    from ndjir_tpu.models.brdf import filament_specular_brdf
    from ndjir_tpu.ops.directions import (
        sample_importance_directions,
        sample_uniform_directions,
    )

    x, nrm, view = _surface_points(48)
    P = x.shape[0]
    assert P >= 24
    # The renderer draws (n_thetas x n_phis) outer-product grids per pixel
    # (ops/directions.py:_outer_grid); with random CDF banks that is an
    # unbiased MC of the same integral.  T*F samples vs the GT's N.
    T, F = 64, 48
    N = T * F

    # GT side (the scene generator's own estimator)
    gt = syn._shade_v2(x, nrm, view, np.random.RandomState(7),
                       n_diffuse=N, n_spec=N)

    conf = load_config("default")
    assert conf.specular_brdf.model == "filament"
    assert conf.specular_brdf.sampling == "importance"

    # framework side: (B=1, R=P) layout the render ops expect
    rng = np.random.RandomState(99)   # independent seed: both are MC
    nrm_j = jnp.asarray(nrm)[None]
    view_j = jnp.asarray(view)[None]

    # diffuse: uniform-in-cos-theta dirs through ops/directions.py
    cdf_the = jnp.asarray(rng.rand(1, P, T), jnp.float32)
    cdf_phi = jnp.asarray(rng.rand(1, P, F), jnp.float32)
    wd = sample_uniform_directions(nrm_j, cdf_the, cdf_phi)
    wd = np.asarray(wd[0])                                   # (P, N, 3)
    cos_d = np.maximum(np.sum(nrm[:, None, :] * wd, axis=-1), 1e-8)
    vis_d = syn._soft_shadow_dirs(x, wd)
    diffuse = np.mean(syn._env_light(wd) * vis_d * cos_d, axis=-1)

    # specular: GGX importance dirs + Filament BRDF through the model ops
    rough = jnp.full((1, P, 1), 0.3, jnp.float32)
    f0 = jnp.full((1, P, conf.specular_reflectance_network.channels), 0.04,
                  jnp.float32)
    cdf_the = jnp.asarray(rng.rand(1, P, T), jnp.float32)
    ws = sample_importance_directions(nrm_j, cdf_the,
                                      jnp.asarray(rng.rand(1, P, F),
                                                  jnp.float32), rough)
    sbrdf, nol = filament_specular_brdf(nrm_j, view_j, ws, rough, f0, conf)
    ws_np = np.asarray(ws[0])
    vis_s = syn._soft_shadow_dirs(x, ws_np)
    spec = np.mean(np.asarray(sbrdf[0])[..., 0] * syn._env_light(ws_np)
                   * vis_s * np.asarray(nol[0])[..., 0], axis=-1)

    albedo = syn._albedo_texture(x)
    ours = np.clip(albedo * diffuse[:, None] + spec[:, None], 0.0, 1.0)

    # Both sides are N-sample MC of the same integrals: agree to MC noise.
    err = np.abs(ours - gt)
    assert float(np.median(err)) < 0.02, float(np.median(err))
    assert float(np.mean(err)) < 0.035, float(np.mean(err))
    assert float(np.max(err)) < 0.25, float(np.max(err))


def test_scene_generation_deterministic(tmp_path):
    a = syn.make_hard_synthetic_scene_v2(str(tmp_path / "a"), n_views=2,
                                         H=24, W=24)
    b = syn.make_hard_synthetic_scene_v2(str(tmp_path / "b"), n_views=2,
                                         H=24, W=24)
    for rel in ("image/000000.png", "image/000001.png", "mask/000000.png"):
        with open(os.path.join(a, rel), "rb") as fa, \
                open(os.path.join(b, rel), "rb") as fb:
            assert fa.read() == fb.read(), rel
    ca = np.load(os.path.join(a, "cameras.npz"))
    cb = np.load(os.path.join(b, "cameras.npz"))
    for k in ca.files:
        np.testing.assert_array_equal(ca[k], cb[k])
    sa = np.load(os.path.join(a, "gt_sdf.npz"))["sdf"]
    sb = np.load(os.path.join(b, "gt_sdf.npz"))["sdf"]
    np.testing.assert_array_equal(sa, sb)


def test_env_light_representable_range():
    """The env radiance must stay inside what the env-light net can emit
    (act_last softplus >= 0) and vary smoothly (PE band-6 representable)."""
    rng = np.random.RandomState(1)
    d = rng.normal(size=(4096, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    L = syn._env_light(d)
    assert np.all(L >= 0.0)
    assert np.all(np.isfinite(L))
    # broad lobes: nearby directions have nearby radiance
    d2 = d + 0.01 * rng.normal(size=d.shape)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    assert float(np.max(np.abs(syn._env_light(d2) - L))) < 0.35
