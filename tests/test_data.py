"""Camera decomposition, ray generation, dataset loader, sharding plan."""

import numpy as np
import pytest

from ndjir_tpu.config import load_config
from ndjir_tpu.data.cameras import (
    generate_all_pixels,
    generate_raydir_camloc,
    load_K_Rt_from_P,
)


def _random_camera(rng):
    K = np.array([[500.0, 0.2, 320.0], [0, 510.0, 240.0], [0, 0, 1.0]])
    # random rotation via QR
    A = rng.randn(3, 3)
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.randn(3) * 2 + np.array([0, 0, 4.0])
    P = K @ np.concatenate([Q, t[:, None]], axis=1)
    return K, Q, t, P


def test_load_K_Rt_round_trip(rng):
    for _ in range(5):
        K, R, t, P = _random_camera(rng)
        intrinsic, pose = load_K_Rt_from_P(P)
        np.testing.assert_allclose(intrinsic[:3, :3], K / K[2, 2], atol=1e-6)
        np.testing.assert_allclose(pose[:3, :3], R.T, atol=1e-5)
        center = -R.T @ t
        np.testing.assert_allclose(pose[:3, 3], center, atol=1e-4)


def test_load_K_Rt_matches_cv2(rng):
    """Direct parity with the reference's cv2.decomposeProjectionMatrix
    (reference: helper.py:27-41)."""
    cv2 = pytest.importorskip("cv2")
    for _ in range(5):
        _, _, _, P = _random_camera(rng)
        intrinsic, pose = load_K_Rt_from_P(P)
        out = cv2.decomposeProjectionMatrix(P)
        K_cv = out[0] / out[0][2, 2]
        R_cv = out[1]
        c_cv = (out[2][:3] / out[2][3])[:, 0]
        np.testing.assert_allclose(intrinsic[:3, :3], K_cv, atol=1e-5)
        np.testing.assert_allclose(pose[:3, :3], R_cv.T, atol=1e-5)
        np.testing.assert_allclose(pose[:3, 3], c_cv, atol=1e-4)


def test_raydir_camloc(rng):
    K, R, t, P = _random_camera(rng)
    intrinsic, pose = load_K_Rt_from_P(P)
    xy = np.array([[[320.0, 240.0], [0.0, 0.0], [640.0, 480.0]]])
    raydir, camloc = generate_raydir_camloc(
        pose[None], intrinsic[None, :3, :3], xy)
    np.testing.assert_allclose(np.linalg.norm(raydir, axis=-1), 1.0,
                               atol=1e-6)
    np.testing.assert_allclose(camloc[0], -R.T @ t, atol=1e-4)
    # principal-point ray ~ camera forward axis (3rd row of R)
    fwd = R[2]
    cos = raydir[0, 0] @ fwd
    assert cos > 0.999


def test_generate_all_pixels():
    xy = generate_all_pixels(3, 2)
    assert xy.shape == (6, 2)
    np.testing.assert_array_equal(xy[0], [0, 0])
    np.testing.assert_array_equal(xy[1], [1, 0])
    np.testing.assert_array_equal(xy[3], [0, 1])


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    from ndjir_tpu.data.synthetic import make_synthetic_scene

    return make_synthetic_scene(
        str(tmp_path_factory.mktemp("scene")), n_views=4, H=32, W=32)


def test_idr_dataset_modes(scene):
    from ndjir_tpu.data.dataset import IDRDataset

    conf = load_config("tiny_test", overrides=[f"data_path={scene}"])
    ds = IDRDataset(conf, train=True, shuffle=True)
    assert ds.size == 4 and ds.H == 32 and ds.W == 32
    R = conf.train.n_rays
    color, mask, intrinsic, pose, xy = ds.next_batch(2)
    assert color.shape == (2, R, 3) and mask.shape == (2, R, 1)
    assert intrinsic.shape == (2, 3, 3) and pose.shape == (2, 4, 4)
    assert xy.shape == (2, R, 2)
    assert color.min() >= 0 and color.max() <= 1

    # synthetic sphere sits inside the unit sphere: camera rays through
    # mask-on pixels must hit the unit AABB
    from ndjir_tpu.data.cameras import generate_raydir_camloc
    from ndjir_tpu.ops.intersect import ray_aabb_intersection
    raydir, camloc = generate_raydir_camloc(pose, intrinsic, xy)
    tn, tf, nh = ray_aabb_intersection(camloc, raydir, [-1] * 3, [1] * 3)
    hit = np.asarray(nh)[..., 0] >= 2
    on_mask = mask[..., 0] > 0.5
    assert hit[on_mask].mean() > 0.99

    # patch mode: contiguous patch of n_rays pixels
    conf_p = load_config("tiny_test", overrides=[
        f"data_path={scene}", "train.patch_ray_sampling=true"])
    dsp = IDRDataset(conf_p, train=True)
    _, _, _, _, xyp = dsp.next_batch(1)
    assert xyp.shape[1] == conf_p.train.n_rays
    w = np.unique(xyp[0, :, 0]).size
    h = np.unique(xyp[0, :, 1]).size
    assert w * h == conf_p.train.n_rays

    # mask-ratio mode: requested fraction lands on the object mask
    conf_m = load_config("tiny_test", overrides=[
        f"data_path={scene}", "train.mask_ray_sample_ratio=0.5"])
    dsm = IDRDataset(conf_m, train=True)
    _, mm, _, _, _ = dsm.next_batch(1)
    frac = float((mm[0, :, 0] > 0.5).mean())
    assert 0.3 < frac < 0.9


def test_sharding_plan_trivial_and_8dev(scene):
    import jax

    from ndjir_tpu.parallel.mesh import ShardingPlan

    conf = load_config("tiny_test")
    plan = ShardingPlan(conf)
    assert plan.is_trivial

    conf8 = load_config("tiny_test", overrides=["parallel.mesh_shape=[2,4]"])
    plan8 = ShardingPlan(conf8)
    assert plan8.mesh.shape == {"data": 2, "rays": 4}
    x = np.zeros((4, 32, 3), np.float32)
    xs = jax.device_put(x, plan8.batch_sharding(3))
    assert len(xs.sharding.device_set) == 8


def test_sharded_loss_matches_unsharded(scene):
    """Loss on a (2, 4) mesh must equal the single-device loss bitwise-ish."""
    import jax
    import jax.numpy as jnp

    from ndjir_tpu.models.fields import init_model
    from ndjir_tpu.parallel.mesh import ShardingPlan
    from ndjir_tpu.render.loss import total_loss

    conf = load_config("tiny_test")
    params = init_model(jax.random.PRNGKey(0), conf)
    B, R = 2, 32
    k = jax.random.PRNGKey(5)
    camloc = jnp.tile(jnp.asarray([[0.0, 0.0, 2.5]]), (B, 1))
    raydir = jax.random.normal(k, (B, R, 3)) - jnp.asarray([0.0, 0.0, 3.0])
    raydir = raydir / jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    color = jax.random.uniform(jax.random.PRNGKey(2), (B, R, 3))
    maskb = jnp.ones((B, R, 1))

    def lossfn(p, c, r, g, m):
        return total_loss(p, c, r, g, m, 0.5, 1.0, conf)[0]

    l_single = float(jax.jit(lossfn)(params, camloc, raydir, color, maskb))

    conf8 = load_config("tiny_test", overrides=["parallel.mesh_shape=[2,4]"])
    plan = ShardingPlan(conf8)
    p8 = plan.replicate(params)
    c8, r8, g8, m8 = plan.shard_batch(np.asarray(camloc), np.asarray(raydir),
                                      np.asarray(color), np.asarray(maskb))
    l_sharded = float(jax.jit(lossfn)(p8, c8, r8, g8, m8))
    np.testing.assert_allclose(l_sharded, l_single, rtol=2e-5)
