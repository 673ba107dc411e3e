"""End-to-end render + training tests on the tiny config (CPU)."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndjir_tpu.config import load_config
from ndjir_tpu.models.fields import init_model
from ndjir_tpu.render.loss import total_loss
from ndjir_tpu.render.renderer import make_mc_cdfs, pb_render
from ndjir_tpu.render.sampler import sample_points


@pytest.fixture(scope="module")
def conf():
    return load_config("tiny_test")


@pytest.fixture(scope="module")
def params(conf):
    return init_model(jax.random.PRNGKey(0), conf)


@pytest.fixture(scope="module")
def batch(conf):
    B, R = 2, 16
    k = jax.random.PRNGKey(7)
    camloc = jnp.tile(jnp.asarray([[0.0, 0.0, 2.5]]), (B, 1))
    raydir = jax.random.normal(k, (B, R, 3)) - jnp.asarray([0.0, 0.0, 3.0])
    raydir = raydir / jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    return camloc, raydir


def test_sampler_shapes_and_monotone(conf, params, batch):
    camloc, raydir = batch
    B, R, _ = raydir.shape
    r = conf.renderer
    N = r.n_samples0 + r.n_samples1 * r.n_upsamples
    cdfs = make_mc_cdfs(conf, B, R)
    x_fg, t_fg, x_bg, t_bg, mask = sample_points(
        params, camloc, raydir, cdfs["stratified"], cdfs["background"], conf)
    assert x_fg.shape == (B, R, N, 3)
    assert t_fg.shape == (B, R, N + 1, 1)
    assert x_bg.shape == (B, R, r.n_bg_samples, 4)
    assert t_bg.shape == (B, R, r.n_bg_samples + 1, 1)
    assert mask.shape == (B, R, 1, 1)
    # t monotone nondecreasing along the sample axis
    dt = np.diff(np.asarray(t_fg)[..., 0], axis=2)
    assert np.all(dt >= -1e-6)
    dtb = np.diff(np.asarray(t_bg)[..., 0], axis=2)
    assert np.all(dtb >= -1e-6)
    # fg samples of hit rays stay inside the AABB
    hit = np.asarray(mask)[..., 0, 0] > 0
    inside = np.all(np.abs(np.asarray(x_fg)) <= r.bounding_sphere_radius + 1e-4,
                    axis=-1)
    assert np.all(inside[hit])
    # bg 4D reparam: first three channels unit-sphere direction * (norm<=1)
    nrm = np.linalg.norm(np.asarray(x_bg)[..., :3], axis=-1)
    np.testing.assert_allclose(nrm, 1.0, atol=1e-4)
    assert np.all(np.asarray(x_bg)[..., 3] > 0)


def test_sampler_concentrates_near_surface(conf, params, batch):
    """Hierarchical upsampling must put more samples near the SDF zero set
    than the stratified init does (NeuS invariant)."""
    from ndjir_tpu.models.fields import geometric_apply
    from ndjir_tpu.render.sampler import (
        sample_importance,
        sample_stratified,
        t_near_far,
    )

    camloc, _ = batch
    B, R = camloc.shape[0], 8
    # rays aimed at the initial SAL sphere (radius 0.35) so every ray has a
    # zero crossing for the upsampler to find
    k = jax.random.PRNGKey(11)
    raydir = -camloc[:, None, :] + 0.12 * jax.random.normal(k, (B, R, 3))
    raydir = raydir / jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    cdfs = make_mc_cdfs(conf, B, R)
    t_near, t_far, hit = t_near_far(camloc, raydir, conf)
    t0 = sample_stratified(t_near, t_far, cdfs["stratified"],
                           conf.renderer.n_samples0)
    t1 = sample_importance(params, conf, camloc, raydir, t_near, t_far, t0)

    def mean_abs_sdf(t):
        x = camloc.reshape(B, 1, 1, 3) + t * raydir.reshape(B, R, 1, 3)
        sdf = np.asarray(geometric_apply(
            params["geometric-network"], x, conf)[0])[..., 0]
        return np.abs(sdf).mean(axis=-1)  # per-ray

    hit_np = np.asarray(hit)[..., 0] > 0
    assert hit_np.any()
    m_strat = mean_abs_sdf(t0)[hit_np]
    # the NEW samples are the multiset difference final \ stratified: since
    # both are sorted, recover them by masking out one match per t0 value
    t1n, t0n = np.asarray(t1)[..., 0], np.asarray(t0)[..., 0]
    new_t = np.empty((B, R, t1n.shape[-1] - t0n.shape[-1]))
    for b in range(B):
        for r in range(R):
            remaining = list(t0n[b, r])
            news = []
            for v in t1n[b, r]:
                if remaining and np.isclose(v, remaining[0], atol=0):
                    remaining.pop(0)
                else:
                    news.append(v)
            new_t[b, r] = np.asarray(news)
    m_new = mean_abs_sdf(jnp.asarray(new_t[..., None],
                                     jnp.float32))[hit_np]
    # upsampled placements must be strictly closer to the zero set on
    # average than the stratified span, on every hit ray batch
    assert (m_new < m_strat).mean() > 0.8, (m_new.mean(), m_strat.mean())
    assert m_new.mean() < 0.6 * m_strat.mean()


def test_pb_render_outputs(conf, params, batch):
    camloc, raydir = batch
    B, R, _ = raydir.shape
    cdfs = make_mc_cdfs(conf, B, R)
    x_fg, t_fg, x_bg, t_bg, mask = sample_points(
        params, camloc, raydir, cdfs["stratified"], cdfs["background"], conf)
    res = pb_render(params, x_fg, t_fg, x_bg, t_bg, camloc, raydir, mask,
                    1.0, 1.0, cdfs, conf)
    assert res["color_pixel"].shape == (B, R, 3)
    assert np.all(np.isfinite(np.asarray(res["color_pixel"])))
    assert np.all(np.asarray(res["alpha_fg"]) >= 0)
    assert np.all(np.asarray(res["alpha_fg"]) <= 1)
    # transmittance decreasing
    tr = np.asarray(res["trans_fg"])[..., 0]
    assert np.all(np.diff(tr, axis=2) <= 1e-6)
    # normals ~unit
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(res["normal_pixel"]), axis=-1), 1.0,
        atol=1e-3)


def test_loss_all_terms_and_grads(conf, params, batch):
    camloc, raydir = batch
    B, R, _ = raydir.shape
    color_gt = jax.random.uniform(jax.random.PRNGKey(1), (B, R, 3))
    obj_mask = jnp.ones((B, R, 1))
    conf_m = load_config("tiny_test", overrides=["train.mask_weight=0.1"])

    def lossfn(p):
        return total_loss(p, camloc, raydir, color_gt, obj_mask, 0.5, 1.0,
                          conf_m)
    (loss, mon), grads = jax.value_and_grad(lossfn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    for k in ["loss_rgb", "loss_eikonal", "loss_tv", "loss_mask",
              "prior_base_color", "prior_roughness",
              "prior_specular_reflectance"]:
        assert np.isfinite(float(mon[k])), k
        assert float(mon[k]) != 0.0, k
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    # every network receives gradient
    for net in params:
        net_leaves = jax.tree_util.tree_leaves(grads[net])
        assert any(float(jnp.abs(g).sum()) > 0 for g in net_leaves), net


def test_train_step_reduces_loss(conf, batch):
    from ndjir_tpu.train.optim import init_optimizer
    from ndjir_tpu.train.trainer import train_step

    params = init_model(jax.random.PRNGKey(0), conf)
    opt_state = init_optimizer(params)
    camloc, raydir = batch
    B, R, _ = raydir.shape
    color_gt = jnp.full((B, R, 3), 0.4)
    obj_mask = jnp.ones((B, R, 1))
    args = (jnp.float32(0.0), jnp.float32(1.0), jnp.float32(3e-3),
            jnp.float32(3e-3))
    losses = []
    for i in range(8):
        params, opt_state, mon = train_step(
            params, opt_state, camloc, raydir, color_gt, obj_mask, *args,
            jnp.int32(i), conf)
        losses.append(float(mon["loss"]))
        assert bool(mon["grads_finite"])
    assert losses[-1] < losses[0], losses


def test_trainer_end_to_end_with_resume(tmp_path):
    from ndjir_tpu.data.synthetic import make_synthetic_scene
    from ndjir_tpu.train.trainer import Trainer

    scene = make_synthetic_scene(str(tmp_path / "scene"), n_views=3, H=24,
                                 W=24)
    conf = load_config("tiny_test", overrides=[
        f"data_path={scene}", f"monitor_base_path={tmp_path}/mon",
        "valid.skip=true"])
    t = Trainer(conf)
    t.train()
    assert os.path.exists(str(tmp_path / "mon_scene" / "config.yaml"))
    assert os.path.exists(
        str(tmp_path / "mon_scene" / "Training-loss.series.txt"))
    # resume picks up after the final checkpoint
    t2 = Trainer(conf)
    assert t2.start_epoch == conf.train.epoch


def test_fresh_seeds_mode(conf, params, batch):
    """fixed_graph_seeds=false folds the step into every CDF draw."""
    conf_fresh = load_config("tiny_test",
                             overrides=["renderer.fixed_graph_seeds=false"])
    c0 = make_mc_cdfs(conf_fresh, 2, 4, step=jnp.int32(0))
    c1 = make_mc_cdfs(conf_fresh, 2, 4, step=jnp.int32(1))
    assert not np.allclose(np.asarray(c0["stratified"]),
                           np.asarray(c1["stratified"]))
    cfix0 = make_mc_cdfs(conf, 2, 4, step=jnp.int32(0))
    cfix1 = make_mc_cdfs(conf, 2, 4, step=jnp.int32(1))
    np.testing.assert_array_equal(np.asarray(cfix0["stratified"]),
                                  np.asarray(cfix1["stratified"]))


def test_config_nested_assignment_sticks():
    """Nested Config views must write through to the underlying tree (the
    trainer patches conf.valid.dtumvs.mesh_path before Chamfer)."""
    conf = load_config("tiny_test")
    conf.valid.dtumvs.mesh_path = "/some/mesh.obj"
    assert conf.valid.dtumvs.mesh_path == "/some/mesh.obj"
    conf["train"]["n_rays"] = 99
    assert conf.train.n_rays == 99


def test_stochastic_upsampling_mode(conf, params, batch):
    """renderer.deterministic=false draws per-round uniforms from the CDFs."""
    conf_s = load_config("tiny_test", overrides=["renderer.deterministic=false"])
    camloc, raydir = batch
    B, R, _ = raydir.shape
    cdfs = make_mc_cdfs(conf_s, B, R)
    assert len(cdfs["upsample"]) == conf_s.renderer.n_upsamples
    x_fg, t_fg, *_ = sample_points(
        params, camloc, raydir, cdfs["stratified"], cdfs["background"],
        conf_s, rand_u=cdfs["upsample"])
    assert np.isfinite(np.asarray(x_fg)).all()
    dt = np.diff(np.asarray(t_fg)[..., 0], axis=2)
    assert np.all(dt >= -1e-6)
    # missing uniforms raise a clear error instead of a NoneType crash
    with pytest.raises(ValueError, match="deterministic"):
        sample_points(params, camloc, raydir, cdfs["stratified"],
                      cdfs["background"], conf_s)


def test_adjacent_skip_layer_config():
    """skip_layers=[1] (adjacent to layer 0) must be well-shaped (the
    reference's first/skip branches never concat)."""
    conf_s = load_config("tiny_test", overrides=[
        "geometric_network.skip_layers=[1]",
        "geometric_network.feature_size=64"])
    p = init_model(jax.random.PRNGKey(0), conf_s)
    from ndjir_tpu.models.fields import geometric_apply
    x = jax.random.uniform(jax.random.PRNGKey(1), (5, 3), minval=-1, maxval=1)
    sdf, feat, gain = geometric_apply(p["geometric-network"], x, conf_s)
    assert sdf.shape == (5, 1) and np.isfinite(np.asarray(sdf)).all()


def test_render_image_golden(conf, params):
    """Fixed-params golden render: catches any unintended numerical drift in
    the full sample->render->composite chain (VERDICT round-1 task 7).

    Regenerate the fixture (only after verifying the change is intended):
    see tests/fixtures/golden_render.npy provenance in git history.
    """
    from ndjir_tpu.render.image import render_image

    H = W = 24
    f = 1.2 * W
    intrinsic = np.array([[[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]]],
                         np.float32)
    pose = np.eye(4, dtype=np.float32)[None]
    pose[0, :3, 3] = [0.0, 0.0, 2.5]
    pose[0, :3, :3] = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]],
                               np.float32)
    img = render_image(params, pose, intrinsic, (W, H), conf, lv_gain=1.0)
    arr = np.clip(np.asarray(img)[0].transpose(1, 2, 0), 0, 1)
    golden = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                                  "golden_render.npy"))
    assert arr.shape == golden.shape
    # perceptual-scale tolerance: mean within 1/255, worst pixel within 8/255
    assert np.abs(arr - golden).mean() < 1.0 / 255
    assert np.abs(arr - golden).max() < 8.0 / 255


def test_render_chunk_conf_is_canonical(conf, params):
    """Editing config fields the chunk program never reads (validation
    downsampling, extraction grid, monitor paths) must NOT recompile the
    jitted render chunk — recompiles are multi-minute stalls on the real
    chip (VERDICT r2 weak item 7)."""
    from ndjir_tpu.config import Config
    from ndjir_tpu.render.image import _canonical_chunk_conf, render_image

    base = _canonical_chunk_conf(conf)
    for field, value in [
        (("valid", "n_down_samples"), 0),
        (("valid", "epoch_interval"), 7),
        (("extraction", "grid_size"), 99),
        (("monitor_base_path",), "/somewhere/else"),
        (("data_path",), "/other/scene"),
        (("train", "epoch"), 12345),
        (("train", "checkpoint_interval_epochs"), 9),
    ]:
        data = conf.to_dict()
        node = data
        for k in field[:-1]:
            node = node.setdefault(k, {})
        node[field[-1]] = value
        assert _canonical_chunk_conf(Config(data)) == base, field
        assert hash(_canonical_chunk_conf(Config(data))) == hash(base), field

    # fields the chunk DOES read must still key the cache
    data = conf.to_dict()
    data["renderer"]["n_thetas"] = int(data["renderer"]["n_thetas"]) + 1
    assert _canonical_chunk_conf(Config(data)) != base

    # end-to-end: two renders differing only in unread fields share one
    # compiled chunk (W large enough that the chunk size P is not clamped
    # by the image at either downsampling level -> identical chunk shapes)
    H = W = 48
    f = 1.2 * W
    intrinsic = np.array([[[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]]],
                         np.float32)
    pose = np.eye(4, dtype=np.float32)[None]
    pose[0, :3, 3] = [0.0, 0.0, 2.5]
    pose[0, :3, :3] = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]],
                               np.float32)
    from ndjir_tpu.render.image import _render_chunk
    render_image(params, pose, intrinsic, (W, H), conf, lv_gain=1.0)
    n0 = _render_chunk._cache_size()
    data = conf.to_dict()
    data["valid"]["n_down_samples"] = 0
    data["extraction"] = {"grid_size": 5}
    render_image(params, pose, intrinsic, (W, H), Config(data), lv_gain=1.0)
    assert _render_chunk._cache_size() == n0
