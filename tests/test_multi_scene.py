"""Multi-scene batch training over a (scenes x rays) virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from ndjir_tpu.config import load_config
from ndjir_tpu.data.synthetic import make_synthetic_scene


def test_multi_scene_trains_and_shards(tmp_path):
    from ndjir_tpu.parallel.multi_scene import MultiSceneTrainer

    scenes = [make_synthetic_scene(str(tmp_path / f"s{i}"), n_views=2, H=24,
                                   W=24, seed=i) for i in range(2)]
    conf = load_config("tiny_test", overrides=[
        "parallel.mesh_shape=[2,4]",   # 2 scene groups x 4-way ray sharding
        "train.epoch=2",
        "valid.skip=true",
        f"monitor_base_path={tmp_path / 'mon'}",
    ])
    t = MultiSceneTrainer(conf, scenes)
    # params stacked with leading scene axis, sharded across 8 devices
    leaf = jax.tree_util.tree_leaves(t.params_s)[0]
    assert leaf.shape[0] == 2
    assert len(leaf.sharding.device_set) == 8

    mon0 = t.train(epochs=1)
    l0 = np.asarray(mon0["loss"]).copy()
    mon1 = t.train(epochs=2)
    l1 = np.asarray(mon1["loss"])
    assert l0.shape == (2,)
    assert np.all(np.isfinite(l1))
    assert np.all(np.asarray(mon1["grads_finite"]))
    # training progressed (loss moved; monotone decrease over 2 tiny epochs
    # is too noisy to assert — semantic equivalence to the single-scene step
    # is covered by test_multi_scene_matches_single_scene)
    assert not np.allclose(l0, l1)

    # per-scene params are independent (different scenes -> diverged)
    p0 = t.scene_params(0)
    p1 = t.scene_params(1)
    d = float(jnp.abs(p0["geometric-network"]["affine-00"]["W"]
                      - p1["geometric-network"]["affine-00"]["W"]).sum())
    assert d > 0


def test_multi_scene_matches_single_scene(tmp_path):
    """vmapped multi-scene step == independent single-scene steps."""
    from ndjir_tpu.models.fields import init_model
    from ndjir_tpu.parallel.multi_scene import multi_scene_train_step
    from ndjir_tpu.train.optim import init_optimizer
    from ndjir_tpu.train.trainer import train_step

    conf = load_config("tiny_test")
    S, B, R = 2, 2, 16
    keys = jax.random.split(jax.random.PRNGKey(0), S)
    params_list = [init_model(k, conf) for k in keys]
    opt_list = [init_optimizer(p) for p in params_list]
    stack = lambda trees: jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *trees)
    params_s = stack(params_list)
    opt_s = stack(opt_list)

    k = jax.random.PRNGKey(3)
    camloc = jnp.tile(jnp.asarray([[[0.0, 0.0, 2.5]]]), (S, B, 1))
    raydir = jax.random.normal(k, (S, B, R, 3)) - jnp.asarray([0.0, 0.0, 3.0])
    raydir = raydir / jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    color = jax.random.uniform(jax.random.PRNGKey(4), (S, B, R, 3))
    mask = jnp.ones((S, B, R, 1))

    args = (jnp.float32(0.5), jnp.float32(1.0), jnp.float32(1e-3),
            jnp.float32(1e-3), jnp.int32(0), conf)
    ps2, os2, mon2 = multi_scene_train_step(params_s, opt_s, camloc, raydir,
                                            color, mask, *args)

    for s in range(S):
        p1, o1, mon1 = train_step(params_list[s], opt_list[s], camloc[s],
                                  raydir[s], color[s], mask[s], *args)
        np.testing.assert_allclose(float(mon1["loss"]),
                                   float(mon2["loss"][s]), rtol=1e-5)
        w_multi = np.asarray(jax.tree_util.tree_map(
            lambda x: x[s], ps2)["geometric-network"]["affine-00"]["W"])
        w_single = np.asarray(p1["geometric-network"]["affine-00"]["W"])
        np.testing.assert_allclose(w_multi, w_single, atol=1e-5)


def test_multi_scene_trainer_e2e_resume_and_extract(tmp_path):
    """Production-parity path: train 2 scenes, write per-scene monitor
    series + combined checkpoint, resume from it in a fresh trainer, and
    extract both scenes' meshes via final validation."""
    import os

    from ndjir_tpu.parallel.multi_scene import MultiSceneTrainer

    scenes = [make_synthetic_scene(str(tmp_path / f"s{i}"), n_views=2, H=24,
                                   W=24, seed=i) for i in range(2)]
    overrides = [
        "parallel.mesh_shape=[2,4]",
        "train.epoch=3",
        "valid.epoch_interval=0",
        "valid.n_down_samples=3",
        "valid.n_rays=32",
        "extraction.grid_size=12",
        f"monitor_base_path={tmp_path / 'mon'}",
    ]
    conf = load_config("tiny_test", overrides=overrides)

    t = MultiSceneTrainer(conf, scenes)
    t.train(epochs=2)   # trains epochs 0..1, checkpoints each epoch

    # per-scene monitor dirs with per-iteration series
    for mp in t.monitor_paths:
        series = os.path.join(mp, "Training-loss.series.txt")
        assert os.path.exists(series)
        assert len(open(series).read().strip().splitlines()) >= 2
        assert os.path.exists(os.path.join(mp, "config.yaml"))
    ck = os.path.join(str(tmp_path / "mon") + "_multiscene", "checkpoints")
    assert any(f.endswith(".msgpack") for f in os.listdir(ck))

    w_before = np.asarray(jax.device_get(
        t.scene_params(1)["geometric-network"]["affine-00"]["W"]))

    # fresh trainer resumes from the combined checkpoint
    conf2 = load_config("tiny_test", overrides=overrides)
    t2 = MultiSceneTrainer(conf2, scenes)
    assert t2.start_epoch == 2
    w_resumed = np.asarray(jax.device_get(
        t2.scene_params(1)["geometric-network"]["affine-00"]["W"]))
    np.testing.assert_array_equal(w_resumed, w_before)

    # continue one epoch + final per-scene validation/extraction
    t2.train(epochs=3)
    for mp in t2.monitor_paths:
        assert os.path.exists(os.path.join(mp, "PSNR-3x3.series.txt"))
        objs = [f for f in os.listdir(mp) if f.endswith(".obj")]
        assert objs, f"no extracted mesh in {mp}"


def test_multi_scene_resume_refuses_scene_mismatch(tmp_path):
    """A same-count relaunch with a different scene list must refuse to
    resume (silently associating params to the wrong scenes is the failure
    mode; parallel/multi_scene.py:_maybe_resume)."""
    import pytest

    from ndjir_tpu.parallel.multi_scene import MultiSceneTrainer

    scenes = [make_synthetic_scene(str(tmp_path / f"s{i}"), n_views=2, H=24,
                                   W=24, seed=i) for i in range(2)]
    overrides = [
        "parallel.mesh_shape=[2,4]",
        "train.epoch=1",
        "valid.skip=true",
        f"monitor_base_path={tmp_path / 'mon'}",
    ]
    conf = load_config("tiny_test", overrides=overrides)
    t = MultiSceneTrainer(conf, scenes)
    t.train(epochs=1)   # writes the combined checkpoint + scene manifest

    # same count, different scene (renamed dir): must refuse
    other = make_synthetic_scene(str(tmp_path / "s_other"), n_views=2,
                                 H=24, W=24, seed=9)
    conf2 = load_config("tiny_test", overrides=overrides)
    with pytest.raises(ValueError, match="refusing to resume"):
        MultiSceneTrainer(conf2, [scenes[0], other])

    # identical list resumes fine
    conf3 = load_config("tiny_test", overrides=overrides)
    t3 = MultiSceneTrainer(conf3, scenes)
    assert t3.start_epoch == 1


def test_gather_for_save_multihost_path(tmp_path, monkeypatch):
    """In a multi-host run _gather_for_save must route the scene-sharded
    state through multihost_utils.process_allgather (tiled) and return ITS
    result — process 0 cannot device_get non-addressable shards directly
    (round-4 fix, parallel/multi_scene.py:_gather_for_save).  A real
    allgather needs >1 process, so the collective itself is replaced by a
    spy; the branch logic and call contract are what this pins."""
    from jax.experimental import multihost_utils

    from ndjir_tpu.parallel import multi_scene as ms

    scenes = [make_synthetic_scene(str(tmp_path / f"s{i}"), n_views=2, H=24,
                                   W=24, seed=i) for i in range(2)]
    conf = load_config("tiny_test", overrides=[
        "parallel.mesh_shape=[2,4]",
        "train.epoch=1",
        "valid.skip=true",
        f"monitor_base_path={tmp_path / 'mon'}",
    ])
    t = ms.MultiSceneTrainer(conf, scenes)
    ref = jax.device_get(t.params_s)

    # single-process: identity (device_get assembles addressable shards)
    out1 = t._gather_for_save(t.params_s)
    assert out1 is t.params_s

    calls = {}

    def fake_allgather(tree, tiled=False):
        calls["tiled"] = tiled
        return jax.device_get(tree)

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)
    gathered = t._gather_for_save(t.params_s)
    assert calls.get("tiled") is True
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(gathered)[0]),
        np.asarray(jax.tree_util.tree_leaves(ref)[0]))
