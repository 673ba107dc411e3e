"""Device-count invariance of the FULL train step (VERDICT round-1 task 4).

Round 1 proved sharded forward == unsharded forward; this extends the proof
through gradients, the ICI all-reduce XLA inserts from the sharding
annotations, and the dual-Adam update: the parameters after one train_step
must be identical between mesh [1,1] and mesh [2,4] on the 8-device virtual
CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndjir_tpu.config import load_config
from ndjir_tpu.models.fields import init_model
from ndjir_tpu.parallel.mesh import ShardingPlan
from ndjir_tpu.train.optim import init_optimizer
from ndjir_tpu.train.trainer import train_step


def _run(mesh_shape):
    conf = load_config("tiny_test", overrides=[
        f"parallel.mesh_shape=[{mesh_shape[0]},{mesh_shape[1]}]"])
    plan = ShardingPlan(conf)
    params = init_model(jax.random.PRNGKey(0), conf)
    opt_state = init_optimizer(params)
    params = plan.replicate(params)
    opt_state = plan.replicate(opt_state)

    B, R = conf.train.batch_size, conf.train.n_rays
    k = jax.random.PRNGKey(3)
    camloc = jnp.tile(jnp.asarray([[0.0, 0.0, 2.5]]), (B, 1))
    raydir = jax.random.normal(k, (B, R, 3)) - jnp.asarray([0.0, 0.0, 3.0])
    raydir = raydir / jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    color_gt = jax.random.uniform(jax.random.fold_in(k, 1), (B, R, 3))
    obj_mask = jnp.ones((B, R, 1))
    camloc, raydir, color_gt, obj_mask = plan.shard_batch(
        camloc, raydir, color_gt, obj_mask)

    for i in range(2):
        params, opt_state, mon = train_step(
            params, opt_state, camloc, raydir, color_gt, obj_mask,
            jnp.float32(0.5), jnp.float32(1.0),
            jnp.float32(5e-4), jnp.float32(5e-4), jnp.int32(i), conf)
    return jax.device_get(params), jax.device_get(mon)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_train_step_device_count_invariant():
    p1, m1 = _run((1, 1))
    p8, m8 = _run((2, 4))
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5, atol=1e-6)
    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flat8 = dict(jax.tree_util.tree_leaves_with_path(p8))
    for path, leaf in flat1:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat8[path]), rtol=1e-5, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))
