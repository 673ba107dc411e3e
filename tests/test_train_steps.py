"""Fused multi-step scan path (train_steps) == sequential train_step."""

import jax
import jax.numpy as jnp
import numpy as np

from ndjir_tpu.config import load_config
from ndjir_tpu.models.fields import init_model
from ndjir_tpu.train.optim import init_optimizer
from ndjir_tpu.train.trainer import train_step, train_steps


def test_train_steps_matches_sequential():
    conf = load_config("tiny_test")
    B, R, K = 2, 16, 3
    k = jax.random.PRNGKey(5)
    camloc = jnp.tile(jnp.asarray([[0.0, 0.0, 2.5]]), (K, B, 1))
    raydir = jax.random.normal(k, (K, B, R, 3)) - jnp.asarray([0.0, 0.0, 3.0])
    raydir = raydir / jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    color = jax.random.uniform(jax.random.fold_in(k, 1), (K, B, R, 3))
    mask = jnp.ones((K, B, R, 1))
    args = (jnp.float32(0.5), jnp.float32(1.0), jnp.float32(3e-3),
            jnp.float32(3e-3))

    p_seq = init_model(jax.random.PRNGKey(0), conf)
    o_seq = init_optimizer(p_seq)
    seq_losses = []
    for i in range(K):
        p_seq, o_seq, mon = train_step(
            p_seq, o_seq, camloc[i], raydir[i], color[i], mask[i], *args,
            jnp.int32(i), conf)
        seq_losses.append(float(mon["loss"]))

    p_fused = init_model(jax.random.PRNGKey(0), conf)
    o_fused = init_optimizer(p_fused)
    p_fused, o_fused, mons = train_steps(
        p_fused, o_fused, camloc, raydir, color, mask, *args, jnp.int32(0),
        conf)

    np.testing.assert_allclose(np.asarray(mons["loss"]), seq_losses,
                               rtol=1e-5, atol=1e-6)
    assert np.asarray(mons["grads_finite"]).shape == (K,)
    # Adam's m/(sqrt(v)+eps) is sign-sensitive for near-zero gradient
    # elements: a 1-ulp difference from different op fusion can flip an
    # update's direction, moving that element by O(lr).  So: bulk of the
    # elements bitwise-tight, stragglers bounded by the per-step trust
    # region K * lr.
    lr = 3e-3
    flat_s = jax.tree_util.tree_leaves_with_path(jax.device_get(p_seq))
    flat_f = dict(jax.tree_util.tree_leaves_with_path(jax.device_get(p_fused)))
    for path, leaf in flat_s:
        a, b = np.asarray(leaf), np.asarray(flat_f[path])
        diff = np.abs(a - b)
        name = jax.tree_util.keystr(path)
        assert (diff < 1e-6 + 1e-5 * np.abs(a)).mean() > 0.995, name
        assert diff.max() <= 2.2 * K * lr, (name, diff.max())
