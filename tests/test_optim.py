"""Dual-Adam optimizer semantics (reference: python/solver.py:29-69).

Numpy oracle of nnabla Adam's exact update form
    m = b1 m + (1-b1) g;  v = b2 v + (1-b2) g^2
    w -= lr * sqrt(1-b2^t)/(1-b1^t) * m / (sqrt(v) + eps)
plus the master-f32-moments guarantee for bf16 parameter leaves and the
NaN-skip behaviour (moments and the step counter frozen too).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ndjir_tpu.config import load_config
from ndjir_tpu.train.optim import apply_updates, init_optimizer

B1, B2, EPS = 0.9, 0.999, 1e-8


def _conf(**over):
    o = [f"train.{k}={v}" for k, v in over.items()]
    return load_config("tiny_test", overrides=o)


def _oracle(params, grads_seq, lr, wd=0.0):
    m = {k: np.zeros_like(np.asarray(v, np.float32)) for k, v in params.items()}
    v = {k: np.zeros_like(np.asarray(a, np.float32)) for k, a in params.items()}
    p = {k: np.asarray(a, np.float32) for k, a in params.items()}
    for t, grads in enumerate(grads_seq, start=1):
        bias = np.sqrt(1 - B2 ** t) / (1 - B1 ** t)
        for k in p:
            g = np.asarray(grads[k], np.float32) + wd * p[k]
            m[k] = B1 * m[k] + (1 - B1) * g
            v[k] = B2 * v[k] + (1 - B2) * g * g
            p[k] = p[k] - lr * bias * m[k] / (np.sqrt(v[k]) + EPS)
    return p


def test_adam_matches_nnabla_form_oracle():
    conf = _conf(weight_decay=0.01)
    key = jax.random.PRNGKey(0)
    params = {"a": jax.random.normal(key, (5, 3)),
              "b": jax.random.normal(jax.random.fold_in(key, 1), (7,))}
    state = init_optimizer(params)
    grads_seq = [
        {"a": jax.random.normal(jax.random.fold_in(key, 10 + t), (5, 3)),
         "b": jax.random.normal(jax.random.fold_in(key, 20 + t), (7,))}
        for t in range(3)]

    p = params
    lr = 1e-2
    for g in grads_seq:
        p, state, finite = apply_updates(p, g, state, jnp.float32(lr),
                                         jnp.float32(lr), conf)
        assert bool(finite)

    ref = _oracle(params, grads_seq, lr, wd=0.01)
    for k in p:
        np.testing.assert_allclose(np.asarray(p[k]), ref[k],
                                   rtol=1e-5, atol=1e-6)


def test_moments_are_f32_for_bf16_params():
    conf = _conf(weight_decay=0.0)
    params = {"F": jnp.ones((8, 4), jnp.bfloat16),
              "W": jnp.ones((4, 4), jnp.float32)}
    state = init_optimizer(params)
    for tree in (state.adam.mu, state.adam.nu):
        for leaf in jax.tree_util.tree_leaves(tree):
            assert leaf.dtype == jnp.float32
    grads = {"F": jnp.full((8, 4), 1e-3, jnp.bfloat16),
             "W": jnp.full((4, 4), 1e-3, jnp.float32)}
    p, state, _ = apply_updates(params, grads, state, jnp.float32(1e-3),
                                jnp.float32(1e-3), conf)
    assert p["F"].dtype == jnp.bfloat16
    assert state.adam.nu["F"].dtype == jnp.float32
    # the 1e-6-scale nu increment must survive (would be lost in bf16 nu
    # against an established second moment)
    assert float(jnp.max(jnp.abs(state.adam.nu["F"]))) > 0


def test_nan_grads_skip_params_moments_and_count():
    conf = _conf(weight_decay=0.0)
    params = {"a": jnp.ones((3,))}
    state = init_optimizer(params)
    good = {"a": jnp.full((3,), 0.5)}
    p, state, finite = apply_updates(params, good, state, jnp.float32(1e-2),
                                     jnp.float32(1e-2), conf)
    assert bool(finite)
    assert int(state.adam.count) == 1
    bad = {"a": jnp.asarray([1.0, jnp.nan, 1.0])}
    p2, state2, finite = apply_updates(p, bad, state, jnp.float32(1e-2),
                                       jnp.float32(1e-2), conf)
    assert not bool(finite)
    assert int(state2.adam.count) == 1
    np.testing.assert_array_equal(np.asarray(p2["a"]), np.asarray(p["a"]))
    np.testing.assert_array_equal(np.asarray(state2.adam.mu["a"]),
                                  np.asarray(state.adam.mu["a"]))
