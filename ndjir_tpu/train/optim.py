"""Dual-Adam optimizer with the reference's feature/weight split.

The reference runs two nnabla Adam solvers partitioned by parameter-name
suffix ``feature/F`` (reference: python/solver.py:29-46); here the partition
is a pytree of labels over param paths (grid-feature leaves vs everything
else) and both groups share one ``optax.scale_by_adam`` state, with per-leaf
learning rates applied at update time as traced scalars.

Semantics parity notes:
  - weight decay is classic L2-added-to-gradient (nnabla
    ``solver.weight_decay``: g += wd * w before Adam), NOT decoupled AdamW.
  - NaN/Inf gradients skip the whole update including Adam moments
    (reference: train.py:141-146 + solver.py:67-69) — implemented branch-free
    with a finite-mask select inside the jitted step.
  - ``clip_grad_norm > 0`` clips the true gradient per group.  (The reference
    calls clip before backward so it only ever clips the weight-decay term —
    an apparent bug; we clip the real gradient and document the deviation.)
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ndjir_tpu.models.fields import is_grid_feature_path


class OptState(NamedTuple):
    adam: Any


_ADAM = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)


def init_optimizer(params) -> OptState:
    return OptState(adam=_ADAM.init(params))


def _global_norm(tree):
    return jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree_util.tree_leaves(tree)))


def apply_updates(params, grads, state: OptState, lr_weight, lr_feat,
                  conf) -> Tuple[Any, OptState, jax.Array]:
    """One optimizer step; returns (params, state, grads_finite flag)."""
    wd = conf.train.weight_decay

    # L2 weight decay folded into the gradient (nnabla semantics)
    if wd > 0:
        grads = jax.tree_util.tree_map(lambda g, p: g + wd * p, grads, params)

    if conf.train.clip_grad_norm > 0:
        clip = conf.train.clip_grad_norm
        gn = _global_norm(grads)
        scale = jnp.minimum(1.0, clip / jnp.maximum(gn, 1e-12))
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)

    finite = jnp.all(jnp.asarray(
        [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)]))

    updates, new_adam = _ADAM.update(grads, state.adam, params)
    # static per-leaf LR choice (labels are compile-time); the update is
    # computed in f32 and cast back so bf16 grid tables stay bf16 (plain
    # p - lr*u would silently promote them to f32)
    new_params = jax.tree_util.tree_map_with_path(
        lambda path, p, u: (p.astype(jnp.float32)
                            - (lr_feat if is_grid_feature_path(path)
                               else lr_weight) * u.astype(jnp.float32)
                            ).astype(p.dtype),
        params, updates)

    # skip the whole step (params AND moments) on non-finite grads
    new_params = jax.tree_util.tree_map(
        lambda new, old: jnp.where(finite, new, old), new_params, params)
    new_adam = jax.tree_util.tree_map(
        lambda new, old: jnp.where(finite, new, old), new_adam, state.adam)
    return new_params, OptState(adam=new_adam), finite
