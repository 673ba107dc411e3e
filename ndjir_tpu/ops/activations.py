"""Activation functions.

TPU note: these are all VPU element-wise ops that XLA fuses into neighbouring
matmuls; no custom kernels needed (the reference hand-wrote a CUDA squareplus,
reference: csrc/activation/squareplus_cuda.cu:29-58).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softplus(x: jax.Array, beta: float = 1.0) -> jax.Array:
    """Numerically-stable softplus with inverse-temperature ``beta``.

    softplus_beta(x) = log(1 + exp(beta x)) / beta, computed as
    max(x, 0) + log1p(exp(-beta |x|)) / beta so large inputs don't overflow.
    The networks use beta=100 (reference: python/network.py:165).
    """
    return jnp.maximum(x, 0.0) + jnp.log1p(jnp.exp(-beta * jnp.abs(x))) / beta


def squareplus(x: jax.Array, b: float = 4.0) -> jax.Array:
    """squareplus(x) = (x + sqrt(x^2 + b)) / 2 — a cheap smooth relu.

    Parity with reference csrc/activation/squareplus_cuda.cu:29-58 (shipped
    but unused by the reference networks; exposed here for completeness).
    """
    return 0.5 * (x + jnp.sqrt(x * x + b))


def get_activation(name: str, beta: float = 100.0):
    """Hidden-layer activation dispatch (reference: python/network.py:164-166)."""
    if name == "relu":
        return jax.nn.relu
    if name == "softplus":
        return lambda x: softplus(x, beta=beta)
    if name == "squareplus":
        return squareplus
    raise ValueError(f"Unknown activation: {name}")


def get_last_activation(name: str, inverse_black_degree: float = 1.0):
    """Output-head activation dispatch (reference: python/network.py:289-292)."""
    if name == "softplus":
        return lambda x: softplus(x, beta=inverse_black_degree)
    if name == "relu":
        return jax.nn.relu
    if name == "sigmoid":
        return jax.nn.sigmoid
    raise ValueError(f"Unknown last activation: {name}")
