"""Positional encoding (NeRF-style frequency features).

Layout parity with reference python/network.py:96-117: output is
``concat([x, cos(2^0 x), ..., cos(2^{M-1} x), sin(2^0 x), ..., sin(2^{M-1} x)])``
where the band axis is interleaved per input channel
(for each channel c: bands 2^0..2^{M-1} are contiguous).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def positional_encoding(x: jax.Array, M: int = 6,
                        include_input: bool = True) -> jax.Array:
    """(..., C) -> (..., C + 2*C*M) frequency features.

    Bands are 2^0 .. 2^{M-1}; per-channel band-major layout matching the
    reference's reshape((..., C, M)) -> (..., C*M) flattening
    (reference: python/network.py:105-110).
    """
    if M <= 0:
        return x
    bands = jnp.asarray(2.0 ** np.arange(M), dtype=x.dtype)
    xb = x[..., :, None] * bands  # (..., C, M)
    xb = xb.reshape(*x.shape[:-1], x.shape[-1] * M)
    parts = [x] if include_input else []
    parts += [jnp.cos(xb), jnp.sin(xb)]
    return jnp.concatenate(parts, axis=-1)


def pe_dim(C: int, M: int, include_input: bool = True) -> int:
    """Output channel count of positional_encoding."""
    if M <= 0:
        return C
    return (C if include_input else 0) + 2 * C * M
