"""Positional encoding vs explicit numpy oracle."""

import numpy as np

from ndjir_tpu.ops.encoding import pe_dim, positional_encoding


def oracle_pe(x, M, include_input=True):
    bands = 2.0 ** np.arange(M)
    xb = (x[..., :, None] * bands).reshape(*x.shape[:-1], -1)
    parts = [x] if include_input else []
    parts += [np.cos(xb), np.sin(xb)]
    return np.concatenate(parts, axis=-1)


def test_pe_matches_oracle(rng):
    x = rng.randn(2, 5, 3).astype(np.float32)
    for M in [1, 4, 6]:
        got = np.asarray(positional_encoding(x, M))
        want = oracle_pe(x, M)
        np.testing.assert_allclose(got, want, atol=1e-6)
        assert got.shape[-1] == pe_dim(3, M)


def test_pe_zero_bands_passthrough(rng):
    x = rng.randn(4, 3).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(positional_encoding(x, 0)), x)
