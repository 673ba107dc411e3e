"""Direction sampling vs explicit per-ray numpy oracle (same strategy as
reference python/sampler/test_sampler.py:23-70)."""

import numpy as np

from ndjir_tpu.ops.directions import (
    sample_importance_directions,
    sample_uniform_directions,
)


def oracle_dirs(normal, cdf_the, cdf_phi, alpha=None, eps=0.0):
    B, R, _ = normal.shape
    n_the = cdf_the.shape[-1]
    n_phi = cdf_phi.shape[-1]
    M = n_the * n_phi
    out = np.zeros((B, R, M, 3))
    for b in range(B):
        for r in range(R):
            n = normal[b, r] + eps
            z_axis = n / np.linalg.norm(n)
            xa = np.array([-n[1], n[0], 0.0])
            x_axis = xa / np.linalg.norm(xa)
            y_axis = np.cross(z_axis, x_axis)
            for m in range(M):
                m_the, m_phi = m // n_phi, m % n_phi
                u_the = cdf_the[b, r, m_the]
                u_phi = cdf_phi[b, r, m_phi]
                phi = 2 * np.pi * u_phi
                if alpha is None:
                    cos_t = u_the
                else:
                    a2 = alpha[b, r, 0] ** 2
                    cos_t = np.sqrt((1 - u_the) / ((a2 - 1) * u_the + 1))
                sin_t = np.sqrt(1 - cos_t ** 2)
                xyz = np.array([sin_t * np.cos(phi), sin_t * np.sin(phi), cos_t])
                out[b, r, m] = (xyz[0] * x_axis + xyz[1] * y_axis + xyz[2] * z_axis)
    return out


def _random_inputs(rng, B=2, R=5, n_the=3, n_phi=6):
    normal = rng.randn(B, R, 3).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    cdf_the = rng.uniform(0.01, 0.99, (B, R, n_the)).astype(np.float32)
    cdf_phi = rng.uniform(0, 1, (B, R, n_phi)).astype(np.float32)
    return normal, cdf_the, cdf_phi


def test_uniform_directions_match_oracle(rng):
    normal, cdf_the, cdf_phi = _random_inputs(rng)
    got = np.asarray(sample_uniform_directions(normal, cdf_the, cdf_phi))
    want = oracle_dirs(normal, cdf_the, cdf_phi)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_importance_directions_match_oracle(rng):
    normal, cdf_the, cdf_phi = _random_inputs(rng)
    alpha = rng.uniform(0.1, 1.0, (2, 5, 1)).astype(np.float32)
    got = np.asarray(sample_importance_directions(normal, cdf_the, cdf_phi, alpha))
    want = oracle_dirs(normal, cdf_the, cdf_phi, alpha)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_degenerate_normal_still_unit(rng):
    """Axis-aligned +-z normal must still yield unit directions (the
    reference's tangent frame divides by zero there)."""
    normal = np.array([[[0.0, 0.0, 1.0]], [[0.0, 0.0, -1.0]]], np.float32)
    cdf_the = rng.uniform(0.01, 0.99, (2, 1, 3)).astype(np.float32)
    cdf_phi = rng.uniform(0, 1, (2, 1, 4)).astype(np.float32)
    dirs = np.asarray(sample_uniform_directions(normal, cdf_the, cdf_phi))
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-5)
    cos = np.sum(dirs * normal[:, :, None, :], axis=-1)
    assert np.all(cos > -1e-5)


def test_directions_in_hemisphere(rng):
    normal, cdf_the, cdf_phi = _random_inputs(rng, R=16)
    dirs = np.asarray(sample_uniform_directions(normal, cdf_the, cdf_phi))
    cos = np.sum(dirs * normal[:, :, None, :], axis=-1)
    assert np.all(cos > -1e-5)      # hemisphere around the normal
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-5)
