"""Pallas scatter kernel logic under the interpreter (no TPU needed).

The TPU-compiled path is exercised by bench.py / on-device drives; this
covers the kernel's slab/chunk/masking logic against the XLA oracle.
"""

import importlib
import os

import numpy as np
import pytest


@pytest.fixture()
def interp_scatter(monkeypatch):
    monkeypatch.setenv("NDJIR_PALLAS_INTERPRET", "1")
    import ndjir_tpu.ops.scatter_pallas as sp

    importlib.reload(sp)
    yield sp
    monkeypatch.delenv("NDJIR_PALLAS_INTERPRET")
    importlib.reload(sp)


def test_kernel_matches_xla_oracle(interp_scatter, rng):
    import jax.numpy as jnp

    for n, m in [(1000, 8192), (513, 4096), (5000, 12000)]:
        ids = rng.randint(0, m, (n,)).astype(np.int32)
        vals = rng.randn(n, 4).astype(np.float32)
        ref = np.zeros((m, 4), np.float32)
        np.add.at(ref, ids, vals)
        got = np.asarray(interp_scatter.scatter_add_rows(
            jnp.asarray(ids), jnp.asarray(vals), m))
        np.testing.assert_allclose(got, ref, atol=1e-3), (n, m)


def test_kernel_extreme_distributions(interp_scatter, rng):
    import jax.numpy as jnp

    m = 8192
    # all updates into one row (worst-case collision)
    ids = np.full((700,), 4095, np.int32)
    vals = np.ones((700, 4), np.float32)
    got = np.asarray(interp_scatter.scatter_add_rows(
        jnp.asarray(ids), jnp.asarray(vals), m))
    np.testing.assert_allclose(got[4095], 700.0, rtol=1e-4)
    assert np.abs(got).sum() == pytest.approx(2800.0, rel=1e-4)

    # boundary rows of slabs
    ids = np.asarray([0, 4095, 4096, 8191], np.int32)
    vals = np.eye(4, dtype=np.float32)
    got = np.asarray(interp_scatter.scatter_add_rows(
        jnp.asarray(ids), jnp.asarray(vals), m))
    for r, c in zip([0, 4095, 4096, 8191], range(4)):
        assert got[r, c] == pytest.approx(1.0)


@pytest.mark.parametrize("d", [8, 32])
def test_transposed_kernel_matches_xla_oracle(interp_scatter, rng, d):
    """d=8 takes the multiop sort default, d=32 the argsort default
    (_sort_mode_for) — both against the numpy oracle."""
    import jax.numpy as jnp

    n, m = (3000, 12288)
    assert interp_scatter._sort_mode_for(d) == \
        ("argsort" if d > 8 else "multiop")
    ids = rng.randint(0, m, (n,)).astype(np.int32)
    vals = rng.randn(n, d).astype(np.float32)
    ref = np.zeros((m, d), np.float32)
    np.add.at(ref, ids, vals)
    got = np.asarray(interp_scatter.scatter_add_rows_t(
        jnp.asarray(ids), jnp.asarray(vals), m))
    assert got.shape == (d, m)
    np.testing.assert_allclose(got.T, ref, atol=1e-3)


def test_octa_fold_is_adjoint_of_dup(rng):
    """_fold_octa_cotangent must be the exact adjoint of the octa-table
    build: <dup(B), C> == <B, fold(C)> for random B, C (f64 on CPU would be
    overkill; f32 + tight tol suffices for the pure add/shift fold)."""
    import jax
    import jax.numpy as jnp

    import ndjir_tpu.ops.grid as G

    gshape = (5, 6, 7, 3)
    base = jnp.asarray(rng.randn(*gshape).astype(np.float32))
    cot = jnp.asarray(
        rng.randn(gshape[0] * gshape[1] * gshape[2], 24).astype(np.float32))

    _, vjp_fn = jax.vjp(G._voxel_octa_flat, base)
    want = np.asarray(vjp_fn(cot)[0])
    got = np.asarray(G._fold_octa_cotangent(cot.T, gshape))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
