"""Pallas octa-fold kernel logic under the interpreter (no TPU needed).

The TPU-compiled path is probed by scripts/probe_grid_bwd.py (fold_pallas
variant); this pins the kernel's halo/mask/in-place-halving logic against
the XLA flat2d oracle, which is itself adjoint-pinned in test_ops_grid.py.
"""

import importlib

import numpy as np
import pytest


@pytest.fixture()
def fp(monkeypatch):
    monkeypatch.setenv("NDJIR_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("NDJIR_FOLD_BLOCK", "512")
    import ndjir_tpu.ops.fold_pallas as fp

    importlib.reload(fp)
    yield fp
    monkeypatch.delenv("NDJIR_PALLAS_INTERPRET")
    monkeypatch.delenv("NDJIR_FOLD_BLOCK")
    importlib.reload(fp)


@pytest.mark.parametrize("gshape", [
    (4, 2, 128, 2),     # multi-block with halo crossing + head block
    (4, 2, 128, 4),     # D=4 (the production feature width)
    (8, 2, 128, 2),     # more blocks
])
def test_pallas_fold_matches_flat2d(fp, rng, gshape):
    import jax.numpy as jnp

    from ndjir_tpu.ops import grid as G

    assert fp.fold_pallas_supported(gshape)
    M = gshape[0] * gshape[1] * gshape[2]
    cot = jnp.asarray(rng.randn(8 * gshape[3], M).astype(np.float32))
    want = np.asarray(G._fold_octa_cotangent_flat2d(cot, gshape))
    got = np.asarray(fp.fold_octa_cotangent_pallas(cot, gshape))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_unaligned_grids_unsupported(fp):
    assert not fp.fold_pallas_supported((5, 6, 7, 3))
    assert not fp.fold_pallas_supported((256, 256, 100, 4))
    # halo (Gy*Gz + Gz + 128) exceeding the block size is rejected
    assert not fp.fold_pallas_supported((2, 8, 128, 4))