"""TV regularizer parity + sym/asym backward behaviour."""

import jax
import jax.numpy as jnp
import numpy as np

from ndjir_tpu.ops import tv_loss as T
from ndjir_tpu.ops.grid import GridEncoding, hash_num_params
from ndjir_tpu.config import load_config


def test_tv_voxel_value(rng):
    Gs, D = 6, 3
    feat = rng.randn(Gs, Gs, Gs, D).astype(np.float32)
    x = rng.uniform(-1, 1, (10, 3)).astype(np.float32)
    got = np.asarray(T.tv_loss_voxel(x, feat))
    g1 = Gs - 1.0
    for n in range(10):
        xyz = (x[n] + 1) * g1 / 2
        i0 = np.clip(np.floor(xyz), 0, g1).astype(int)
        i1 = np.minimum(i0 + 1, g1).astype(int)
        f000 = feat[i0[0], i0[1], i0[2]]
        dx = feat[i1[0], i0[1], i0[2]] - f000
        dy = feat[i0[0], i1[1], i0[2]] - f000
        dz = feat[i0[0], i0[1], i1[2]] - f000
        want = np.sqrt(dx ** 2 + dy ** 2 + dz ** 2)
        np.testing.assert_allclose(got[n], want, atol=1e-5)


def test_tv_sym_vs_asym_grad(rng):
    feat = jnp.asarray(rng.randn(6, 6, 6, 2).astype(np.float32))
    x = jnp.asarray(rng.uniform(-0.9, 0.9, (12, 3)).astype(np.float32))

    g_sym = jax.grad(lambda f: T.tv_loss_voxel(x, f, sym_backward=True).sum())(feat)
    g_asym = jax.grad(lambda f: T.tv_loss_voxel(x, f, sym_backward=False).sum())(feat)
    # asym drops the base-corner contribution -> different gradients,
    # and summed asym grad is positive-only scatter of deltas
    assert not np.allclose(np.asarray(g_sym), np.asarray(g_asym))
    assert np.all(np.isfinite(np.asarray(g_sym)))
    # sym gradient telescopes: sum over grid of each delta's +g and -g cancels
    np.testing.assert_allclose(float(g_sym.sum()), 0.0, atol=1e-3)


def test_tv_zero_safe_gradient(rng):
    """Gradient at zero deltas (constant grid) must be finite (eps in rsqrt)."""
    feat = jnp.ones((5, 5, 5, 2), jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (4, 3)).astype(np.float32))
    g = jax.grad(lambda f: T.tv_loss_voxel(x, f).sum())(feat)
    assert np.all(np.isfinite(np.asarray(g)))


def test_tv_dispatch_shapes(rng):
    x = jnp.asarray(rng.uniform(-1, 1, (7, 3)).astype(np.float32))
    cases = [("voxel", 4), ("triplane", 12), ("triline", 12),
             ("triplaneline", 24), ("voxel_hash", 64), ("lanczos_voxel", 4)]
    for t, C in cases:
        conf = load_config("default", overrides=[
            "geometric_network.voxel.type=" + t,
            "geometric_network.voxel.grid_size=8"])
        enc = GridEncoding(conf.geometric_network.voxel)
        params = enc.init(jax.random.PRNGKey(1))
        out = T.grid_tv_loss(enc, params, x)
        assert out.shape == (7, C), t
