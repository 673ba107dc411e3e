"""Field networks: geometric init invariants, heads, BRDF."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndjir_tpu.config import load_config
from ndjir_tpu.models import brdf, fields


@pytest.fixture(scope="module")
def conf():
    return load_config("tiny_test")


@pytest.fixture(scope="module")
def full_conf():
    # reference-sized geometric net to check the SAL init quality
    return load_config("no_voxel", overrides=["renderer.n_samples0=8"])


def test_geometric_sphere_init(full_conf):
    """SAL geometric init: at init the SDF approximates |x| - r (sign
    structure + eikonal ~1), reference network.py:36-56, 191-225."""
    params = fields.init_geometric(jax.random.PRNGKey(0), full_conf)
    r = full_conf.geometric_network.initial_sphere_radius

    x0 = jnp.zeros((1, 3))
    x_out = jnp.asarray([[0.9, 0.0, 0.0], [0.0, 0.9, 0.0], [0.0, 0.0, 0.9]])
    sdf0, _, gain = fields.geometric_apply(params, x0, full_conf)
    sdf_out, _, _ = fields.geometric_apply(params, x_out, full_conf)
    assert float(sdf0[0, 0]) < 0, "center must be inside"
    assert np.all(np.asarray(sdf_out) > 0), "points at 0.9 must be outside"

    # zero level set near radius r along a ray
    ts = jnp.linspace(0.05, 0.95, 64)
    xs = ts[:, None] * jnp.asarray([[1.0, 0.0, 0.0]])
    sdfs = np.asarray(fields.geometric_apply(params, xs, full_conf)[0])[:, 0]
    crossing = ts[int(np.argmin(np.abs(sdfs)))]
    assert abs(float(crossing) - r) < 0.15

    # eikonal property of the init
    key = jax.random.PRNGKey(3)
    xr = jax.random.uniform(key, (128, 3), minval=-0.8, maxval=0.8)
    g = jax.vmap(jax.grad(
        lambda x: fields.geometric_apply(params, x[None], full_conf)[0][0, 0]))(xr)
    norms = np.linalg.norm(np.asarray(g), axis=-1)
    assert 0.5 < float(np.median(norms)) < 2.0

    # gain = clip(exp(10 g), ...) of sigmoid_gain=0.3 -> e^3
    np.testing.assert_allclose(float(gain[0]), np.exp(3.0), rtol=1e-5)


def test_roughness_bounds(conf, rng):
    params = fields.init_roughness(jax.random.PRNGKey(1), conf)
    x = jnp.asarray(rng.randn(10, 3).astype(np.float32))
    f = jnp.asarray(rng.randn(10, conf.geometric_network.feature_size).astype(np.float32))
    n = jnp.asarray(rng.randn(10, 3).astype(np.float32))
    r, std = fields.roughness_apply(params, x, f, n, conf)
    lb = conf.roughness_network.lower_bound
    assert np.all(np.asarray(r) >= lb - 1e-6)
    assert np.all(np.asarray(r) <= 1.0)
    assert np.all(np.asarray(std) > 0)


def test_specular_remap_and_fixme(conf, rng):
    params = fields.init_specular_reflectance(jax.random.PRNGKey(1), conf)
    x = jnp.asarray(rng.randn(10, 3).astype(np.float32))
    f = jnp.asarray(rng.randn(10, conf.geometric_network.feature_size).astype(np.float32))
    n = jnp.asarray(rng.randn(10, 3).astype(np.float32))
    v, std = fields.specular_reflectance_apply(params, x, f, n, conf)
    # filament remap: 0.16 h^2 in (0, 0.16)
    assert np.all(np.asarray(v) > 0) and np.all(np.asarray(v) < 0.16)
    assert v.shape[-1] == conf.specular_reflectance_network.channels

    conf_fix = load_config("tiny_test", overrides=[
        "specular_reflectance_network.fixme=true"])
    v2, _ = fields.specular_reflectance_apply(None, x, f, n, conf_fix)
    np.testing.assert_allclose(np.asarray(v2), 0.04)


def test_implicit_illumination_off(conf, rng):
    conf_off = load_config("no_implicit_illumination",
                           overrides=["geometric_network.feature_size=64"])
    x = jnp.asarray(rng.randn(4, 7, 3).astype(np.float32))
    out = fields.implicit_illumination_apply(None, x, None, None, conf_off)
    assert out.shape == (4, 7, 1)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_background_shapes(conf, rng):
    params = fields.init_background(jax.random.PRNGKey(2), conf)
    B, R, N = 2, 3, 5
    x = jnp.asarray(rng.randn(B, R, N, 4).astype(np.float32))
    view = jnp.asarray(rng.randn(B, R, 1, 3).astype(np.float32))
    delta = jnp.abs(jnp.asarray(rng.randn(B, R, N, 1).astype(np.float32)))
    alpha, color = fields.background_apply(params, x, view, delta, conf)
    assert alpha.shape == (B, R, N, 1)
    assert color.shape == (B, R, N, 3)
    assert np.all((np.asarray(alpha) >= 0) & (np.asarray(alpha) < 1))


def test_model_init_structure(conf):
    params = fields.init_model(jax.random.PRNGKey(0), conf)
    expected = {"geometric-network", "base-color-network",
                "environment-light-network", "implicit-illumination-network",
                "soft-visibility-light-network",
                "photogrammetric-light-network", "roughness-network",
                "specular-reflectance-network", "background-network"}
    assert set(params.keys()) == expected
    # roughness hidden layer carries the reference's off-by-one name
    assert "affine--1" in params["roughness-network"]


@pytest.mark.parametrize("model", ["filament", "ue4"])
@pytest.mark.parametrize("sampling", ["importance", "uniform"])
def test_brdf_nonnegative(rng, model, sampling):
    conf = load_config("tiny_test", overrides=[
        f"specular_brdf.model={model}", f"specular_brdf.sampling={sampling}"])
    B, R, M = 2, 4, 8
    normal = rng.randn(B, R, 3).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    view = normal[:, :, None, :] * 0.8 + 0.2 * rng.randn(B, R, 1, 3).astype(np.float32)
    view /= np.linalg.norm(view, axis=-1, keepdims=True)
    light = normal[:, :, None, :] + 0.3 * rng.randn(B, R, M, 3).astype(np.float32)
    light /= np.linalg.norm(light, axis=-1, keepdims=True)
    rough = rng.uniform(0.1, 1.0, (B, R, 1)).astype(np.float32)
    spec = rng.uniform(0.0, 0.16, (B, R, 3)).astype(np.float32)
    s, cos = brdf.specular_brdf_model(
        jnp.asarray(normal), jnp.asarray(view), jnp.asarray(light),
        jnp.asarray(rough), jnp.asarray(spec), conf)
    assert s.shape == (B, R, M, 3)
    assert np.all(np.asarray(s) >= 0)
    assert np.all(np.isfinite(np.asarray(s)))
    assert np.all(np.asarray(cos) >= conf.renderer.eps_dot * 0.99)
