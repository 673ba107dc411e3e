"""Numerical-parity tests: JAX pipeline vs the standalone numpy f64 oracle.

Covers the `voxel` and `none` grid types at the reference's default network
architecture (8x256 geometric MLP, all lights, filament importance BRDF,
128 fg + 32 bg samples, 2x128 light dirs) on a small ray batch:

1. forward: rendered RGB and every loss term allclose (f32 JAX vs f64 numpy);
2. gradient: d loss / d params along random parameter directions — central
   finite differences of the ORACLE loss vs the JAX autodiff directional
   derivative.  This validates the entire double-backward chain (eikonal
   grad-of-grad included) against an implementation that shares no code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle_numpy as onp
from ndjir_tpu.config import load_config
from ndjir_tpu.models.fields import init_model
from ndjir_tpu.render.loss import total_loss
from ndjir_tpu.render.renderer import make_mc_cdfs, pb_render
from ndjir_tpu.render.sampler import sample_points

B, R = 2, 4

OVERRIDES = dict(
    voxel=["geometric_network.voxel.grid_size=48"],
    none=["geometric_network.voxel.type=none"],
)


def _setup(grid_type):
    conf = load_config("default", overrides=OVERRIDES[grid_type])
    params = init_model(jax.random.PRNGKey(0), conf)
    k = jax.random.PRNGKey(7)
    camloc = jnp.tile(jnp.asarray([[0.1, -0.2, 2.5]]), (B, 1))
    raydir = jax.random.normal(k, (B, R, 3)) - jnp.asarray([0.0, 0.0, 3.0])
    raydir = raydir / jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    color_gt = jax.random.uniform(jax.random.fold_in(k, 1), (B, R, 3))
    obj_mask = jnp.ones((B, R, 1))
    cdfs = make_mc_cdfs(conf, B, R)
    return conf, params, camloc, raydir, color_gt, obj_mask, cdfs


def _to_np(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64), tree)


@pytest.mark.parametrize("grid_type", ["voxel", "none"])
def test_forward_parity(grid_type):
    conf, params, camloc, raydir, color_gt, obj_mask, cdfs = _setup(grid_type)

    # JAX forward (f32)
    loss_j, mon_j = total_loss(params, camloc, raydir, color_gt, obj_mask,
                               jnp.float32(0.37), jnp.float32(0.9), conf,
                               cdfs=cdfs)
    x_fg, t_fg, x_bg, t_bg, mask = sample_points(
        params, camloc, raydir, cdfs["stratified"], cdfs["background"], conf,
        rand_u=cdfs["upsample"])
    res_j = pb_render(params, x_fg, t_fg, x_bg, t_bg, camloc, raydir, mask,
                      0.37, 0.9, cdfs, conf)

    # oracle forward (f64).  The render/loss comparison evaluates the oracle
    # at the JAX sample positions so that bin-edge searchsorted differences
    # (checked separately below) don't contaminate the shading comparison.
    p64, cdfs64 = _to_np(params), _to_np(cdfs)
    cam64, ray64 = _to_np((camloc, raydir))
    samples64 = _to_np((x_fg, t_fg, x_bg, t_bg, mask))
    loss_o, mon_o = onp.total_loss(p64, cam64, ray64, _to_np(color_gt),
                                   _to_np(obj_mask), 0.37, 0.9, conf, cdfs64,
                                   samples=samples64)
    x64, tf64, xb64, tb64, m64 = samples64
    res_o = onp.pb_render(p64, x64, tf64, xb64, tb64, cam64, ray64, m64,
                          0.37, 0.9, cdfs64, conf)
    xo, tfo, xbo, tbo, mo = onp.sample_points(
        p64, cam64, ray64, cdfs64["stratified"], cdfs64["background"], conf)

    # sample positions agree (sampler parity incl. searchsorted chain);
    # a handful of bin-edge samples may land one section over in f32 vs f64
    # (inverse-CDF searchsorted on nearly-equal keys), so bound the bulk
    # tightly and the tail by one coarse section width
    diff = np.abs(np.asarray(x_fg, np.float64) - xo)
    assert np.quantile(diff, 0.99) < 1e-4
    assert diff.max() < 0.05
    np.testing.assert_allclose(np.asarray(mask), mo, rtol=0, atol=0)

    # rendered RGB
    np.testing.assert_allclose(np.asarray(res_j["color_pixel"]),
                               res_o["color_pixel"], rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(res_j["normal_pixel"]),
                               res_o["normal_pixel"], rtol=2e-3, atol=2e-3)

    # every loss term
    np.testing.assert_allclose(float(loss_j), loss_o, rtol=2e-3, atol=1e-5)
    for k, v in mon_o.items():
        np.testing.assert_allclose(float(mon_j[k]), v, rtol=5e-3, atol=1e-5,
                                   err_msg=k)


@pytest.mark.parametrize("grid_type", ["voxel", "none"])
def test_gradient_parity(grid_type):
    conf, params, camloc, raydir, color_gt, obj_mask, cdfs = _setup(grid_type)

    def lossfn(p):
        return total_loss(p, camloc, raydir, color_gt, obj_mask,
                          jnp.float32(0.37), jnp.float32(0.9), conf,
                          cdfs=cdfs)[0]

    grads = jax.grad(lossfn)(params)

    p64, cdfs64 = _to_np(params), _to_np(cdfs)
    cam64, ray64 = _to_np((camloc, raydir))
    np_inputs = (_to_np(color_gt), _to_np(obj_mask))

    # Sample positions AND sampled light directions are stop-gradient data
    # generation in both implementations (reference: non-differentiable
    # PythonFunction sampler/SampleDirections), so the FD probe must hold
    # them FIXED while perturbing the parameters.
    samples = onp.sample_points(p64, cam64, ray64, cdfs64["stratified"],
                                cdfs64["background"], conf)
    res0 = onp.pb_render(p64, *samples[:4], cam64, ray64, samples[4],
                         0.37, 0.9, cdfs64, conf)
    frozen = (res0["u_dirs"], res0["s_dirs"])

    def oracle_loss(p):
        return onp.total_loss(p, cam64, ray64, *np_inputs, 0.37, 0.9, conf,
                              cdfs64, samples=samples, frozen_dirs=frozen)[0]

    # random unit directions over the whole parameter tree; central FD of the
    # oracle loss vs the JAX directional derivative.
    rng = np.random.RandomState(0)
    leaves, treedef = jax.tree_util.tree_flatten(p64)
    for trial in range(2):
        vs = [rng.normal(size=l.shape) for l in leaves]
        norm = np.sqrt(sum((v ** 2).sum() for v in vs))
        vs = [v / norm for v in vs]
        h = 1e-5
        p_plus = jax.tree_util.tree_unflatten(
            treedef, [l + h * v for l, v in zip(leaves, vs)])
        p_minus = jax.tree_util.tree_unflatten(
            treedef, [l - h * v for l, v in zip(leaves, vs)])
        fd = (oracle_loss(p_plus) - oracle_loss(p_minus)) / (2 * h)

        gleaves = jax.tree_util.tree_flatten(_to_np(grads))[0]
        jvp = sum(float((g * v).sum()) for g, v in zip(gleaves, vs))
        np.testing.assert_allclose(jvp, fd, rtol=2e-2, atol=1e-6)
