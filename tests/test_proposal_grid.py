"""Coarse-grid proposal opt-in (renderer.proposal_method=coarse_grid).

The hierarchical sampler reads a cached G_c^3 SDF snapshot instead of running
the geometric network per proposal.  Placement is approximate by design; the
tests pin (a) validity invariants, (b) closeness to the network path when the
snapshot is fresh, and (c) that the default config never takes this path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndjir_tpu.config import load_config
from ndjir_tpu.models.fields import geometric_apply, init_model
from ndjir_tpu.render.renderer import make_mc_cdfs
from ndjir_tpu.render.sampler import make_proposal_grid, sample_points


@pytest.fixture(scope="module")
def conf_cg():
    return load_config("tiny_test", overrides=[
        "renderer.proposal_method=coarse_grid",
        "renderer.proposal_grid_size=48",
    ])


@pytest.fixture(scope="module")
def params(conf_cg):
    return init_model(jax.random.PRNGKey(0), conf_cg)


@pytest.fixture(scope="module")
def batch():
    B, R = 2, 8
    k = jax.random.PRNGKey(7)
    camloc = jnp.tile(jnp.asarray([[0.0, 0.0, 2.5]]), (B, 1))
    raydir = jax.random.normal(k, (B, R, 3)) - jnp.asarray([0.0, 0.0, 3.0])
    raydir = raydir / jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    return camloc, raydir


def test_snapshot_matches_network(conf_cg, params):
    """Lattice values ARE network evaluations (stop-gradient)."""
    pg = make_proposal_grid(params, conf_cg)
    Gc = conf_cg.renderer.proposal_grid_size
    assert pg.shape == (Gc, Gc, Gc, 1)
    r = conf_cg.renderer.bounding_sphere_radius
    lin = np.linspace(-r, r, Gc)
    pts = jnp.asarray(np.stack(np.meshgrid(lin[:3], lin[:3], lin[:3],
                                           indexing="ij"), -1).reshape(-1, 3),
                      jnp.float32)
    sdf, _, _ = geometric_apply(params["geometric-network"], pts, conf_cg)
    np.testing.assert_allclose(np.asarray(pg[:3, :3, :3, 0]).ravel(),
                               np.asarray(sdf).ravel(), rtol=1e-5, atol=1e-6)


def test_coarse_grid_sampling_valid_and_close(conf_cg, params, batch):
    camloc, raydir = batch
    B, R, _ = raydir.shape
    rc = conf_cg.renderer
    N = rc.n_samples0 + rc.n_samples1 * rc.n_upsamples
    cdfs = make_mc_cdfs(conf_cg, B, R)
    pg = make_proposal_grid(params, conf_cg)

    x_cg, t_cg, _, _, mask = sample_points(
        params, camloc, raydir, cdfs["stratified"], cdfs["background"],
        conf_cg, proposal_grid=pg)
    assert x_cg.shape == (B, R, N, 3)
    dt = np.diff(np.asarray(t_cg)[..., 0], axis=2)
    assert np.all(dt >= -1e-6)
    assert np.all(np.isfinite(np.asarray(x_cg)))

    # network-proposal positions on the same inputs: placement should agree
    # to within a few coarse cells for a fresh snapshot (same SDF field, the
    # only error is trilinear interpolation of a smooth near-sphere init)
    x_nn, t_nn, _, _, _ = sample_points(
        params, camloc, raydir, cdfs["stratified"], cdfs["background"],
        conf_cg, proposal_grid=None)
    cell = 2 * rc.bounding_sphere_radius / conf_cg.renderer.proposal_grid_size
    hit = np.asarray(mask)[..., 0, 0] > 0
    diff = np.abs(np.asarray(t_cg) - np.asarray(t_nn))[..., 0]
    assert np.median(diff[hit]) < 4 * cell


def test_none_grid_falls_back_to_network(conf_cg, params, batch):
    """proposal_grid=None must silently use the reference network path."""
    camloc, raydir = batch
    B, R, _ = raydir.shape
    cdfs = make_mc_cdfs(conf_cg, B, R)
    conf_net = load_config("tiny_test")
    x0, t0, _, _, _ = sample_points(
        params, camloc, raydir, cdfs["stratified"], cdfs["background"],
        conf_net)
    x1, t1, _, _, _ = sample_points(
        params, camloc, raydir, cdfs["stratified"], cdfs["background"],
        conf_cg, proposal_grid=None)
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1), rtol=0, atol=0)
