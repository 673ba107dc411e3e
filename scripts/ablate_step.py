"""Step-time ablation harness (config-diff timing on the real chip).

The axon tunnel breaks jax.profiler tracing, so perf attribution is done by
timing train_step under config ablations that disable one component each.
Prints one line per variant: name, ms/step, rays/s.

Usage: python scripts/ablate_step.py [variant ...]   (default: a curated set)
Env: NDJIR_ABLATE_STEPS (default 20), NDJIR_ABLATE_GRID (default 256).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ndjir_tpu.utils.runtime import setup_compilation_cache  # noqa: E402

setup_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ndjir_tpu.config import load_config  # noqa: E402
from ndjir_tpu.models.fields import init_model  # noqa: E402
from ndjir_tpu.render.renderer import make_mc_cdfs  # noqa: E402
from ndjir_tpu.render.sampler import make_proposal_grid  # noqa: E402
from ndjir_tpu.train.optim import init_optimizer  # noqa: E402
from ndjir_tpu.train.trainer import train_step  # noqa: E402

GRID = int(os.environ.get("NDJIR_ABLATE_GRID", "256"))
STEPS = int(os.environ.get("NDJIR_ABLATE_STEPS", "20"))

BASE = [f"geometric_network.voxel.grid_size={GRID}",
        "precision.mlp_dtype=bfloat16"]

VARIANTS = {
    "full": [],
    "fused_ptb": ["renderer.fuse_perturbed_query=true"],
    "no_ptb_prior": ["train.base_color_prior_weight=0.0"],
    "coarse_proposals": ["renderer.proposal_method=coarse_grid"],
    "no_upsample": ["renderer.n_upsamples=0"],
    # same final N=128 but no proposal rounds: isolates the proposal
    # machinery exactly (no_upsample alone also halves N downstream)
    "same_n_no_up": ["renderer.n_samples0=128", "renderer.n_upsamples=0"],
    "half_n": ["renderer.n_samples0=32", "renderer.n_samples1=8"],
    "no_tv": ["train.tv_weight=0.0"],
    "no_eikonal": ["train.eikonal_weight=0.0"],
    "no_eik_no_up": ["train.eikonal_weight=0.0", "renderer.n_samples0=128",
                     "renderer.n_upsamples=0"],
    "spp_2": ["renderer.n_thetas=2"],
    "no_lightp": ["photogrammetric_light_network.use_me=false"],
    "no_bg": ["background_modeling=false"],
    "no_specular": ["specular_brdf.weight=0.0"],
    "f32_mlp": ["precision.mlp_dtype=float32"],
    "no_implicit": ["implicit_illumination_network.use_me=false"],
    # diagnostic (semantics-changing): softplus(beta=100) -> relu everywhere.
    # Sizes the VPU-transcendental share of the MLP stack.
    "all_relu": [f"{n}.act=relu" for n in (
        "geometric_network", "base_color_network",
        "environment_light_network", "soft_visibility_light_network",
        "implicit_illumination_network", "photogrammetric_light_network",
        "roughness_network", "specular_reflectance_network",
        "background_network")],
    "bf16_grid": ["precision.grid_dtype=bfloat16"],
    "bf16_grid_relu": ["precision.grid_dtype=bfloat16"] + [
        f"{n}.act=relu" for n in (
            "geometric_network", "base_color_network",
            "environment_light_network", "soft_visibility_light_network",
            "implicit_illumination_network", "photogrammetric_light_network",
            "roughness_network", "specular_reflectance_network",
            "background_network")],
    "no_priors": ["train.roughness_prior_weight=0.0",
                  "train.specular_reflectance_prior_weight=0.0"],
}


def sync(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    np.asarray(leaf.ravel()[:1])


def run_variant(name, overrides):
    conf = load_config(os.environ.get("NDJIR_ABLATE_CONFIG", "default"),
                       overrides=BASE + overrides)
    B, R = conf.train.batch_size, conf.train.n_rays
    key = jax.random.PRNGKey(0)
    params = init_model(key, conf)
    opt_state = init_optimizer(params)
    ks = jax.random.split(key, 2)
    camloc = jnp.tile(jnp.asarray([[0.0, 0.0, 2.5]]), (B, 1))
    raydir = jax.random.normal(ks[0], (B, R, 3)) - jnp.asarray([0.0, 0.0, 3.0])
    raydir = raydir / jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    color_gt = jax.random.uniform(ks[1], (B, R, 3))
    obj_mask = jnp.ones((B, R, 1), jnp.float32)
    args = (jnp.float32(0.5), jnp.float32(1.0), jnp.float32(5e-4),
            jnp.float32(5e-4))
    cdfs = jax.jit(lambda: make_mc_cdfs(conf, B, R))()
    pgrid = None
    if conf.renderer.get("proposal_method", "network") == "coarse_grid":
        pgrid = jax.jit(lambda p: make_proposal_grid(p, conf))(params)

    t0 = time.perf_counter()
    params, opt_state, mon = train_step(
        params, opt_state, camloc, raydir, color_gt, obj_mask, *args,
        jnp.int32(0), conf, cdfs=cdfs, proposal_grid=pgrid)
    sync((params, mon))
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(STEPS):
        params, opt_state, mon = train_step(
            params, opt_state, camloc, raydir, color_gt, obj_mask, *args,
            jnp.int32(i + 1), conf, cdfs=cdfs, proposal_grid=pgrid)
    sync((params, mon))
    dt = time.perf_counter() - t0
    ms = dt / STEPS * 1000
    print(f"{name:18s} {ms:8.1f} ms/step  {B * R / (dt / STEPS):8.0f} rays/s"
          f"  (compile+warm {compile_s:.0f}s)", flush=True)
    return ms


def tunnel_floor():
    """Per-dispatch floor of the axon tunnel: a trivial chained jitted op."""
    @jax.jit
    def stepf(x):
        return x * 1.000001 + 1e-9

    x = jnp.ones((1024,), jnp.float32)
    x = stepf(x)
    sync(x)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        x = stepf(x)
    sync(x)
    ms = (time.perf_counter() - t0) / STEPS * 1000
    print(f"{'tunnel_floor':18s} {ms:8.1f} ms/step", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    tunnel_floor()
    for n in names:
        run_variant(n, VARIANTS[n])
