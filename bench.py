"""Benchmark: training-step ray throughput (fwd+bwd+update) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's derived A100 throughput of ~4.1k rays/s at the
default workload (B=4, R=512, 128 fg + 32 bg samples, 2x128 light dirs;
BASELINE.md).  The benchmarked step is the same default-config workload.

Env knobs: NDJIR_BENCH_GRID (default 512), NDJIR_BENCH_STEPS (default 20),
NDJIR_BENCH_CONFIG (default "default").
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_RAYS_PER_S = 4100.0


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ndjir_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()

    import jax
    import jax.numpy as jnp

    from ndjir_tpu.config import load_config
    from ndjir_tpu.models.fields import init_model
    from ndjir_tpu.render.loss import total_loss  # noqa: F401  (compiled path)
    from ndjir_tpu.train.optim import init_optimizer
    from ndjir_tpu.train.trainer import train_step

    # G=512 (the reference default) needs ~20 GB HBM for params + dual-Adam
    # moments + gradient + scatter temporaries — fine on the v5p target
    # (95 GB/chip) but not on the 16 GB v5e dev chip, so the bench default
    # is G=256 (same op mix, 1/8 the table).
    grid = int(os.environ.get("NDJIR_BENCH_GRID", "256"))
    n_steps = int(os.environ.get("NDJIR_BENCH_STEPS", "20"))
    config = os.environ.get("NDJIR_BENCH_CONFIG", "default")
    mlp_dtype = os.environ.get("NDJIR_BENCH_MLP_DTYPE", "bfloat16")

    overrides = [
        f"geometric_network.voxel.grid_size={grid}",
        # bf16 MXU with f32 accumulation is the production TPU precision
        # (loss parity to ~3e-4); set NDJIR_BENCH_MLP_DTYPE=float32 for the
        # strict-parity path.
        f"precision.mlp_dtype={mlp_dtype}",
    ]
    # NDJIR_BENCH_PROPOSAL=coarse_grid A/Bs the cached-proposal opt-in
    # (amortized refresh included in the timed loop); default is the
    # reference-parity network-proposal path.
    proposal = os.environ.get("NDJIR_BENCH_PROPOSAL", "")
    if proposal:
        overrides.append(f"renderer.proposal_method={proposal}")
    conf = load_config(config, overrides=overrides)
    B, R = conf.train.batch_size, conf.train.n_rays

    key = jax.random.PRNGKey(0)
    params = init_model(key, conf)
    opt_state = init_optimizer(params)

    ks = jax.random.split(key, 4)
    camloc = jnp.tile(jnp.asarray([[0.0, 0.0, 2.5]]), (B, 1))
    raydir = jax.random.normal(ks[0], (B, R, 3)) - jnp.asarray([0.0, 0.0, 3.0])
    raydir = raydir / jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    color_gt = jax.random.uniform(ks[1], (B, R, 3))
    obj_mask = jnp.ones((B, R, 1), jnp.float32)

    args = (jnp.float32(0.5), jnp.float32(1.0), jnp.float32(5e-4),
            jnp.float32(5e-4))

    # fixed graph seeds => MC uniforms are step-invariant; hoist them
    from ndjir_tpu.render.renderer import make_mc_cdfs
    cdfs = jax.jit(lambda: make_mc_cdfs(conf, B, R))() \
        if conf.renderer.fixed_graph_seeds else None

    refresh = pgrid = None
    refresh_k = int(conf.renderer.get("proposal_refresh_interval", 16))
    if conf.renderer.get("proposal_method", "network") == "coarse_grid":
        from ndjir_tpu.render.sampler import make_proposal_grid
        refresh = jax.jit(lambda p: make_proposal_grid(p, conf))
        pgrid = refresh(params)

    import numpy as np

    def sync(tree):
        # On the axon tunnel, block_until_ready can return before remote
        # execution finishes; a host transfer of a param leaf is the only
        # reliable barrier (it depends on the whole chained computation).
        leaf = jax.tree_util.tree_leaves(tree)[0]
        np.asarray(leaf.ravel()[:1])

    # warmup / compile
    params, opt_state, mon = train_step(
        params, opt_state, camloc, raydir, color_gt, obj_mask, *args,
        jnp.int32(0), conf, cdfs=cdfs, proposal_grid=pgrid)
    sync((params, mon))

    t0 = time.perf_counter()
    for i in range(n_steps):
        if refresh is not None and (i + 1) % refresh_k == 0:
            pgrid = refresh(params)
        params, opt_state, mon = train_step(
            params, opt_state, camloc, raydir, color_gt, obj_mask, *args,
            jnp.int32(i + 1), conf, cdfs=cdfs, proposal_grid=pgrid)
    sync((params, mon))
    dt = time.perf_counter() - t0

    rays_per_s = B * R * n_steps / dt
    print(json.dumps({
        "metric": "train_rays_per_s_per_chip",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
