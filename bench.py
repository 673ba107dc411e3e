"""Benchmark: training-step ray throughput (fwd+bwd+update), single or mesh.

Prints ONE final JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's derived A100 throughput of ~4.1k rays/s at the
default workload (B=4, R=512, 128 fg + 32 bg samples, 2x128 light dirs;
BASELINE.md).  The benchmarked step is the same default-config workload.

Env knobs:
  NDJIR_BENCH_GRID      grid size (default 256; 512 is the reference default
                        and needs precision.grid_dtype=bfloat16 on 16 GB)
  NDJIR_BENCH_STEPS     timed steps (default 20)
  NDJIR_BENCH_CONFIG    config name (default "default")
  NDJIR_BENCH_MLP_DTYPE bfloat16 (default) | float32 strict-parity
  NDJIR_BENCH_PROPOSAL  "" (reference network proposals) | coarse_grid opt-in
  NDJIR_BENCH_MESH      "D,R" scaling mode: weak-scaled global batch
                        (B*D, R*R_axis) over a (data, rays) device mesh; also
                        times the [1,1] single-device run and reports a
                        scaling_efficiency line before the headline per-chip
                        line.  Runnable on the CPU virtual mesh for plumbing:
                        JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8.
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_RAYS_PER_S = 4100.0


def build_conf(mesh=(1, 1)):
    from ndjir_tpu.config import load_config

    grid = int(os.environ.get("NDJIR_BENCH_GRID", "256"))
    config = os.environ.get("NDJIR_BENCH_CONFIG", "default")
    mlp_dtype = os.environ.get("NDJIR_BENCH_MLP_DTYPE", "bfloat16")
    overrides = [
        f"geometric_network.voxel.grid_size={grid}",
        # bf16 MXU with f32 accumulation is the production TPU precision
        # (loss parity to ~3e-4); NDJIR_BENCH_MLP_DTYPE=float32 for strict
        # parity.
        f"precision.mlp_dtype={mlp_dtype}",
        f"parallel.mesh_shape=[{mesh[0]},{mesh[1]}]",
    ]
    # bf16 grid tables are the production TPU precision (f32 master weights
    # and f32 scatter accumulation; halves the gather bytes and the table's
    # HBM footprint).  NDJIR_BENCH_GRID_DTYPE=float32 for strict parity.
    grid_dtype = os.environ.get("NDJIR_BENCH_GRID_DTYPE", "bfloat16")
    if grid_dtype and grid_dtype != "float32":
        overrides.append(f"precision.grid_dtype={grid_dtype}")
    if os.environ.get("NDJIR_BENCH_REMAT", ""):
        overrides.append("train.remat_heads=true")
    # NDJIR_BENCH_PROPOSAL=coarse_grid A/Bs the cached-proposal opt-in
    # (amortized refresh included in the timed loop); default is the
    # reference-parity network-proposal path.
    proposal = os.environ.get("NDJIR_BENCH_PROPOSAL", "")
    if proposal:
        overrides.append(f"renderer.proposal_method={proposal}")
    return load_config(config, overrides=overrides)


def time_one(conf, mesh=(1, 1)):
    """Compile + time the train step for one mesh shape; returns rays/s."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ndjir_tpu.models.fields import init_model
    from ndjir_tpu.parallel.mesh import ShardingPlan
    from ndjir_tpu.render.renderer import make_mc_cdfs
    from ndjir_tpu.train.optim import init_optimizer
    from ndjir_tpu.train.trainer import train_step

    n_steps = int(os.environ.get("NDJIR_BENCH_STEPS", "20"))
    plan = ShardingPlan(conf)
    # weak scaling: per-chip workload stays at the reference (B, R)
    B = conf.train.batch_size * mesh[0]
    R = conf.train.n_rays * mesh[1]

    key = jax.random.PRNGKey(0)
    params = init_model(key, conf)
    opt_state = init_optimizer(params)
    params = plan.replicate(params)
    opt_state = plan.replicate(opt_state)

    ks = jax.random.split(key, 4)
    camloc = jnp.tile(jnp.asarray([[0.0, 0.0, 2.5]]), (B, 1))
    raydir = jax.random.normal(ks[0], (B, R, 3)) - jnp.asarray([0.0, 0.0, 3.0])
    raydir = raydir / jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    color_gt = jax.random.uniform(ks[1], (B, R, 3))
    obj_mask = jnp.ones((B, R, 1), jnp.float32)
    camloc, raydir, color_gt, obj_mask = plan.shard_batch(
        camloc, raydir, color_gt, obj_mask)

    args = (jnp.float32(0.5), jnp.float32(1.0), jnp.float32(5e-4),
            jnp.float32(5e-4))

    # fixed graph seeds => MC uniforms are step-invariant; hoist them
    cdfs = jax.jit(lambda: make_mc_cdfs(conf, B, R))() \
        if conf.renderer.fixed_graph_seeds else None

    refresh = pgrid = None
    refresh_k = int(conf.renderer.get("proposal_refresh_interval", 16))
    if conf.renderer.get("proposal_method", "network") == "coarse_grid":
        from ndjir_tpu.render.sampler import make_proposal_grid
        refresh = jax.jit(lambda p: make_proposal_grid(p, conf))
        pgrid = refresh(params)

    def sync(tree):
        # On the axon tunnel, block_until_ready can return before remote
        # execution finishes; a host transfer of a param leaf is the only
        # reliable barrier (it depends on the whole chained computation).
        leaf = jax.tree_util.tree_leaves(tree)[0]
        np.asarray(jax.device_get(leaf).ravel()[:1])

    # NDJIR_BENCH_SPC>1 benches the fused multi-step scan path
    # (train.steps_per_call): n_steps land in ceil(n/spc) jitted calls with
    # pre-staged batches instead of one dispatch per step.
    spc = int(os.environ.get("NDJIR_BENCH_SPC", "1"))
    if spc > 1:
        from ndjir_tpu.train.trainer import train_steps

        def stack(x):
            return jnp.broadcast_to(x, (spc, *x.shape))

        scl, srd = stack(camloc), stack(raydir)
        scg, som = stack(color_gt), stack(obj_mask)
        params, opt_state, mons = train_steps(
            params, opt_state, scl, srd, scg, som, *args, jnp.int32(0),
            conf, cdfs=cdfs, proposal_grid=pgrid)
        sync((params, mons))
        n_calls = max(1, n_steps // spc)
        t0 = time.perf_counter()
        for i in range(n_calls):
            params, opt_state, mons = train_steps(
                params, opt_state, scl, srd, scg, som, *args,
                jnp.int32((i + 1) * spc), conf, cdfs=cdfs,
                proposal_grid=pgrid)
        sync((params, mons))
        dt = time.perf_counter() - t0
        return B * R * spc * n_calls / dt

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
    return B * R * n_steps / dt


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ndjir_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()

    mesh_env = os.environ.get("NDJIR_BENCH_MESH", "")
    if mesh_env:
        mesh = tuple(int(v) for v in mesh_env.split(","))
        n_dev = mesh[0] * mesh[1]
        r1 = time_one(build_conf((1, 1)), (1, 1))
        rN = time_one(build_conf(mesh), mesh)
        per_chip = rN / n_dev
        print(json.dumps({
            "metric": "scaling_efficiency",
            "value": round(per_chip / r1, 4),
            "unit": f"per-chip rays/s at mesh {list(mesh)} vs [1,1]",
            "vs_baseline": round(rN / BASELINE_RAYS_PER_S, 3),
        }))
        rays_per_s = per_chip
    else:
        rays_per_s = time_one(build_conf(), (1, 1))

    print(json.dumps({
        "metric": "train_rays_per_s_per_chip",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
