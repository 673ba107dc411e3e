"""Component micro-benchmarks on the real chip (profiler-free attribution).

Times isolated pieces of the training step at the default workload shapes
(B=4, R=512, N=128, M=2x128 dirs, G=256).  Iterations are serialized through
a data dependency (out feeds a scalar into the next input) so the axon
tunnel's async dispatch cannot fake the numbers; sync is a host transfer.

Usage: python scripts/micro_bench.py [name ...]
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
from ndjir_tpu.models.fields import (  # noqa: E402
    geometric_apply,
    init_model,
    photogrammetric_apply,
    soft_visibility_apply,
)
from ndjir_tpu.ops.grid import query_voxel  # noqa: E402
from ndjir_tpu.ops.scatter_pallas import scatter_add_rows  # noqa: E402
from ndjir_tpu.render.renderer import (  # noqa: E402
    make_mc_cdfs,
    pb_render,
    sdf_value_and_spatial_grad,
)
from ndjir_tpu.render.sampler import sample_points  # noqa: E402

GRID = int(os.environ.get("NDJIR_MICRO_GRID", "256"))
STEPS = int(os.environ.get("NDJIR_MICRO_STEPS", "10"))

conf = load_config("default", overrides=[
    f"geometric_network.voxel.grid_size={GRID}",
    "precision.mlp_dtype=bfloat16",
    f"precision.grid_dtype="
    f"{os.environ.get('NDJIR_MICRO_GRID_DTYPE', 'bfloat16')}",
])
B, R, N = 4, 512, 128
M = 2 * conf.renderer.n_thetas ** 2

key = jax.random.PRNGKey(0)
params = init_model(key, conf)
ks = jax.random.split(key, 8)
x = 0.9 * (2 * jax.random.uniform(ks[0], (B, R, N, 3)) - 1)
camloc = jnp.tile(jnp.asarray([[0.0, 0.0, 2.5]]), (B, 1))
raydir = jax.random.normal(ks[1], (B, R, 3)) - jnp.asarray([0.0, 0.0, 3.0])
raydir = raydir / jnp.linalg.norm(raydir, axis=-1, keepdims=True)
feature = jax.random.normal(ks[2], (B, R, N, 256))
normal = jax.random.normal(ks[3], (B, R, N, 3))
normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
dirs = jax.random.normal(ks[4], (B, R, M, 3))
dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
feat_pix = jnp.broadcast_to(feature[:, :, :1, :], (B, R, M, 256))
x_pix = jnp.broadcast_to(x[:, :, :1, :], (B, R, M, 3))
n_rows = 4 * B * R * N
ids = jax.random.randint(ks[5], (n_rows,), 0, GRID ** 3)
vals = jax.random.normal(ks[6], (n_rows, 8))
cdfs = jax.jit(lambda: make_mc_cdfs(conf, B, R))()


def timeit(name, fn, *args):
    """fn(eps, *args) -> array; eps serializes the chain.

    args (incl. any params trees) are passed as jit ARGUMENTS — closed-over
    arrays would be embedded in the HLO as constants, and a 268 MB grid
    table blows the axon remote-compile upload limit (HTTP 413)."""
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(jnp.float32(0.0), *args)
    np.asarray(jax.device_get(out).ravel()[:1])
    compile_s = time.perf_counter() - t0
    eps = out.ravel()[0] * 1e-30
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = f(eps, *args)
        eps = out.ravel()[0] * 1e-30
    np.asarray(jax.device_get(out).ravel()[:1])
    ms = (time.perf_counter() - t0) / STEPS * 1000
    print(f"{name:26s} {ms:8.2f} ms  (compile {compile_s:.0f}s)", flush=True)


GEO = params["geometric-network"]


def bench_geo_query_fwd():
    timeit("grid_query_fwd", lambda e, F, x_: query_voxel(
        x_ + e, F).sum(-1, keepdims=True), GEO["grid"]["F"], x)


def bench_geo_fwd():
    timeit("geometric_fwd", lambda e, p, x_: geometric_apply(
        p, x_ + e, conf)[0], GEO, x)


def bench_geo_grad():
    timeit("geometric_fwd+spatialgrad",
           lambda e, p, x_: sdf_value_and_spatial_grad(
               {"geometric-network": p}, x_ + e, conf, with_tv=True)[3],
           GEO, x)


def bench_geo_full_bwd():
    def f(e, p0, x_):
        def loss(p):
            sdf, feat, gain, gx, tv = sdf_value_and_spatial_grad(
                {"geometric-network": p}, x_ + e, conf, with_tv=True)
            return (jnp.sum(sdf) + jnp.sum(feat) * 1e-3
                    + jnp.sum((jnp.linalg.norm(gx, axis=-1) - 1) ** 2)
                    + jnp.sum(tv))
        g = jax.grad(loss)(p0)
        return g["affine-00"]["W"]
    timeit("geometric_full_bwd(eik+tv)", f, GEO, x)


def bench_soft_vis():
    def f(e, p0, x_, d_, ft_):
        def loss(p):
            return jnp.sum(soft_visibility_apply(p, x_ + e, d_, ft_, d_,
                                                 conf))
        return jax.grad(loss)(p0)["affine-00"]["W"]
    timeit("soft_vis_fwd+bwd(M dirs)", f,
           params["soft-visibility-light-network"], x_pix, dirs, feat_pix)


def bench_soft_vis_split():
    """Per-pixel parts at axis-2 size 1 (the split-first-affine fast path)."""
    def f(e, p0, x_, d_, ft_, nm_):
        def loss(p):
            return jnp.sum(soft_visibility_apply(p, x_ + e, d_, ft_, nm_,
                                                 conf))
        return jax.grad(loss)(p0)["affine-00"]["W"]
    timeit("soft_vis_split_fwd+bwd", f,
           params["soft-visibility-light-network"], x[:, :, :1, :], dirs,
           feature[:, :, :1, :], normal[:, :, :1, :])


def bench_photo():
    def f(e, p0, x_, ft_, nm_):
        def loss(p):
            return jnp.sum(photogrammetric_apply(
                p, x_ + e, camloc, -raydir.reshape(B, R, 1, 3), ft_,
                nm_, jnp.float32(1.0), conf))
        return jax.grad(loss)(p0)["affine-00"]["W"]
    timeit("photogrammetric_fwd+bwd", f,
           params["photogrammetric-light-network"], x, feature, normal)


def bench_scatter():
    timeit("scatter_1M_rows_d8", lambda e, v: scatter_add_rows(
        ids, v + e, GRID ** 3).sum(-1)[:8], vals)


def bench_sort():
    timeit("sort_1M_multi", lambda e, v: jax.lax.sort(
        (ids, v[:, 0] + e, v[:, 1], v[:, 2], v[:, 3]), num_keys=1)[1][:8],
        vals)


def bench_sampler():
    timeit("sample_points_full", lambda e, p, c: sample_points(
        p, c + e, raydir, cdfs["stratified"], cdfs["background"], conf,
        rand_u=cdfs["upsample"])[0][..., :1], params, camloc)


def bench_render_fwd():
    def f(e, p, c):
        xf, tf, xb, tb, mk = sample_points(
            p, c + e, raydir, cdfs["stratified"], cdfs["background"],
            conf, rand_u=cdfs["upsample"])
        res = pb_render(p, xf, tf, xb, tb, c + e, raydir, mk,
                        0.5, 1.0, cdfs, conf)
        return res["color_pixel"]
    timeit("sample+render_fwd", f, params, camloc)


BENCHES = {
    "grid_query": bench_geo_query_fwd,
    "geo_fwd": bench_geo_fwd,
    "geo_grad": bench_geo_grad,
    "geo_full_bwd": bench_geo_full_bwd,
    "soft_vis": bench_soft_vis,
    "soft_vis_split": bench_soft_vis_split,
    "photo": bench_photo,
    "scatter": bench_scatter,
    "sort": bench_sort,
    "sampler": bench_sampler,
    "render_fwd": bench_render_fwd,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(BENCHES)
    for n in names:
        BENCHES[n]()
