#!/usr/bin/env python
"""Grid-op microbenchmarks (reference: scripts/bench_voxel_hash.py,
bench_lanczos_voxel.py — timed fwd+bwd loops).

Times forward and feature-backward of every grid encoding at the training
workload's query count, with the axon-safe host-transfer sync.

Usage: PYTHONPATH=<repo>:/root/.axon_site python scripts/bench_grid_ops.py [n_points]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ndjir_tpu.utils.runtime import setup_compilation_cache  # noqa: E402

setup_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ndjir_tpu.config import load_config  # noqa: E402
from ndjir_tpu.ops.grid import GridEncoding  # noqa: E402


def bench(name, fn, *args, n=10):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    print(f"{name:42s} {(time.perf_counter() - t0) / n * 1000:9.2f} ms")


def main():
    n_pts = int(sys.argv[1]) if len(sys.argv) > 1 else 4 * 512 * 128
    x = jax.random.uniform(jax.random.PRNGKey(0), (n_pts, 3),
                           minval=-1, maxval=1)
    print(f"n_points = {n_pts}, backend = {jax.default_backend()}")

    for gtype, G in [("voxel", 256), ("cosine_voxel", 256),
                     ("lanczos_voxel", 128), ("triplane", 2048),
                     ("triline", 2048), ("triplaneline", 2048),
                     ("voxel_hash", 16)]:
        conf = load_config("default", overrides=[
            f"geometric_network.voxel.type={gtype}",
            f"geometric_network.voxel.grid_size={G}"])
        enc = GridEncoding(conf.geometric_network.voxel)
        params = enc.init(jax.random.PRNGKey(1))

        fwd = jax.jit(lambda p, x_: enc.apply(p, x_))
        bench(f"{gtype} (G={G}) fwd", fwd, params, x)
        bwd = jax.jit(lambda p, x_: jax.grad(
            lambda pp: enc.apply(pp, x_).sum())(p))
        bench(f"{gtype} (G={G}) bwd-feature", bwd, params, x)


if __name__ == "__main__":
    main()
