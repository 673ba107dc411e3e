"""Chip probe: split the octa-gather BACKWARD cost (scatter vs fold).

ablation `tiny_grid` (docs/roofline_data.json) shows the G=256 table block
costs ~80 ms of the 215 ms step; the forward build+gather accounts for
~29 ms (probe_build_variants.json), leaving ~50 ms in the backward chain:
Pallas scatter-add into (8D, G^3) + the octa cotangent fold
(channel-leading shifts + final minor-dim transpose) + table Adam.

Variants (each its own jit; realistic surface-clustered ids):
  scatter_d32   scatter_add_rows_t at 524k d=32 rows into 16.7M rows
  fold_octa     _fold_octa_cotangent on a (32, G^3) f32 cotangent
  fold_notrans  the same fold WITHOUT the final (1,2,3,0) transpose —
                bounds what a transposed-layout Adam state would save
  gather_vjp    full fwd+bwd of gather_rows_octa (build+gather+scatter+fold)

Writes docs/probe_grid_bwd.json incrementally.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ndjir_tpu.utils.runtime import setup_compilation_cache  # noqa: E402

setup_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

OUT = os.path.join(REPO, "docs", "probe_grid_bwd.json")
G, D = 256, 4
NPTS = 524_288
STEPS = int(os.environ.get("NDJIR_PROBE_STEPS", "10"))


def save(key, val):
    data = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            data = json.load(f)
    data[key] = val
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)
    print(f"[{key}] {val}", flush=True)


def timeit(fn, *args):
    f = jax.jit(fn)
    out = f(jnp.float32(0.0), *args)
    np.asarray(jax.device_get(out).ravel()[:1])
    eps = out.ravel()[0].astype(jnp.float32) * 1e-30
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = f(eps, *args)
        eps = out.ravel()[0].astype(jnp.float32) * 1e-30
    np.asarray(jax.device_get(out).ravel()[:1])
    return (time.perf_counter() - t0) / STEPS * 1e3


def make_ids(n, seed=0):
    rng = np.random.RandomState(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    r = 0.5 + 0.05 * rng.normal(size=(n, 1))
    x = np.clip((d * r + 1.0) * 0.5 * (G - 1), 0, G - 1 - 1e-4)
    i = x.astype(np.int64)
    return (i[:, 0] * G * G + i[:, 1] * G + i[:, 2]).astype(np.int32)


def main():
    from ndjir_tpu.ops import grid as gr
    from ndjir_tpu.ops.scatter_pallas import scatter_add_rows_t

    ids = jnp.asarray(make_ids(NPTS))
    feat = (1e-3 * jax.random.normal(jax.random.PRNGKey(0), (G, G, G, D))
            ).astype(jnp.bfloat16)
    gvals = jax.random.normal(jax.random.PRNGKey(1), (NPTS, 8 * D),
                              jnp.float32)
    cot = jax.random.normal(jax.random.PRNGKey(2), (8 * D, G ** 3),
                            jnp.float32)

    done = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            done = json.load(f)
    which = sys.argv[1:] or ["scatter_d32", "fold_octa", "fold_notrans",
                             "gather_vjp"]
    for name in which:
        if name in done:
            print(f"[{name}] cached {done[name]}", flush=True)
            continue
        try:
            if name == "scatter_d32":
                def f(e, i, v):
                    return scatter_add_rows_t(i, v + e, G ** 3)[:, :8].sum()
                save(name, {"ms": round(timeit(f, ids, gvals), 2)})
            elif name == "fold_octa":
                def f(e, c):
                    return gr._fold_octa_cotangent(c + e, (G, G, G, D)).sum()
                save(name, {"ms": round(timeit(f, cot), 2)})
            elif name == "fold_notrans":
                def f(e, c):
                    cc = (c + e).reshape(8 * D, G, G, G)
                    cc = gr._fold_dup_axis(cc, 1)
                    cc = gr._fold_dup_axis(cc, 2)
                    cc = gr._fold_dup_axis(cc, 3)
                    return cc.sum()
                save(name, {"ms": round(timeit(f, cot), 2)})
            elif name == "gather_vjp":
                def f(e, t, i, g):
                    out, vjp = jax.vjp(
                        lambda b: gr.gather_rows_octa(b, i, (G, G, G, D)), t)
                    (db,) = vjp(g + e)
                    return db.astype(jnp.float32).sum() \
                        + out.astype(jnp.float32).sum()
                save(name, {"ms": round(timeit(f, feat, ids,
                                               gvals.astype(feat.dtype)), 2)})
        except Exception as exc:
            save(name, {"error": str(exc)[:300]})


if __name__ == "__main__":
    main()
