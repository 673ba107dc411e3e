"""Chip probe: duplicated-row table BUILD formulations (round-4 decision).

Round-3/4 diagnosis: the committed concat-chain builds of the z-dup/octa
tables either (a) never materialize — XLA rewrites gather(concat(...)) into
per-slice narrow gathers (~95 ns/point observed in-step vs ~15-39 ns/row
from a materialized table) — or (b) materialize catastrophically (233 ms
standalone at G=256) because every chain op runs on 4-32-lane arrays that
pad to 128 lanes.  The conv-based rewrite does not compile on this TPU
toolchain (remote tpu_compile_helper exit 1, BENCH_MODES 2026-08-20).

This probe times, per variant: the build alone, and build + 524k-row
gather + sum (forcing the table the gather actually reads), against a
prebuilt-table gather floor.  Variants:

  prebuilt   gather from an existing (G^3, 8D) table (floor; no build)
  concat     committed concat-chain octa build (the bad case)
  wide_xla   8 shift variants on (Gx, Gy, Gz*D) wide views + one final
             stack/reshape interleave + optimization_barrier
  pairwin    pair-window z-dup table: concat of 1-D flat slices (pure
             memcpy), parity row ids — 4 gathers/point of 2D rows
             (zdup-shaped; replaces interleave with id math)
  pallas     Pallas octa build kernel (in-kernel stack+reshape interleave)
  pallas_t   Pallas build writing (Gx, Gy, 8, Gz*D) + XLA transpose +
             optimization_barrier

Writes docs/probe_build_variants.json incrementally.

CAVEAT (learned from the 2026-08-20 run): the `build_ms` numbers are
meaningless — the probe reads only 8 elements of the built table, so XLA
dead-code-eliminates almost the entire build.  Only `build_gather_ms`
(optimization_barrier forces the full table, then 524k rows are gathered)
and the `prebuilt` floors are real.  Conclusions from that run: the
committed concat-chain build + barrier materializes in ~12 ms at G=256 bf16
(28.79 total vs 16.49 prebuilt), beating the wide-view stack/reshape build
(34.36); the Pallas builds and the conv build crash the remote
tpu_compile_helper; pair-window rows gather at 11.9 ns/row prebuilt.  The
round-3 "233 ms standalone concat build" measurement was polluted by a
concurrently running probe and is retracted.
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

OUT = os.path.join(REPO, "docs", "probe_build_variants.json")
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
    return (time.perf_counter() - t0) / STEPS * 1e3  # ms


# surface-clustered ids: points near a sphere shell, like real SDF samples
def make_ids(n, seed=0):
    rng = np.random.RandomState(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    r = 0.5 + 0.05 * rng.normal(size=(n, 1))
    x = np.clip((d * r + 1.0) * 0.5 * (G - 1), 0, G - 1 - 1e-4)
    i = x.astype(np.int64)
    return (i[:, 0] * G * G + i[:, 1] * G + i[:, 2]).astype(np.int32)


IDS = jnp.asarray(make_ids(NPTS))
FEAT = (1e-3 * jax.random.normal(jax.random.PRNGKey(0), (G, G, G, D))
        ).astype(jnp.bfloat16)


# --- builds ---------------------------------------------------------------

def build_concat(f):
    def dup(t, axis):
        shifted = jnp.concatenate(
            [jax.lax.slice_in_dim(t, 1, t.shape[axis], axis=axis),
             jax.lax.slice_in_dim(t, t.shape[axis] - 1, t.shape[axis],
                                  axis=axis)], axis=axis)
        return jnp.concatenate([t, shifted], axis=-1)

    t = dup(f, 2)
    t = dup(t, 1)
    t = dup(t, 0)
    return t.reshape(-1, 8 * f.shape[-1])


def build_wide_xla(f):
    Gx, Gy, Gz, d = f.shape
    A = f.reshape(Gx, Gy, Gz * d)
    B = jnp.concatenate([A[1:], A[-1:]], axis=0)          # x+1
    outs = []
    for S in (A, B):
        Sy = jnp.concatenate([S[:, 1:], S[:, -1:]], axis=1)
        for T in (S, Sy):
            Tz = jnp.concatenate([T[:, :, d:], T[:, :, -d:]], axis=2)
            outs.extend([T, Tz])
    # order: (A,Az,Ay,Ayz,B,Bz,By,Byz) == c = dx*4+dy*2+dz
    stack = jnp.stack([o.reshape(Gx, Gy, Gz, d) for o in outs], axis=3)
    return stack.reshape(-1, 8 * d)


def build_pairwin(f):
    """(G^3 + pad, 2D) pair-window table from the flat buffer: row r < H
    holds cells (2r, 2r+1); row r >= H holds (2(r-H)+1, 2(r-H)+2)."""
    flat = f.reshape(-1)
    d = f.shape[-1]
    odd = jnp.concatenate([flat[d:], flat[-d:]])
    return jnp.concatenate([flat, odd]).reshape(-1, 2 * d)


def pairwin_ids(ids):
    """Cell id m (z-corner pre-clamped to Gz-2) -> pair-table row id."""
    H = (G * G * G) // 2
    return (ids & 1) * H + (ids >> 1)


def _pallas_octa_kernel(a_ref, b_ref, out_ref, *, d, interleave):
    A = a_ref[0]                       # (Gy, Gz*D)
    B = b_ref[0]
    outs = []
    for S in (A, B):
        Sy = jnp.concatenate([S[1:], S[-1:]], axis=0)
        for T in (S, Sy):
            Tz = jnp.concatenate([T[:, d:], T[:, -d:]], axis=1)
            outs.extend([T, Tz])
    if interleave:
        Gy, GzD = A.shape
        stack = jnp.stack([o.reshape(Gy, GzD // d, d) for o in outs], axis=2)
        out_ref[0] = stack.reshape(Gy, 8 * GzD)
    else:
        out_ref[0] = jnp.stack(outs, axis=0)      # (8, Gy, Gz*D)


def build_pallas(f, interleave=True):
    Gx, Gy, Gz, d = f.shape
    fw = f.reshape(Gx, Gy, Gz * d)
    import functools
    kern = functools.partial(_pallas_octa_kernel, d=d, interleave=interleave)
    out_shape = (jax.ShapeDtypeStruct((Gx, Gy, 8 * Gz * d), f.dtype)
                 if interleave else
                 jax.ShapeDtypeStruct((Gx, 8, Gy, Gz * d), f.dtype))
    out_spec = (pl.BlockSpec((1, Gy, 8 * Gz * d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
                if interleave else
                pl.BlockSpec((1, 8, Gy, Gz * d), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kern,
        grid=(Gx,),
        in_specs=[
            pl.BlockSpec((1, Gy, Gz * d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gy, Gz * d),
                         lambda i: (jnp.minimum(i + 1, Gx - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
    )(fw, fw)
    if interleave:
        return out.reshape(-1, 8 * d)
    # (Gx, 8, Gy, GzD) -> (Gx, Gy, Gz, 8, D) -> rows
    t = out.reshape(Gx, 8, Gy, Gz, d).transpose(0, 2, 3, 1, 4)
    return t.reshape(-1, 8 * d)


# --- probes ---------------------------------------------------------------

def probe(name, build, ids=IDS, width=8 * D, barrier=True):
    res = {}
    try:
        def fb(e, f):
            t = build((f + e.astype(f.dtype)))
            return t.ravel()[:8].astype(jnp.float32)

        res["build_ms"] = round(timeit(fb, FEAT), 2)
    except Exception as exc:
        res["build_error"] = str(exc)[:300]
        save(name, res)
        return

    try:
        def fg(e, f, i):
            t = build((f + e.astype(f.dtype)))
            if barrier:
                t = jax.lax.optimization_barrier(t)
            return t[i].astype(jnp.float32).sum(0)

        ms = timeit(fg, FEAT, ids)
        res["build_gather_ms"] = round(ms, 2)
        res["ns_per_row_incl_build"] = round(
            ms * 1e6 / (ids.size if ids.ndim == 1 else ids.size), 2)
    except Exception as exc:
        res["gather_error"] = str(exc)[:300]
    save(name, res)


def main():
    which = sys.argv[1:] or ["prebuilt", "pairwin", "wide_xla", "pallas_t",
                             "pallas", "concat"]
    done = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            done = json.load(f)
    for name in which:
        if name in done and "build_error" not in done[name]:
            print(f"[{name}] cached {done[name]}", flush=True)
            continue
        t0 = time.time()
        if name == "prebuilt":
            table = jax.device_put(build_pairwin(FEAT))  # cheap to create
            octa = jax.device_put(np.asarray(
                build_concat(np.asarray(FEAT, np.float32)).astype(
                    jnp.bfloat16)))

            def g(e, t, i):
                return t[i].astype(jnp.float32).sum(0) + e

            ms = timeit(g, octa, IDS)
            save("prebuilt", {
                "octa_gather_ms": round(ms, 2),
                "octa_ns_per_row": round(ms * 1e6 / NPTS, 2)})
            ms4 = timeit(g, table, pairwin_ids(
                jnp.concatenate([IDS, IDS + G, IDS + G * G,
                                 IDS + G * G + G])))
            d2 = dict(done.get("prebuilt", {}))
            d2.update({"octa_gather_ms": round(ms, 2),
                       "octa_ns_per_row": round(ms * 1e6 / NPTS, 2),
                       "pairwin_4x_gather_ms": round(ms4, 2),
                       "pairwin_ns_per_point": round(ms4 * 1e6 / NPTS, 2)})
            save("prebuilt", d2)
        elif name == "concat":
            probe("concat", build_concat)
        elif name == "wide_xla":
            probe("wide_xla", build_wide_xla)
        elif name == "pairwin":
            ids4 = pairwin_ids(jnp.concatenate(
                [IDS, IDS + G, IDS + G * G, IDS + G * G + G]))
            probe("pairwin", build_pairwin, ids=ids4, width=2 * D)
        elif name == "pallas":
            probe("pallas", lambda f: build_pallas(f, True))
        elif name == "pallas_t":
            probe("pallas_t", lambda f: build_pallas(f, False))
        print(f"[{name}] wall {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
