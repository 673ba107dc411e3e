"""Chip probe: split the octa-table BACKWARD cost (scatter vs fold vs Adam)
and measure every candidate round-5 lever before committing to plumbing.

ablation `tiny_grid` (docs/roofline_data.json) shows the G=256 table block
costs ~80 ms of the 215 ms step; the forward build+gather accounts for
~29 ms (probe_build_variants.json), leaving ~50 ms in the backward chain:
Pallas scatter-add into (8D, G^3) + the octa cotangent fold + table Adam.

Variants (each its own jit; realistic surface-clustered ids):
  build_octa       the barriered octa build alone (12 ms expected)
  gather_prebuilt  524k-row gather from a materialized (G^3, 8D) table
  scatter_d32      scatter_add_rows_t at 524k d=32 rows into 16.7M rows
  scatter_slab_S   the same at slab size S (sweep; default slab is 4096)
  sort_argsort     argsort+gather row permutation vs the kernel's
                   33-operand lax.sort (sort_multiop)
  fold_octa        _fold_octa_cotangent on a (32, G^3) f32 cotangent
                   (3 chained passes + final minor-dim transpose)
  fold_notrans     the same fold WITHOUT the final (1,2,3,0) transpose —
                   bounds what a transposed-layout Adam state would save
  fold_onepass     single-pass 8-shifted-slice fold (reads the cotangent
                   once instead of the 3-pass concat chain)
  adam_table       nnabla-Adam moment+param update on the base table
  gather_vjp       full fwd+bwd of gather_rows_octa (build+gather+scatter
                   +fold) — the complete production backward
  block_base       end-to-end table block as shipped: vjp + Adam
  block_master     master-octa candidate: persistent (G^3, 8D) bf16 param,
                   direct gather (no build), scatter + fold + Adam on the
                   folded base cotangent + dup(delta) applied to the octa
                   param (exact-parity alternative that deletes the build)

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
SLABS = (1024, 2048, 8192, 16384, 32768)

_B1, _B2, _EPS = 0.9, 0.999, 1e-8


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


def _adam_update(p, m, v, g, t):
    m2 = _B1 * m + (1 - _B1) * g
    v2 = _B2 * v + (1 - _B2) * g * g
    bias = jnp.sqrt(1.0 - _B2 ** t) / (1.0 - _B1 ** t)
    p2 = (p.astype(jnp.float32)
          - (1e-2 * bias) * m2 / (jnp.sqrt(v2) + _EPS)).astype(p.dtype)
    return p2, m2, v2


def _apply_dup_delta(octa, delta):
    """octa (G^3, 8D) bf16 minus dup(delta); delta (G, G, G, D) f32.
    Per-block shifted subtract — the incremental-update pass of the
    master-octa candidate (keeps octa == dup(base) invariant exactly)."""
    d16 = delta.astype(octa.dtype)
    o = octa.reshape(G, G, G, 8, D)

    def shifted(f, axis, on):
        if not on:
            return f
        L = f.shape[axis]
        return jnp.concatenate(
            [jax.lax.slice_in_dim(f, 1, L, axis=axis),
             jax.lax.slice_in_dim(f, L - 1, L, axis=axis)], axis=axis)

    blocks = []
    for b in range(8):
        dx, dy, dz = (b >> 2) & 1, (b >> 1) & 1, b & 1
        t = shifted(d16, 0, dx)
        t = shifted(t, 1, dy)
        t = shifted(t, 2, dz)
        blocks.append(o[:, :, :, b, :] - t)
    return jnp.stack(blocks, axis=3).reshape(G ** 3, 8 * D)


def main():
    from ndjir_tpu.ops import grid as gr
    from ndjir_tpu.ops.scatter_pallas import (
        _scatter_add_rows_pallas_t,
        scatter_add_rows_t,
    )

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
    default = ["build_octa", "gather_prebuilt", "scatter_d32",
               "scatter_d32_argsort", "sort_multiop", "sort_argsort",
               "fold_octa", "fold_notrans", "fold_onepass", "adam_table",
               "gather_vjp", "block_base", "block_master"] \
        + [f"scatter_slab_{s}" for s in SLABS]
    # Per-variant wall-clock guard: the remote compile helper HANGS (not
    # errors) on certain programs (block_master's strided-slice views, the
    # 33-operand d=32 multiop sort scatter — both >25 min frozen, measured
    # 2026-08-20).  SIGALRM turns a hang into a recorded per-variant error
    # so one pathological compile cannot stall the whole chip session.
    import signal

    budget_s = int(os.environ.get("NDJIR_PROBE_VARIANT_TIMEOUT", "600"))

    def _alarm(signum, frame):
        raise TimeoutError(f"variant exceeded {budget_s}s (compile hang)")

    signal.signal(signal.SIGALRM, _alarm)

    which = sys.argv[1:] or default
    for name in which:
        if name in done and "error" not in done[name]:
            print(f"[{name}] cached {done[name]}", flush=True)
            continue
        signal.alarm(budget_s)
        try:
            if name == "build_octa":
                def f(e, t):
                    o = jax.lax.optimization_barrier(
                        gr._voxel_octa_flat(t + e.astype(t.dtype)))
                    # full reduction so XLA cannot DCE the build
                    return o.astype(jnp.float32).sum()
                save(name, {"ms": round(timeit(f, feat), 2)})
            elif name == "gather_prebuilt":
                octa = jax.jit(lambda t: jax.lax.optimization_barrier(
                    gr._voxel_octa_flat(t)))(feat)
                octa.block_until_ready()

                def f(e, o, i):
                    return (o[i].astype(jnp.float32) + e).sum()
                save(name, {"ms": round(timeit(f, octa, ids), 2)})
            elif name == "scatter_d32":
                def f(e, i, v):
                    return scatter_add_rows_t(i, v + e, G ** 3)[:, :8].sum()
                save(name, {"ms": round(timeit(f, ids, gvals), 2)})
            elif name.startswith("scatter_slab_"):
                s = int(name.rsplit("_", 1)[1])

                def f(e, i, v, s=s):
                    return _scatter_add_rows_pallas_t(
                        i, v + e, G ** 3, s)[:, :8].sum()
                save(name, {"ms": round(timeit(f, ids, gvals), 2)})
            elif name == "scatter_d32_multiop":
                # the round-4 default strategy, as the explicit baseline for
                # the argsort A/B (the width-dependent default now picks
                # argsort at d=32)
                def f(e, i, v):
                    return _scatter_add_rows_pallas_t(
                        i, v + e, G ** 3, sort_mode="multiop")[:, :8].sum()
                save(name, {"ms": round(timeit(f, ids, gvals), 2)})
            elif name == "scatter_d32_argsort":
                # full scatter with the argsort+gather sort strategy
                def f(e, i, v):
                    return _scatter_add_rows_pallas_t(
                        i, v + e, G ** 3, sort_mode="argsort")[:, :8].sum()
                save(name, {"ms": round(timeit(f, ids, gvals), 2)})
            elif name == "sort_multiop":
                def f(e, i, v):
                    v = v + e
                    ops = (i,) + tuple(v[:, j] for j in range(v.shape[1]))
                    out = jax.lax.sort(ops, num_keys=1)
                    return out[0].sum() + sum(o[:8].sum() for o in out[1:])
                save(name, {"ms": round(timeit(f, ids, gvals), 2)})
            elif name == "sort_argsort":
                def f(e, i, v):
                    v = v + e
                    ids_s, perm = jax.lax.sort(
                        (i, jax.lax.iota(jnp.int32, i.shape[0])), num_keys=1)
                    vs = v[perm]
                    return ids_s.sum() + vs[:8].sum()
                save(name, {"ms": round(timeit(f, ids, gvals), 2)})
            elif name == "fold_octa":
                # explicitly the round-4 3-pass chain (grid's dispatcher now
                # defaults to one-pass; this row is the A side of the A/B)
                def f(e, c):
                    cc = (c + e).reshape(8 * D, G, G, G)
                    cc = gr._fold_dup_axis(cc, 1)
                    cc = gr._fold_dup_axis(cc, 2)
                    cc = gr._fold_dup_axis(cc, 3)
                    return jnp.transpose(cc, (1, 2, 3, 0)).sum()
                save(name, {"ms": round(timeit(f, cot), 2)})
            elif name == "fold_notrans":
                def f(e, c):
                    cc = (c + e).reshape(8 * D, G, G, G)
                    cc = gr._fold_dup_axis(cc, 1)
                    cc = gr._fold_dup_axis(cc, 2)
                    cc = gr._fold_dup_axis(cc, 3)
                    return cc.sum()
                save(name, {"ms": round(timeit(f, cot), 2)})
            elif name == "fold_onepass":
                # correctness vs the chained fold, then timing (this is the
                # production default, ops/grid.py:_fold_octa_cotangent_onepass)
                small = cot[:, :64 ** 3]

                def chain(c):
                    cc = c.reshape(8 * D, 64, 64, 64)
                    cc = gr._fold_dup_axis(cc, 1)
                    cc = gr._fold_dup_axis(cc, 2)
                    cc = gr._fold_dup_axis(cc, 3)
                    return jnp.transpose(cc, (1, 2, 3, 0))
                ref = jax.jit(chain)(small)
                alt = jax.jit(lambda c: gr._fold_octa_cotangent_onepass(
                    c, (64, 64, 64, D)))(small)
                err = float(jnp.max(jnp.abs(ref - alt)))

                def f(e, c):
                    return gr._fold_octa_cotangent_onepass(
                        c + e, (G, G, G, D)).sum()
                save(name, {"ms": round(timeit(f, cot), 2),
                            "max_err_vs_chain": err})
            elif name == "fold_flat":
                # candidate: bulk shift of ALL active axes in ONE pad+slice
                # per block (no nested concat chains), plus the clamped-edge
                # cross terms as boundary-plane .at[].add updates (each <=
                # a G^2 plane - negligible traffic).  Correctness vs the
                # 3-pass chain at G=64, then timing at G=256.
                def flat_fold(c, g):
                    cc = c.reshape(8, D, g, g, g)
                    out = cc[0]
                    for b in range(1, 8):
                        # t = cc[b] is (D, g, g, g): grid axes are 1, 2, 3
                        act = [(a + 1) for a in range(3) if (b >> (2 - a)) & 1]
                        t = cc[b]
                        pad = [(0, 0)] * 4
                        for a in act:
                            pad[a] = (1, 0)
                        bulk = jax.lax.pad(t, jnp.float32(0.0),
                                           [(lo, 0, 0) for lo, _ in pad])
                        bulk = bulk[tuple(slice(0, s) for s in t.shape)]
                        out = out + bulk
                        # edge cross terms: every nonempty subset T of the
                        # active axes pins those axes to G-1 on input+output,
                        # remaining active axes shift (adjoint of clamp-dup)
                        for mask_t in range(1, 1 << len(act)):
                            sub = [act[j] for j in range(len(act))
                                   if (mask_t >> j) & 1]
                            rest = [a for a in act if a not in sub]
                            src = t
                            idx = [slice(None)] * 4
                            for a in sub:
                                idx[a] = slice(g - 1, g)
                            src = src[tuple(idx)]
                            for a in rest:
                                zero = jnp.zeros_like(
                                    jax.lax.slice_in_dim(src, 0, 1, axis=a))
                                src = jnp.concatenate(
                                    [zero,
                                     jax.lax.slice_in_dim(src, 0, g - 1,
                                                          axis=a)], axis=a)
                            out_idx = tuple(
                                slice(g - 1, g) if a in sub else slice(None)
                                for a in range(4))
                            out = out.at[out_idx].add(src)
                    return jnp.moveaxis(out, 0, -1)   # (g, g, g, D)

                small = cot[:, :64 ** 3]

                def chain64(c):
                    cc = c.reshape(8 * D, 64, 64, 64)
                    cc = gr._fold_dup_axis(cc, 1)
                    cc = gr._fold_dup_axis(cc, 2)
                    cc = gr._fold_dup_axis(cc, 3)
                    return jnp.transpose(cc, (1, 2, 3, 0))
                ref = jax.jit(chain64)(small)
                alt = jax.jit(lambda c: flat_fold(c, 64))(small)
                err = float(jnp.max(jnp.abs(ref - alt)))

                def f(e, c):
                    return flat_fold(c + e, G).sum()
                save(name, {"ms": round(timeit(f, cot), 2),
                            "max_err_vs_chain": err})
            elif name in ("fold_2d", "fold_2d_notrans"):
                # flat2d: the 3-pass halving chain in the scatter kernel's
                # native (channels, G^3) layout — lane shifts + iota masks,
                # no reshape of the cotangent onto a (G,G,G) tiling
                small = cot[:, :64 ** 3]

                def chain64(c):
                    cc = c.reshape(8 * D, 64, 64, 64)
                    cc = gr._fold_dup_axis(cc, 1)
                    cc = gr._fold_dup_axis(cc, 2)
                    cc = gr._fold_dup_axis(cc, 3)
                    return jnp.transpose(cc, (1, 2, 3, 0))
                ref = jax.jit(chain64)(small)
                alt = jax.jit(lambda c: gr._fold_octa_cotangent_flat2d(
                    c, (64, 64, 64, D)))(small)
                err = float(jnp.max(jnp.abs(ref - alt)))

                if name == "fold_2d":
                    def f(e, c):
                        return gr._fold_octa_cotangent_flat2d(
                            c + e, (G, G, G, D)).sum()
                else:
                    def f(e, c):
                        cc = c + e
                        cc = gr._fold_halve_flat(cc, G * G, G)
                        cc = gr._fold_halve_flat(cc, G, G)
                        cc = gr._fold_halve_flat(cc, 1, G)
                        return cc.sum()
                save(name, {"ms": round(timeit(f, cot), 2),
                            "max_err_vs_chain": err})
            elif name.startswith("fold_pallas"):
                # the Pallas fold kernel (ops/fold_pallas.py); suffix picks
                # the lane-block size, e.g. fold_pallas_65536
                from ndjir_tpu.ops import fold_pallas as fpk
                blk = int(name.rsplit("_", 1)[1]) \
                    if name[len("fold_pallas"):].strip("_").isdigit() \
                    else fpk._BLOCK
                # correctness is pinned by the interpret-mode tests
                # (tests/test_fold_pallas.py); assert support at G=256
                assert fpk.fold_pallas_supported((G, G, G, D))

                def f(e, c, blk=blk):
                    return fpk.fold_octa_cotangent_pallas(
                        c + e, (G, G, G, D), blk).sum()
                save(name, {"ms": round(timeit(f, cot), 2), "block": blk})
            elif name in ("fold_zdup512_4d", "fold_zdup512_2d"):
                # z-dup fold A/B at G=512 (the G=512 production backward):
                # 4-D reshape form vs the flat2d lane-shift form
                G5 = 512
                # ONE 4.3 GB alloc (a concat-of-halves doubled the peak and
                # ResourceExhausted'd the first attempt, 2026-08-20)
                cot5 = jax.jit(lambda: jax.random.normal(
                    jax.random.PRNGKey(9), (8, G5 ** 3), jnp.float32))()
                cot5.block_until_ready()
                gshape5 = (G5, G5, G5, 4)
                if name == "fold_zdup512_4d":
                    def f(e, c):
                        cc = (c + e).reshape(8, G5, G5, G5)
                        cc = gr._fold_dup_axis(cc, 3)
                        return jnp.transpose(cc, (1, 2, 3, 0)).sum()
                else:
                    def f(e, c):
                        cc = gr._fold_halve_flat(c + e, 1, G5)
                        return jnp.transpose(cc, (1, 0)).sum()
                save(name, {"ms": round(timeit(f, cot5), 2)})
            elif name == "adam_table":
                m = jnp.zeros((G, G, G, D), jnp.float32)
                v = jnp.zeros((G, G, G, D), jnp.float32)
                gb = jax.random.normal(jax.random.PRNGKey(3),
                                       (G, G, G, D), jnp.float32)

                def f(e, p, m, v, g):
                    p2, m2, v2 = _adam_update(p, m, v, g + e, 10.0)
                    return p2.astype(jnp.float32).sum() + m2.sum() + v2.sum()
                save(name, {"ms": round(timeit(f, feat, m, v, gb), 2)})
            elif name in ("gather_vjp", "gather_vjp_onepass"):
                # gather_vjp was measured by the session-1 process (3-pass
                # fold); gather_vjp_onepass re-measures the SAME production
                # vjp with the one-pass fold default — run it from a process
                # whose ops/grid.py has _FOLD_ONEPASS on
                def f(e, t, i, g):
                    out, vjp = jax.vjp(
                        lambda b: gr.gather_rows_octa(b, i, (G, G, G, D)), t)
                    # cotangent must match the primal output dtype (bf16)
                    (db,) = vjp((g + e).astype(out.dtype))
                    return db.astype(jnp.float32).sum() \
                        + out.astype(jnp.float32).sum()
                save(name, {"ms": round(timeit(f, feat, ids, gvals), 2)})
            elif name == "block_base":
                m = jnp.zeros((G, G, G, D), jnp.float32)
                v = jnp.zeros((G, G, G, D), jnp.float32)

                def f(e, t, i, g, m, v):
                    out, vjp = jax.vjp(
                        lambda b: gr.gather_rows_octa(b, i, (G, G, G, D)), t)
                    (db,) = vjp((g + e).astype(out.dtype))
                    p2, m2, v2 = _adam_update(t, m, v,
                                              db.astype(jnp.float32), 10.0)
                    return p2.astype(jnp.float32).sum() + m2.sum() \
                        + v2.sum() + out.astype(jnp.float32).sum()
                save(name, {"ms": round(timeit(f, feat, ids, gvals, m, v),
                                        2)})
            elif name == "build_octa_packed":
                def f(e, t):
                    o = jax.lax.optimization_barrier(
                        gr._voxel_octa_packed(t + e.astype(t.dtype), 4))
                    return o.astype(jnp.float32).sum()
                save(name, {"ms": round(timeit(f, feat), 2)})
            elif name == "gather_packed":
                packed = jax.jit(lambda t: jax.lax.optimization_barrier(
                    gr._voxel_octa_packed(t, 4)))(feat)
                packed.block_until_ready()

                def f(e, o, i):
                    rows = o[i // 4]
                    out = gr._packed_select(rows, i % 4, 8 * D, 4)
                    return (out.astype(jnp.float32) + e).sum()
                save(name, {"ms": round(timeit(f, packed, ids), 2)})
            elif name == "octa_packed_fwd":
                # end-to-end packed forward: build + gather + select
                def f(e, t, i):
                    o = jax.lax.optimization_barrier(
                        gr._voxel_octa_packed(t + e.astype(t.dtype), 4))
                    rows = o[i // 4]
                    out = gr._packed_select(rows, i % 4, 8 * D, 4)
                    return out.astype(jnp.float32).sum()
                save(name, {"ms": round(timeit(f, feat, ids), 2)})
            elif name == "gather_vjp_packed":
                # production vjp with the packed forward (backward unchanged)
                old = gr._PACKED_TABLE
                gr._PACKED_TABLE = True
                try:
                    def f(e, t, i, g):
                        out, vjp = jax.vjp(
                            lambda b: gr.gather_rows_octa(
                                b, i, (G, G, G, D)), t)
                        (db,) = vjp((g + e).astype(out.dtype))
                        return db.astype(jnp.float32).sum() \
                            + out.astype(jnp.float32).sum()
                    save(name, {"ms": round(timeit(f, feat, ids, gvals), 2)})
                finally:
                    gr._PACKED_TABLE = old
            elif name in ("zdup512_fwd", "zdup512_packed_fwd"):
                G5 = 512
                feat5 = (1e-3 * jax.random.normal(
                    jax.random.PRNGKey(5), (G5, G5, G5, D))
                ).astype(jnp.bfloat16)
                rng5 = np.random.RandomState(7)
                d5 = rng5.normal(size=(NPTS, 3))
                d5 /= np.linalg.norm(d5, axis=1, keepdims=True)
                r5 = 0.5 + 0.05 * rng5.normal(size=(NPTS, 1))
                x5 = np.clip((d5 * r5 + 1.0) * 0.5 * (G5 - 1), 0,
                             G5 - 1 - 1e-4).astype(np.int64)
                ids5 = jnp.asarray(
                    (x5[:, 0] * G5 * G5 + x5[:, 1] * G5 + x5[:, 2])
                    .astype(np.int32))
                # 4 corner rows per point in production; probe 4x rows
                ids5 = jnp.concatenate([ids5, ids5 + 1, ids5 + G5,
                                        ids5 + G5 + 1])
                if name == "zdup512_fwd":
                    def f(e, t, i):
                        out = gr._voxel_zdup_flat(t + e.astype(t.dtype))[i]
                        return out.astype(jnp.float32).sum()
                else:
                    def f(e, t, i):
                        o = jax.lax.optimization_barrier(
                            gr._voxel_zdup_packed(t + e.astype(t.dtype), 16))
                        rows = o[i // 16]
                        out = gr._packed_select(rows, i % 16, 2 * D, 16)
                        return out.astype(jnp.float32).sum()
                save(name, {"ms": round(timeit(f, feat5, ids5), 2)})
            elif name == "block_master":
                octa = jax.jit(lambda t: jax.lax.optimization_barrier(
                    gr._voxel_octa_flat(t)))(feat)
                octa.block_until_ready()
                m = jnp.zeros((G, G, G, D), jnp.float32)
                v = jnp.zeros((G, G, G, D), jnp.float32)

                def f(e, o, i, g, m, v):
                    # forward: direct gather from the persistent octa param
                    # (no build); backward: hand-rolled kernel scatter+fold
                    out = o[i]
                    cot_t = scatter_add_rows_t(i, (g + e), G ** 3)
                    db = gr._fold_octa_cotangent(cot_t, (G, G, G, D))
                    base = o[:, :D].reshape(G, G, G, D)
                    _, m2, v2 = _adam_update(base, m, v, db, 10.0)
                    bias = jnp.sqrt(1.0 - _B2 ** 10.0) / (1.0 - _B1 ** 10.0)
                    delta = (1e-2 * bias) * m2 / (jnp.sqrt(v2) + _EPS)
                    o2 = _apply_dup_delta(o, delta)
                    return o2.astype(jnp.float32)[:, :8].sum() + m2.sum() \
                        + v2.sum() + out.astype(jnp.float32).sum()
                save(name, {"ms": round(timeit(f, octa, ids, gvals, m, v),
                                        2)})
        except Exception as exc:
            save(name, {"error": str(exc)[:300]})
        finally:
            signal.alarm(0)


if __name__ == "__main__":
    main()
