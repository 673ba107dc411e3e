"""Multi-resolution grid feature encodings, natively twice-differentiable.

The reference implements 12 grid-query variants as ~8k LoC of hand-written
CUDA with manual first- and second-order backward kernels (reference:
csrc/grid_feature/*.cu, python/grid_feature/*.py), because nnabla cannot
differentiate through gathers twice.  JAX can: every query here is a gather
plus arithmetic on interpolation weights, so the eikonal double-backward
(grad-of-grad w.r.t. the query point) and the feature-scatter backward
(segment-sum instead of atomicAdd) come from autodiff for free.

Layouts (parity with the reference):
  dense voxel   : (G, G, G, D)           reference voxel_feature.py:160
  triplane      : (3, G, G, D), planes (xy, yz, zx)  common_triplane.cuh:44-66
  triline       : (3, G, D),   lines (x, y, z)       common_triline.cuh:24-35
  voxel hash    : flat (n_params,), tcnn-style per-level offsets,
                  8-aligned (common_voxel_hash.cuh:24-55); output channel
                  layout c = d * L + l (voxel_hash_feature_cuda.cu:190 +
                  the transpose in voxel_hash_feature.py:153-155)

Interpolation weights:
  linear : w0 = x1 - x                        (voxel_feature_cuda.cu)
  cosine : w0 = 0.5 cos(pi (x - x0)) + 0.5    (cosine_voxel_feature_cuda.cu:65)
  lanczos: Lanczos-2 windowed sinc, 4 taps/axis, border-clamped taps with
           coefficients evaluated at the clamped position and NO window
           cutoff or renormalisation (lanczos_voxel_feature_cuda.cu:71-89)

TPU notes: gathers run on the sparse core / scalar pipeline; tables up to
512^3 x 4 f32 (2 GiB) stay in HBM.  The pure-jnp forms below are the
correctness oracles; ndjir_tpu.ops.grid_pallas provides fused kernels for
the hot paths where XLA's gather falls short.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ndjir_tpu.ops.scatter_pallas import gather_rows

Vec3 = Sequence[float]
DEFAULT_MIN = (-1.0, -1.0, -1.0)
DEFAULT_MAX = (1.0, 1.0, 1.0)


def _gather_weighted_sum(flat: jax.Array, idx_list, w_list) -> jax.Array:
    """sum_c w_c * flat[idx_c] via ONE batched gather_rows call.

    Batching all corner/tap lookups into a single gather gives the backward a
    single fast scatter (ndjir_tpu.ops.scatter_pallas) instead of one XLA
    scatter per tap.
    """
    C = len(idx_list)
    idx = jnp.stack(idx_list, axis=0)          # (C, ...)
    w = jnp.stack(w_list, axis=0)              # (C, ...)
    f = gather_rows(flat, idx.reshape(C, -1))  # (C, n, D)
    f = f.reshape(*idx.shape, flat.shape[-1])
    return jnp.sum(w[..., None] * f, axis=0)


# ---------------------------------------------------------------------------
# shared coordinate / weight helpers
# ---------------------------------------------------------------------------

def _to_grid(x: jax.Array, grid_sizes1: jax.Array, vmin: jax.Array,
             vmax: jax.Array) -> jax.Array:
    """World coords (..., 3) -> continuous grid coords in [0, G-1]."""
    scales = grid_sizes1 / (vmax - vmin)
    return (x - vmin) * scales


def _corners(xyz: jax.Array, grid_sizes1: jax.Array):
    """Clamped floor/ceil corner coordinates (float, for weight math)."""
    xyz0 = jnp.clip(jnp.floor(xyz), 0.0, grid_sizes1)
    xyz1 = jnp.minimum(xyz0 + 1.0, grid_sizes1)
    return xyz0, xyz1


def _weights(xyz: jax.Array, xyz0: jax.Array, xyz1: jax.Array, kind: str):
    """Per-axis corner-0 weight; corner-1 weight is its complement."""
    if kind == "linear":
        w0 = xyz1 - xyz
    elif kind == "cosine":
        w0 = 0.5 * jnp.cos(jnp.pi * (xyz - xyz0)) + 0.5
    else:
        raise ValueError(f"Unknown interpolation: {kind}")
    return w0, 1.0 - w0


def lanczos_window(x: jax.Array, a: int = 2) -> jax.Array:
    """lanczos(x) = sinc(x) * sinc(x / a) (no |x| < a cutoff; parity with
    csrc/grid_feature/common.cuh:62-69)."""
    return jnp.sinc(x) * jnp.sinc(x / a)


# ---------------------------------------------------------------------------
# dense voxel
# ---------------------------------------------------------------------------

def init_voxel(key: jax.Array, G: int, D: int, eps: float = 1e-3,
               dtype=jnp.float32) -> jax.Array:
    """N(0, eps) init (reference: voxel_feature.py:155-163)."""
    return eps * jax.random.normal(key, (G, G, G, D), dtype=dtype)


_ZDUP_MAX_BYTES = int(os.environ.get("NDJIR_ZDUP_MAX_BYTES", 2_200_000_000))


def use_zdup_layout(gshape, dtype=jnp.float32) -> bool:
    """Whether the z-paired duplicated table layout is used for this grid.

    Budget is the ACTUAL transient table size (dtype-aware), so a bf16
    G=512 x D=4 table (2.15 GB doubled) gets the 4-gather z-dup layout while
    its f32 twin (4.3 GB) falls back to the 8-gather path.  Decisions at the
    f32 reference workloads (G=256 in, G=512 out) are unchanged from the
    old f32-bytes budget; layout parity is guarded by
    tests/test_ops_grid.py::test_nonzdup_path_matches_zdup."""
    Gx, Gy, Gz, D = gshape
    itemsize = jnp.dtype(dtype).itemsize
    return Gx * Gy * Gz * 2 * D * itemsize <= _ZDUP_MAX_BYTES


def _voxel_zdup_flat(feature: jax.Array) -> jax.Array:
    """(G,G,G,D) -> (G^3, 2D) z-paired table: row z holds (z, z+1) features.
    XLA CSE dedupes this build across every query site in a step."""
    return jnp.concatenate(
        [feature,
         jnp.concatenate([feature[:, :, 1:], feature[:, :, -1:]], axis=2)],
        axis=-1).reshape(-1, 2 * feature.shape[-1])


# The octa layout packs ALL 8 cell corners into one 8D-wide row, so a
# trilinear query is ONE gather row per point instead of 4 (z-dup) or 8.
# Measured on v5e (1M random rows, G=256 table): one 64 B bf16 row costs
# 25.5 ns vs 4 x 11.5 ns for the z-dup pair rows — the gather unit's per-row
# cost grows sub-linearly with width.  The 8x table is bf16-only and
# budget-gated (G=256 x D=4 -> 1.07 GB transient; G=512 falls back to z-dup).
_OCTA_MAX_BYTES = int(os.environ.get("NDJIR_OCTA_MAX_BYTES", 1_200_000_000))


def use_octa_layout(gshape, dtype) -> bool:
    """Whether the 8-corner-packed duplicated table layout applies."""
    Gx, Gy, Gz, D = gshape
    return (jnp.dtype(dtype) == jnp.bfloat16
            and Gx * Gy * Gz * 8 * D * 2 <= _OCTA_MAX_BYTES)


def _voxel_octa_flat(feature: jax.Array) -> jax.Array:
    """(G,G,G,D) -> (G^3, 8D): row (x,y,z) holds the features of cells
    (x+dx, y+dy, z+dz), channel block c = dx*4 + dy*2 + dz; the +1 neighbour
    duplicates the last slice per axis (matching the clamped-corner
    semantics of :func:`_corners`).  Autodiff of this build routes the
    duplicated-row cotangents back to the base table (shifted adds)."""
    def dup(f, axis):
        shifted = jnp.concatenate(
            [jax.lax.slice_in_dim(f, 1, f.shape[axis], axis=axis),
             jax.lax.slice_in_dim(f, f.shape[axis] - 1, f.shape[axis],
                                  axis=axis)], axis=axis)
        return jnp.concatenate([f, shifted], axis=-1)

    f = dup(feature, 2)          # (..., 2D): (z0, z1)
    f = dup(f, 1)                # (..., 4D): (y0z0, y0z1, y1z0, y1z1)
    f = dup(f, 0)                # (..., 8D): x0 block then x1 block
    return f.reshape(-1, 8 * feature.shape[-1])


def _fold_dup_axis(c: jax.Array, axis: int) -> jax.Array:
    """Adjoint of one ``dup(f, axis)`` step on a channel-leading cotangent:
    c (2K, ...) -> (K, ...) — identity block + a one-cell shift of the
    duplicated block + the clamped-edge duplicate folded onto the last
    slice."""
    K = c.shape[0] // 2
    a, b = c[:K], c[K:]
    L = b.shape[axis]
    zero = jnp.zeros_like(jax.lax.slice_in_dim(b, 0, 1, axis=axis))
    shifted = jnp.concatenate(
        [zero, jax.lax.slice_in_dim(b, 0, L - 1, axis=axis)], axis=axis)
    out = a + shifted
    last = jax.lax.slice_in_dim(out, L - 1, L, axis=axis) \
        + jax.lax.slice_in_dim(b, L - 1, L, axis=axis)
    return jnp.concatenate(
        [jax.lax.slice_in_dim(out, 0, L - 1, axis=axis), last], axis=axis)


# NDJIR_FOLD_MODE selects the octa cotangent-fold formulation:
#   chain    the round-4 3-pass halving chain on the (8D, G, G, G) view —
#            41 ms at G=256 on-chip (docs/probe_grid_bwd.json)
#   onepass  single-pass 8-shifted-slice fold — 58 ms measured: the lower
#            LOGICAL traffic loses to XLA's per-term materialization of the
#            nested shifts; a committed negative result
#   flat     pad+slice bulk + boundary-plane corrections — 61 ms, same story
#   flat2d   3-pass halving chain working DIRECTLY in the scatter kernel's
#            native (channels, G^3) layout: every shift is a lane shift of
#            the flat minor dim with iota-derived validity/edge masks, so no
#            reshape of the 2 GB cotangent onto a (G, G, G) tiling ever
#            happens (the relayouts are what the 4-D forms pay) — 27.4 ms
#            measured, the production default
# NDJIR_FOLD_ONEPASS=0 is kept as an alias for chain (round-4 scripts).
_FOLD_MODE = os.environ.get("NDJIR_FOLD_MODE", "") or (
    "chain" if os.environ.get("NDJIR_FOLD_ONEPASS", "1") == "0" else "flat2d")


def _shift_edge_adjoint(f: jax.Array, axis: int) -> jax.Array:
    """Adjoint of the clamped +1 duplicate along ``axis``:
    out[u] = f[u-1] (zero at u=0) plus f[L-1] folded onto u=L-1."""
    L = f.shape[axis]
    zero = jnp.zeros_like(jax.lax.slice_in_dim(f, 0, 1, axis=axis))
    shifted = jnp.concatenate(
        [zero, jax.lax.slice_in_dim(f, 0, L - 1, axis=axis)], axis=axis)
    edge = jnp.concatenate(
        [jnp.zeros_like(jax.lax.slice_in_dim(f, 0, L - 1, axis=axis)),
         jax.lax.slice_in_dim(f, L - 1, L, axis=axis)], axis=axis)
    return shifted + edge


def _fold_octa_cotangent_onepass(cot_t: jax.Array, gshape) -> jax.Array:
    """Single-pass adjoint of :func:`_voxel_octa_flat`: the cotangent is
    read ONCE (sum over the 8 channel blocks of per-axis shift-adjoints)
    instead of the 3-pass halving chain, cutting the fold's HBM traffic
    from ~5.7 GB to ~2.4 GB at G=256."""
    Gx, Gy, Gz, D = gshape
    c = cot_t.reshape(8, D, Gx, Gy, Gz)
    out = None
    # block index b = dx*4 + dy*2 + dz (the _voxel_octa_flat channel layout)
    for b in range(8):
        dx, dy, dz = (b >> 2) & 1, (b >> 1) & 1, b & 1
        t = c[b]
        if dx:
            t = _shift_edge_adjoint(t, 1)
        if dy:
            t = _shift_edge_adjoint(t, 2)
        if dz:
            t = _shift_edge_adjoint(t, 3)
        out = t if out is None else out + t
    return jnp.transpose(out, (1, 2, 3, 0))


def _fold_octa_cotangent_flat(cot_t: jax.Array, gshape) -> jax.Array:
    """Flat-shift fold: for each of the 8 channel blocks the bulk shift of
    ALL its active axes is ONE ``lax.pad`` + slice (the S-part of the
    per-axis adjoint (S + E)); the clamped-edge cross terms (products
    containing at least one E) pin those axes to G-1 and touch at most a
    G^2 boundary plane each — 19 small ``.at[].add`` updates whose traffic
    is negligible.  Avoids the nested concat chains of the onepass/chain
    forms, which XLA materializes per nesting level."""
    Gx, Gy, Gz, D = gshape
    cc = cot_t.reshape(8, D, Gx, Gy, Gz)
    sizes = (Gx, Gy, Gz)
    out = cc[0]
    for b in range(1, 8):
        # cc[b] is (D, gx, gy, gz): grid axes are 1, 2, 3
        act = [(a + 1) for a in range(3) if (b >> (2 - a)) & 1]
        t = cc[b]
        padcfg = [(0, 0, 0)] * 4
        for a in act:
            padcfg[a] = (1, 0, 0)
        bulk = jax.lax.pad(t, jnp.zeros((), t.dtype), padcfg)
        bulk = bulk[tuple(slice(0, s) for s in t.shape)]
        out = out + bulk
        for mask_t in range(1, 1 << len(act)):
            sub = [act[j] for j in range(len(act)) if (mask_t >> j) & 1]
            rest = [a for a in act if a not in sub]
            idx = [slice(None)] * 4
            for a in sub:
                idx[a] = slice(sizes[a - 1] - 1, sizes[a - 1])
            src = t[tuple(idx)]
            for a in rest:
                L = sizes[a - 1]
                zero = jnp.zeros_like(
                    jax.lax.slice_in_dim(src, 0, 1, axis=a))
                src = jnp.concatenate(
                    [zero, jax.lax.slice_in_dim(src, 0, L - 1, axis=a)],
                    axis=a)
            out_idx = tuple(
                slice(sizes[a - 1] - 1, sizes[a - 1]) if a in sub
                else slice(None) for a in range(4))
            out = out.at[out_idx].add(src)
    return jnp.moveaxis(out, 0, -1)


def _fold_halve_flat(c: jax.Array, delta: int, L: int) -> jax.Array:
    """One halving pass of the duplicated-table adjoint in the scatter
    kernel's native flat (C, M) layout: the duplicated channel half b
    references flat position i + delta (clamped when the folded-axis
    coordinate hits L-1; coord(i) = (i // delta) % L), so its adjoint is a
    LANE shift plus iota-derived masks — no reshape of the cotangent onto a
    (G, G, G) tiling:

        a_new[i] = a[i] + b[i - delta]*[coord(i) >= 1]
                        + b[i]*[coord(i) == L - 1]
    """
    C = c.shape[0] // 2
    a, b = c[:C], c[C:]
    M = c.shape[1]
    i = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
    coord = (i // delta) % L
    shifted = jnp.concatenate(
        [jnp.zeros((C, delta), c.dtype), b[:, :M - delta]], axis=1)
    zero = jnp.zeros((), c.dtype)
    return a + jnp.where(coord >= 1, shifted, zero) \
        + jnp.where(coord == L - 1, b, zero)


def _fold_octa_cotangent_flat2d(cot_t: jax.Array, gshape) -> jax.Array:
    """3-pass halving fold entirely in the (channels, G^3) flat layout
    (fold x, then y, then z — the inverse of the _voxel_octa_flat build
    order), finishing with the single (D, M) -> (M, D) transpose into the
    base-table shape."""
    Gx, Gy, Gz, D = gshape
    c = cot_t
    c = _fold_halve_flat(c, Gy * Gz, Gx)
    c = _fold_halve_flat(c, Gz, Gy)
    c = _fold_halve_flat(c, 1, Gz)
    return jnp.transpose(c, (1, 0)).reshape(Gx, Gy, Gz, D)


def _fold_octa_cotangent(cot_t: jax.Array, gshape) -> jax.Array:
    """(8D, G^3) f32 octa-row cotangent -> (Gx, Gy, Gz, D) base-table
    cotangent: the adjoint of :func:`_voxel_octa_flat` applied directly in
    the scatter kernel's transposed layout, in f32 throughout — replacing
    autodiff-of-concat folds on a transposed (G^3, 8D) table (2x ~2 GB
    cheaper in HBM traffic at G=256, and the 8-way duplicate sums no longer
    round through bf16).  Formulation picked by NDJIR_FOLD_MODE (see
    above); all three are adjoint-exact (tests/test_ops_grid.py)."""
    if _FOLD_MODE == "pallas":
        from ndjir_tpu.ops.fold_pallas import (
            fold_octa_cotangent_pallas,
            fold_pallas_supported,
        )
        if fold_pallas_supported(gshape):
            return fold_octa_cotangent_pallas(cot_t, gshape)
        return _fold_octa_cotangent_flat2d(cot_t, gshape)
    if _FOLD_MODE == "flat2d":
        return _fold_octa_cotangent_flat2d(cot_t, gshape)
    if _FOLD_MODE == "flat":
        return _fold_octa_cotangent_flat(cot_t, gshape)
    if _FOLD_MODE == "onepass":
        return _fold_octa_cotangent_onepass(cot_t, gshape)
    Gx, Gy, Gz, D = gshape
    c = cot_t.reshape(8 * D, Gx, Gy, Gz)
    # inverse order of the _voxel_octa_flat build (z, y, x) -> fold x, y, z
    c = _fold_dup_axis(c, 1)
    c = _fold_dup_axis(c, 2)
    c = _fold_dup_axis(c, 3)
    return jnp.transpose(c, (1, 2, 3, 0))


def _fold_zdup_cotangent(cot_t: jax.Array, gshape) -> jax.Array:
    """(2D, G^3) f32 z-dup-row cotangent -> (Gx, Gy, Gz, D) base-table
    cotangent: the adjoint of :func:`_voxel_zdup_flat`, folded directly in
    the scatter kernel's transposed f32 layout (skips the full-table
    transpose + dtype roundtrip that autodiff-of-concat would pay — at
    G=512 bf16 that is a ~2 GB HBM pass).  In flat2d mode the single
    z-halving pass runs as a lane shift on the flat (2D, G^3) layout (same
    relayout-avoidance argument as the octa flat2d fold)."""
    Gx, Gy, Gz, D = gshape
    if _FOLD_MODE == "flat2d":
        c = _fold_halve_flat(cot_t, 1, Gz)
        return jnp.transpose(c, (1, 0)).reshape(Gx, Gy, Gz, D)
    c = cot_t.reshape(2 * D, Gx, Gy, Gz)
    c = _fold_dup_axis(c, 3)
    return jnp.transpose(c, (1, 2, 3, 0))


# ---------------------------------------------------------------------------
# packed duplicated tables: pad-free materialization
# ---------------------------------------------------------------------------
#
# The duplicated-row tables above have narrow minor dims (octa 8D=32 ch
# bf16, z-dup 2D=8 ch), and forcing them to materialize (the
# optimization_barrier) tile-pads the lane dim to 128 — a 4x (octa) / 16x
# (z-dup) write amplification; the measured ~12-18 ms octa build at G=256
# is mostly that padding.  Packing P consecutive-z duplicated rows into one
# 128-channel stored row makes the lane dim exactly 128: the build writes
# the table at its logical size, the gather reads one 256 B packed row, and
# a P-way channel select (elementwise, fused) recovers the logical row.
# The backward is UNCHANGED (scatter + fold on the logical layout).
# Build = 32 (octa) / 32 (z-dup) clamp-shifted strided slices of the base
# param — no reshape of the 4-D param ever happens inside the program (the
# pair-window trap; see tpu-toolchain notes in docs/ROOFLINE.md).

_PACKED_TABLE = os.environ.get("NDJIR_PACKED_TABLE", "0") != "0"


def _zpick(f: jax.Array, s: int, pack: int) -> jax.Array:
    """Along axis 2 (z): t[..., k, :] = f[..., min(pack*k + s, G-1), :] for
    k = 0..G/pack-1, with s in [0, pack].  s <= pack-1 is a plain strided
    slice; s == pack needs the clamped last element appended."""
    Gz = f.shape[2]
    n = Gz // pack
    if s < pack:
        return jax.lax.slice_in_dim(f, s, s + (n - 1) * pack + 1, pack,
                                    axis=2)
    last = jax.lax.slice_in_dim(f, Gz - 1, Gz, axis=2)
    if n == 1:
        return last
    body = jax.lax.slice_in_dim(f, pack, pack + (n - 2) * pack + 1, pack,
                                axis=2)
    return jnp.concatenate([body, last], axis=2)


def _shift_clamp(f: jax.Array, axis: int) -> jax.Array:
    """out[u] = f[min(u + 1, L - 1)] along ``axis``."""
    L = f.shape[axis]
    return jnp.concatenate(
        [jax.lax.slice_in_dim(f, 1, L, axis=axis),
         jax.lax.slice_in_dim(f, L - 1, L, axis=axis)], axis=axis)


def _voxel_octa_packed(feature: jax.Array, pack: int = 4) -> jax.Array:
    """(G,G,G,D) -> (Gx*Gy*(Gz/pack), pack*8D) packed octa table: stored row
    j holds the ``pack`` octa rows with z0 = pack*(j % (Gz/pack)) + q,
    channel layout q-major then the _voxel_octa_flat order
    (c = dx*4D + dy*2D + dz*D + d)."""
    Gx, Gy, Gz, D = feature.shape
    assert Gz % pack == 0
    blocks = []
    for q in range(pack):
        for dx in range(2):
            for dy in range(2):
                for dz in range(2):
                    t = _zpick(feature, q + dz, pack)
                    if dx:
                        t = _shift_clamp(t, 0)
                    if dy:
                        t = _shift_clamp(t, 1)
                    blocks.append(t)
    out = jnp.concatenate(blocks, axis=-1)     # (Gx, Gy, Gz/pack, pack*8D)
    return out.reshape(Gx * Gy * (Gz // pack), pack * 8 * D)


def _voxel_zdup_packed(feature: jax.Array, pack: int = 16) -> jax.Array:
    """(G,G,G,D) -> (Gx*Gy*(Gz/pack), pack*2D) packed z-dup table (channel
    layout q-major then (dz, d))."""
    Gx, Gy, Gz, D = feature.shape
    assert Gz % pack == 0
    blocks = []
    for q in range(pack):
        for dz in range(2):
            blocks.append(_zpick(feature, q + dz, pack))
    out = jnp.concatenate(blocks, axis=-1)     # (Gx, Gy, Gz/pack, pack*2D)
    return out.reshape(Gx * Gy * (Gz // pack), pack * 2 * D)


def _packed_select(rows: jax.Array, sel: jax.Array, width: int,
                   pack: int) -> jax.Array:
    """rows (..., pack*width), sel (...,) in [0, pack) -> (..., width):
    out = rows[..., sel*width : (sel+1)*width] as a fused P-way select."""
    out = None
    for q in range(pack):
        w = (sel == q).astype(rows.dtype)[..., None]
        term = w * rows[..., q * width:(q + 1) * width]
        out = term if out is None else out + term
    return out


def octa_pack_for(gshape, dtype) -> int:
    """Packing factor making the stored lane dim exactly 128 channels."""
    D = gshape[-1]
    return max(1, 128 // (8 * D)) if jnp.dtype(dtype) == jnp.bfloat16 else 1


def zdup_pack_for(gshape, dtype) -> int:
    D = gshape[-1]
    return max(1, 128 // (2 * D)) if jnp.dtype(dtype) == jnp.bfloat16 else 1


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows_zdup(base: jax.Array, ids: jax.Array, gshape) -> jax.Array:
    """Gather (..., 2D) z-paired rows for int row ids (...,) straight from
    the BASE table (Gx, Gy, Gz, D).

    Forward: builds the z-dup table (XLA CSE dedupes the build across all
    query sites in a step) and gathers.  Backward: transposed Pallas
    scatter-add into the kernel-native (2D, G^3) f32 layout + the direct
    :func:`_fold_zdup_cotangent` adjoint.  With NDJIR_PACKED_TABLE=1 and a
    bf16 table, the forward materializes the pad-free packed form instead
    (see the packed-table comment block)."""
    return _zdup_forward(base, ids, gshape)


def _zdup_forward(base, ids, gshape):
    pack = zdup_pack_for(gshape, base.dtype)
    if _PACKED_TABLE and pack > 1 and gshape[2] % pack == 0:
        D = gshape[-1]
        packed = jax.lax.optimization_barrier(_voxel_zdup_packed(base, pack))
        rows = packed[ids // pack]
        return _packed_select(rows, ids % pack, 2 * D, pack)
    return _voxel_zdup_flat(base)[ids]


def _gather_zdup_fwd(base, ids, gshape):
    return _zdup_forward(base, ids, gshape), ids


def _gather_zdup_bwd(gshape, ids, g):
    from ndjir_tpu.ops.scatter_pallas import scatter_add_rows_t

    Gx, Gy, Gz, D = gshape
    flat_ids = ids.reshape(-1)
    flat_g = g.reshape(-1, 2 * D)
    cot_t = scatter_add_rows_t(flat_ids, flat_g, Gx * Gy * Gz)
    return _fold_zdup_cotangent(cot_t, gshape).astype(g.dtype), None


gather_rows_zdup.defvjp(_gather_zdup_fwd, _gather_zdup_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows_octa(base: jax.Array, ids: jax.Array, gshape) -> jax.Array:
    """Gather (..., 8D) octa rows for int row ids (...,) straight from the
    BASE table (Gx, Gy, Gz, D).

    Forward: builds the duplicated octa table (XLA CSE dedupes the build
    across all query sites in a step) and gathers; the optimization barrier
    is REQUIRED — without it XLA rewrites gather(concatenate(...)) into
    per-corner NARROW gathers, the wide-row table never materializes, and
    every query silently degenerates to 8 narrow gathers (~95 ns/point
    in-step; the round-3 silent-degeneration bug).  With the barrier the
    build materializes in ~12 ms at G=256 bf16 and 524k rows gather at the
    prebuilt-table rate (28.8 ms total vs 16.5 prebuilt;
    docs/probe_build_variants.json — conv / Pallas / wide-view builds and a
    pair-window reformulation were all probed 2026-08-20 and lost: the
    first two crash the remote compile helper, the last trips a tile-padded
    bf16[G,G,G,D]{T(8,128)} 32 GiB copy at G=512 because it must reshape
    the 4-D param to 1-D inside the program).  Backward: transposed Pallas
    scatter-add into the kernel-native (8D, G^3) layout + the direct
    :func:`_fold_octa_cotangent` adjoint — no (G^3, 8D) transpose pass and
    no staged bf16 concat-VJP fold.  With NDJIR_PACKED_TABLE=1 the forward
    materializes the pad-free packed form instead (see the packed-table
    comment block).
    """
    return _octa_forward(base, ids, gshape)


def _octa_forward(base, ids, gshape):
    pack = octa_pack_for(gshape, base.dtype)
    if _PACKED_TABLE and pack > 1 and gshape[2] % pack == 0:
        D = gshape[-1]
        packed = jax.lax.optimization_barrier(_voxel_octa_packed(base, pack))
        rows = packed[ids // pack]
        return _packed_select(rows, ids % pack, 8 * D, pack)
    return jax.lax.optimization_barrier(_voxel_octa_flat(base))[ids]


def _gather_octa_fwd(base, ids, gshape):
    return _octa_forward(base, ids, gshape), ids


def _gather_octa_bwd(gshape, ids, g):
    from ndjir_tpu.ops.scatter_pallas import scatter_add_rows_t

    Gx, Gy, Gz, D = gshape
    flat_ids = ids.reshape(-1)
    flat_g = g.reshape(-1, 8 * D)
    cot_t = scatter_add_rows_t(flat_ids, flat_g, Gx * Gy * Gz)
    return _fold_octa_cotangent(cot_t, gshape).astype(g.dtype), None


gather_rows_octa.defvjp(_gather_octa_fwd, _gather_octa_bwd)


def voxel_octa_ids(x: jax.Array, gshape, vmin: Vec3 = DEFAULT_MIN,
                   vmax: Vec3 = DEFAULT_MAX) -> jax.Array:
    """(*x.shape[:-1],) int32 row ids into the octa table (the clamped floor
    corner; the row's duplicated neighbours reproduce xyz1 = min(xyz0+1, G-1)
    exactly)."""
    Gx, Gy, Gz, _ = gshape
    dtype = x.dtype
    g1 = jnp.asarray([Gx - 1, Gy - 1, Gz - 1], dtype)
    xyz = _to_grid(x, g1, jnp.asarray(vmin, dtype), jnp.asarray(vmax, dtype))
    i0 = jnp.clip(jnp.floor(xyz), 0.0, g1).astype(jnp.int32)
    return i0[..., 0] * (Gy * Gz) + i0[..., 1] * Gz + i0[..., 2]


def voxel_interp_octa(x: jax.Array, f: jax.Array, gshape,
                      vmin: Vec3 = DEFAULT_MIN, vmax: Vec3 = DEFAULT_MAX,
                      weight: str = "linear") -> jax.Array:
    """Trilinear/cosine combine of one pre-gathered octa row f (..., 8D):
    nested per-axis pair reduction (x, then y, then z block halves)."""
    Gx, Gy, Gz, D = gshape
    dtype = x.dtype
    g1 = jnp.asarray([Gx - 1, Gy - 1, Gz - 1], dtype)
    xyz = _to_grid(x, g1, jnp.asarray(vmin, dtype), jnp.asarray(vmax, dtype))
    xyz0, xyz1 = _corners(xyz, g1)
    w0, w1 = _weights(xyz, xyz0, xyz1, weight)
    fx = w0[..., 0:1] * f[..., :4 * D] + w1[..., 0:1] * f[..., 4 * D:]
    fy = w0[..., 1:2] * fx[..., :2 * D] + w1[..., 1:2] * fx[..., 2 * D:]
    return w0[..., 2:3] * fy[..., :D] + w1[..., 2:3] * fy[..., D:]


def voxel_tv_octa(f: jax.Array, dtype, sym_backward: bool = True
                  ) -> jax.Array:
    """Cell TV map from one octa row f (..., 8D) (blocks c = dx*4+dy*2+dz:
    000=0, 001=1, 010=2, 100=4).  Same semantics as
    :func:`voxel_tv_corners` / ops.tv_loss.tv_loss_voxel."""
    from ndjir_tpu.ops.tv_loss import _tv_sqrt

    D = f.shape[-1] // 8
    f000 = f[..., 0:D].astype(dtype)
    f001 = f[..., D:2 * D].astype(dtype)
    f010 = f[..., 2 * D:3 * D].astype(dtype)
    f100 = f[..., 4 * D:5 * D].astype(dtype)
    base = f000 if sym_backward else jax.lax.stop_gradient(f000)
    s = (f100 - base) ** 2 + (f010 - base) ** 2 + (f001 - base) ** 2
    return _tv_sqrt(s)


def voxel_zdup_ids(x: jax.Array, gshape, vmin: Vec3 = DEFAULT_MIN,
                   vmax: Vec3 = DEFAULT_MAX) -> jax.Array:
    """(4, *x.shape[:-1]) int32 row ids into the z-paired table, in
    (x0y0, x0y1, x1y0, x1y1) order.  Integer (non-differentiable) by
    construction — safe to compute outside any vjp."""
    Gx, Gy, Gz, _ = gshape
    dtype = x.dtype
    g1 = jnp.asarray([Gx - 1, Gy - 1, Gz - 1], dtype)
    xyz = _to_grid(x, g1, jnp.asarray(vmin, dtype), jnp.asarray(vmax, dtype))
    xyz0, xyz1 = _corners(xyz, g1)
    i0 = xyz0.astype(jnp.int32)
    i1 = xyz1.astype(jnp.int32)
    sy, sx = Gz, Gy * Gz
    iz = i0[..., 2]
    ids = []
    for cx in range(2):
        ix = (i0 if cx == 0 else i1)[..., 0]
        for cy in range(2):
            iy = (i0 if cy == 0 else i1)[..., 1]
            ids.append(ix * sx + iy * sy + iz)
    return jnp.stack(ids, axis=0)


def voxel_gather_multi(x_list, feature: jax.Array,
                       vmin: Vec3 = DEFAULT_MIN, vmax: Vec3 = DEFAULT_MAX):
    """Gather duplicated-layout corner rows for SEVERAL point sets with ONE
    ``gather_rows`` call, so the training backward issues ONE fused scatter
    for all sets (2x1M-row scatters cost ~2x19.7 ms; one 2.1M-row scatter
    ~29 ms).  Octa layout (bf16, budget-gated): one (*, 8D) row per point;
    z-dup fallback: (4, *, 2D) corner tensors.  Consumed by
    :func:`voxel_interp_corners` / :func:`voxel_tv_corners`, which dispatch
    on the tensor shape.

    Caller must have checked :func:`use_zdup_layout` /
    :func:`use_octa_layout`."""
    if use_octa_layout(feature.shape, feature.dtype):
        D8 = 8 * feature.shape[-1]
        ids = [voxel_octa_ids(x, feature.shape, vmin, vmax) for x in x_list]
        flat_ids = [i.reshape(-1) for i in ids]
        ns = [fi.shape[0] for fi in flat_ids]
        f = gather_rows_octa(feature, jnp.concatenate(flat_ids, axis=0),
                             tuple(feature.shape))
        out, off = [], 0
        for i, n in zip(ids, ns):
            out.append(f[off:off + n].reshape(*i.shape, D8))
            off += n
        return out
    D2 = 2 * feature.shape[-1]
    ids = [voxel_zdup_ids(x, feature.shape, vmin, vmax) for x in x_list]
    flat_ids = [i.reshape(4, -1) for i in ids]
    ns = [fi.shape[1] for fi in flat_ids]
    f = gather_rows_zdup(feature, jnp.concatenate(flat_ids, axis=1),
                         tuple(feature.shape))
    out, off = [], 0
    for i, n in zip(ids, ns):
        out.append(f[:, off:off + n].reshape(*i.shape, D2))
        off += n
    return out


def voxel_interp_corners(x: jax.Array, f: jax.Array, gshape,
                         vmin: Vec3 = DEFAULT_MIN, vmax: Vec3 = DEFAULT_MAX,
                         weight: str = "linear") -> jax.Array:
    """Trilinear/cosine combine of pre-gathered corners: z-dup layout
    f (4, ..., 2D) or octa layout f (..., 8D) (dispatch on shape).
    Differentiable w.r.t. ``x`` through the interpolation weights; ``f`` is
    constant w.r.t. ``x`` (ids are piecewise constant), so spatial-gradient
    vjps over this function never touch the table."""
    if f.ndim == x.ndim and f.shape[-1] == 8 * gshape[-1]:
        return voxel_interp_octa(x, f, gshape, vmin, vmax, weight)
    Gx, Gy, Gz, D = gshape
    dtype = x.dtype
    g1 = jnp.asarray([Gx - 1, Gy - 1, Gz - 1], dtype)
    xyz = _to_grid(x, g1, jnp.asarray(vmin, dtype), jnp.asarray(vmax, dtype))
    xyz0, xyz1 = _corners(xyz, g1)
    w0, w1 = _weights(xyz, xyz0, xyz1, weight)
    wz0 = w0[..., 2:3]
    wz1 = w1[..., 2:3]
    w = jnp.stack([w0[..., 0] * w0[..., 1], w0[..., 0] * w1[..., 1],
                   w1[..., 0] * w0[..., 1], w1[..., 0] * w1[..., 1]], axis=0)
    pair = wz0 * f[..., :D] + wz1 * f[..., D:]
    return jnp.sum(w[..., None] * pair, axis=0)


def voxel_tv_corners(f: jax.Array, dtype, sym_backward: bool = True,
                     octa: bool = False) -> jax.Array:
    """Cell TV map from pre-gathered z-paired corners f (4, ..., 2D) — the
    same four corners the interpolation reads (000, 001, 010, 100) — or,
    with ``octa=True``, from octa rows f (..., 8D).
    Identical semantics to ops.tv_loss.tv_loss_voxel."""
    from ndjir_tpu.ops.tv_loss import _tv_sqrt

    if octa:
        return voxel_tv_octa(f, dtype, sym_backward)
    D = f.shape[-1] // 2
    # rows are (x0y0, x0y1, x1y0, x1y1) with z pair packed along features
    f000, f001, f010, f100 = f[0, ..., :D], f[0, ..., D:], f[1, ..., :D], \
        f[2, ..., :D]
    # TV differences in f32 even for bf16 tables (forward differences of
    # near-equal values cancel catastrophically in bf16)
    f000, f001, f010, f100 = (a.astype(dtype)
                              for a in (f000, f001, f010, f100))
    base = f000 if sym_backward else jax.lax.stop_gradient(f000)
    s = (f100 - base) ** 2 + (f010 - base) ** 2 + (f001 - base) ** 2
    return _tv_sqrt(s)


def query_voxel(x: jax.Array, feature: jax.Array,
                vmin: Vec3 = DEFAULT_MIN, vmax: Vec3 = DEFAULT_MAX,
                weight: str = "linear") -> jax.Array:
    """Trilinear (or cosine-weighted) dense-grid query: (..., 3) -> (..., D).

    TPU fast path: gathers are gather-unit-rate-bound (~13 ns/row measured
    regardless of row size), so for tables where the doubled layout fits a
    budget the z-corner pair is duplicated into 2D-wide rows — 4 gathers per
    point instead of 8 (27 -> 19 ms for 262k points at G=256).  XLA CSE
    dedupes the duplicated-table build across all query sites in a step.
    """
    Gx, Gy, Gz, D = feature.shape
    dtype = x.dtype

    if use_octa_layout(feature.shape, feature.dtype) \
            or use_zdup_layout(feature.shape, feature.dtype):
        (f,) = voxel_gather_multi([x], feature, vmin, vmax)
        return voxel_interp_corners(x, f, feature.shape, vmin, vmax, weight)

    g1 = jnp.asarray([Gx - 1, Gy - 1, Gz - 1], dtype)
    xyz = _to_grid(x, g1, jnp.asarray(vmin, dtype), jnp.asarray(vmax, dtype))
    xyz0, xyz1 = _corners(xyz, g1)
    w0, w1 = _weights(xyz, xyz0, xyz1, weight)
    i0 = xyz0.astype(jnp.int32)
    i1 = xyz1.astype(jnp.int32)
    sy, sx = Gz, Gy * Gz

    flat = feature.reshape(-1, D)
    idx_list, w_list = [], []
    for cx in range(2):
        ix = (i0 if cx == 0 else i1)[..., 0]
        wx = (w0 if cx == 0 else w1)[..., 0]
        for cy in range(2):
            iy = (i0 if cy == 0 else i1)[..., 1]
            wy = (w0 if cy == 0 else w1)[..., 1]
            for cz in range(2):
                iz = (i0 if cz == 0 else i1)[..., 2]
                wz = (w0 if cz == 0 else w1)[..., 2]
                idx_list.append(ix * sx + iy * sy + iz)
                w_list.append(wx * wy * wz)
    return _gather_weighted_sum(flat, idx_list, w_list)


def query_voxel_and_tv(x: jax.Array, feature: jax.Array,
                       vmin: Vec3 = DEFAULT_MIN, vmax: Vec3 = DEFAULT_MAX,
                       weight: str = "linear", sym_backward: bool = True):
    """Fused trilinear query + cell TV map sharing ONE corner gather.

    The TV regularizer reads 4 of the same 8 cell corners the interpolation
    gathers (reference computes them in separate CUDA ops:
    voxel_feature_cuda.cu + total_variation_loss_cuda.cu) — fusing saves a
    full gather pass and a full backward scatter per training step.
    Returns (interp (..., D), tv (..., D)); TV semantics identical to
    ndjir_tpu.ops.tv_loss.tv_loss_voxel.
    """
    from ndjir_tpu.ops.tv_loss import _tv_sqrt

    Gx, Gy, Gz, D = feature.shape
    dtype = x.dtype

    if use_octa_layout(feature.shape, feature.dtype):
        (f,) = voxel_gather_multi([x], feature, vmin, vmax)
        interp = voxel_interp_corners(x, f, feature.shape, vmin, vmax, weight)
        return interp, voxel_tv_corners(f, dtype, sym_backward, octa=True)

    if use_zdup_layout(feature.shape, feature.dtype):
        (f,) = voxel_gather_multi([x], feature, vmin, vmax)
        interp = voxel_interp_corners(x, f, feature.shape, vmin, vmax, weight)
        return interp, voxel_tv_corners(f, dtype, sym_backward)

    g1 = jnp.asarray([Gx - 1, Gy - 1, Gz - 1], dtype)
    xyz = _to_grid(x, g1, jnp.asarray(vmin, dtype), jnp.asarray(vmax, dtype))
    xyz0, xyz1 = _corners(xyz, g1)
    w0, w1 = _weights(xyz, xyz0, xyz1, weight)
    i0 = xyz0.astype(jnp.int32)
    i1 = xyz1.astype(jnp.int32)
    sy, sx = Gz, Gy * Gz

    flat = feature.reshape(-1, D)
    idx_list, w_list = [], []
    for cx in range(2):
        ix = (i0 if cx == 0 else i1)[..., 0]
        wx = (w0 if cx == 0 else w1)[..., 0]
        for cy in range(2):
            iy = (i0 if cy == 0 else i1)[..., 1]
            wy = (w0 if cy == 0 else w1)[..., 1]
            for cz in range(2):
                iz = (i0 if cz == 0 else i1)[..., 2]
                wz = (w0 if cz == 0 else w1)[..., 2]
                idx_list.append(ix * sx + iy * sy + iz)
                w_list.append(wx * wy * wz)
    idx = jnp.stack(idx_list, axis=0)
    w = jnp.stack(w_list, axis=0)
    f = gather_rows(flat, idx.reshape(8, -1)).reshape(*idx.shape, D)
    interp = jnp.sum(w[..., None] * f, axis=0)
    # corner order (cx, cy, cz): 000=0, 001=1, 010=2, 100=4
    f000, f001, f010, f100 = f[0], f[1], f[2], f[4]

    # TV differences in f32 even for bf16 tables (forward differences of
    # near-equal values cancel catastrophically in bf16)
    f000, f001, f010, f100 = (f.astype(dtype) for f in (f000, f001, f010, f100))
    base = f000 if sym_backward else jax.lax.stop_gradient(f000)
    s = (f100 - base) ** 2 + (f010 - base) ** 2 + (f001 - base) ** 2
    return interp, _tv_sqrt(s)


def query_voxel_lanczos(x: jax.Array, feature: jax.Array,
                        vmin: Vec3 = DEFAULT_MIN, vmax: Vec3 = DEFAULT_MAX,
                        a: int = 2) -> jax.Array:
    """Lanczos-a dense-grid query, (2a)^3 taps (reference:
    lanczos_voxel_feature_cuda.cu:68-89)."""
    Gx, Gy, Gz, D = feature.shape
    dtype = x.dtype
    g1 = jnp.asarray([Gx - 1, Gy - 1, Gz - 1], dtype)
    xyz = _to_grid(x, g1, jnp.asarray(vmin, dtype), jnp.asarray(vmax, dtype))
    xyz0 = jnp.floor(xyz)  # NOTE: not clamped before tap offsets (parity)

    flat = feature.reshape(-1, D)
    sy, sx = Gz, Gy * Gz

    # Precompute per-axis taps: positions (clamped) and coefficients.
    taps = []
    for ax in range(3):
        pos, coef = [], []
        for o in range(-a + 1, a + 1):
            p = jnp.clip(xyz0[..., ax] + o, 0.0, g1[ax])
            c = lanczos_window(xyz[..., ax] - p, a)
            pos.append(p.astype(jnp.int32))
            coef.append(c)
        taps.append((pos, coef))

    idx_list, w_list = [], []
    (px, cx), (py, cy), (pz, cz) = taps
    for i in range(2 * a):
        for j in range(2 * a):
            wij = cx[i] * cy[j]
            base_ij = px[i] * sx + py[j] * sy
            for k in range(2 * a):
                idx_list.append(base_ij + pz[k])
                w_list.append(wij * cz[k])
    return _gather_weighted_sum(flat, idx_list, w_list)


# ---------------------------------------------------------------------------
# triplane
# ---------------------------------------------------------------------------

_PLANE_AXES = ((0, 1), (1, 2), (2, 0))  # (xy, yz, zx): common_triplane.cuh:44-66
_LINE_AXES = (0, 1, 2)


def init_triplane(key: jax.Array, G: int, D: int, eps: float = 1e-3,
                  dtype=jnp.float32) -> jax.Array:
    return eps * jax.random.normal(key, (3, G, G, D), dtype=dtype)


def query_triplane(x: jax.Array, feature: jax.Array,
                   vmin: Vec3 = DEFAULT_MIN, vmax: Vec3 = DEFAULT_MAX,
                   weight: str = "linear") -> jax.Array:
    """Sum of three bilinear plane queries: (..., 3) -> (..., D)."""
    _, G, _, D = feature.shape
    dtype = x.dtype
    g1 = jnp.full((3,), G - 1, dtype)
    xyz = _to_grid(x, g1, jnp.asarray(vmin, dtype), jnp.asarray(vmax, dtype))
    xyz0, xyz1 = _corners(xyz, g1)
    w0, w1 = _weights(xyz, xyz0, xyz1, weight)
    i0 = xyz0.astype(jnp.int32)
    i1 = xyz1.astype(jnp.int32)

    # one flat (3*G*G, D) table so all 12 taps batch into one gather
    flat = feature.reshape(-1, D)
    idx_list, w_list = [], []
    for p, (au, av) in enumerate(_PLANE_AXES):
        off = p * G * G
        for cu in range(2):
            iu = (i0 if cu == 0 else i1)[..., au]
            wu = (w0 if cu == 0 else w1)[..., au]
            for cv in range(2):
                iv = (i0 if cv == 0 else i1)[..., av]
                wv = (w0 if cv == 0 else w1)[..., av]
                idx_list.append(off + iu * G + iv)
                w_list.append(wu * wv)
    return _gather_weighted_sum(flat, idx_list, w_list)


def query_triplane_lanczos(x: jax.Array, feature: jax.Array,
                           vmin: Vec3 = DEFAULT_MIN, vmax: Vec3 = DEFAULT_MAX,
                           a: int = 2) -> jax.Array:
    _, G, _, D = feature.shape
    dtype = x.dtype
    g1 = jnp.full((3,), G - 1, dtype)
    xyz = _to_grid(x, g1, jnp.asarray(vmin, dtype), jnp.asarray(vmax, dtype))
    xyz0 = jnp.floor(xyz)

    pos = [[jnp.clip(xyz0[..., ax] + o, 0.0, g1[ax])
            for o in range(-a + 1, a + 1)] for ax in range(3)]
    coef = [[lanczos_window(xyz[..., ax] - p, a) for p in pos[ax]]
            for ax in range(3)]
    ipos = [[p.astype(jnp.int32) for p in pos[ax]] for ax in range(3)]

    flat = feature.reshape(-1, D)
    idx_list, w_list = [], []
    for p, (au, av) in enumerate(_PLANE_AXES):
        off = p * G * G
        for i in range(2 * a):
            for j in range(2 * a):
                idx_list.append(off + ipos[au][i] * G + ipos[av][j])
                w_list.append(coef[au][i] * coef[av][j])
    return _gather_weighted_sum(flat, idx_list, w_list)


# ---------------------------------------------------------------------------
# triline
# ---------------------------------------------------------------------------

def init_triline(key: jax.Array, G: int, D: int, eps: float = 1e-3,
                 dtype=jnp.float32) -> jax.Array:
    return eps * jax.random.normal(key, (3, G, D), dtype=dtype)


def query_triline(x: jax.Array, feature: jax.Array,
                  vmin: Vec3 = DEFAULT_MIN, vmax: Vec3 = DEFAULT_MAX,
                  weight: str = "linear") -> jax.Array:
    """Sum of three 1-D line queries: (..., 3) -> (..., D)."""
    _, G, D = feature.shape
    dtype = x.dtype
    g1 = jnp.full((3,), G - 1, dtype)
    xyz = _to_grid(x, g1, jnp.asarray(vmin, dtype), jnp.asarray(vmax, dtype))
    xyz0, xyz1 = _corners(xyz, g1)
    w0, w1 = _weights(xyz, xyz0, xyz1, weight)
    i0 = xyz0.astype(jnp.int32)
    i1 = xyz1.astype(jnp.int32)

    flat = feature.reshape(-1, D)
    idx_list, w_list = [], []
    for ax in _LINE_AXES:
        off = ax * G
        idx_list.append(off + i0[..., ax])
        w_list.append(w0[..., ax])
        idx_list.append(off + i1[..., ax])
        w_list.append(w1[..., ax])
    return _gather_weighted_sum(flat, idx_list, w_list)


def query_triline_lanczos(x: jax.Array, feature: jax.Array,
                          vmin: Vec3 = DEFAULT_MIN, vmax: Vec3 = DEFAULT_MAX,
                          a: int = 2) -> jax.Array:
    _, G, D = feature.shape
    dtype = x.dtype
    g1 = jnp.full((3,), G - 1, dtype)
    xyz = _to_grid(x, g1, jnp.asarray(vmin, dtype), jnp.asarray(vmax, dtype))
    xyz0 = jnp.floor(xyz)

    flat = feature.reshape(-1, D)
    idx_list, w_list = [], []
    for ax in _LINE_AXES:
        off = ax * G
        for o in range(-a + 1, a + 1):
            p = jnp.clip(xyz0[..., ax] + o, 0.0, g1[ax])
            idx_list.append(off + p.astype(jnp.int32))
            w_list.append(lanczos_window(xyz[..., ax] - p, a))
    return _gather_weighted_sum(flat, idx_list, w_list)


# ---------------------------------------------------------------------------
# multi-resolution voxel hash
# ---------------------------------------------------------------------------

_HASH_PRIMES = (1, 2654435761, 805459861)  # tcnn primes, voxel_hash_feature_cuda.cu:39


def hash_grid_size(G0: int, growth_factor: float, level: int) -> int:
    return int(G0 * growth_factor ** level)


def hash_table_size(G: int, T0: int) -> int:
    return int(min(float(G) ** 3, float(T0)))


def _force_align(size: int, mod: int = 8) -> int:
    # Parity quirk: the reference ADDS the remainder instead of the pad-to-
    # multiple amount (common_voxel_hash.cuh:24-28); offsets must match so a
    # reference checkpoint maps 1:1.
    return size + size % mod


def hash_num_params(G0: int, growth_factor: float, T0: int, L: int,
                    D: int) -> int:
    return sum(_force_align(hash_table_size(hash_grid_size(G0, growth_factor, l), T0) * D)
               for l in range(L))


def hash_level_offsets(G0: int, growth_factor: float, T0: int, L: int,
                       D: int) -> Tuple[Tuple[int, int, int], ...]:
    """Per-level (offset, G_l, T_l) static metadata."""
    out, off = [], 0
    for l in range(L):
        G = hash_grid_size(G0, growth_factor, l)
        T = hash_table_size(G, T0)
        out.append((off, G, T))
        off += _force_align(T * D)
    return tuple(out)


def init_voxel_hash(key: jax.Array, G0: int, growth_factor: float, T0: int,
                    L: int, D: int, eps: float = 1e-3,
                    dtype=jnp.float32) -> jax.Array:
    """Flat N(0, eps) parameter buffer (reference: voxel_hash_feature.py:230-237)."""
    n = hash_num_params(G0, growth_factor, T0, L, D)
    return eps * jax.random.normal(key, (n,), dtype=dtype)


def _hash_index(ix: jax.Array, iy: jax.Array, iz: jax.Array, T: int) -> jax.Array:
    """tcnn spatial hash on uint32 with XOR-combined primes."""
    h = (ix.astype(jnp.uint32) * np.uint32(_HASH_PRIMES[0]))
    h = h ^ (iy.astype(jnp.uint32) * np.uint32(_HASH_PRIMES[1]))
    h = h ^ (iz.astype(jnp.uint32) * np.uint32(_HASH_PRIMES[2]))
    return (h % np.uint32(T)).astype(jnp.int32)


def hash_index(x: jax.Array, G: int, T: int,
               vmin: Vec3 = DEFAULT_MIN, vmax: Vec3 = DEFAULT_MAX
               ) -> jax.Array:
    """Debug op: the 8 hash-table indices of a query's cell corners
    (..., 8) (reference: kernel_hash_index, voxel_hash_feature_cuda.cu:54-116)."""
    dtype = x.dtype
    g1 = jnp.full((3,), G - 1, dtype)
    xyz = _to_grid(x, g1, jnp.asarray(vmin, dtype), jnp.asarray(vmax, dtype))
    xyz0, xyz1 = _corners(xyz, g1)
    i0 = xyz0.astype(jnp.int32)
    i1 = xyz1.astype(jnp.int32)
    # corner order (x-major): x0y0z0, x0y0z1, x0y1z0, ..., x1y1z1 — matches
    # the reference's idx000..idx111 layout (voxel_hash_feature_cuda.cu:83-99)
    idx = []
    for cx in (i0[..., 0], i1[..., 0]):
        for cy in (i0[..., 1], i1[..., 1]):
            for cz in (i0[..., 2], i1[..., 2]):
                idx.append(_hash_index(cx, cy, cz, T))
    return jnp.stack(idx, axis=-1)


def _hash_index_leveled(ix: jax.Array, iy: jax.Array, iz: jax.Array,
                        Ts: jax.Array) -> jax.Array:
    """tcnn spatial hash, vectorized over a trailing level axis.

    ix/iy/iz (..., L) int32 corner coords; Ts (L,) uint32 table sizes."""
    h = (ix.astype(jnp.uint32) * np.uint32(_HASH_PRIMES[0]))
    h = h ^ (iy.astype(jnp.uint32) * np.uint32(_HASH_PRIMES[1]))
    h = h ^ (iz.astype(jnp.uint32) * np.uint32(_HASH_PRIMES[2]))
    return (h % Ts).astype(jnp.int32)


def query_voxel_hash(x: jax.Array, feature: jax.Array, G0: int = 16,
                     growth_factor: float = 1.5, T0: int = 2 ** 15,
                     L: int = 16, D: int = 2,
                     vmin: Vec3 = DEFAULT_MIN, vmax: Vec3 = DEFAULT_MAX
                     ) -> jax.Array:
    """Multi-resolution hash query: (..., 3) -> (..., D*L), channel = d*L + l.

    Vectorized over levels: per-level grid coords / weights / hashes are
    computed on an (…, L)-shaped tensor in ONE set of ops, so the HLO stays
    O(8 corners) regardless of L (the earlier unrolled 8*L-branch form took
    >25 min to compile at L=16 on the target toolchain).  Math parity:
    voxel_hash_feature_cuda.cu:124-194 + the (D*L, B) -> (B, D*L) transpose
    in voxel_hash_feature.py:153-155.
    """
    dtype = x.dtype
    vmin = jnp.asarray(vmin, dtype)
    vmax = jnp.asarray(vmax, dtype)
    levels = hash_level_offsets(G0, growth_factor, T0, L, D)
    for (off, _, _) in levels:
        assert off % D == 0, "level offset not divisible by feature dim"

    # static per-level metadata as (L,) constants
    g1s = jnp.asarray([[G - 1] for (_, G, _) in levels], dtype)      # (L, 1)
    Ts = jnp.asarray([T for (_, _, T) in levels], jnp.uint32)        # (L,)
    row0s = jnp.asarray([off // D for (off, _, _) in levels], jnp.int32)

    # per-level continuous grid coords: (..., L, 3)
    scales = g1s / (vmax - vmin)                                     # (L, 3)
    xyz = (x[..., None, :] - vmin) * scales
    g1b = jnp.broadcast_to(g1s, (L, 3))
    xyz0 = jnp.clip(jnp.floor(xyz), 0.0, g1b)
    xyz1 = jnp.minimum(xyz0 + 1.0, g1b)
    w0 = xyz1 - xyz
    w1 = 1.0 - w0
    i0 = xyz0.astype(jnp.int32)
    i1 = xyz1.astype(jnp.int32)

    # All level offsets are 8-aligned (common_voxel_hash.cuh:24-28), so for
    # D in {1,2,4,8} the flat buffer can be viewed as (n_params/D, D) rows
    # and every level+corner lookup batches into ONE gather (one fast
    # scatter in the backward).
    flat = feature.reshape(-1, D)
    idx_list, w_list = [], []
    for cx in range(2):
        ix = (i0 if cx == 0 else i1)[..., 0]
        wx = (w0 if cx == 0 else w1)[..., 0]
        for cy in range(2):
            iy = (i0 if cy == 0 else i1)[..., 1]
            wy = (w0 if cy == 0 else w1)[..., 1]
            for cz in range(2):
                iz = (i0 if cz == 0 else i1)[..., 2]
                wz = (w0 if cz == 0 else w1)[..., 2]
                idx_list.append(row0s + _hash_index_leveled(ix, iy, iz, Ts))
                w_list.append(wx * wy * wz)
    idx = jnp.stack(idx_list, axis=0)       # (8, ..., L)
    w = jnp.stack(w_list, axis=0)
    f = gather_rows(flat, idx.reshape(8, -1)).reshape(*idx.shape, D)
    acc = jnp.sum(w[..., None] * f, axis=0)  # (..., L, D)
    stacked = jnp.swapaxes(acc, -1, -2)      # (..., D, L)
    return stacked.reshape(*x.shape[:-1], D * L)


def query_voxel_hash_lanczos(x: jax.Array, feature: jax.Array, G0: int = 16,
                             growth_factor: float = 1.5, T0: int = 2 ** 15,
                             L: int = 16, D: int = 2,
                             vmin: Vec3 = DEFAULT_MIN, vmax: Vec3 = DEFAULT_MAX,
                             a: int = 2) -> jax.Array:
    """Lanczos-a hash query (reference: lanczos_voxel_hash_feature_cuda.cu)."""
    dtype = x.dtype
    vmin = jnp.asarray(vmin, dtype)
    vmax = jnp.asarray(vmax, dtype)
    levels = hash_level_offsets(G0, growth_factor, T0, L, D)
    for (off, _, _) in levels:
        assert off % D == 0

    g1s = jnp.asarray([[G - 1] for (_, G, _) in levels], dtype)      # (L, 1)
    Ts = jnp.asarray([T for (_, _, T) in levels], jnp.uint32)
    row0s = jnp.asarray([off // D for (off, _, _) in levels], jnp.int32)

    scales = g1s / (vmax - vmin)
    xyz = (x[..., None, :] - vmin) * scales                          # (..., L, 3)
    xyz0 = jnp.floor(xyz)
    g1b = jnp.broadcast_to(g1s, (L, 3))

    # per-axis taps on (..., L) tensors — HLO stays O((2a)^3) regardless of L
    pos, coef = [], []
    for ax in range(3):
        ps, cs = [], []
        for o in range(-a + 1, a + 1):
            p = jnp.clip(xyz0[..., ax] + o, 0.0, g1b[..., ax])
            cs.append(lanczos_window(xyz[..., ax] - p, a))
            ps.append(p.astype(jnp.int32))
        pos.append(ps)
        coef.append(cs)

    flat = feature.reshape(-1, D)
    n_taps = (2 * a) ** 3
    idx_list, w_list = [], []
    for i in range(2 * a):
        for j in range(2 * a):
            wij = coef[0][i] * coef[1][j]
            for k in range(2 * a):
                idx_list.append(
                    row0s + _hash_index_leveled(pos[0][i], pos[1][j],
                                                pos[2][k], Ts))
                w_list.append(wij * coef[2][k])
    idx = jnp.stack(idx_list, axis=0)       # (n_taps, ..., L)
    w = jnp.stack(w_list, axis=0)
    f = gather_rows(flat, idx.reshape(n_taps, -1)).reshape(*idx.shape, D)
    acc = jnp.sum(w[..., None] * f, axis=0)  # (..., L, D)
    stacked = jnp.swapaxes(acc, -1, -2)
    return stacked.reshape(*x.shape[:-1], D * L)


# ---------------------------------------------------------------------------
# unified encoding spec (what the networks consume)
# ---------------------------------------------------------------------------

class GridEncoding:
    """Config-driven grid encoding: init(key) -> params, apply(params, x).

    Dispatch parity with query_on_grid (reference: python/network.py:120-151)
    plus first-class voxel_hash / lanczos_voxel_hash types the reference
    ships but never wires in (SURVEY.md section 2.2).
    """

    def __init__(self, conf_voxel, radius: float = 1.0):
        c = conf_voxel
        self.type = c.type
        self.G = int(c.grid_size)
        self.D = int(c.feature_size)
        self.use_ste = bool(c.use_ste)
        self.vmin = (-radius, -radius, -radius)
        self.vmax = (radius, radius, radius)
        self.hash_G0 = int(c.get("hash_base_grid_size", 16))
        self.hash_growth = float(c.get("hash_growth_factor", 1.5))
        self.hash_T0 = int(c.get("hash_table_size", 2 ** 15))
        self.hash_L = int(c.get("hash_levels", 16))

    @property
    def out_dim(self) -> int:
        t = self.type
        if t == "none":
            return 0
        if t in ("voxel_hash", "lanczos_voxel_hash"):
            return self.D * self.hash_L
        if t.endswith("triplaneline"):
            return 2 * self.D
        return self.D

    def init(self, key: jax.Array, dtype=jnp.float32):
        t = self.type
        if t == "none":
            return {}
        k0, k1 = jax.random.split(key)
        if t in ("voxel_hash", "lanczos_voxel_hash"):
            return {"F": init_voxel_hash(k0, self.hash_G0, self.hash_growth,
                                         self.hash_T0, self.hash_L, self.D,
                                         dtype=dtype)}
        if t.endswith("triplaneline"):
            return {"plane_F": init_triplane(k0, self.G, self.D, dtype=dtype),
                    "line_F": init_triline(k1, self.G, self.D, dtype=dtype)}
        if t.endswith("triplane"):
            return {"F": init_triplane(k0, self.G, self.D, dtype=dtype)}
        if t.endswith("triline"):
            return {"F": init_triline(k0, self.G, self.D, dtype=dtype)}
        if t.endswith("voxel"):
            return {"F": init_voxel(k0, self.G, self.D, dtype=dtype)}
        raise ValueError(f"Unknown grid type: {t}")

    def apply_with_tv(self, params, x: jax.Array, sym_backward: bool = True):
        """(features, tv_map) with a shared corner gather on dense-voxel
        layouts; other layouts fall back to separate query + TV passes."""
        t = self.type
        if t in ("voxel", "cosine_voxel"):
            xq = jax.lax.stop_gradient(x) if self.use_ste else x
            kind = "cosine" if t.startswith("cosine_") else "linear"
            return query_voxel_and_tv(xq, params["F"], self.vmin, self.vmax,
                                      kind, sym_backward)
        from ndjir_tpu.ops.tv_loss import grid_tv_loss

        return (self.apply(params, x),
                grid_tv_loss(self, params, x, sym_backward))

    def apply(self, params, x: jax.Array) -> jax.Array:
        t = self.type
        if t == "none":
            raise ValueError("apply() on type='none'")
        if self.use_ste:
            # Straight-through: the grid contributes no d(feature)/dx to the
            # normal / eikonal double-backward (reference:
            # voxel_feature.py:383-397 returns None query-grad under STE);
            # feature gradients still flow.
            x = jax.lax.stop_gradient(x)
        kind = "cosine" if t.startswith("cosine_") else "linear"
        lanczos = t.startswith("lanczos_")
        base = t.split("_")[-1] if not t.endswith("triplaneline") else "triplaneline"
        if t in ("voxel_hash", "lanczos_voxel_hash"):
            base = "voxel_hash"

        if base == "voxel_hash":
            fn = query_voxel_hash_lanczos if lanczos else query_voxel_hash
            return fn(x, params["F"], self.hash_G0, self.hash_growth,
                      self.hash_T0, self.hash_L, self.D, self.vmin, self.vmax)
        if base == "triplaneline":
            if lanczos:
                f0 = query_triplane_lanczos(x, params["plane_F"], self.vmin, self.vmax)
                f1 = query_triline_lanczos(x, params["line_F"], self.vmin, self.vmax)
            else:
                f0 = query_triplane(x, params["plane_F"], self.vmin, self.vmax, kind)
                f1 = query_triline(x, params["line_F"], self.vmin, self.vmax, kind)
            return jnp.concatenate([f0, f1], axis=-1)
        if base == "triplane":
            return (query_triplane_lanczos(x, params["F"], self.vmin, self.vmax)
                    if lanczos else
                    query_triplane(x, params["F"], self.vmin, self.vmax, kind))
        if base == "triline":
            return (query_triline_lanczos(x, params["F"], self.vmin, self.vmax)
                    if lanczos else
                    query_triline(x, params["F"], self.vmin, self.vmax, kind))
        if base == "voxel":
            return (query_voxel_lanczos(x, params["F"], self.vmin, self.vmax)
                    if lanczos else
                    query_voxel(x, params["F"], self.vmin, self.vmax, kind))
        raise ValueError(f"Unknown grid type: {t}")
