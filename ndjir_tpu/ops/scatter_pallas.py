"""Fast scatter-add for grid-feature gradients (Pallas TPU kernel).

XLA's TPU scatter processes ~one row per 85 ns regardless of sorting/unique
flags (committed artifact docs/roofline_data.json `scatter`: 84.8 ns/row
XLA vs 19.5 ns/row this kernel, 2M d=8 rows into a 256^3-row table).  The
grid-feature backward needs exactly this scatter several times per training
step, so it dominated the step time.

Reformulation: sort + slab-local one-hot matmuls.

  1. XLA: multi-operand ``lax.sort`` by row id (12 ms for 2.1M updates —
     much cheaper than argsort + gather) and ``searchsorted`` slab starts.
  2. Pallas: grid over table slabs of S rows; each instance owns the output
     block (S, D), streams its (sorted, hence contiguous) update range from
     HBM in 128-aligned chunks via async DMA, builds a (C, S) one-hot of
     local row ids on the VPU, and accumulates ``one_hot^T @ vals`` on the
     MXU.  No atomics needed — each output row belongs to exactly one
     instance (the reference's CUDA equivalent is an atomicAdd loop,
     voxel_hash_feature_cuda.cu:387).

Mosaic layout constraints drive the data prep: ids ship lane-packed as
(N/128, 128) int32 and values transposed as (D, N) so every DMA slices only
128-aligned lane ranges.

The public entry is :func:`scatter_add_rows`; :func:`gather_rows` is a
custom-vjp gather whose backward uses it, making every grid-feature cotangent
in the framework take the fast path while the spatial (eikonal) second-order
path stays ordinary differentiable jnp.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SLAB = int(os.environ.get("NDJIR_SCATTER_SLAB", 2048))   # rows per instance
# slab sweep at the production workload (524k d=32 rows, argsort sort):
# 2048 -> 16.01 ms, 4096 -> 16.38, 8192 -> 19.91 (docs/probe_grid_bwd.json)
_CHUNK = int(os.environ.get("NDJIR_SCATTER_CHUNK", 128))   # rows per DMA
_SUB = 128        # rows per one-hot/matmul sub-step
assert _CHUNK % _SUB == 0 and _CHUNK >= _SUB, \
    "NDJIR_SCATTER_CHUNK must be a positive multiple of 128"
assert _SLAB % 128 == 0 and _SLAB > 0, \
    "NDJIR_SCATTER_SLAB must be a positive multiple of 128"


_INTERPRET = bool(os.environ.get("NDJIR_PALLAS_INTERPRET"))
# Width-dependent sort default (round-5 chip probe, docs/probe_grid_bwd.json):
# at d=32 (the octa cotangent) the multi-operand sort streams 33 operands
# through every sort-network pass while argsort+gather permutes the values
# with ONE gather — full-scatter 16.4 ms argsort; at d<=8 (z-dup) the
# microbench (docs/roofline_data.json `sort`) has multiop 2x ahead.
# NDJIR_SCATTER_SORT={multiop,argsort} forces one strategy globally.
_SORT_MODE = os.environ.get("NDJIR_SCATTER_SORT", "")


def _sort_mode_for(d: int) -> str:
    return _SORT_MODE or ("argsort" if d > 8 else "multiop")


def _on_tpu() -> bool:
    if os.environ.get("NDJIR_DISABLE_PALLAS_SCATTER"):
        return False
    if _INTERPRET:
        return True   # exercise the kernel in interpreter mode (tests)
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _scatter_kernel(starts_ref, ids_hbm, vals_hbm, out_ref, ids_buf,
                    vals_buf, sem_i, sem_v, *, slab, chunk, d):
    k = pl.program_id(0)
    start = starts_ref[k]
    end = starts_ref[k + 1]
    out_ref[:] = jnp.zeros_like(out_ref)

    start_al = (start // chunk) * chunk     # chunk-aligned read base
    # skip DMA+compute entirely for slabs with no updates (surface-localized
    # update distributions leave most slabs empty)
    n_chunks = jnp.where(end > start,
                         (end - start_al + chunk - 1) // chunk, 0)
    row0 = k * slab
    # one-hot built as (slab, sub): slab rows on sublanes, updates on lanes
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (slab, 1), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, _SUB), 1)

    n_sub = chunk // _SUB

    def body(i, _):
        off = start_al + i * chunk
        cp_i = pltpu.make_async_copy(
            ids_hbm.at[pl.ds(off // _SUB, n_sub), :], ids_buf, sem_i)
        cp_v = pltpu.make_async_copy(
            vals_hbm.at[:, pl.ds(off, chunk)], vals_buf, sem_v)
        cp_i.start()
        cp_v.start()
        cp_i.wait()
        cp_v.wait()
        for j in range(n_sub):
            pos = off + j * _SUB + iota_c             # (1, _SUB)
            valid = (pos >= start) & (pos < end)
            local = ids_buf[j:j + 1, :] - row0        # (1, _SUB)
            onehot = ((local == iota_s) & valid).astype(jnp.float32)  # (slab, _SUB)
            # One-hot is exact in bf16, so a hi/lo split of the values makes
            # the default (single-pass bf16) MXU matmul exact to ~2^-16
            # relative at a third of the cost of Precision.HIGHEST.
            v = vals_buf[:, j * _SUB:(j + 1) * _SUB]
            v_hi = v.astype(jnp.bfloat16).astype(jnp.float32)
            v_lo = v - v_hi

            def mm(lhs):
                # (d, sub) . (slab, sub) contracting sub -> (d, slab);
                # transposed output keeps the lane dim = slab (128-aligned)
                # so the HBM buffer has no 32x lane padding.
                return jax.lax.dot_general(
                    lhs, onehot,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            out_ref[:] += mm(v_hi) + mm(v_lo)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("num_rows", "slab", "sort_mode"))
def _scatter_add_rows_pallas_t(ids: jax.Array, vals: jax.Array,
                               num_rows: int, slab: int = _SLAB,
                               sort_mode: str | None = None) -> jax.Array:
    """Transposed-output scatter-add: (d, num_rows) f32, no final transpose.

    The accumulation layout inside the kernel is already (d, slab); wide-row
    consumers (the octa grid-cotangent fold) read it directly, skipping a
    2x full-table HBM transpose pass.  ``slab`` (rows per grid instance) is
    static so chip probes can sweep it (scripts/probe_grid_bwd.py); the
    default comes from NDJIR_SCATTER_SLAB."""
    assert slab % 128 == 0 and slab > 0
    n, d = vals.shape
    n_slabs = pl.cdiv(num_rows, slab)
    m_pad = n_slabs * slab

    # sort updates by row id; pad to whole chunks with out-of-range ids.
    # Two strategies: "multiop" carries all d value columns through the
    # sort network; "argsort" sorts (id, iota) then permutes the values with
    # ONE gather — at d=32 the sort network otherwise streams 33 operands
    # through every pass (NDJIR_SCATTER_SORT picks; see probe_grid_bwd).
    if (sort_mode or _sort_mode_for(d)) == "argsort":
        ids_s, perm = jax.lax.sort(
            (ids.astype(jnp.int32), jax.lax.iota(jnp.int32, n)), num_keys=1)
        vals_t = vals[perm].astype(jnp.float32).T       # (d, n)
    else:
        operands = (ids.astype(jnp.int32),) \
            + tuple(vals[:, j] for j in range(d))
        out = jax.lax.sort(operands, num_keys=1)
        ids_s = out[0]
        vals_t = jnp.stack(out[1:], axis=0).astype(jnp.float32)  # (d, n)
    n_pad = ((n + _CHUNK - 1) // _CHUNK) * _CHUNK + _CHUNK
    ids_p = jnp.concatenate(
        [ids_s, jnp.full((n_pad - n,), m_pad, jnp.int32)])
    vals_p = jnp.concatenate(
        [vals_t, jnp.zeros((d, n_pad - n), jnp.float32)], axis=1)

    bounds = jnp.arange(n_slabs + 1, dtype=jnp.int32) * slab
    starts = jnp.searchsorted(ids_s, bounds).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_slabs,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((d, slab), lambda k, s: (0, k),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_CHUNK // _SUB, _SUB), jnp.int32),
            pltpu.VMEM((d, _CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_scatter_kernel, slab=slab, chunk=_CHUNK, d=d)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d, m_pad), jnp.float32),
        interpret=_INTERPRET,
    )(starts, ids_p.reshape(-1, _SUB), vals_p)
    return out[:, :num_rows]


def scatter_add_rows(ids: jax.Array, vals: jax.Array, num_rows: int
                     ) -> jax.Array:
    """sum_i onehot(ids[i]) * vals[i] -> (num_rows, D) dense accumulation.

    Pallas fast path on TPU; XLA ``.at[].add`` elsewhere (and under
    NDJIR_DISABLE_PALLAS_SCATTER=1).
    """
    if _on_tpu():
        return _scatter_add_rows_pallas_t(ids, vals, num_rows).T.astype(
            vals.dtype)
    return jnp.zeros((num_rows, vals.shape[-1]),
                     vals.dtype).at[ids].add(vals)


def scatter_add_rows_t(ids: jax.Array, vals: jax.Array, num_rows: int,
                       slab: int | None = None) -> jax.Array:
    """Transposed scatter-add: (D, num_rows) f32 accumulation (the kernel's
    native layout — no transpose pass).  Used by wide-row cotangent folds."""
    if _on_tpu():
        return _scatter_add_rows_pallas_t(ids, vals, num_rows,
                                          slab if slab else _SLAB)
    return jnp.zeros((num_rows, vals.shape[-1]),
                     jnp.float32).at[ids].add(vals.astype(jnp.float32)).T


# ---------------------------------------------------------------------------
# custom-vjp gather: feature cotangents take the fast scatter
# ---------------------------------------------------------------------------

@jax.custom_vjp
def gather_rows(table: jax.Array, ids: jax.Array) -> jax.Array:
    """table (M, D), ids (...,) int -> (..., D).

    Forward is a plain XLA gather (the fastest TPU form measured); backward
    w.r.t. the table is :func:`scatter_add_rows`.  Spatial derivatives of the
    interpolation *weights* never pass through here (ids are integer), so the
    eikonal grad-of-grad path stays ordinary differentiable jnp.
    """
    return table[ids]


def _gather_fwd(table, ids):
    return table[ids], (ids, table.shape[0])


def _gather_bwd(res, g):
    ids, num_rows = res
    flat_ids = ids.reshape(-1)
    flat_g = g.reshape(-1, g.shape[-1])
    dtable = scatter_add_rows(flat_ids, flat_g, num_rows)
    return dtable, None


gather_rows.defvjp(_gather_fwd, _gather_bwd)
