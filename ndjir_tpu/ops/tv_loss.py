"""Point-sampled total-variation regularizers for grid features.

At each query point, the enclosing cell's corner feature f0 is compared with
its +1 neighbours along each layout axis; the per-channel result is the L2
norm of those forward differences.  Layout dispatch is by parameter family —
the cosine/Lanczos interpolation variants share the same cell-based TV as
their linear parents (the reference registers them under the same parameter
scope, e.g. lanczos_voxel_feature.py:144 -> "voxel_feature").

Semantics parity: csrc/grid_feature/total_variation_loss_cuda.cu (voxel,
:45-85 fwd / :155-175 bwd), *_on_triplane (sqrt(du^2+dv^2) per plane),
*_on_triline (|f1-f0| per line), *_on_voxel_hash (per level).  The backward
stabilizes with rsqrt(s + 1e-12); ``sym_backward=False`` drops the gradient
into the base corner f0 (reference backward kernel's template flag) — in JAX
that is a stop_gradient on f0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ndjir_tpu.ops.grid import (
    DEFAULT_MAX,
    DEFAULT_MIN,
    _corners,
    _hash_index,
    _to_grid,
    hash_level_offsets,
)
from ndjir_tpu.ops.scatter_pallas import gather_rows


def _gather4(flat, idx_list):
    """Batched corner gathers: one gather_rows call -> list of (..., D).

    Corner values are promoted to f32 before the forward differences (bf16
    tables would cancel catastrophically)."""
    idx = jnp.stack(idx_list, axis=0)
    f = gather_rows(flat, idx.reshape(len(idx_list), -1))
    f = f.reshape(*idx.shape, flat.shape[-1]).astype(jnp.float32)
    return [f[i] for i in range(len(idx_list))]


@jax.custom_jvp
def _tv_sqrt(s: jax.Array) -> jax.Array:
    """sqrt with the reference's backward stabilization (rsqrt(s + 1e-12))."""
    return jnp.sqrt(s)


@_tv_sqrt.defjvp
def _tv_sqrt_jvp(primals, tangents):
    (s,), (ds,) = primals, tangents
    y = jnp.sqrt(s)
    return y, 0.5 * jax.lax.rsqrt(s + 1e-12) * ds


def _base(f0: jax.Array, sym_backward: bool) -> jax.Array:
    return f0 if sym_backward else jax.lax.stop_gradient(f0)


def tv_loss_voxel(x: jax.Array, feature: jax.Array,
                  vmin=DEFAULT_MIN, vmax=DEFAULT_MAX,
                  sym_backward: bool = True) -> jax.Array:
    """(..., 3), (G,G,G,D) -> (..., D)."""
    Gx, Gy, Gz, D = feature.shape
    dtype = x.dtype
    g1 = jnp.asarray([Gx - 1, Gy - 1, Gz - 1], dtype)
    xyz = _to_grid(x, g1, jnp.asarray(vmin, dtype), jnp.asarray(vmax, dtype))
    xyz0, xyz1 = _corners(xyz, g1)
    i0 = xyz0.astype(jnp.int32)
    i1 = xyz1.astype(jnp.int32)

    flat = feature.reshape(-1, D)
    sy, sx = Gz, Gy * Gz
    ix0, iy0, iz0 = i0[..., 0], i0[..., 1], i0[..., 2]
    ix1, iy1, iz1 = i1[..., 0], i1[..., 1], i1[..., 2]

    f000, f100, f010, f001 = _gather4(flat, [
        ix0 * sx + iy0 * sy + iz0, ix1 * sx + iy0 * sy + iz0,
        ix0 * sx + iy1 * sy + iz0, ix0 * sx + iy0 * sy + iz1])
    f000 = _base(f000, sym_backward)

    s = (f100 - f000) ** 2 + (f010 - f000) ** 2 + (f001 - f000) ** 2
    return _tv_sqrt(s)


def tv_loss_triplane(x: jax.Array, feature: jax.Array,
                     vmin=DEFAULT_MIN, vmax=DEFAULT_MAX,
                     sym_backward: bool = True) -> jax.Array:
    """(..., 3), (3,G,G,D) -> (..., D*3) (planes xy, yz, zx)."""
    _, G, _, D = feature.shape
    dtype = x.dtype
    g1 = jnp.full((3,), G - 1, dtype)
    xyz = _to_grid(x, g1, jnp.asarray(vmin, dtype), jnp.asarray(vmax, dtype))
    xyz0, xyz1 = _corners(xyz, g1)
    i0 = xyz0.astype(jnp.int32)
    i1 = xyz1.astype(jnp.int32)

    flat = feature.reshape(-1, D)
    idx_list = []
    for p, (au, av) in enumerate(((0, 1), (1, 2), (2, 0))):
        off = p * G * G
        u0, v0 = i0[..., au], i0[..., av]
        u1, v1 = i1[..., au], i1[..., av]
        idx_list += [off + u0 * G + v0, off + u1 * G + v0, off + u0 * G + v1]
    fs = _gather4(flat, idx_list)
    outs = []
    for p in range(3):
        f00 = _base(fs[3 * p], sym_backward)
        f10, f01 = fs[3 * p + 1], fs[3 * p + 2]
        s = (f10 - f00) ** 2 + (f01 - f00) ** 2
        outs.append(_tv_sqrt(s))  # (..., D)
    return jnp.stack(outs, axis=-1).reshape(*x.shape[:-1], D * 3)


def tv_loss_triline(x: jax.Array, feature: jax.Array,
                    vmin=DEFAULT_MIN, vmax=DEFAULT_MAX,
                    sym_backward: bool = True) -> jax.Array:
    """(..., 3), (3,G,D) -> (..., D*3)."""
    _, G, D = feature.shape
    dtype = x.dtype
    g1 = jnp.full((3,), G - 1, dtype)
    xyz = _to_grid(x, g1, jnp.asarray(vmin, dtype), jnp.asarray(vmax, dtype))
    xyz0, xyz1 = _corners(xyz, g1)
    i0 = xyz0.astype(jnp.int32)
    i1 = xyz1.astype(jnp.int32)

    flat = feature.reshape(-1, D)
    idx_list = []
    for ax in range(3):
        idx_list += [ax * G + i0[..., ax], ax * G + i1[..., ax]]
    fs = _gather4(flat, idx_list)
    outs = []
    for ax in range(3):
        f0 = _base(fs[2 * ax], sym_backward)
        f1 = fs[2 * ax + 1]
        outs.append(_tv_sqrt((f1 - f0) ** 2))
    return jnp.stack(outs, axis=-1).reshape(*x.shape[:-1], D * 3)


def tv_loss_voxel_hash(x: jax.Array, feature: jax.Array, G0: int = 16,
                       growth_factor: float = 1.5, T0: int = 2 ** 15,
                       L: int = 16, D: int = 2,
                       vmin=DEFAULT_MIN, vmax=DEFAULT_MAX,
                       sym_backward: bool = True) -> jax.Array:
    """(..., 3), (n_params,) -> (..., D*L), channel = d*L + l."""
    import numpy as np

    from ndjir_tpu.ops.grid import _hash_index_leveled

    dtype = x.dtype
    vmin = jnp.asarray(vmin, dtype)
    vmax = jnp.asarray(vmax, dtype)
    levels = hash_level_offsets(G0, growth_factor, T0, L, D)
    for (off, _, _) in levels:
        assert off % D == 0

    # vectorized over levels (see ops.grid.query_voxel_hash): the HLO stays
    # O(4 corners) regardless of L
    g1s = jnp.asarray([[G - 1] for (_, G, _) in levels], dtype)      # (L, 1)
    Ts = jnp.asarray([T for (_, _, T) in levels], jnp.uint32)
    row0s = jnp.asarray([off // D for (off, _, _) in levels], jnp.int32)

    scales = g1s / (vmax - vmin)
    xyz = (x[..., None, :] - vmin) * scales                          # (..., L, 3)
    g1b = jnp.broadcast_to(g1s, (L, 3))
    xyz0 = jnp.clip(jnp.floor(xyz), 0.0, g1b)
    xyz1 = jnp.minimum(xyz0 + 1.0, g1b)
    i0 = xyz0.astype(jnp.int32)
    i1 = xyz1.astype(jnp.int32)
    ix0, iy0, iz0 = i0[..., 0], i0[..., 1], i0[..., 2]
    ix1, iy1, iz1 = i1[..., 0], i1[..., 1], i1[..., 2]

    flat = feature.reshape(-1, D)
    fs = _gather4(flat, [
        row0s + _hash_index_leveled(ix0, iy0, iz0, Ts),
        row0s + _hash_index_leveled(ix1, iy0, iz0, Ts),
        row0s + _hash_index_leveled(ix0, iy1, iz0, Ts),
        row0s + _hash_index_leveled(ix0, iy0, iz1, Ts)])  # each (..., L, D)
    f000 = _base(fs[0], sym_backward)
    f100, f010, f001 = fs[1], fs[2], fs[3]
    s = (f100 - f000) ** 2 + (f010 - f000) ** 2 + (f001 - f000) ** 2
    stacked = jnp.swapaxes(_tv_sqrt(s), -1, -2)  # (..., D, L)
    return stacked.reshape(*x.shape[:-1], D * L)


def grid_tv_loss(encoding, params, x: jax.Array,
                 sym_backward: bool = True) -> jax.Array:
    """Dispatch TV over a GridEncoding's parameter family; returns the
    per-point channel-concatenated TV map (..., C_total).

    Mirrors the param-name-driven dispatch in reference loss.py:79-105 (for
    triplaneline both families contribute, as the reference's parameter
    iteration naturally does).
    """
    t = encoding.type
    vmin, vmax = encoding.vmin, encoding.vmax
    if t == "none":
        return jnp.zeros((*x.shape[:-1], 1), dtype=x.dtype)
    parts = []
    if t in ("voxel_hash", "lanczos_voxel_hash"):
        parts.append(tv_loss_voxel_hash(
            x, params["F"], encoding.hash_G0, encoding.hash_growth,
            encoding.hash_T0, encoding.hash_L, encoding.D, vmin, vmax,
            sym_backward))
    elif t.endswith("triplaneline"):
        parts.append(tv_loss_triplane(x, params["plane_F"], vmin, vmax, sym_backward))
        parts.append(tv_loss_triline(x, params["line_F"], vmin, vmax, sym_backward))
    elif t.endswith("triplane"):
        parts.append(tv_loss_triplane(x, params["F"], vmin, vmax, sym_backward))
    elif t.endswith("triline"):
        parts.append(tv_loss_triline(x, params["F"], vmin, vmax, sym_backward))
    elif t.endswith("voxel"):
        parts.append(tv_loss_voxel(x, params["F"], vmin, vmax, sym_backward))
    else:
        raise ValueError(f"Unknown grid type: {t}")
    return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
