"""Coordinate-MLP field networks (geometry, materials, lights, background).

Functional param-pytree re-design of the reference's nine name-scoped nnabla
networks (reference: python/network.py:154-561).  Every network is a pair
``init_*(key, conf) -> params`` / ``*_apply(params, ..., conf) -> out``; the
full model is built by :func:`init_model`.  Param keys mirror the reference's
parameter scopes (``geometric-network/affine-00/W`` etc.) so a reference
checkpoint maps 1:1 and the optimizer's feature/weight split can key on path
names (reference: python/solver.py:34-46).

TPU notes: all hidden widths are 128/256 — MXU-aligned; points are flattened
to (N_pts, C) matmuls by the caller.  ``conf.precision.mlp_dtype=bfloat16``
runs the affine layers in bf16 with f32 accumulation (grids, gains and heads
stay f32).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ndjir_tpu.ops.activations import get_activation, get_last_activation, softplus
from ndjir_tpu.ops.encoding import pe_dim, positional_encoding
from ndjir_tpu.ops.grid import GridEncoding

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# affine + MLP primitives
# ---------------------------------------------------------------------------

def _glorot_uniform(key, Di, Do, dtype=jnp.float32):
    lim = np.sqrt(6.0 / (Di + Do))
    return jax.random.uniform(key, (Di, Do), dtype, -lim, lim)


def init_affine(key, Di: int, Do: int, w_init=None, b_init=None,
                use_wn: bool = False, dtype=jnp.float32) -> Params:
    kw, _ = jax.random.split(key)
    W = w_init(kw) if w_init is not None else _glorot_uniform(kw, Di, Do, dtype)
    b = (b_init() if b_init is not None else jnp.zeros((Do,), dtype))
    p = {"W": W, "b": b}
    if use_wn:
        p["g"] = jnp.ones((Do,), dtype)
    return p


def affine_apply(p: Params, h: jax.Array, compute_dtype=None,
                 out_dtype=jnp.float32) -> jax.Array:
    """y = h @ W + b, optionally weight-normalized per output column
    (reference: python/network.py:88-93; PF.weight_normalization dim=1).

    Accumulation is always f32 (``preferred_element_type``); ``out_dtype``
    controls the dtype the activation is *stored* in.  Hidden layers in bf16
    mode pass ``out_dtype=bfloat16`` so the (N_pts, width) activations hit
    HBM at half the bytes — the next matmul would re-truncate its operands
    to bf16 anyway, so the f32 round-trip bought no precision, only
    bandwidth."""
    W = p["W"]
    if "g" in p:
        W = p["g"] * W / jnp.maximum(
            jnp.linalg.norm(W, axis=0, keepdims=True), 1e-12)
    if compute_dtype is not None and compute_dtype != h.dtype:
        h = h.astype(compute_dtype)
    if compute_dtype is not None and compute_dtype != W.dtype:
        W = W.astype(compute_dtype)
    y = jnp.dot(h, W, preferred_element_type=jnp.float32) + p["b"]
    return y.astype(out_dtype)


def _normalized_W(p: Params) -> jax.Array:
    W = p["W"]
    if "g" in p:
        W = p["g"] * W / jnp.maximum(
            jnp.linalg.norm(W, axis=0, keepdims=True), 1e-12)
    return W


def affine_apply_split(p: Params, parts, compute_dtype=None,
                       out_dtype=jnp.float32) -> jax.Array:
    """Affine over the conceptual concat of ``parts`` WITHOUT materializing
    it: each part matmuls its own W row-block and the results add (matmul
    linearity — numerically the same sum, reassociated).

    TPU rationale: head inputs are concats of per-sample tensors with
    *broadcast* per-pixel tensors (geometric feature over M light dirs,
    PE'd view over N samples).  The fused concat forces the broadcast to
    materialize at (B, R, M|N, 256+) in HBM and matmuls the duplicate rows;
    split, a (B, R, 1, D) part projects ONCE per pixel and broadcast-adds
    its (B, R, 1, width) activation — bytes and MXU rows both drop by ~M.
    """
    W = _normalized_W(p)
    off, y = 0, None
    for t in parts:
        if t is None:
            continue
        Wp = W[off:off + t.shape[-1]]
        off += t.shape[-1]
        if compute_dtype is not None:
            t = t.astype(compute_dtype)
            Wp = Wp.astype(compute_dtype)
        d = jnp.dot(t, Wp, preferred_element_type=jnp.float32)
        y = d if y is None else y + d
    assert off == W.shape[0], (off, W.shape)
    return (y + p["b"]).astype(out_dtype)


def _mlp_init(key, dims, use_wn, dtype=jnp.float32, name_fmt="affine-{:02d}",
              name_offset=0, last_offset=None):
    """Plain (non-geometric) MLP stack; returns {name: affine params}.

    ``name_offset`` shifts hidden-layer numbering; ``last_offset`` (default =
    name_offset) shifts the last layer separately — the reference's roughness
    / specular heads number hidden layers l-1 but the LAST layer L-1
    (network.py:451, 454), leaving a gap in the sequence.
    """
    last_offset = name_offset if last_offset is None else last_offset
    params = {}
    keys = jax.random.split(key, len(dims) - 1)
    L = len(dims) - 1
    for l in range(L):
        off = last_offset if l == L - 1 else name_offset
        name = name_fmt.format(l + off)
        params[name] = init_affine(keys[l], dims[l], dims[l + 1],
                                   use_wn=use_wn, dtype=dtype)
    return params


def _mlp_apply(params, h, n_layers, act, compute_dtype=None,
               name_fmt="affine-{:02d}", name_offset=0, last_offset=None,
               start=0):
    """``start``: resume from layer `start` (the caller already applied the
    earlier layers + activations, e.g. via :func:`affine_apply_split`)."""
    last_offset = name_offset if last_offset is None else last_offset
    hid_dtype = jnp.float32 if compute_dtype is None else compute_dtype
    for l in range(start, n_layers - 1):
        h = affine_apply(params[name_fmt.format(l + name_offset)], h,
                         compute_dtype, out_dtype=hid_dtype)
        h = act(h)
    return affine_apply(params[name_fmt.format(n_layers - 1 + last_offset)],
                        h, compute_dtype)


def _compute_dtype(conf):
    d = conf.precision.mlp_dtype if "precision" in conf else "float32"
    return jnp.bfloat16 if d == "bfloat16" else None


# ---------------------------------------------------------------------------
# geometric (SDF) network with SAL sphere init
# ---------------------------------------------------------------------------

def _geometric_w_init(key, Di, Do, sigma, zero_start=None, last=False,
                      dtype=jnp.float32):
    """sqrt(sigma)*randn, optional zeroed row-block, optional pi-scaled SDF
    column (reference GeometricInitializer, python/network.py:36-56)."""
    def init(k):
        w = np.sqrt(sigma) * jax.random.normal(k, (Di, Do), dtype)
        if zero_start is not None:
            rows = jnp.arange(Di)[:, None]
            zs = zero_start if zero_start >= 0 else Di + zero_start
            w = jnp.where(rows >= zs, 0.0, w)
        if last:
            k2 = jax.random.fold_in(k, 1)
            col0 = (np.sqrt(np.pi / Di) * jnp.ones((Di,), dtype)
                    + 1e-4 * jax.random.normal(k2, (Di,), dtype))
            w = w.at[:, 0].set(col0)
        return w
    return init(key)


def init_geometric(key, conf, dtype=jnp.float32) -> Params:
    """SDF network params (reference: python/network.py:154-232).

    Layout under geometric_init (the default): layer 0 zeroes the weight rows
    of everything but raw x; the layer feeding a skip concat narrows to
    D - D_inputs; the skip layer zeroes the concatenated-input rows; the last
    layer ("affine-last") gets the pi-scaled SDF column and bias -r.
    """
    g = conf.geometric_network
    D = g.feature_size
    L = g.layers
    M = g.pe_bands
    skip_layers = tuple(g.skip_layers)
    use_wn = conf.use_wn
    radius = conf.renderer.bounding_sphere_radius

    enc = GridEncoding(g.voxel, radius=radius)
    Dx = 3
    Din = pe_dim(Dx, M) + enc.out_dim  # width of the concatenated inputs

    params: Params = {}
    if enc.out_dim > 0:
        kgrid, key = jax.random.split(key)
        # precision.grid_dtype=bfloat16 halves the table + its Adam moments
        # + its gradient (the G=512 reference default then fits 16 GB HBM);
        # interpolation weights and the weighted sum stay f32, and the
        # Pallas scatter accumulates grid cotangents in f32 regardless.
        gd = (conf.precision.grid_dtype if "precision" in conf else "float32")
        grid_dtype = jnp.bfloat16 if gd == "bfloat16" else dtype
        params["grid"] = enc.init(kgrid, dtype=grid_dtype)

    keys = jax.random.split(key, L + 1)
    if not g.geometric_init:
        h_dim = Din
        for l in range(L - 1):
            Do = D
            params[f"affine-{l:02d}"] = init_affine(keys[l], h_dim, Do,
                                                    use_wn=use_wn, dtype=dtype)
            h_dim = Do + (pe_dim(Dx, M) if l in skip_layers else 0)
        params[f"affine-{L - 1:02d}"] = init_affine(keys[L - 1], h_dim, D + 1,
                                                    use_wn=use_wn, dtype=dtype)
    else:
        h_dim = Din
        for l in range(L):
            if l == 0:
                W = _geometric_w_init(keys[l], h_dim, D, 2.0 / D,
                                      zero_start=Dx, dtype=dtype)
                params[f"affine-{l:02d}"] = {"W": W, "b": jnp.zeros((D,), dtype)}
                h_dim = D
            elif l in skip_layers:
                W = _geometric_w_init(keys[l], D, D, 2.0 / (D - Din),
                                      zero_start=-Din, dtype=dtype)
                params[f"affine-{l:02d}"] = {"W": W, "b": jnp.zeros((D,), dtype)}
                h_dim = D
            elif l == L - 1:
                Do = 1 + D
                W = _geometric_w_init(keys[l], D, Do, 2.0 / Do, last=True,
                                      dtype=dtype)
                b = jnp.full((Do,), -g.initial_sphere_radius, dtype)
                params["affine-last"] = {"W": W, "b": b}
            else:
                Do = D - Din if (l + 1) in skip_layers else D
                W = _geometric_w_init(keys[l], h_dim, Do, 2.0 / Do, dtype=dtype)
                params[f"affine-{l:02d}"] = {"W": W, "b": jnp.zeros((Do,), dtype)}
                h_dim = Do + (Din if (l + 1) in skip_layers else 0)
            if use_wn and f"affine-{l:02d}" in params:
                params[f"affine-{l:02d}"]["g"] = jnp.ones(
                    params[f"affine-{l:02d}"]["W"].shape[1:], dtype)
            if use_wn and l == L - 1:
                params["affine-last"]["g"] = jnp.ones((1 + D,), dtype)

    # learnable NeuS inverse-s parameter (reference: network.py:227-231)
    params["gain"] = jnp.asarray([conf.train.sigmoid_gain], dtype)
    return params


def geometric_apply(params: Params, x: jax.Array, conf,
                    with_tv: bool = False, tv_sym: bool = True):
    """x (..., 3) -> (sdf (..., 1), feature (..., D), gain scalar array).

    ``with_tv=True`` additionally returns the grid TV map (..., C) computed
    from the SAME corner gather as the feature query (one fewer gather pass
    and backward scatter per step; see ops.grid.query_voxel_and_tv).
    """
    g = conf.geometric_network
    D = g.feature_size
    L = g.layers
    M = g.pe_bands
    act = get_activation(g.act)
    skip_layers = tuple(g.skip_layers)
    cdt = _compute_dtype(conf)

    tv_map = None
    pe_x = positional_encoding(x, M) if M > 0 else x
    if "grid" in params:
        enc = GridEncoding(g.voxel, radius=conf.renderer.bounding_sphere_radius)
        if with_tv:
            vfeat, tv_map = enc.apply_with_tv(params["grid"], x, tv_sym)
        else:
            vfeat = enc.apply(params["grid"], x)
    else:
        if with_tv:
            tv_map = jnp.zeros((*x.shape[:-1], 1), dtype=x.dtype)
        vfeat = None

    sdf, feature, gain = _geometric_mlp(params, pe_x, vfeat, conf)
    if with_tv:
        return sdf, feature, gain, tv_map
    return sdf, feature, gain


def _geometric_mlp(params: Params, pe_x: jax.Array, vfeat, conf):
    """The geometric network's MLP stack given already-computed PE'd inputs
    and grid features (``vfeat`` may be None for grid-free configs)."""
    g = conf.geometric_network
    L = g.layers
    act = get_activation(g.act)
    skip_layers = tuple(g.skip_layers)
    cdt = _compute_dtype(conf)

    inputs = pe_x if vfeat is None \
        else jnp.concatenate([pe_x, vfeat], axis=-1)
    h = inputs

    hid = jnp.float32 if cdt is None else cdt
    if not g.geometric_init:
        for l in range(L - 1):
            h = affine_apply(params[f"affine-{l:02d}"], h, cdt, out_dtype=hid)
            if l in skip_layers:
                h = jnp.concatenate([h, pe_x.astype(h.dtype)], axis=-1)
            h = act(h)
        h = affine_apply(params[f"affine-{L - 1:02d}"], h, cdt)
    else:
        for l in range(L):
            name = "affine-last" if l == L - 1 else f"affine-{l:02d}"
            h = affine_apply(params[name], h, cdt,
                             out_dtype=jnp.float32 if l == L - 1 else hid)
            if l < L - 1:
                h = act(h)
                # the skip concat only follows INTERMEDIATE layers (the
                # reference's first/skip branches never concat,
                # network.py:196-224), so adjacent skips stay well-shaped
                if (l + 1) in skip_layers and l != 0 \
                        and l not in skip_layers:
                    h = jnp.concatenate([h, inputs.astype(h.dtype)], axis=-1)
                    if g.use_inv_square:
                        h = h / np.sqrt(2)

    sdf, feature = h[..., 0:1], h[..., 1:]
    gain = jnp.clip(jnp.exp(params["gain"] * 10.0), 1e-6, 5e4)
    return sdf, feature, gain


def geometric_supports_shared_gather(params: Params, conf) -> bool:
    """Whether the dense-voxel shared-gather fast path applies (see
    :func:`geometric_apply_corners`)."""
    from ndjir_tpu.ops.grid import use_octa_layout, use_zdup_layout

    g = conf.geometric_network
    if "grid" not in params or g.voxel.type not in ("voxel", "cosine_voxel") \
            or g.voxel.use_ste:
        return False
    F = params["grid"]["F"]
    return use_zdup_layout(F.shape, F.dtype) \
        or use_octa_layout(F.shape, F.dtype)


def geometric_gather_corners(params: Params, x_list, conf):
    """ONE fused corner gather for several point sets (shared backward
    scatter); pair with :func:`geometric_apply_corners`."""
    from ndjir_tpu.ops.grid import voxel_gather_multi

    r = conf.renderer.bounding_sphere_radius
    return voxel_gather_multi(x_list, params["grid"]["F"],
                              (-r,) * 3, (r,) * 3)


def geometric_apply_corners(params: Params, x: jax.Array, corners: jax.Array,
                            conf, with_tv: bool = False, tv_sym: bool = True):
    """:func:`geometric_apply` with the grid corner rows supplied by the
    caller (from :func:`geometric_gather_corners`).  Interpolation weights
    are recomputed from ``x`` (differentiable — spatial-gradient vjps over
    this function see only weight arithmetic, never the table), while the
    corner tensor routes table cotangents through the caller's shared
    gather.  Numerically identical to :func:`geometric_apply` (same helpers,
    same op order)."""
    from ndjir_tpu.ops.grid import voxel_interp_corners, voxel_tv_corners

    g = conf.geometric_network
    r = conf.renderer.bounding_sphere_radius
    kind = "cosine" if g.voxel.type.startswith("cosine_") else "linear"
    pe_x = positional_encoding(x, g.pe_bands) if g.pe_bands > 0 else x
    F = params["grid"]["F"]
    vfeat = voxel_interp_corners(x, corners, F.shape,
                                 (-r,) * 3, (r,) * 3, kind)
    sdf, feature, gain = _geometric_mlp(params, pe_x, vfeat, conf)
    if with_tv:
        octa = corners.ndim == x.ndim and corners.shape[-1] == 8 * F.shape[-1]
        return sdf, feature, gain, voxel_tv_corners(corners, x.dtype, tv_sym,
                                                    octa=octa)
    return sdf, feature, gain


# ---------------------------------------------------------------------------
# generic material / light heads
# ---------------------------------------------------------------------------

def _head_inputs(x, feature, normal, use_feature, use_normal, extra=None):
    """Input PARTS for a head net, in the reference's concat order
    (x, extra, feature, normal) — consumed split by :func:`_head_apply`."""
    inputs = [x]
    if extra is not None:
        inputs.append(extra)
    if use_feature:
        inputs.append(feature)
    if use_normal:
        inputs.append(normal)
    return inputs


def _head_apply(params, parts, n_layers, act, compute_dtype=None,
                name_offset=0, last_offset=None):
    """Head MLP with a split (concat-free) first affine; parts may carry
    broadcast-compatible size-1 axes (projected once, broadcast at width)."""
    last_offset = name_offset if last_offset is None else last_offset
    if n_layers == 1:
        return affine_apply_split(params["affine-{:02d}".format(last_offset)],
                                  parts, compute_dtype)
    hid = jnp.float32 if compute_dtype is None else compute_dtype
    h = affine_apply_split(params["affine-{:02d}".format(name_offset)],
                           parts, compute_dtype, out_dtype=hid)
    h = act(h)
    return _mlp_apply(params, h, n_layers, act, compute_dtype,
                      name_offset=name_offset, last_offset=last_offset,
                      start=1)


def init_base_color(key, conf, dtype=jnp.float32) -> Params:
    c = conf.base_color_network
    Din = 3 + (conf.geometric_network.feature_size if c.use_geometric_feature else 0) \
        + (3 if c.use_normal else 0)
    dims = [Din] + [c.feature_size] * (c.layers - 1) + [3]
    return _mlp_init(key, dims, conf.use_wn, dtype)


def base_color_apply(params, x, feature, normal, conf):
    c = conf.base_color_network
    act = get_activation(c.act)
    parts = _head_inputs(x, feature, normal, c.use_geometric_feature,
                         c.use_normal)
    h = _head_apply(params, parts, c.layers, act, _compute_dtype(conf))
    return jax.nn.sigmoid(h)


def init_environment_light(key, conf, dtype=jnp.float32) -> Params:
    c = conf.environment_light_network
    dims = [pe_dim(3, c.pe_bands)] + [c.feature_size] * (c.layers - 1) + [c.channels]
    return _mlp_init(key, dims, conf.use_wn, dtype)


def environment_light_apply(params, light_dirs, conf):
    c = conf.environment_light_network
    act = get_activation(c.act)
    h = positional_encoding(light_dirs, c.pe_bands) if c.pe_bands > 0 else light_dirs
    h = _mlp_apply(params, h, c.layers, act, _compute_dtype(conf))
    out = get_last_activation(c.act_last, c.inverse_black_degree)(h)
    if c.upper_bound > 0:
        out = jnp.clip(out, 0.0, c.upper_bound)
    return out


def init_implicit_illumination(key, conf, dtype=jnp.float32) -> Optional[Params]:
    c = conf.implicit_illumination_network
    if not c.use_me:
        return None
    Din = 3 + (conf.geometric_network.feature_size if c.use_geometric_feature else 0) \
        + (3 if c.use_normal else 0)
    dims = [Din] + [c.feature_size] * (c.layers - 1) + [c.channels]
    return _mlp_init(key, dims, conf.use_wn, dtype)


def implicit_illumination_apply(params, x, feature, normal, conf):
    c = conf.implicit_illumination_network
    if not c.use_me:
        return jnp.zeros((*x.shape[:-1], 1), dtype=x.dtype)
    act = get_activation(c.act)
    parts = _head_inputs(x, feature, normal, c.use_geometric_feature,
                         c.use_normal)
    h = _head_apply(params, parts, c.layers, act, _compute_dtype(conf))
    return get_last_activation(c.act_last, c.inverse_black_degree)(h)


def init_soft_visibility(key, conf, dtype=jnp.float32) -> Params:
    c = conf.soft_visibility_light_network
    Din = 3 + pe_dim(3, c.pe_bands) \
        + (conf.geometric_network.feature_size if c.use_geometric_feature else 0) \
        + (3 if c.use_normal else 0)
    dims = [Din] + [c.feature_size] * (c.layers - 1) + [c.channels]
    return _mlp_init(key, dims, conf.use_wn, dtype)


def soft_visibility_apply(params, x, light_dirs, feature, normal, conf):
    c = conf.soft_visibility_light_network
    act = get_activation(c.act)
    pe_l = positional_encoding(light_dirs, c.pe_bands) if c.pe_bands > 0 else light_dirs
    # x / feature / normal may be per-pixel (..., 1, D) against per-dir
    # (..., M, P) light dirs: the split first affine projects them once and
    # broadcast-adds at hidden width (no (..., M, 256+) concat in HBM)
    parts = _head_inputs(x, feature, normal, c.use_geometric_feature,
                         c.use_normal, extra=pe_l)
    h = _head_apply(params, parts, c.layers, act, _compute_dtype(conf))
    return get_last_activation(c.act_last, c.inverse_black_degree)(h)


def init_photogrammetric(key, conf, dtype=jnp.float32) -> Optional[Params]:
    c = conf.photogrammetric_light_network
    if not c.use_me:
        return None
    Din = 3 + pe_dim(3, c.pe_bands) + conf.geometric_network.feature_size + 3 \
        + (1 if c.use_inverse_distance else 0)
    dims = [Din] + [c.feature_size] * (c.layers - 1) + [c.channels]
    return _mlp_init(key, dims, conf.use_wn, dtype)


def photogrammetric_apply(params, x, camloc, view, feature, normal, lv_gain,
                          conf):
    """Camera-attached ("flash") light visibility.

    x (B, R, N, 3); camloc (B, 1, 3); view (B, R, 1, 3); lv_gain is the
    scheduled scalar (reference: network.py:418-422 + solver.py:110-119 —
    a non-learned parameter pushed per epoch; here a plain argument).
    """
    c = conf.photogrammetric_light_network
    act = get_activation(c.act)
    B, R, N, _ = x.shape
    # view is constant along the N samples of a ray: PE + first-affine
    # projection happen at (B, R, 1, .) and broadcast-add over N
    pe_view = positional_encoding(view, c.pe_bands) if c.pe_bands > 0 else view
    parts = [x, pe_view, feature, normal]
    if c.use_inverse_distance:
        dist2 = jnp.sum((x - camloc.reshape(B, 1, 1, 3)) ** 2, axis=-1,
                        keepdims=True)
        parts.append(1.0 / (dist2 + 1e-5))
    h = _head_apply(params, parts, c.layers, act, _compute_dtype(conf))
    return jax.nn.sigmoid(lv_gain * h)


def init_roughness(key, conf, dtype=jnp.float32) -> Params:
    c = conf.roughness_network
    Din = 3 + (conf.geometric_network.feature_size if c.use_geometric_feature else 0) \
        + (3 if c.use_normal else 0)
    dims = [Din] + [c.feature_size] * (c.layers - 1) + [2]
    # parity quirk: hidden layers are named affine-{l-1} in the reference
    # (network.py:451) but the LAST layer is affine-{L-1} (no offset), so for
    # L=4 the keys are affine--1, affine-00, affine-01, affine-03 — keep the
    # same (gappy) keys so reference checkpoints map 1:1
    return _mlp_init(key, dims, conf.use_wn, dtype, name_offset=-1,
                     last_offset=0)


def roughness_apply(params, x, feature, normal, conf):
    c = conf.roughness_network
    act = get_activation(c.act)
    parts = _head_inputs(x, feature, normal, c.use_geometric_feature,
                         c.use_normal)
    h = _head_apply(params, parts, c.layers, act, _compute_dtype(conf),
                    name_offset=-1, last_offset=0)
    h0, h1 = h[..., 0:1], h[..., 1:2]
    std = softplus(h1)
    r = jax.nn.sigmoid(h0)
    if conf.specular_brdf.model == "filament" and conf.specular_brdf.remap:
        r = r ** 2
    r = jnp.clip(r, c.lower_bound, 1.0)
    return r, std


def init_specular_reflectance(key, conf, dtype=jnp.float32) -> Optional[Params]:
    c = conf.specular_reflectance_network
    if c.fixme:
        return None
    Din = 3 + (conf.geometric_network.feature_size if c.use_geometric_feature else 0) \
        + (3 if c.use_normal else 0)
    dims = [Din] + [c.feature_size] * (c.layers - 1) + [c.channels * 2]
    return _mlp_init(key, dims, conf.use_wn, dtype, name_offset=-1,
                     last_offset=0)


def specular_reflectance_apply(params, x, feature, normal, conf):
    c = conf.specular_reflectance_network
    Do = c.channels
    if c.fixme:
        v = jnp.full((*x.shape[:-1], Do), 0.04, dtype=x.dtype)
        return v, jnp.ones_like(v)
    act = get_activation(c.act)
    parts = _head_inputs(x, feature, normal, c.use_geometric_feature,
                         c.use_normal)
    h = _head_apply(params, parts, c.layers, act, _compute_dtype(conf),
                    name_offset=-1, last_offset=0)
    # parity: reference splits as (h[..., :-Do], h[..., Do:]) which for 2*Do
    # outputs is (first Do, last Do) (network.py:499)
    h0, h1 = h[..., :Do], h[..., Do:]
    std = softplus(h1)
    v = jax.nn.sigmoid(h0)
    if conf.specular_brdf.model == "filament" and conf.specular_brdf.remap:
        v = 0.16 * v ** 2
    else:
        v = c.upper_bound_scale * v
    return v, std


def init_background(key, conf, dtype=jnp.float32) -> Optional[Params]:
    if not conf.background_modeling:
        return None
    c = conf.background_network
    k0, k1 = jax.random.split(key)
    geo_dims = [pe_dim(4, c.pe_bands0)] + [c.feature_size0] * (c.layers0 - 1) \
        + [c.feature_size0 + 1]
    light_in = 4 + c.feature_size0 + 3 + (pe_dim(3, c.pe_bands1) if c.pe_bands1 > 0 else 0)
    light_dims = [light_in] + [c.feature_size1] * (c.layers1 - 1) + [3]
    return {
        "geometric-network": _mlp_init(k0, geo_dims, conf.use_wn, dtype),
        "lighting-network": _mlp_init(k1, light_dims, conf.use_wn, dtype),
    }


def background_apply(params, x, view, delta, conf):
    """NeRF++ background: x (B, R, N, 4) 4D reparam, view (B, R, 1, 3),
    delta (B, R, N, 1) -> (alpha, color) (reference: network.py:512-561)."""
    c = conf.background_network
    act = get_activation(c.act)
    cdt = _compute_dtype(conf)
    B, R, N, _ = x.shape

    h = positional_encoding(x, c.pe_bands0) if c.pe_bands0 > 0 else x
    h = _mlp_apply(params["geometric-network"], h, c.layers0, act, cdt)
    density, feature = softplus(h[..., 0:1], beta=100), h[..., 1:]
    alpha = 1.0 - jnp.exp(-density * delta)

    view = jnp.broadcast_to(view, (B, R, N, 3))
    if c.pe_bands1 > 0:
        pe_view = positional_encoding(view, c.pe_bands1)
        h = jnp.concatenate([x, feature, view, pe_view], axis=-1)
    else:
        h = jnp.concatenate([x, feature, view], axis=-1)
    h = _mlp_apply(params["lighting-network"], h, c.layers1, act, cdt)
    color = jax.nn.sigmoid(h)
    return alpha, color


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

_INITS = {
    "geometric-network": init_geometric,
    "base-color-network": init_base_color,
    "environment-light-network": init_environment_light,
    "implicit-illumination-network": init_implicit_illumination,
    "soft-visibility-light-network": init_soft_visibility,
    "photogrammetric-light-network": init_photogrammetric,
    "roughness-network": init_roughness,
    "specular-reflectance-network": init_specular_reflectance,
    "background-network": init_background,
}


def init_model(key, conf, dtype=jnp.float32) -> Params:
    """Build the complete parameter pytree for a config."""
    params: Params = {}
    keys = jax.random.split(key, len(_INITS))
    for k, (name, fn) in zip(keys, _INITS.items()):
        p = fn(k, conf, dtype)
        if p is not None:
            params[name] = p
    return params


def is_grid_feature_path(path) -> bool:
    """True for grid-feature leaves (the reference's ``*feature/F`` split,
    solver.py:39-43); used by the dual-optimizer partition."""
    names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
    return any(n in ("F", "plane_F", "line_F") for n in names)
