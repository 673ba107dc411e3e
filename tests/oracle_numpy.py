"""Standalone numpy (float64) oracle for sample_points + pb_render + total_loss.

An independent re-implementation of the full differentiated pipeline against
which the JAX path is verified (VERDICT round-1 task 3).  Written directly
from the reference semantics (reference: python/sampler.py:140-299,
renderer.py:32-209, loss.py:27-192, network.py:88-561, specular_brdf.py:40-118,
csrc/sampling/inverse_transform_cuda.cu:30-136) in plain numpy — no JAX, no
shared helper code — so a disagreement pins a real bug on one side.

The SDF spatial gradient is propagated analytically (hand-written
forward-mode tangents through PE, trilinear grid interpolation and the MLP),
NOT by finite differences: the trilinear grid is only piecewise-smooth, and
an FD probe that crosses a cell face would disagree with autodiff for
reasons that are not bugs.

Supports the `none` and `voxel` grid types, the filament importance BRDF,
the AABB t-range, deterministic upsampling and fixed graph seeds (the
reference default configuration family).
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def softplus(x, beta=1.0):
    return np.maximum(x, 0.0) + np.log1p(np.exp(-beta * np.abs(x))) / beta


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def act_fn(name):
    if name == "relu":
        return lambda h: np.maximum(h, 0.0), lambda h, dh: (h > 0) * dh
    if name == "softplus":
        return (lambda h: softplus(h, 100.0),
                lambda h, dh: sigmoid(100.0 * h) * dh)
    raise ValueError(name)


def last_act(name, ibd=1.0):
    if name == "sigmoid":
        return sigmoid
    if name == "relu":
        return lambda h: np.maximum(h, 0.0)
    if name == "softplus":
        return lambda h: softplus(h, ibd)
    raise ValueError(name)


def pe(x, M):
    """concat([x, cos(2^b x), sin(2^b x)]), per-channel band-major."""
    if M <= 0:
        return x
    bands = 2.0 ** np.arange(M)
    xb = (x[..., :, None] * bands).reshape(*x.shape[:-1], x.shape[-1] * M)
    return np.concatenate([x, np.cos(xb), np.sin(xb)], axis=-1)


def pe_jvp(x, dx, M):
    if M <= 0:
        return x, dx
    bands = 2.0 ** np.arange(M)
    xb = (x[..., :, None] * bands).reshape(*x.shape[:-1], x.shape[-1] * M)
    dxb = (dx[..., :, None] * bands).reshape(*x.shape[:-1], x.shape[-1] * M)
    v = np.concatenate([x, np.cos(xb), np.sin(xb)], axis=-1)
    dv = np.concatenate([dx, -np.sin(xb) * dxb, np.cos(xb) * dxb], axis=-1)
    return v, dv


def affine(p, h):
    W = np.asarray(p["W"], np.float64)
    if "g" in p:
        W = np.asarray(p["g"], np.float64) * W \
            / np.maximum(np.linalg.norm(W, axis=0, keepdims=True), 1e-12)
    return h @ W + np.asarray(p["b"], np.float64)


def affine_jvp(p, h, dh):
    W = np.asarray(p["W"], np.float64)
    if "g" in p:
        W = np.asarray(p["g"], np.float64) * W \
            / np.maximum(np.linalg.norm(W, axis=0, keepdims=True), 1e-12)
    return h @ W + np.asarray(p["b"], np.float64), dh @ W


def mlp(params, h, n_layers, act_name, name_offset=0, last_offset=None):
    act, _ = act_fn(act_name)
    last_offset = name_offset if last_offset is None else last_offset
    for l in range(n_layers - 1):
        h = act(affine(params[f"affine-{l + name_offset:02d}"], h))
    return affine(params[f"affine-{n_layers - 1 + last_offset:02d}"], h)


# ---------------------------------------------------------------------------
# trilinear dense-voxel grid query (value + directional tangent)
# ---------------------------------------------------------------------------

def query_voxel(x, F, radius, dx=None, with_tv=False):
    """(..., 3), (G,G,G,D) -> value (..., D) [, tangent][, tv map]."""
    G = F.shape[0]
    D = F.shape[-1]
    g1 = G - 1.0
    scale = g1 / (2.0 * radius)
    xyz = (x + radius) * scale
    dxyz = None if dx is None else dx * scale
    x0 = np.clip(np.floor(xyz), 0.0, g1)
    x1 = np.minimum(x0 + 1.0, g1)
    w0 = x1 - xyz          # d w0 / d xyz = -1
    w1 = 1.0 - w0
    i0 = x0.astype(np.int64)
    i1 = x1.astype(np.int64)

    val = np.zeros((*x.shape[:-1], D))
    dval = np.zeros_like(val) if dx is not None else None
    corners = {}
    for cx in range(2):
        ix = (i0 if cx == 0 else i1)[..., 0]
        wx = (w0 if cx == 0 else w1)[..., 0]
        dwx = (-dxyz[..., 0] if cx == 0 else dxyz[..., 0]) if dx is not None else 0
        for cy in range(2):
            iy = (i0 if cy == 0 else i1)[..., 1]
            wy = (w0 if cy == 0 else w1)[..., 1]
            dwy = (-dxyz[..., 1] if cy == 0 else dxyz[..., 1]) if dx is not None else 0
            for cz in range(2):
                iz = (i0 if cz == 0 else i1)[..., 2]
                wz = (w0 if cz == 0 else w1)[..., 2]
                dwz = (-dxyz[..., 2] if cz == 0 else dxyz[..., 2]) if dx is not None else 0
                f = F[ix, iy, iz]   # (..., D)
                w = (wx * wy * wz)[..., None]
                val += w * f
                if dx is not None:
                    dw = (dwx * wy * wz + wx * dwy * wz + wx * wy * dwz)
                    dval += dw[..., None] * f
                if with_tv and (cx, cy, cz) in ((0, 0, 0), (1, 0, 0),
                                                (0, 1, 0), (0, 0, 1)):
                    corners[(cx, cy, cz)] = f
    out = [val]
    if dx is not None:
        out.append(dval)
    if with_tv:
        f000 = corners[(0, 0, 0)]
        s = ((corners[(1, 0, 0)] - f000) ** 2
             + (corners[(0, 1, 0)] - f000) ** 2
             + (corners[(0, 0, 1)] - f000) ** 2)
        out.append(np.sqrt(s))
    return out[0] if len(out) == 1 else tuple(out)


# ---------------------------------------------------------------------------
# networks
# ---------------------------------------------------------------------------

def geometric(params, x, conf, dx=None, with_tv=False):
    """-> sdf (..., 1), feature (..., D), gain (1,) [, dsdf] [, tv]."""
    g = conf.geometric_network
    p = params["geometric-network"]
    L, M = g.layers, g.pe_bands
    skips = tuple(g.skip_layers)
    act, dact = act_fn(g.act)
    radius = conf.renderer.bounding_sphere_radius
    jvp = dx is not None

    tv = None
    if jvp:
        pe_x, dpe_x = pe_jvp(x, dx, M)
    else:
        pe_x = pe(x, M)
    if "grid" in p:
        F = np.asarray(p["grid"]["F"], np.float64)
        if jvp:
            out = query_voxel(x, F, radius, dx=dx, with_tv=with_tv)
            vfeat, dvfeat = out[0], out[1]
            tv = out[2] if with_tv else None
        else:
            out = query_voxel(x, F, radius, with_tv=with_tv)
            vfeat = out[0] if with_tv else out
            tv = out[1] if with_tv else None
        inputs = np.concatenate([pe_x, vfeat], axis=-1)
        dinputs = np.concatenate([dpe_x, dvfeat], axis=-1) if jvp else None
    else:
        inputs = pe_x
        dinputs = dpe_x if jvp else None
        if with_tv:
            tv = np.zeros((*x.shape[:-1], 1))

    h, dh = inputs, dinputs
    assert g.geometric_init, "oracle covers the geometric-init branch"
    for l in range(L):
        name = "affine-last" if l == L - 1 else f"affine-{l:02d}"
        if jvp:
            h, dh = affine_jvp(p[name], h, dh)
        else:
            h = affine(p[name], h)
        if l < L - 1:
            if jvp:
                dh = dact(h, dh)
            h = act(h)
            if (l + 1) in skips and l != 0 and l not in skips:
                h = np.concatenate([h, inputs], axis=-1)
                if jvp:
                    dh = np.concatenate([dh, dinputs], axis=-1)
                if g.use_inv_square:
                    h = h / np.sqrt(2)
                    if jvp:
                        dh = dh / np.sqrt(2)
    sdf, feature = h[..., 0:1], h[..., 1:]
    gain = np.clip(np.exp(np.asarray(p["gain"], np.float64) * 10.0),
                   1e-6, 5e4)
    out = [sdf, feature, gain]
    if jvp:
        out.append(dh[..., 0:1])
    if with_tv:
        out.append(tv)
    return tuple(out)


def sdf_grad(params, x, conf):
    """d sdf / d x via three forward-mode passes (analytic, not FD)."""
    grads = []
    for ax in range(3):
        dx = np.zeros_like(x)
        dx[..., ax] = 1.0
        grads.append(geometric(params, x, conf, dx=dx)[3][..., 0])
    return np.stack(grads, axis=-1)


def head_inputs(x, feature, normal, use_feature, use_normal, extra=None):
    parts = [x]
    if extra is not None:
        parts.append(extra)
    if use_feature:
        parts.append(feature)
    if use_normal:
        parts.append(normal)
    return np.concatenate(parts, axis=-1) if len(parts) > 1 else x


def base_color(params, x, feature, normal, conf):
    c = conf.base_color_network
    h = head_inputs(x, feature, normal, c.use_geometric_feature, c.use_normal)
    return sigmoid(mlp(params["base-color-network"], h, c.layers, c.act))


def env_light(params, dirs, conf):
    c = conf.environment_light_network
    h = pe(dirs, c.pe_bands) if c.pe_bands > 0 else dirs
    out = last_act(c.act_last, c.inverse_black_degree)(
        mlp(params["environment-light-network"], h, c.layers, c.act))
    if c.upper_bound > 0:
        out = np.clip(out, 0.0, c.upper_bound)
    return out


def implicit_illum(params, x, feature, normal, conf):
    c = conf.implicit_illumination_network
    if not c.use_me:
        return np.zeros((*x.shape[:-1], 1))
    h = head_inputs(x, feature, normal, c.use_geometric_feature, c.use_normal)
    return last_act(c.act_last, c.inverse_black_degree)(
        mlp(params["implicit-illumination-network"], h, c.layers, c.act))


def soft_vis(params, x, dirs, feature, normal, conf):
    c = conf.soft_visibility_light_network
    pe_l = pe(dirs, c.pe_bands) if c.pe_bands > 0 else dirs
    h = head_inputs(x, feature, normal, c.use_geometric_feature, c.use_normal,
                    extra=pe_l)
    return last_act(c.act_last, c.inverse_black_degree)(
        mlp(params["soft-visibility-light-network"], h, c.layers, c.act))


def photogrammetric(params, x, camloc, view, feature, normal, lv_gain, conf):
    c = conf.photogrammetric_light_network
    B, R, N, _ = x.shape
    view = np.broadcast_to(view, (B, R, N, 3))
    pe_v = pe(view, c.pe_bands) if c.pe_bands > 0 else view
    parts = [x, pe_v, feature, normal]
    if c.use_inverse_distance:
        d2 = np.sum((x - camloc.reshape(B, 1, 1, 3)) ** 2, -1, keepdims=True)
        parts.append(1.0 / (d2 + 1e-5))
    h = np.concatenate(parts, axis=-1)
    return sigmoid(lv_gain * mlp(params["photogrammetric-light-network"], h,
                                 c.layers, c.act))


def roughness_net(params, x, feature, normal, conf):
    c = conf.roughness_network
    h = head_inputs(x, feature, normal, c.use_geometric_feature, c.use_normal)
    h = mlp(params["roughness-network"], h, c.layers, c.act,
            name_offset=-1, last_offset=0)
    r = sigmoid(h[..., 0:1])
    if conf.specular_brdf.model == "filament" and conf.specular_brdf.remap:
        r = r ** 2
    return np.clip(r, c.lower_bound, 1.0), softplus(h[..., 1:2])


def specular_net(params, x, feature, normal, conf):
    c = conf.specular_reflectance_network
    Do = c.channels
    if c.fixme:
        v = np.full((*x.shape[:-1], Do), 0.04)
        return v, np.ones_like(v)
    h = head_inputs(x, feature, normal, c.use_geometric_feature, c.use_normal)
    h = mlp(params["specular-reflectance-network"], h, c.layers, c.act,
            name_offset=-1, last_offset=0)
    v = sigmoid(h[..., :Do])
    if conf.specular_brdf.model == "filament" and conf.specular_brdf.remap:
        v = 0.16 * v ** 2
    else:
        v = c.upper_bound_scale * v
    return v, softplus(h[..., Do:])


def background(params, x, view, delta, conf):
    c = conf.background_network
    p = params["background-network"]
    B, R, N, _ = x.shape
    h = pe(x, c.pe_bands0) if c.pe_bands0 > 0 else x
    h = mlp(p["geometric-network"], h, c.layers0, c.act)
    density, feature = softplus(h[..., 0:1], 100.0), h[..., 1:]
    alpha = 1.0 - np.exp(-density * delta)
    view = np.broadcast_to(view, (B, R, N, 3))
    if c.pe_bands1 > 0:
        h = np.concatenate([x, feature, view, pe(view, c.pe_bands1)], axis=-1)
    else:
        h = np.concatenate([x, feature, view], axis=-1)
    color = sigmoid(mlp(p["lighting-network"], h, c.layers1, c.act))
    return alpha, color


# ---------------------------------------------------------------------------
# direction sampling + BRDF
# ---------------------------------------------------------------------------

def _tangent_frame(n):
    def norm(v):
        return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    z = norm(n)
    xa = np.stack([-n[..., 1], n[..., 0], np.zeros_like(n[..., 0])], -1)
    degenerate = np.linalg.norm(xa, axis=-1, keepdims=True) < 1e-9
    xa = np.where(degenerate, np.array([1.0, 0.0, 0.0]), xa)
    x = norm(xa)
    y = np.cross(z, x)
    return x, y, z


def _orient(local, n):
    xa, ya, za = _tangent_frame(n)
    return (local[..., 0:1] * xa[..., None, :]
            + local[..., 1:2] * ya[..., None, :]
            + local[..., 2:3] * za[..., None, :])


def _outer(cdf_the, cdf_phi):
    n_the, n_phi = cdf_the.shape[-1], cdf_phi.shape[-1]
    the = np.repeat(cdf_the, n_phi, axis=-1)
    phi = np.tile(cdf_phi, (1,) * (cdf_phi.ndim - 1) + (n_the,))
    return the, phi


def uniform_dirs(n, cdf_the, cdf_phi):
    the, phi_u = _outer(cdf_the, cdf_phi)
    phi = 2 * np.pi * phi_u
    ct = the
    st = np.sqrt(np.maximum(1 - ct * ct, 0))
    local = np.stack([st * np.cos(phi), st * np.sin(phi), ct], -1)
    return _orient(local, n)


def importance_dirs(n, cdf_the, cdf_phi, alpha):
    the, phi_u = _outer(cdf_the, cdf_phi)
    phi = 2 * np.pi * phi_u
    a2 = alpha * alpha
    ct = np.sqrt(np.clip((1 - the) / ((a2 - 1) * the + 1), 0, 1))
    st = np.sqrt(np.maximum(1 - ct * ct, 0))
    local = np.stack([st * np.cos(phi), st * np.sin(phi), ct], -1)
    return _orient(local, n)


def mdot(u, v, eps):
    uv = np.sum(u * v, -1, keepdims=True)
    return np.maximum(uv, eps), (uv > eps).astype(np.float64)


def filament_brdf(normal, view, light, roughness, f0, conf):
    M = light.shape[2]
    C = conf.specular_reflectance_network.channels
    B, R = normal.shape[:2]
    n = np.broadcast_to(normal[..., None, :], (B, R, M, 3))
    v = np.broadcast_to(view.reshape(B, R, 1, 3), (B, R, M, 3))
    a2 = np.broadcast_to(roughness[..., None, :], (B, R, M, 1)) ** 2
    f0 = np.broadcast_to(f0[..., None, :], (B, R, M, C))
    h = light + v
    h = h / np.linalg.norm(h, axis=-1, keepdims=True)
    ed = conf.renderer.eps_dot
    nol, m_nol = mdot(n, light, ed)
    nov, m_nov = mdot(n, v, ed)
    _, m_noh = mdot(n, h, ed)
    voh, _ = mdot(v, h, ed)
    noh_u, _ = mdot(n, h, ed)

    def V1(nou):
        return 1.0 / (nou + np.sqrt(a2 + (1 - a2) * nou ** 2) + 1e-6)

    F = f0 + (1 - f0) * (1 - voh) ** 5
    assert conf.specular_brdf.sampling == "importance"
    sBRDF = V1(nol) * V1(nov) * F * (4.0 * voh / noh_u)
    return sBRDF * (m_nol * m_nov * m_noh), nol


# ---------------------------------------------------------------------------
# sampler
# ---------------------------------------------------------------------------

def ray_aabb(camloc, raydir, radius):
    """Six-face candidate test with plane snapping
    (reference: ray_aabb_intersection_cuda.cu:39-142)."""
    B, R, _ = raydir.shape
    bmin, bmax = -radius, radius
    c = camloc[:, None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        t_list = np.concatenate([(bmax - c) / raydir, (bmin - c) / raydir], -1)
    x = c[..., None, :] + t_list[..., :, None] * raydir[..., None, :]
    for f in range(6):
        x[..., f, f % 3] = bmax if f < 3 else bmin
    inside = ((x >= bmin) & (x <= bmax)).all(-1)
    cond = inside & (t_list >= 0) & np.isfinite(t_list)
    n_hits = cond.sum(-1, keepdims=True).astype(np.float64)
    first = np.argmax(cond, -1)
    last = 5 - np.argmax(cond[..., ::-1], -1)
    ta = np.take_along_axis(t_list, first[..., None], -1)
    tb = np.take_along_axis(t_list, last[..., None], -1)
    t_near = np.where(n_hits >= 2, np.minimum(ta, tb), 0.0)
    t_far = np.where(n_hits >= 2, np.maximum(ta, tb),
                     np.where(n_hits == 1, ta, 0.0))
    return t_near, t_far, n_hits


def _excl_cumprod(a, axis):
    cp = np.cumprod(a, axis=axis)
    sl = [slice(None)] * a.ndim
    sl[axis] = slice(0, a.shape[axis] - 1)
    ones_sl = [slice(None)] * a.ndim
    ones_sl[axis] = slice(0, 1)
    return np.concatenate([np.ones_like(a[tuple(ones_sl)]), cp[tuple(sl)]],
                          axis=axis)


def sample_points(params, camloc, raydir, stratified_u, background_u, conf):
    r = conf.renderer
    B, R, _ = raydir.shape
    radius = r.bounding_sphere_radius
    assert r.t_near_far_method == "intersect_with_aabb"
    t_near, t_far, n_hits = ray_aabb(camloc, raydir, radius)
    mask = (n_hits > 1.0).astype(np.float64)

    N0 = r.n_samples0
    tn = t_near.reshape(B, R, 1, 1)
    tf = t_far.reshape(B, R, 1, 1)
    step = (tf - tn) / N0
    t = tn + step * (np.arange(N0).reshape(1, 1, N0, 1) + stratified_u)

    # hierarchical upsampling, re-evaluating the SDF at every position each
    # round (the reference scheme, sampler.py:167-242)
    assert r.deterministic
    M = r.n_samples1
    for u in range(r.n_upsamples):
        gain = r.sampling_sigmoid_gain * 2 ** u
        x = camloc.reshape(B, 1, 1, 3) + t * raydir.reshape(B, R, 1, 3)
        sdf = geometric(params, x, conf)[0]
        Nt = t.shape[2]
        sdf0, sdf1 = sdf[:, :, :-1], sdf[:, :, 1:]
        t0, t1 = t[:, :, :-1], t[:, :, 1:]
        sdfm = 0.5 * (sdf0 + sdf1)
        cos1 = (sdf1 - sdf0) / (t1 - t0 + 1e-5)
        cos0 = np.concatenate([np.ones((B, R, 1, 1)), cos1[:, :, :-1]], 2)
        cos = np.clip(np.minimum(cos0, cos1), -1e3, 0.0)
        dist = t1 - t0
        s0 = sdfm - cos * dist * 0.5
        s1 = sdfm + cos * dist * 0.5
        cdf0 = sigmoid(s0 * gain)
        cdf1 = sigmoid(s1 * gain)
        alpha = np.clip((cdf0 - cdf1 + 1e-5) / (cdf0 + 1e-5), 0, 1)
        w = (alpha * _excl_cumprod(1 - alpha, 2))[..., 0]
        w = w / w.sum(2, keepdims=True)
        cumsum = np.cumsum(w, 2)
        uu = np.arange(M) / (M - 1 + 1.0 / M)
        idx = np.empty((B, R, M), np.int64)
        for b in range(B):
            for rr in range(R):
                idx[b, rr] = np.searchsorted(cumsum[b, rr], uu, side="left")
        idx = np.minimum(idx, Nt - 2)
        cumsum0 = np.concatenate([np.zeros((B, R, 1)), cumsum], 2)
        denorm = np.take_along_axis(w, idx, 2)
        lower = np.take_along_axis(cumsum0, idx, 2)
        ratio = ((uu - lower) / denorm)[..., None]
        steps = t[:, :, 1:] - t[:, :, :-1]
        t_new = (np.take_along_axis(t, idx[..., None], 2)
                 + np.take_along_axis(steps, idx[..., None], 2) * ratio)
        t_new = np.clip(t_new, tn, tf)
        t = np.sort(np.concatenate([t, t_new], 2), axis=2)

    x_fg = camloc.reshape(B, 1, 1, 3) + t * raydir.reshape(B, R, 1, 3)
    t_fg = np.concatenate([t, tf], axis=2)

    assert conf.background_modeling
    d = np.linalg.norm(camloc, axis=-1, keepdims=True)[:, None, :]
    t_near_bg = np.broadcast_to(d - radius, (B, R, 1))
    t_base = t_far * mask + t_near_bg * (1 - mask)
    t_bg = np.sort(t_base.reshape(B, R, 1, 1) / background_u, axis=2)
    x3 = camloc.reshape(B, 1, 1, 3) \
        + t_bg[:, :, :-1] * raydir.reshape(B, R, 1, 3)
    dist = np.linalg.norm(x3, axis=3, keepdims=True) + 1e-6
    x_bg = np.concatenate([x3 / dist, 1.0 / dist], axis=-1)
    return x_fg, t_fg, x_bg, t_bg, mask.reshape(B, R, 1, 1)


# ---------------------------------------------------------------------------
# renderer + loss
# ---------------------------------------------------------------------------

def pb_render(params, x_fg, t_fg, x_bg, t_bg, camloc, raydir, mask,
              cos_anneal, lv_gain, cdfs, conf, frozen_dirs=None):
    """``frozen_dirs`` = (uniform_dirs, importance_dirs) pins the sampled
    light directions: the JAX/reference path stop-gradients direction
    sampling (reference: non-differentiable SampleDirections PythonFunction),
    so FD gradient probes must not let directions move with the perturbed
    normal/roughness."""
    B, R, N, _ = x_fg.shape
    rc = conf.renderer
    raydir_r = raydir.reshape(B, R, 1, 3)
    view_dir = -raydir_r

    want_tv = (conf.geometric_network.voxel.type != "none"
               and conf.train.tv_weight > 0.0)
    out = geometric(params, x_fg, conf, with_tv=want_tv)
    sdf, feature, gain = out[0], out[1], out[2]
    tv_map = out[3] if want_tv else None
    grad = sdf_grad(params, x_fg, conf)

    true_cos = np.sum(raydir_r * grad, -1, keepdims=True)
    iter_cos = -(np.maximum(-true_cos * 0.5 + 0.5, 0) * (1 - cos_anneal)
                 + np.maximum(-true_cos, 0) * cos_anneal)
    dt = t_fg[:, :, 1:] - t_fg[:, :, :-1]
    g = gain.reshape((1,) * sdf.ndim)
    cdf0 = sigmoid(g * (sdf - iter_cos * dt * 0.5))
    cdf1 = sigmoid(g * (sdf + iter_cos * dt * 0.5))
    alpha_fg = np.clip((cdf0 - cdf1 + 1e-5) / (cdf0 + 1e-5), 0, 1)

    delta_bg = t_bg[:, :, 1:] - t_bg[:, :, :-1]
    alpha_bg, color_bg = background(params, x_bg, view_dir, delta_bg, conf)

    alpha = np.concatenate([alpha_fg * mask, alpha_bg], 2)
    trans = _excl_cumprod(1 - alpha, 2)
    weights = alpha * trans
    w_fg, w_bg = weights[:, :, :N], weights[:, :, N:]

    def VR(v, w=w_fg):
        return np.sum(w * v, axis=2)

    grad_pixel = VR(grad) + rc.eps_normal
    normal_pixel = grad_pixel / np.linalg.norm(grad_pixel, axis=-1,
                                               keepdims=True)

    n_the = rc.n_thetas
    Mdir = n_the * 2 * n_the
    D = feature.shape[-1]
    x_pix = np.broadcast_to(VR(x_fg).reshape(B, R, 1, 3), (B, R, Mdir, 3))
    f_pix = np.broadcast_to(VR(feature).reshape(B, R, 1, D), (B, R, Mdir, D))
    n_pix = np.broadcast_to(normal_pixel[:, :, None, :], (B, R, Mdir, 3))

    u_dirs = (frozen_dirs[0] if frozen_dirs is not None
              else uniform_dirs(normal_pixel, cdfs["diffuse_the"],
                                cdfs["diffuse_phi"]))
    env = env_light(params, u_dirs, conf)
    sv = soft_vis(params, x_pix, u_dirs, f_pix, n_pix, conf)
    implicit = implicit_illum(params, x_fg, feature, grad, conf)
    implicit_pixel = VR(implicit)
    cos, _ = mdot(n_pix, u_dirs, rc.eps_dot)
    diffuse_light_pixel = np.mean(sv * env * cos, axis=2) + implicit_pixel
    bc = base_color(params, x_fg, feature, grad, conf)

    rough, std_rough = roughness_net(params, x_fg, feature, grad, conf)
    rough_pixel = VR(rough)
    spec, std_spec = specular_net(params, x_fg, feature, grad, conf)
    spec_pixel = VR(spec)

    s_dirs = (frozen_dirs[1] if frozen_dirs is not None
              else importance_dirs(normal_pixel, cdfs["specular_the"],
                                   cdfs["specular_phi"], rough_pixel))
    sBRDF, cos_s = filament_brdf(normal_pixel, view_dir, s_dirs, rough_pixel,
                                 spec_pixel, conf)
    env_s = env_light(params, s_dirs, conf)
    sv_s = soft_vis(params, x_pix, s_dirs, f_pix, n_pix, conf)
    assert not conf.specular_brdf.use_split_sum
    spec_color_pixel = np.mean(sBRDF * sv_s * env_s * cos_s, axis=2)
    ii = conf.implicit_illumination_network
    if ii.use_me and ii.use_me_on_specular:
        spec_color_pixel = spec_color_pixel + np.mean(
            sBRDF * implicit_pixel[:, :, :, None], axis=2)
    spec_color_pixel = conf.specular_brdf.weight * spec_color_pixel

    assert conf.photogrammetric_light_network.use_me
    photo = photogrammetric(params, x_fg, camloc, view_dir, feature, grad,
                            lv_gain, conf)
    photo_pixel = VR(photo)
    if conf.diffuse_brdf.entangle:
        color_fg = VR(bc * photo) * diffuse_light_pixel \
            + photo_pixel * spec_color_pixel
    else:
        color_fg = photo_pixel * (VR(bc) * diffuse_light_pixel
                                  + spec_color_pixel)
    color_pixel = color_fg + VR(color_bg, w_bg)

    G = conf.geometric_network.voxel.grid_size
    x_ptb = x_fg + cdfs["perturb"] * (np.sqrt(3) * 2
                                      * rc.bounding_sphere_radius / G)
    feat_ptb = geometric(params, x_ptb, conf)[1]
    bc_ptb = base_color(params, x_ptb, feat_ptb, None, conf)

    obj_mask_pred = (np.sum(alpha_fg * trans[:, :, :N], axis=2)
                     if conf.train.mask_weight > 0
                     else np.zeros((B, R, 1)))
    return dict(color_pixel=color_pixel, sdf_x_fg=sdf, grad_x_fg=grad,
                base_color=bc, base_color_ptb=bc_ptb, roughness=rough,
                specular_reflectance=spec, std_roughness=std_rough,
                std_specular_reflectance=std_spec, gain=gain,
                tv_map=tv_map, normal_pixel=normal_pixel,
                obj_mask_pred=obj_mask_pred, u_dirs=u_dirs, s_dirs=s_dirs)


def total_loss(params, camloc, raydir, color_gt, obj_mask, cos_anneal,
               lv_gain, conf, cdfs, samples=None, frozen_dirs=None):
    """``samples`` pins (x_fg, t_fg, x_bg, t_bg, mask) and ``frozen_dirs``
    the sampled light directions: both are stop-gradient data generation in
    the reference and the JAX path, so gradient checks must differentiate
    the loss with them FIXED."""
    B, R, _ = color_gt.shape
    tr = conf.train
    if samples is None:
        samples = sample_points(
            params, camloc, raydir, cdfs["stratified"], cdfs["background"],
            conf)
    x_fg, t_fg, x_bg, t_bg, mask = samples
    res = pb_render(params, x_fg, t_fg, x_bg, t_bg, camloc, raydir, mask,
                    cos_anneal, lv_gain, cdfs, conf, frozen_dirs=frozen_dirs)
    N = x_fg.shape[2]

    err = (np.abs(res["color_pixel"] - color_gt) if tr.rgb_loss == "l1"
           else (res["color_pixel"] - color_gt) ** 2)
    if tr.mask_weight > 0:
        loss_rgb = np.sum(err * obj_mask) / (np.sum(obj_mask) + 1e-5)
    else:
        loss_rgb = np.sum(err) / (B * R)

    denorm = np.sum(mask) * N + 1e-5
    gn = np.linalg.norm(res["grad_x_fg"], axis=-1, keepdims=True)
    loss_eik = np.sum(((gn - 1.0) * mask) ** 2) / denorm \
        if tr.eikonal_weight > 0 else 0.0
    loss_tv = (np.sum(res["tv_map"] * mask) / denorm
               if res["tv_map"] is not None and tr.tv_weight > 0 else 0.0)
    if tr.mask_weight > 0:
        p = np.clip(res["obj_mask_pred"], 1e-3, 1 - 1e-3)
        bce = -(obj_mask * np.log(p) + (1 - obj_mask) * np.log(1 - p))
        loss_mask = np.sum(bce) / (np.sum(mask) + 1e-5)
    else:
        loss_mask = 0.0

    prior_bc = (np.sum(np.abs(res["base_color"] - res["base_color_ptb"])
                       * mask) / denorm
                if tr.base_color_prior_weight > 0 else 0.0)
    if tr.roughness_prior_weight > 0:
        pv = conf.roughness_network.prior_value
        prior_r = np.sum(np.abs(res["roughness"] - pv)
                         / res["std_roughness"] * mask) / denorm
        reg_r = np.sum(np.clip(np.log(res["std_roughness"]), 1e-5, 1e5)
                       * mask) / denorm
    else:
        prior_r = reg_r = 0.0
    if tr.specular_reflectance_prior_weight > 0:
        pv = conf.specular_reflectance_network.prior_value
        prior_s = np.sum(np.abs(res["specular_reflectance"] - pv)
                         / res["std_specular_reflectance"] * mask) / denorm
        reg_s = np.sum(np.clip(np.log(res["std_specular_reflectance"]),
                               1e-5, 1e5) * mask) / denorm
    else:
        prior_s = reg_s = 0.0

    loss = (loss_rgb + tr.eikonal_weight * loss_eik + tr.tv_weight * loss_tv
            + tr.mask_weight * loss_mask
            + tr.base_color_prior_weight * prior_bc
            + tr.roughness_prior_weight * (prior_r + reg_r)
            + tr.specular_reflectance_prior_weight * (prior_s + reg_s))
    return loss, dict(loss=loss, loss_rgb=loss_rgb, loss_eikonal=loss_eik,
                      loss_tv=loss_tv, loss_mask=loss_mask,
                      prior_base_color=prior_bc, prior_roughness=prior_r,
                      prior_specular_reflectance=prior_s,
                      reg_std_roughness=reg_r,
                      reg_std_specular_reflectance=reg_s)
