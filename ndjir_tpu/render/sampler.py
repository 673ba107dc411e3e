"""Ray point sampling: stratified + NeuS hierarchical importance + background.

The reference implements this as a *non-differentiable PythonFunction escape
hatch* that re-enters the graph builder per iteration (reference:
python/sampler.py:24-314).  Here the whole sampler is ordinary jit-traceable
JAX inside the training step: static shapes (N0 -> N0 + M*U fg samples), an
unrolled U-round upsampling loop, and jax.lax.stop_gradient in place of the
reference's "no backward" (proposal SDF evals are data generation).

Shapes (B rays-batch, R rays, N0 stratified, M per upsample, U rounds, Nb bg):
  x_fg (B, R, N0+M*U, 3); t_fg (B, R, N0+M*U+1, 1);
  x_bg (B, R, Nb, 4);     t_bg (B, R, Nb+1, 1);   hit mask (B, R, 1, 1).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ndjir_tpu.models.fields import geometric_apply
from ndjir_tpu.ops.intersect import ray_aabb_intersection, ray_sphere_intersection


def _exclusive_cumprod(x: jax.Array, axis: int) -> jax.Array:
    """cumprod with exclusive=True semantics (first element = 1).

    The input is materialized behind an optimization barrier: XLA otherwise
    fuses the producer chain (the whole NeuS alpha computation) into every
    shifted-multiply pass of the cumulative-product decomposition,
    recomputing it ~log2(N) times — measured 38.7 -> 3.2 ms for one
    proposal-round weight chain at the default workload.  The barrier is the
    identity (twice-differentiable), so numerics are unchanged."""
    cp = jnp.cumprod(jax.lax.optimization_barrier(x), axis=axis)
    one = jnp.ones_like(jax.lax.slice_in_dim(cp, 0, 1, axis=axis))
    return jnp.concatenate(
        [one, jax.lax.slice_in_dim(cp, 0, x.shape[axis] - 1, axis=axis)],
        axis=axis)


def t_near_far(camloc: jax.Array, raydir: jax.Array, conf):
    """Dispatch over the four t-range methods (reference: sampler.py:71-138).

    Returns t_near/t_far (B, R, 1) and hit mask (B, R, 1).
    """
    method = conf.renderer.t_near_far_method
    radius = conf.renderer.bounding_sphere_radius
    B, R, _ = raydir.shape
    if method == "intersect_with_r_sphere":
        t_near, t_far, n_hits = ray_sphere_intersection(camloc, raydir, radius)
        mask = (n_hits > 1.0).astype(camloc.dtype)
    elif method == "intersect_with_aabb":
        t_near, t_far, n_hits = ray_aabb_intersection(
            camloc, raydir, [-radius] * 3, [radius] * 3)
        mask = (n_hits > 1.0).astype(camloc.dtype)
    elif method == "intersect_with_midpoint":
        # midpoint of the chord through the sphere center projection
        cv = jnp.sum(camloc[:, None, :] * raydir, axis=-1, keepdims=True)
        midpoint = -cv  # raydir is unit
        t_near = jnp.maximum(midpoint - radius, 0.0)
        t_far = midpoint + radius
        mask = jnp.ones((B, R, 1), camloc.dtype)
    elif method == "intersect_with_camloc_dists":
        t_near, t_far = _camloc_dists_range(camloc, raydir, radius)
        mask = jnp.ones((B, R, 1), camloc.dtype)
    else:
        raise ValueError(f"Unsupported t_near_far method: {method}")
    return t_near, t_far, mask


def _camloc_dists_range(camloc, raydir, radius):
    B, R, _ = raydir.shape
    d = jnp.linalg.norm(camloc, axis=-1, keepdims=True)[:, None, :]
    t_near = jnp.broadcast_to(d - radius, (B, R, 1))
    t_far = jnp.broadcast_to(d + radius, (B, R, 1))
    return t_near, t_far


def sample_stratified(t_near, t_far, stratified_u, n_samples0):
    """t_i = t_near + step * (i + u_i), step = (t_far - t_near) / N
    (reference: sampler.py:140-165)."""
    B, R, _ = t_far.shape
    N = n_samples0
    tn = t_near.reshape(B, R, 1, 1)
    tf = t_far.reshape(B, R, 1, 1)
    step = (tf - tn) / N
    i = jnp.arange(N, dtype=t_near.dtype).reshape(1, 1, N, 1)
    return tn + step * (i + stratified_u)


def _proposal_sdf(params, conf, camloc, raydir, t):
    """Stop-gradient SDF at sample positions t (proposal data generation)."""
    B, R = t.shape[:2]
    x = camloc.reshape(B, 1, 1, 3) + t * raydir.reshape(B, R, 1, 3)
    sdf, _, _ = geometric_apply(params["geometric-network"], x, conf)
    return jax.lax.stop_gradient(sdf)


def _propose_t(conf, t, sdf, t_near, t_far, gain, u):
    """One NeuS hierarchical proposal round (reference: sampler.py:189-241).

    Takes t (B, R, Nt, 1) sorted and the SDF values at those positions and
    returns the M new sample positions (B, R, M, 1).  The SDF evaluations are
    hoisted out (see sample_importance): positions surviving from earlier
    rounds keep their cached SDF, so each round only costs M fresh network
    evaluations instead of Nt — identical values, 3x fewer proposal evals at
    the default 64 + 4x16 schedule.
    """
    B, R, Nt, _ = t.shape
    M = conf.renderer.n_samples1

    # robust section slope: clamped min of this and previous section's cos
    sdf0, sdf1 = sdf[:, :, :-1, :], sdf[:, :, 1:, :]
    t0, t1 = t[:, :, :-1, :], t[:, :, 1:, :]
    sdfm = 0.5 * (sdf0 + sdf1)
    cos_val1 = (sdf1 - sdf0) / (t1 - t0 + 1e-5)
    cos_val0 = jnp.concatenate(
        [jnp.ones((B, R, 1, 1), t.dtype), cos_val1[:, :, :-1, :]], axis=2)
    cos_val = jnp.minimum(cos_val0, cos_val1)
    cos_val = jnp.clip(cos_val, -1e3, 0.0)

    dist = t1 - t0
    s0 = sdfm - cos_val * dist * 0.5
    s1 = sdfm + cos_val * dist * 0.5

    cdf0 = jax.nn.sigmoid(s0 * gain)
    cdf1 = jax.nn.sigmoid(s1 * gain)
    alpha = jnp.clip((cdf0 - cdf1 + 1e-5) / (cdf0 + 1e-5), 0.0, 1.0)
    weights = (alpha * _exclusive_cumprod(1.0 - alpha, axis=2))[..., 0]  # (B,R,Nt-1)

    # inverse-transform sampling over normalized section weights
    weights = weights / jnp.sum(weights, axis=2, keepdims=True)
    cumsum = jnp.cumsum(weights, axis=2)
    if conf.renderer.deterministic:
        uu = jnp.arange(M, dtype=t.dtype) / (M - 1 + 1.0 / M)  # in [0, 1)
        uu = jnp.broadcast_to(uu.reshape(1, 1, M), (B, R, M))
    else:
        if u is None:
            raise ValueError(
                "renderer.deterministic=false needs per-round uniforms; "
                "pass cdfs['upsample'] as rand_u (see make_mc_cdfs)")
        uu = u  # caller-provided uniforms (B, R, M)
    # searchsorted(side='left') == #{cumsum[i] < u}, computed as one
    # broadcasted comparison-count: vmap(vmap(searchsorted))'s batched
    # binary-search while_loop serializes on TPU (measured 72 ms/round at
    # the default workload vs <1 ms for the count — O(Nt*M) compares are
    # nothing on the VPU at these shapes)
    idx = jnp.sum((cumsum[:, :, :, None] < uu[:, :, None, :])
                  .astype(jnp.int32), axis=2)            # (B, R, M)
    idx = jnp.minimum(idx, Nt - 2)
    # all four per-section lookups ride ONE one-hot mask contraction
    # (take_along_axis costs ~1.3 ms each at these shapes; the fused masked
    # sums are one cheap (B,R,Nt,M) elementwise+reduce pass).  cumsum0[idx]
    # == shifted-cumsum lookup with idx==0 -> 0.
    sec = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Nt - 1, 1), 2)
    onehot = (idx[:, :, None, :] == sec).astype(t.dtype)  # (B, R, Nt-1, M)

    def take(v):  # v: (B, R, Nt-1)
        return jnp.sum(v[:, :, :, None] * onehot, axis=2)  # (B, R, M)

    denorm = take(weights)
    lower = take(jnp.concatenate(
        [jnp.zeros((B, R, 1), t.dtype), cumsum[:, :, :-1]], axis=2))
    ratio = ((uu - lower) / denorm).reshape(B, R, M, 1)

    # (Nt-1 section widths; the reference appends a [t_last, t_far] tail row,
    # sampler.py:231-232, but its own u<1 guard keeps idx <= Nt-2, so the
    # tail is unreachable — here idx is clipped explicitly instead)
    steps_idx = take(t[:, :, 1:, 0] - t[:, :, :-1, 0]).reshape(B, R, M, 1)
    ts_idx = take(t[:, :, :-1, 0]).reshape(B, R, M, 1)

    t_new = ts_idx + steps_idx * ratio
    return jnp.clip(t_new, t_near.reshape(B, R, 1, 1),
                    t_far.reshape(B, R, 1, 1))


def _merge_sorted(t, sdf, t_new, sdf_new):
    """Merge (t, sdf) with the new samples, kept sorted by t.

    Multi-operand lax.sort carries the cached SDF values alongside the
    positions (~3x cheaper than argsort + gather on TPU)."""
    tc = jnp.concatenate([t, t_new], axis=2)[..., 0]
    sc = jnp.concatenate([sdf, sdf_new], axis=2)[..., 0]
    ts, ss = jax.lax.sort((tc, sc), dimension=2, num_keys=1)
    return ts[..., None], ss[..., None]


def sample_importance(params, conf, camloc, raydir, t_near, t_far, t,
                      rand_u=None, sdf_fn=None):
    """U rounds of hierarchical upsampling with gain 64 * 2^u
    (reference: sampler.py:167-242).  Entirely inside jit; shapes static.

    SDF values are evaluated once per position and carried through the
    merge-sorts (multi-operand lax.sort), so round u only evaluates the M new
    positions from round u-1 — numerically identical to the reference's
    re-evaluate-everything scheme (sampler.py:189: same positions, same
    params, same values) at 112 instead of 352 evals/ray for the default
    64 + 4x16 schedule.  ``sdf_fn`` overrides the proposal SDF source (the
    coarse-grid opt-in); default is the full geometric network.
    """
    U = conf.renderer.n_upsamples
    base_gain = conf.renderer.sampling_sigmoid_gain
    grid = params.get("geometric-network", {}).get("grid") \
        if isinstance(params.get("geometric-network", {}), dict) else None
    if conf.renderer.get("proposal_grid_bf16", False) and grid is not None:
        # Proposals are stop-gradient data generation: bf16 table reads cut
        # the gather bytes (+9 ms/step measured at G=256). The cast itself
        # costs a full table read+write per step, so only do it when the
        # table is small enough for the cast to stay well under the saving.
        n_bytes = sum(int(np.prod(f.shape)) * 4
                      for f in jax.tree_util.tree_leaves(grid))
        if n_bytes <= 600_000_000:
            geo = dict(params["geometric-network"])
            geo["grid"] = jax.tree_util.tree_map(
                lambda f: f.astype(jnp.bfloat16), grid)
            params = dict(params)
            params["geometric-network"] = geo
    if sdf_fn is None:
        def sdf_fn(t_):
            return _proposal_sdf(params, conf, camloc, raydir, t_)
    sdf = sdf_fn(t)
    for u in range(U):
        uu = None if rand_u is None else rand_u[u]
        t_new = _propose_t(conf, t, sdf, t_near, t_far, base_gain * 2 ** u, uu)
        if u < U - 1:
            t, sdf = _merge_sorted(t, sdf, t_new, sdf_fn(t_new))
        else:
            # the final round's new positions never need an SDF value
            t = jnp.sort(jnp.concatenate([t, t_new], axis=2), axis=2)
    return t


def sample_background(t_base, background_u):
    """Inverse-distance background samples t = t_base / u, sorted
    (reference: sampler.py:244-254)."""
    B, R, _ = t_base.shape
    t = t_base.reshape(B, R, 1, 1) / background_u
    return jnp.sort(t, axis=2)


def make_proposal_grid(params, conf):
    """SDF snapshot on a G_c^3 lattice over the bounding box (the coarse-grid
    proposal opt-in, ``renderer.proposal_method=coarse_grid``).

    An occupancy-grid-flavored accelerator in the Instant-NGP tradition: the
    hierarchical sampler reads trilinear interpolations of this cached
    snapshot instead of running the full geometric network per proposal.
    Sample *placement* shifts slightly (bounded by the SDF's Lipschitz bound
    and the 2r/G_c cell size); the differentiated pipeline is untouched.
    Refresh on the trainer's cadence (``renderer.proposal_refresh_interval``).
    """
    Gc = int(conf.renderer.get("proposal_grid_size", 64))
    r = conf.renderer.bounding_sphere_radius
    lin = jnp.linspace(-r, r, Gc)
    X, Y, Z = jnp.meshgrid(lin, lin, lin, indexing="ij")
    pts = jnp.stack([X, Y, Z], axis=-1).reshape(-1, 3)
    sdf, _, _ = geometric_apply(params["geometric-network"], pts, conf)
    return jax.lax.stop_gradient(sdf).reshape(Gc, Gc, Gc, 1)


def _coarse_grid_sdf_fn(proposal_grid, conf, camloc, raydir):
    from ndjir_tpu.ops.grid import query_voxel

    r = conf.renderer.bounding_sphere_radius
    B, R, _ = raydir.shape

    def sdf_fn(t_):
        x = camloc.reshape(B, 1, 1, 3) + t_ * raydir.reshape(B, R, 1, 3)
        return query_voxel(x, proposal_grid, (-r,) * 3, (r,) * 3)

    return sdf_fn


def sample_points(params, camloc, raydir, stratified_u, background_u, conf,
                  rand_u=None, proposal_grid=None) -> Tuple[jax.Array, ...]:
    """Full point-sampling pass (reference: sampler.py:256-299).

    The proposal SDF evaluations run under stop_gradient: sampling is data
    generation, not part of the differentiated graph (reference makes this a
    non-differentiable PythonFunction; SURVEY.md section 1 "notable
    inversion").  ``proposal_grid`` (from :func:`make_proposal_grid`) swaps
    the proposal SDF source to cached coarse-grid reads when
    ``renderer.proposal_method == "coarse_grid"``.
    """
    B, R, _ = raydir.shape
    sg = jax.lax.stop_gradient
    camloc_s, raydir_s = sg(camloc), sg(raydir)

    sdf_fn = None
    if (conf.renderer.get("proposal_method", "network") == "coarse_grid"
            and proposal_grid is not None):
        sdf_fn = _coarse_grid_sdf_fn(sg(proposal_grid), conf, camloc_s,
                                     raydir_s)

    t_near, t_far, mask = t_near_far(camloc_s, raydir_s, conf)
    t = sample_stratified(t_near, t_far, stratified_u, conf.renderer.n_samples0)
    t = sample_importance(
        jax.tree_util.tree_map(sg, params), conf, camloc_s, raydir_s,
        t_near, t_far, t, rand_u, sdf_fn=sdf_fn)
    t = sg(t)

    x_fg = camloc_s.reshape(B, 1, 1, 3) + t * raydir_s.reshape(B, R, 1, 3)
    t_fg = jnp.concatenate([t, t_far.reshape(B, R, 1, 1)], axis=2)

    if conf.background_modeling:
        radius = conf.renderer.bounding_sphere_radius
        t_near_bg, _ = _camloc_dists_range(camloc_s, raydir_s, radius)
        t_base = t_far * mask + t_near_bg * (1.0 - mask)
        t_bg = sample_background(t_base, background_u)
        x_bg3 = camloc_s.reshape(B, 1, 1, 3) \
            + t_bg[:, :, :-1, :] * raydir_s.reshape(B, R, 1, 3)
        dists = jnp.linalg.norm(x_bg3, axis=3, keepdims=True) + 1e-6
        x_bg = jnp.concatenate([x_bg3 / dists, 1.0 / dists], axis=-1)
    else:
        Nb = conf.renderer.n_bg_samples
        x_bg = jnp.ones((B, R, Nb, 4), camloc.dtype)
        t_bg = jnp.ones((B, R, Nb + 1, 1), camloc.dtype)

    mask = mask.reshape(B, R, 1, 1)
    return x_fg, t_fg, x_bg, sg(t_bg), sg(mask)
