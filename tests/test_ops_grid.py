"""Grid feature encodings vs numpy oracles + grad-of-grad checks.

Reproduces the reference's composite-vs-monolithic oracle strategy
(reference: python/grid_feature/test/, SURVEY.md section 4): forward parity
with an explicit numpy loop, first-order feature/query grads, and the
second-order (eikonal-path) grad-of-grad invariant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndjir_tpu.ops import grid as G


def np_lanczos(x, a=2):
    return np.sinc(x) * np.sinc(x / a)


def oracle_voxel(x, feat, vmin, vmax, kind="linear"):
    Gx, Gy, Gz, D = feat.shape
    g1 = np.array([Gx - 1, Gy - 1, Gz - 1], np.float64)
    out = np.zeros((x.shape[0], D))
    for n in range(x.shape[0]):
        xyz = (x[n] - vmin) * g1 / (np.array(vmax) - vmin)
        x0 = np.clip(np.floor(xyz), 0, g1)
        x1 = np.minimum(x0 + 1, g1)
        if kind == "linear":
            w0 = x1 - xyz
        else:
            w0 = 0.5 * np.cos(np.pi * (xyz - x0)) + 0.5
        w1 = 1 - w0
        i0, i1 = x0.astype(int), x1.astype(int)
        for cx, (ix, wx) in enumerate([(i0[0], w0[0]), (i1[0], w1[0])]):
            for cy, (iy, wy) in enumerate([(i0[1], w0[1]), (i1[1], w1[1])]):
                for cz, (iz, wz) in enumerate([(i0[2], w0[2]), (i1[2], w1[2])]):
                    out[n] += wx * wy * wz * feat[ix, iy, iz]
    return out


def oracle_voxel_lanczos(x, feat, vmin, vmax, a=2):
    Gx, Gy, Gz, D = feat.shape
    g1 = np.array([Gx - 1, Gy - 1, Gz - 1], np.float64)
    out = np.zeros((x.shape[0], D))
    for n in range(x.shape[0]):
        xyz = (x[n] - vmin) * g1 / (np.array(vmax) - vmin)
        x0 = np.floor(xyz)
        for i in range(-a + 1, a + 1):
            xi = np.clip(x0[0] + i, 0, g1[0])
            ci = np_lanczos(xyz[0] - xi, a)
            for j in range(-a + 1, a + 1):
                yj = np.clip(x0[1] + j, 0, g1[1])
                cj = np_lanczos(xyz[1] - yj, a)
                for k in range(-a + 1, a + 1):
                    zk = np.clip(x0[2] + k, 0, g1[2])
                    ck = np_lanczos(xyz[2] - zk, a)
                    out[n] += ci * cj * ck * feat[int(xi), int(yj), int(zk)]
    return out


def tcnn_hash(ix, iy, iz, T):
    h = (np.uint32(ix) * np.uint32(1)) ^ (np.uint32(iy) * np.uint32(2654435761)) \
        ^ (np.uint32(iz) * np.uint32(805459861))
    return int(h % np.uint32(T))


def oracle_voxel_hash(x, feat, G0, growth, T0, L, D, vmin, vmax):
    N = x.shape[0]
    out = np.zeros((N, D * L))
    for (off, Gl, T) in G.hash_level_offsets(G0, growth, T0, L, D):
        pass  # offsets checked below via the library helper
    levels = G.hash_level_offsets(G0, growth, T0, L, D)
    for li, (off, Gl, T) in enumerate(levels):
        g1 = np.array([Gl - 1] * 3, np.float64)
        table = feat[off:off + T * D].reshape(T, D)
        for n in range(N):
            xyz = (x[n] - vmin) * g1 / (np.array(vmax) - vmin)
            x0 = np.clip(np.floor(xyz), 0, g1)
            x1 = np.minimum(x0 + 1, g1)
            w0 = x1 - xyz
            w1 = 1 - w0
            i0, i1 = x0.astype(int), x1.astype(int)
            acc = np.zeros(D)
            for (ix, wx) in [(i0[0], w0[0]), (i1[0], w1[0])]:
                for (iy, wy) in [(i0[1], w0[1]), (i1[1], w1[1])]:
                    for (iz, wz) in [(i0[2], w0[2]), (i1[2], w1[2])]:
                        acc += wx * wy * wz * table[tcnn_hash(ix, iy, iz, T)]
            for d in range(D):
                out[n, d * L + li] = acc[d]  # channel = d*L + l layout
    return out


VMIN, VMAX = (-1.0, -1.0, -1.0), (1.0, 1.0, 1.0)


@pytest.mark.parametrize("kind", ["linear", "cosine"])
def test_voxel_matches_oracle(rng, kind):
    feat = rng.randn(5, 6, 7, 3).astype(np.float32)
    x = rng.uniform(-1.2, 1.2, (32, 3)).astype(np.float32)  # incl. out-of-box
    got = np.asarray(G.query_voxel(x, feat, VMIN, VMAX, kind))
    want = oracle_voxel(x, feat, VMIN, VMAX, kind)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_voxel_lanczos_matches_oracle(rng):
    feat = rng.randn(8, 8, 8, 2).astype(np.float32)
    x = rng.uniform(-1.0, 1.0, (16, 3)).astype(np.float32)
    got = np.asarray(G.query_voxel_lanczos(x, feat, VMIN, VMAX))
    want = oracle_voxel_lanczos(x, feat, VMIN, VMAX)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_triplane_matches_oracle(rng):
    Gs, D = 9, 4
    feat = rng.randn(3, Gs, Gs, D).astype(np.float32)
    x = rng.uniform(-1, 1, (24, 3)).astype(np.float32)
    got = np.asarray(G.query_triplane(x, feat, VMIN, VMAX))

    # explicit oracle: sum of three bilinear plane lookups (xy, yz, zx)
    g1 = Gs - 1.0
    want = np.zeros((24, D))
    for n in range(24):
        xyz = (x[n] + 1) * g1 / 2.0
        x0 = np.clip(np.floor(xyz), 0, g1)
        x1 = np.minimum(x0 + 1, g1)
        w0 = x1 - xyz
        w1 = 1 - w0
        i0, i1 = x0.astype(int), x1.astype(int)
        for p, (au, av) in enumerate([(0, 1), (1, 2), (2, 0)]):
            for (iu, wu) in [(i0[au], w0[au]), (i1[au], w1[au])]:
                for (iv, wv) in [(i0[av], w0[av]), (i1[av], w1[av])]:
                    want[n] += wu * wv * feat[p, iu, iv]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_triline_matches_oracle(rng):
    Gs, D = 11, 4
    feat = rng.randn(3, Gs, D).astype(np.float32)
    x = rng.uniform(-1, 1, (24, 3)).astype(np.float32)
    got = np.asarray(G.query_triline(x, feat, VMIN, VMAX))
    g1 = Gs - 1.0
    want = np.zeros((24, D))
    for n in range(24):
        xyz = (x[n] + 1) * g1 / 2.0
        x0 = np.clip(np.floor(xyz), 0, g1)
        x1 = np.minimum(x0 + 1, g1)
        w0 = x1 - xyz
        for ax in range(3):
            want[n] += w0[ax] * feat[ax, int(x0[ax])] \
                + (1 - w0[ax]) * feat[ax, int(x1[ax])]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_voxel_hash_matches_oracle(rng):
    G0, growth, T0, L, D = 4, 1.5, 2 ** 9, 4, 2
    n = G.hash_num_params(G0, growth, T0, L, D)
    feat = rng.randn(n).astype(np.float32)
    x = rng.uniform(-1, 1, (16, 3)).astype(np.float32)
    got = np.asarray(G.query_voxel_hash(x, feat, G0, growth, T0, L, D, VMIN, VMAX))
    want = oracle_voxel_hash(x, feat, G0, growth, T0, L, D, VMIN, VMAX)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_hash_param_sizing_matches_reference_formula():
    # G_l = floor(G0 * b^l), T_l = min(G^3, T0), 8-"aligned" by adding the
    # remainder (reference: common_voxel_hash.cuh:24-55)
    assert G.hash_grid_size(16, 1.5, 0) == 16
    assert G.hash_grid_size(16, 1.5, 2) == 36
    assert G.hash_table_size(4, 2 ** 15) == 64
    assert G.hash_table_size(64, 2 ** 15) == 2 ** 15
    n = G.hash_num_params(16, 1.5, 2 ** 15, 16, 2)
    per = [G._force_align(G.hash_table_size(G.hash_grid_size(16, 1.5, l), 2 ** 15) * 2)
           for l in range(16)]
    assert n == sum(per)


@pytest.mark.parametrize("query_fn_name", [
    "voxel", "voxel_cosine", "voxel_lanczos", "triplane", "triline", "hash"])
def test_grad_of_grad(rng, query_fn_name):
    """Second-order differentiability: d/dfeat of sum((d out/d x)^2) exists
    and is finite — the eikonal-loss invariant the reference needed 8k LoC of
    CUDA for (SURVEY.md section 2.4)."""
    x = jnp.asarray(rng.uniform(-0.9, 0.9, (8, 3)).astype(np.float32))
    if query_fn_name == "hash":
        G0, growth, T0, L, D = 4, 1.5, 2 ** 9, 3, 2
        feat = jnp.asarray(rng.randn(G.hash_num_params(G0, growth, T0, L, D)).astype(np.float32))
        f = lambda x_, ft: G.query_voxel_hash(x_, ft, G0, growth, T0, L, D)
    elif query_fn_name == "triplane":
        feat = jnp.asarray(rng.randn(3, 8, 8, 2).astype(np.float32))
        f = lambda x_, ft: G.query_triplane(x_, ft)
    elif query_fn_name == "triline":
        feat = jnp.asarray(rng.randn(3, 8, 2).astype(np.float32))
        f = lambda x_, ft: G.query_triline(x_, ft)
    elif query_fn_name == "voxel_lanczos":
        feat = jnp.asarray(rng.randn(8, 8, 8, 2).astype(np.float32))
        f = lambda x_, ft: G.query_voxel_lanczos(x_, ft)
    elif query_fn_name == "voxel_cosine":
        feat = jnp.asarray(rng.randn(8, 8, 8, 2).astype(np.float32))
        f = lambda x_, ft: G.query_voxel(x_, ft, weight="cosine")
    else:
        feat = jnp.asarray(rng.randn(8, 8, 8, 2).astype(np.float32))
        f = lambda x_, ft: G.query_voxel(x_, ft)

    def outer(ft):
        def inner(x_):
            return f(x_, ft).sum()
        g = jax.grad(inner)(x)           # d out / d x
        return (g ** 2).sum()            # eikonal-style

    gg = jax.grad(outer)(feat)
    assert np.all(np.isfinite(np.asarray(gg)))
    # for the *linear* voxel the spatial grad is piecewise-constant in feat:
    # check it is nonzero (grid actually contributes to the normal)
    if query_fn_name == "voxel":
        assert float(jnp.abs(gg).sum()) > 0


def test_lanczos_spatial_gradient_fd(rng):
    """Finite-difference check of d out / d x for the Lanczos query (smooth
    interpolant, so FD converges; linear variants are only piecewise-smooth)."""
    feat = jnp.asarray(rng.randn(10, 10, 10, 1).astype(np.float32))
    x0 = jnp.asarray([[0.13, -0.25, 0.4]], dtype=jnp.float32)

    def f(x_):
        return G.query_voxel_lanczos(x_, feat).sum()

    g = np.asarray(jax.grad(f)(x0))[0]
    eps = 1e-3
    for ax in range(3):
        d = np.zeros(3, np.float32)
        d[ax] = eps
        fp = float(f(x0 + d))
        fm = float(f(x0 - d))
        fd = (fp - fm) / (2 * eps)
        np.testing.assert_allclose(g[ax], fd, rtol=5e-2, atol=1e-3)


def test_grid_encoding_dispatch(rng):
    from ndjir_tpu.config import load_config
    for t, expected in [("voxel", 4), ("triplane", 4), ("triline", 4),
                        ("triplaneline", 8), ("voxel_hash", 64),
                        ("cosine_voxel", 4), ("lanczos_voxel", 4)]:
        conf = load_config("default", overrides=[
            "geometric_network.voxel.type=" + t,
            "geometric_network.voxel.grid_size=16",
        ])
        enc = G.GridEncoding(conf.geometric_network.voxel)
        assert enc.out_dim == expected, t
        params = enc.init(jax.random.PRNGKey(0))
        x = jnp.asarray(rng.uniform(-1, 1, (5, 3)).astype(np.float32))
        out = enc.apply(params, x)
        assert out.shape == (5, expected)


def test_ste_blocks_spatial_grad(rng):
    from ndjir_tpu.config import load_config
    conf = load_config("ste", overrides=["geometric_network.voxel.grid_size=8"])
    enc = G.GridEncoding(conf.geometric_network.voxel)
    assert enc.use_ste
    params = enc.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.uniform(-0.9, 0.9, (4, 3)).astype(np.float32))
    g = jax.grad(lambda x_: enc.apply(params, x_).sum())(x)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=0)
    # feature grads still flow under STE
    gf = jax.grad(lambda p: enc.apply(p, x).sum())(params)
    assert float(jnp.abs(gf["F"]).sum()) > 0


def test_fused_query_and_tv_matches_separate(rng):
    """query_voxel_and_tv must equal (query_voxel, tv_loss_voxel) in value
    AND in gradients for both sym settings (shared-gather fusion)."""
    import jax
    import jax.numpy as jnp

    from ndjir_tpu.ops.tv_loss import tv_loss_voxel

    feat = jnp.asarray(rng.randn(9, 9, 9, 3).astype(np.float32))
    x = jnp.asarray(rng.uniform(-1.1, 1.1, (20, 3)).astype(np.float32))
    for kind in ["linear", "cosine"]:
        qi, tv = G.query_voxel_and_tv(x, feat, weight=kind)
        q_ref = G.query_voxel(x, feat, weight=kind)
        tv_ref = tv_loss_voxel(x, feat)
        np.testing.assert_allclose(np.asarray(qi), np.asarray(q_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tv), np.asarray(tv_ref), atol=1e-5)

    for sym in [True, False]:
        def fused(f):
            qi, tv = G.query_voxel_and_tv(x, f, sym_backward=sym)
            return (qi ** 2).sum() + tv.sum()

        def separate(f):
            return (G.query_voxel(x, f) ** 2).sum() + \
                tv_loss_voxel(x, f, sym_backward=sym).sum()

        gf = jax.grad(fused)(feat)
        gs = jax.grad(separate)(feat)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gs), atol=1e-4)


def test_nonzdup_path_matches_zdup(rng, monkeypatch):
    """The 8-corner (non-zdup) gather path — production at G=512, where the
    doubled table exceeds the budget — must match the z-paired path in
    values, TV, and table gradients."""
    feat = jnp.asarray(rng.randn(9, 9, 9, 3).astype(np.float32))
    x = jnp.asarray(rng.uniform(-1.1, 1.1, (20, 3)).astype(np.float32))

    q_z, tv_z = G.query_voxel_and_tv(x, feat)
    gz = jax.grad(lambda f: (G.query_voxel_and_tv(x, f)[0] ** 2).sum()
                  + G.query_voxel_and_tv(x, f)[1].sum())(feat)

    monkeypatch.setattr(G, "_ZDUP_MAX_BYTES", 0)
    assert not G.use_zdup_layout(feat.shape)
    q_8, tv_8 = G.query_voxel_and_tv(x, feat)
    g8 = jax.grad(lambda f: (G.query_voxel_and_tv(x, f)[0] ** 2).sum()
                  + G.query_voxel_and_tv(x, f)[1].sum())(feat)

    np.testing.assert_allclose(np.asarray(q_8), np.asarray(q_z), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tv_8), np.asarray(tv_z), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g8), np.asarray(gz), atol=1e-4)
    for kind in ["linear", "cosine"]:
        q8k = G.query_voxel(x, feat, weight=kind)
        monkeypatch.setattr(G, "_ZDUP_MAX_BYTES", 10 ** 12)
        np.testing.assert_allclose(
            np.asarray(q8k),
            np.asarray(G.query_voxel(x, feat, weight=kind)), atol=1e-5)
        monkeypatch.setattr(G, "_ZDUP_MAX_BYTES", 0)


def test_gather_multi_matches_single(rng):
    """voxel_gather_multi over several point sets == per-set gathers, and
    interp-from-corners == query_voxel (the shared-gather fast path)."""
    feat = jnp.asarray(rng.randn(7, 7, 7, 4).astype(np.float32))
    xa = jnp.asarray(rng.uniform(-1.1, 1.1, (5, 11, 3)).astype(np.float32))
    xb = jnp.asarray(rng.uniform(-1.1, 1.1, (2, 9, 3)).astype(np.float32))
    fa, fb = G.voxel_gather_multi([xa, xb], feat)
    (fa1,) = G.voxel_gather_multi([xa], feat)
    (fb1,) = G.voxel_gather_multi([xb], feat)
    np.testing.assert_array_equal(np.asarray(fa), np.asarray(fa1))
    np.testing.assert_array_equal(np.asarray(fb), np.asarray(fb1))
    for x_, f_ in [(xa, fa), (xb, fb)]:
        np.testing.assert_allclose(
            np.asarray(G.voxel_interp_corners(x_, f_, feat.shape)),
            np.asarray(G.query_voxel(x_, feat)), atol=1e-6)


def test_octa_layout_matches_zdup(rng, monkeypatch):
    """The octa (8-corner-packed-row) layout — production for bf16 tables
    within the byte budget — must match the z-paired path in values, TV,
    table gradients, and the multi-set shared gather."""
    feat = jnp.asarray(rng.randn(9, 9, 9, 3).astype(np.float32)
                       ).astype(jnp.bfloat16)
    x = jnp.asarray(rng.uniform(-1.15, 1.15, (40, 3)).astype(np.float32))
    x = jnp.concatenate(
        [x, jnp.asarray([[1.0, 1.0, 1.0], [-1.0, -1.0, -1.0]])])

    assert G.use_octa_layout(feat.shape, feat.dtype)
    assert not G.use_octa_layout(feat.shape, jnp.float32)
    q_o, tv_o = G.query_voxel_and_tv(x, feat)

    def table_grad(f):
        q, tv = G.query_voxel_and_tv(x, f)
        return ((q.astype(jnp.float32) ** 2).sum()
                + tv.astype(jnp.float32).sum())

    g_o = jax.grad(table_grad)(feat).astype(jnp.float32)
    q_ok = G.query_voxel(x, feat, weight="cosine")

    monkeypatch.setattr(G, "_OCTA_MAX_BYTES", 0)
    assert not G.use_octa_layout(feat.shape, feat.dtype)
    q_z, tv_z = G.query_voxel_and_tv(x, feat)
    g_z = jax.grad(table_grad)(feat).astype(jnp.float32)

    np.testing.assert_allclose(np.asarray(q_o), np.asarray(q_z), atol=2e-6)
    np.testing.assert_allclose(np.asarray(tv_o), np.asarray(tv_z), atol=2e-6)
    # both paths round the bf16 table cotangent; allow bf16-level slack
    np.testing.assert_allclose(np.asarray(g_o), np.asarray(g_z),
                               rtol=2e-2, atol=2e-2)
    monkeypatch.setattr(G, "_OCTA_MAX_BYTES", 10 ** 12)
    np.testing.assert_allclose(
        np.asarray(q_ok),
        np.asarray(G.query_voxel(x, feat, weight="cosine")), atol=2e-6)

    # multi-set shared gather, octa rows
    xa = jnp.asarray(rng.uniform(-1.1, 1.1, (5, 11, 3)).astype(np.float32))
    xb = jnp.asarray(rng.uniform(-1.1, 1.1, (2, 9, 3)).astype(np.float32))
    fa, fb = G.voxel_gather_multi([xa, xb], feat)
    assert fa.shape == (5, 11, 8 * 3) and fb.shape == (2, 9, 8 * 3)
    for x_, f_ in [(xa, fa), (xb, fb)]:
        np.testing.assert_allclose(
            np.asarray(G.voxel_interp_corners(x_, f_, feat.shape)),
            np.asarray(G.query_voxel(x_, feat)), atol=2e-6)


def test_layout_budget_is_dtype_aware():
    """bf16 G=512 x D=4 must take the z-dup (4-gather) layout — its actual
    doubled-table bytes (2.15 GB) fit the budget — while the f32 twin
    (4.3 GB) must not; decisions at the f32 reference workloads are
    unchanged (G=256 in, G=512 out)."""
    g512 = (512, 512, 512, 4)
    g256 = (256, 256, 256, 4)
    assert G.use_zdup_layout(g512, jnp.bfloat16)
    assert not G.use_zdup_layout(g512, jnp.float32)
    assert G.use_zdup_layout(g256, jnp.float32)
    assert G.use_zdup_layout(g256, jnp.bfloat16)
    # octa stays z-dup-denied at G=512 even in bf16 (8.6 GB transient)
    assert not G.use_octa_layout(g512, jnp.bfloat16)
    assert G.use_octa_layout(g256, jnp.bfloat16)


def test_zdup_fold_is_adjoint_of_dup(rng):
    """_fold_zdup_cotangent must be the exact adjoint of the z-dup table
    build: matches autodiff through _voxel_zdup_flat."""
    gshape = (5, 6, 7, 3)
    base = jnp.asarray(rng.randn(*gshape).astype(np.float32))
    cot = jnp.asarray(
        rng.randn(gshape[0] * gshape[1] * gshape[2], 6).astype(np.float32))

    _, vjp_fn = jax.vjp(G._voxel_zdup_flat, base)
    want = np.asarray(vjp_fn(cot)[0])
    got = np.asarray(G._fold_zdup_cotangent(cot.T, gshape))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_gather_rows_zdup_vjp_matches_autodiff(rng, dtype):
    """gather_rows_zdup's hand-written backward (transposed scatter + direct
    f32 fold) == plain autodiff through _voxel_zdup_flat(base)[ids], on f32
    AND bf16 tables."""
    gshape = (6, 5, 7, 4)
    base = jnp.asarray(rng.randn(*gshape).astype(np.float32)).astype(dtype)
    x = jnp.asarray(rng.uniform(-1.1, 1.1, (30, 3)).astype(np.float32))
    ids = G.voxel_zdup_ids(x, gshape)
    cot = jnp.asarray(
        rng.randn(*ids.shape, 8).astype(np.float32)).astype(dtype)

    out, vjp_fn = jax.vjp(
        lambda b: G.gather_rows_zdup(b, ids, gshape), base)
    want_out, want_vjp = jax.vjp(
        lambda b: G._voxel_zdup_flat(b)[ids], base)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want_out))
    got = np.asarray(vjp_fn(cot)[0].astype(jnp.float32))
    want = np.asarray(want_vjp(cot)[0].astype(jnp.float32))
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


def test_packed_table_forward_bitexact(rng, monkeypatch):
    """NDJIR_PACKED_TABLE forward (pad-free 128-lane packed rows + P-way
    channel select) must be BIT-exact vs the plain duplicated-table gather,
    for octa and z-dup, values and custom-vjp cotangents alike."""
    gshape = (8, 8, 8, 4)
    base = jnp.asarray(rng.randn(*gshape).astype(np.float32)
                       ).astype(jnp.bfloat16)
    x = jnp.asarray(rng.uniform(-1.2, 1.2, (60, 3)).astype(np.float32))

    ids_o = G.voxel_octa_ids(x, gshape)
    ids_z = G.voxel_zdup_ids(x, gshape)
    cot_o = jnp.asarray(rng.randn(*ids_o.shape, 32).astype(np.float32)
                        ).astype(jnp.bfloat16)
    cot_z = jnp.asarray(rng.randn(*ids_z.shape, 8).astype(np.float32)
                        ).astype(jnp.bfloat16)

    def run():
        out_o, vjp_o = jax.vjp(
            lambda b: G.gather_rows_octa(b, ids_o, gshape), base)
        out_z, vjp_z = jax.vjp(
            lambda b: G.gather_rows_zdup(b, ids_z, gshape), base)
        return (np.asarray(out_o.astype(jnp.float32)),
                np.asarray(vjp_o(cot_o)[0].astype(jnp.float32)),
                np.asarray(out_z.astype(jnp.float32)),
                np.asarray(vjp_z(cot_z)[0].astype(jnp.float32)))

    monkeypatch.setattr(G, "_PACKED_TABLE", False)
    plain = run()
    monkeypatch.setattr(G, "_PACKED_TABLE", True)
    packed = run()
    for a, b in zip(plain, packed):
        np.testing.assert_array_equal(a, b)


def test_octa_fold_onepass_matches_chain(rng):
    """The single-pass octa fold (production default) == the 3-pass halving
    chain == autodiff through _voxel_octa_flat, including the clamped-edge
    double-count rows."""
    gshape = (5, 6, 7, 3)
    base = jnp.asarray(rng.randn(*gshape).astype(np.float32))
    n_rows = gshape[0] * gshape[1] * gshape[2]
    cot_t = jnp.asarray(rng.randn(24, n_rows).astype(np.float32))

    _, vjp_fn = jax.vjp(G._voxel_octa_flat, base)
    want = np.asarray(vjp_fn(cot_t.T.reshape(n_rows, 24))[0])

    got_one = np.asarray(G._fold_octa_cotangent_onepass(cot_t, gshape))
    np.testing.assert_allclose(got_one, want, rtol=1e-5, atol=1e-5)

    got_flat = np.asarray(G._fold_octa_cotangent_flat(cot_t, gshape))
    np.testing.assert_allclose(got_flat, want, rtol=1e-5, atol=1e-5)

    got_2d = np.asarray(G._fold_octa_cotangent_flat2d(cot_t, gshape))
    np.testing.assert_allclose(got_2d, want, rtol=1e-5, atol=1e-5)

    cc = cot_t.reshape(24, *gshape[:3])
    cc = G._fold_dup_axis(cc, 1)
    cc = G._fold_dup_axis(cc, 2)
    cc = G._fold_dup_axis(cc, 3)
    got_chain = np.asarray(jnp.transpose(cc, (1, 2, 3, 0)))
    np.testing.assert_allclose(got_chain, want, rtol=1e-5, atol=1e-5)


def test_zdup_fold_flat2d_matches_4d(rng, monkeypatch):
    """The flat2d z-dup fold (lane shift + iota masks) == the 4-D reshape
    form, on a non-cubic grid."""
    gshape = (4, 5, 7, 3)
    n_rows = gshape[0] * gshape[1] * gshape[2]
    cot_t = jnp.asarray(rng.randn(6, n_rows).astype(np.float32))
    want = np.asarray(G._fold_zdup_cotangent(cot_t, gshape))
    monkeypatch.setattr(G, "_FOLD_MODE", "flat2d")
    got = np.asarray(G._fold_zdup_cotangent(cot_t, gshape))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("fold_mode", ["chain", "flat2d"])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_gather_rows_octa_vjp_matches_autodiff(rng, dtype, fold_mode,
                                               monkeypatch):
    """gather_rows_octa's hand-written backward (transposed scatter + direct
    f32 fold) == plain autodiff through _voxel_octa_flat(base)[ids]
    end-to-end via jax.vjp, on f32 AND bf16 tables (advisor round-2
    finding: the adjoint-identity test alone did not pin the full custom-vjp
    path on a bf16 table), under both candidate fold formulations."""
    monkeypatch.setattr(G, "_FOLD_MODE", fold_mode)
    gshape = (6, 5, 7, 4)
    base = jnp.asarray(rng.randn(*gshape).astype(np.float32)).astype(dtype)
    x = jnp.asarray(rng.uniform(-1.1, 1.1, (30, 3)).astype(np.float32))
    ids = G.voxel_octa_ids(x, gshape)
    cot = jnp.asarray(
        rng.randn(*ids.shape, 32).astype(np.float32)).astype(dtype)

    out, vjp_fn = jax.vjp(
        lambda b: G.gather_rows_octa(b, ids, gshape), base)
    want_out, want_vjp = jax.vjp(
        lambda b: G._voxel_octa_flat(b)[ids], base)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want_out))
    got = np.asarray(vjp_fn(cot)[0].astype(jnp.float32))
    want = np.asarray(want_vjp(cot)[0].astype(jnp.float32))
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


def test_zdup_layout_matches_nonzdup_bf16(rng, monkeypatch):
    """bf16 z-dup (the new production layout at G=512) == the 8-gather path
    in values, TV, and table gradients."""
    feat = jnp.asarray(rng.randn(9, 9, 9, 3).astype(np.float32)
                       ).astype(jnp.bfloat16)
    x = jnp.asarray(rng.uniform(-1.15, 1.15, (40, 3)).astype(np.float32))

    # deny octa so bf16 takes the z-dup branch, as at G=512
    monkeypatch.setattr(G, "_OCTA_MAX_BYTES", 0)

    def table_grad(f):
        q, tv = G.query_voxel_and_tv(x, f)
        return ((q.astype(jnp.float32) ** 2).sum()
                + tv.astype(jnp.float32).sum())

    q_z, tv_z = G.query_voxel_and_tv(x, feat)
    g_z = jax.grad(table_grad)(feat).astype(jnp.float32)

    monkeypatch.setattr(G, "_ZDUP_MAX_BYTES", 0)
    q_8, tv_8 = G.query_voxel_and_tv(x, feat)
    g_8 = jax.grad(table_grad)(feat).astype(jnp.float32)

    np.testing.assert_allclose(np.asarray(q_z), np.asarray(q_8), atol=2e-6)
    np.testing.assert_allclose(np.asarray(tv_z), np.asarray(tv_8), atol=2e-6)
    np.testing.assert_allclose(np.asarray(g_z), np.asarray(g_8),
                               rtol=2e-2, atol=2e-2)
