"""Intersection ops vs per-ray numpy oracles (the reference tests the CUDA
kernels against numpy loops; same strategy, reference:
python/intersection/test/)."""

import numpy as np

from ndjir_tpu.ops.intersect import ray_aabb_intersection, ray_sphere_intersection


def oracle_sphere(camloc, raydir, radius):
    B, R, _ = raydir.shape
    t_near = np.zeros((B, R, 1))
    t_far = np.zeros((B, R, 1))
    n_hits = np.zeros((B, R, 1))
    for b in range(B):
        c = camloc[b]
        for r in range(R):
            v = raydir[b, r]
            cv, vv, cc = c @ v, v @ v, c @ c
            Y = cv * cv - vv * (cc - radius ** 2)
            if Y > 0:
                tn = (-cv - np.sqrt(Y)) / vv
                tf = (-cv + np.sqrt(Y)) / vv
                pos = float(tn >= 0)
                t_near[b, r] = pos * tn
                t_far[b, r] = tf
                n_hits[b, r] = 2 - (1 - pos)
            elif Y == 0:
                t_near[b, r] = t_far[b, r] = -cv / vv
                n_hits[b, r] = 1
    return t_near, t_far, n_hits


def oracle_aabb(camloc, raydir, bmin, bmax):
    B, R, _ = raydir.shape
    t_near = np.zeros((B, R, 1))
    t_far = np.zeros((B, R, 1))
    n_hits = np.zeros((B, R, 1))
    bmin = np.asarray(bmin); bmax = np.asarray(bmax)
    for b in range(B):
        c = camloc[b]
        for r in range(R):
            d = raydir[b, r]
            with np.errstate(divide="ignore"):
                ts = np.concatenate([(bmax - c) / d, (bmin - c) / d])
            hits = []
            for i, t in enumerate(ts):
                if np.isinf(t):
                    continue
                x = c + t * d
                ax = i % 3
                x[ax] = bmax[ax] if i < 3 else bmin[ax]
                if t >= 0 and np.all(x >= bmin) and np.all(x <= bmax):
                    hits.append(i)
            n_hits[b, r] = len(hits)
            if len(hits) >= 2:
                ta, tb = ts[hits[0]], ts[hits[-1]]
                t_near[b, r] = min(ta, tb)
                t_far[b, r] = max(ta, tb)
            elif len(hits) == 1:
                t_far[b, r] = ts[hits[0]]
    return t_near, t_far, n_hits


def test_ray_sphere_matches_oracle(rng):
    B, R = 3, 64
    camloc = (rng.randn(B, 3) * 2 + np.array([0, 0, 3.0])).astype(np.float32)
    raydir = rng.randn(B, R, 3).astype(np.float32)
    raydir /= np.linalg.norm(raydir, axis=-1, keepdims=True)
    tn, tf, nh = ray_sphere_intersection(camloc, raydir, 1.0)
    on, of, oh = oracle_sphere(camloc, raydir, 1.0)
    np.testing.assert_allclose(np.asarray(nh), oh, atol=0)
    np.testing.assert_allclose(np.asarray(tn), on, atol=1e-4)
    np.testing.assert_allclose(np.asarray(tf), of, atol=1e-4)


def test_ray_aabb_matches_oracle(rng):
    B, R = 3, 64
    camloc = (rng.randn(B, 3) * 2 + np.array([0, 0, 3.0])).astype(np.float32)
    raydir = rng.randn(B, R, 3).astype(np.float32)
    raydir /= np.linalg.norm(raydir, axis=-1, keepdims=True)
    bmin, bmax = [-1.0] * 3, [1.0] * 3
    tn, tf, nh = ray_aabb_intersection(camloc, raydir, bmin, bmax)
    on, of, oh = oracle_aabb(camloc, raydir, bmin, bmax)
    np.testing.assert_allclose(np.asarray(nh), oh, atol=0)
    np.testing.assert_allclose(np.asarray(tn), on, atol=1e-4)
    np.testing.assert_allclose(np.asarray(tf), of, atol=1e-4)


def test_ray_aabb_inside_box():
    camloc = np.zeros((1, 3), np.float32)
    raydir = np.array([[[0.0, 0.0, 1.0]]], np.float32)
    tn, tf, nh = ray_aabb_intersection(camloc, raydir, [-1] * 3, [1] * 3)
    assert float(nh[0, 0, 0]) == 1.0
    assert float(tn[0, 0, 0]) == 0.0
    np.testing.assert_allclose(float(tf[0, 0, 0]), 1.0, atol=1e-6)
