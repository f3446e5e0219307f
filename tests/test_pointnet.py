"""Semantics tests for the XLA-native PointNet++ ops against numpy oracles
that mirror the reference's CUDA kernels (pointnet2_ops: furthest-point
sampling and ball query, used via mpinets/model.py:364-383)."""

import numpy as np
import jax
import jax.numpy as jnp

from mpinets_tpu.kernels import pointnet


def _oracle_fps(xyz: np.ndarray, npoint: int) -> np.ndarray:
    """Greedy FPS starting at index 0 (CUDA kernel convention)."""
    n = xyz.shape[0]
    out = np.zeros(npoint, np.int64)
    min_d2 = np.full(n, np.inf)
    last = 0
    for i in range(1, npoint):
        d2 = np.sum((xyz - xyz[last]) ** 2, axis=-1)
        min_d2 = np.minimum(min_d2, d2)
        last = int(np.argmax(min_d2))
        out[i] = last
    return out


def _oracle_ball_query(centroids, xyz, radius, nsample):
    """First-nsample-in-index-order with fill-with-first (CUDA semantics)."""
    s = centroids.shape[0]
    out = np.zeros((s, nsample), np.int64)
    for i in range(s):
        cnt = 0
        for j in range(xyz.shape[0]):
            if np.sum((xyz[j] - centroids[i]) ** 2) < radius * radius:
                if cnt == 0:
                    out[i, :] = j
                out[i, cnt] = j
                cnt += 1
                if cnt == nsample:
                    break
    return out


def test_fps_matches_oracle():
    rng = np.random.default_rng(0)
    xyz = rng.standard_normal((3, 64, 3)).astype(np.float32)
    idx = np.asarray(pointnet.furthest_point_sample(jnp.asarray(xyz), 16))
    for b in range(3):
        np.testing.assert_array_equal(idx[b], _oracle_fps(xyz[b], 16))


def test_fps_covers_clusters():
    # Two distant clusters: FPS must pick from both immediately.
    rng = np.random.default_rng(1)
    a = rng.standard_normal((32, 3)) * 0.01
    b = rng.standard_normal((32, 3)) * 0.01 + 100.0
    xyz = np.concatenate([a, b]).astype(np.float32)[None]
    idx = np.asarray(pointnet.furthest_point_sample(jnp.asarray(xyz), 2))[0]
    assert idx[0] < 32 and idx[1] >= 32


def test_ball_query_matches_oracle():
    rng = np.random.default_rng(2)
    xyz = rng.uniform(-1, 1, (2, 128, 3)).astype(np.float32)
    centroids = xyz[:, :16]
    got = np.asarray(pointnet.ball_query(jnp.asarray(centroids), jnp.asarray(xyz), 0.5, 8))
    for b in range(2):
        np.testing.assert_array_equal(got[b], _oracle_ball_query(centroids[b], xyz[b], 0.5, 8))


def test_ball_query_empty_ball_returns_zero():
    xyz = jnp.asarray([[[10.0, 10.0, 10.0], [11.0, 11.0, 11.0]]])
    centroids = jnp.zeros((1, 1, 3))
    got = np.asarray(pointnet.ball_query(centroids, xyz, 0.1, 4))
    np.testing.assert_array_equal(got, np.zeros((1, 1, 4)))


def test_ball_query_fill_with_first():
    # 3 points in the ball at indices 1, 3, 4, nsample=5 -> [1,3,4,1,1]
    pts = np.full((8, 3), 50.0, np.float32)
    for i in (1, 3, 4):
        pts[i] = (0.01 * i, 0, 0)
    got = np.asarray(
        pointnet.ball_query(jnp.zeros((1, 1, 3)), jnp.asarray(pts[None]), 0.5, 5)
    )
    np.testing.assert_array_equal(got[0, 0], [1, 3, 4, 1, 1])


def test_query_and_group_recenters():
    rng = np.random.default_rng(3)
    xyz = rng.uniform(-1, 1, (1, 32, 3)).astype(np.float32)
    feats = rng.standard_normal((1, 32, 2)).astype(np.float32)
    centroids = xyz[:, :4]
    grouped = np.asarray(
        pointnet.query_and_group(
            jnp.asarray(centroids), jnp.asarray(xyz), jnp.asarray(feats), 2.0, 8
        )
    )
    assert grouped.shape == (1, 4, 8, 5)
    # With radius 2.0 covering everything, slot 0 of centroid i is point 0
    # recentered (first index in ball).
    np.testing.assert_allclose(
        grouped[0, :, 0, :3], xyz[0, 0] - centroids[0], atol=1e-6
    )
    np.testing.assert_allclose(
        grouped[0, :, 0, 3:], np.broadcast_to(feats[0, 0], (4, 2)), atol=1e-6
    )


def test_group_all_shapes():
    xyz = jnp.zeros((2, 16, 3))
    feats = jnp.ones((2, 16, 4))
    grouped = pointnet.group_all(xyz, feats)
    assert grouped.shape == (2, 1, 16, 7)
