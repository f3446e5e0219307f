"""XLA-native PointNet++ set-abstraction primitives: furthest-point sampling,
ball query, and grouping.

These replace the reference's CUDA ``pointnet2_ops`` kernels
(``mpinets/model.py:27,364-383``) with static-shape, jit/vmap-friendly
formulations:

* **FPS** -- the inherently sequential greedy selection is a
  ``lax.fori_loop`` whose body is a fully vectorized distance update +
  argmax over N (one [N]-sized VPU pass per iteration, batched over B by
  vmap). Matches the CUDA kernel's semantics: start from index 0, repeatedly
  take the point with the largest min-distance to the selected set.
* **Ball query** -- the CUDA kernel returns, per centroid, the *first*
  ``nsample`` point indices (in index order) within ``radius``; when fewer
  than ``nsample`` are found, remaining slots repeat the first found index;
  when none are found, slot 0's default index 0 is used. We reproduce this
  exactly with a top-k over masked indices (smallest-k = first-k in index
  order), which XLA lowers to an efficient partial sort.
* **Grouping** is a plain gather + recenter.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def furthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Greedy furthest-point sampling.

    :param xyz: [B, N, 3]
    :returns: int32 indices [B, npoint]
    """
    b, n, _ = xyz.shape

    def body(i, state):
        min_d2, last_idx, out = state
        last = jnp.take_along_axis(xyz, last_idx[:, None, None], axis=1)  # [B,1,3]
        d2 = jnp.sum((xyz - last) ** 2, axis=-1)  # [B, N]
        min_d2 = jnp.minimum(min_d2, d2)
        nxt = jnp.argmax(min_d2, axis=-1).astype(jnp.int32)  # [B]
        out = out.at[:, i].set(nxt)
        return min_d2, nxt, out

    out = jnp.zeros((b, npoint), jnp.int32)
    init_idx = jnp.zeros((b,), jnp.int32)
    min_d2 = jnp.full((b, n), jnp.inf, xyz.dtype)
    # Slot 0 is index 0 (CUDA kernel convention); the loop fills 1..npoint-1.
    _, _, out = jax.lax.fori_loop(1, npoint, body, (min_d2, init_idx, out))
    return out


def ball_query(
    centroids: jnp.ndarray,
    xyz: jnp.ndarray,
    radius: float,
    nsample: int,
) -> jnp.ndarray:
    """First-``nsample`` neighbors within ``radius`` of each centroid.

    :param centroids: [B, S, 3]
    :param xyz: [B, N, 3]
    :returns: int32 indices [B, S, nsample] with the CUDA kernel's
        fill-with-first semantics.
    """
    b, s, _ = centroids.shape
    n = xyz.shape[1]
    d2 = jnp.sum((centroids[:, :, None, :] - xyz[:, None, :, :]) ** 2, axis=-1)
    in_ball = d2 < radius * radius  # [B, S, N]
    idx = jax.lax.broadcasted_iota(jnp.int32, (b, s, n), 2)
    # Sort key: index when in ball, else a sentinel beyond every real index.
    key = jnp.where(in_ball, idx, n)
    # smallest-k == first-k in index order; top_k finds largest so negate.
    k = min(nsample, n)
    neg_topk, _ = jax.lax.top_k(-key, k)
    first_k = -neg_topk  # [B, S, k], ascending index order
    if k < nsample:  # degenerate N < nsample case: pad with sentinels
        pad = jnp.full((b, s, nsample - k), n, jnp.int32)
        first_k = jnp.concatenate([first_k, pad], axis=-1)
    found = first_k < n
    first_found = first_k[..., :1]  # slot 0: first in-ball index, or sentinel
    fill = jnp.where(first_found < n, first_found, 0)
    return jnp.where(found, first_k, fill).astype(jnp.int32)


def gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points: [B, N, C], idx: [B, ...] int -> [B, ..., C]."""
    b = points.shape[0]
    flat = idx.reshape(b, -1)
    out = jnp.take_along_axis(points, flat[..., None], axis=1)
    return out.reshape(idx.shape + (points.shape[-1],))


@partial(jax.jit, static_argnames=("radius", "nsample"))
def query_and_group(
    centroids: jnp.ndarray,
    xyz: jnp.ndarray,
    features: jnp.ndarray,
    radius: float,
    nsample: int,
) -> jnp.ndarray:
    """Ball query + grouping, concatenating recentered xyz with features
    (``use_xyz=True`` in pointnet2_ops, the reference default).

    :param centroids: [B, S, 3]
    :param xyz: [B, N, 3]
    :param features: [B, N, C]
    :returns: grouped [B, S, nsample, 3 + C]
    """
    idx = ball_query(centroids, xyz, radius, nsample)
    grouped_xyz = gather_points(xyz, idx) - centroids[:, :, None, :]
    grouped_feat = gather_points(features, idx)
    return jnp.concatenate([grouped_xyz, grouped_feat], axis=-1)


def group_all(xyz: jnp.ndarray, features: jnp.ndarray) -> jnp.ndarray:
    """The global set-abstraction grouping (GroupAll in pointnet2_ops):
    every point in one group, xyz NOT recentered.

    :returns: [B, 1, N, 3 + C]
    """
    return jnp.concatenate([xyz, features], axis=-1)[:, None, :, :]
