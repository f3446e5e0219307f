"""Pallas kernel parity: FPS, fused SA stage, and the full fused forward
against the XLA-oracle / flax paths (interpret mode on CPU).

These pin the exactness claims of the performance path: identical FPS
selections, identical ball-query SETS (slot order differs from the CUDA
kernel, which the order-invariant max-pool cannot see), and full-forward
equality with ``model.apply`` from one shared parameter tree.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpinets_tpu.kernels import pointnet, pallas_ops
from mpinets_tpu.model.policy import MotionPolicyNetwork
from mpinets_tpu.model.fused import make_fused_apply

pytestmark = pytest.mark.slow  # interpret-mode Pallas is compile-heavy


@pytest.mark.parametrize("impl", ["v1", "v2"])
def test_fps_with_coords_matches_oracle(impl):
    key = jax.random.PRNGKey(0)
    xyz = jax.random.normal(key, (5, 384, 3))
    ref = pointnet.furthest_point_sample(xyz, 64)
    idx, coords = pallas_ops.furthest_point_sample_with_coords(
        xyz, 64, interpret=True, impl=impl
    )
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref))
    np.testing.assert_allclose(
        np.asarray(coords),
        np.asarray(pointnet.gather_points(xyz, ref)),
        atol=1e-7,
    )


@pytest.mark.parametrize("radius", [0.02, 0.3, 0.9])
@pytest.mark.parametrize("impl", ["v3", "v5", "v8"])
def test_sa_stage_matches_oracle(radius, impl):
    key = jax.random.PRNGKey(1)
    B, N, S, NS, C1 = 2, 384, 16, 128, 32
    xyz = jax.random.uniform(key, (B, N, 3), minval=-0.6, maxval=0.6)
    feat = jax.random.uniform(jax.random.fold_in(key, 1), (B, N, 2))
    cent = xyz[:, :S]
    mk = lambda i, s: jax.random.normal(jax.random.fold_in(key, i), s) * 0.2
    w1, b1 = mk(2, (5, C1)), mk(3, (C1,))
    w2, b2 = mk(4, (C1, 32)), mk(5, (32,))
    w3, b3 = mk(6, (32, 48)), mk(7, (48,))

    idx0 = pointnet.ball_query(cent, xyz, radius, NS)
    g = jnp.concatenate(
        [
            pointnet.gather_points(xyz, idx0) - cent[:, :, None, :],
            pointnet.gather_points(feat, idx0),
        ],
        -1,
    )
    h = jnp.maximum(jnp.einsum("bsnc,cd->bsnd", g, w1) + b1, 0)
    h = jnp.maximum(jnp.einsum("bsnc,cd->bsnd", h, w2) + b2, 0)
    h = jnp.maximum(jnp.einsum("bsnc,cd->bsnd", h, w3) + b3, 0)
    ref = jnp.max(h, axis=2)

    feats, idx = pallas_ops.sa_stage(
        xyz, feat, cent, w1, b1, w2, b2, w3, b3,
        radius=radius, nsample=NS,
        compute_dtype=jnp.float32, interpret=True, impl=impl,
        # v8 requires the fused-path invariant (centroids are cloud
        # members); cent = xyz[:, :S] satisfies it here.
        centroids_in_cloud=impl == "v8",
    )
    for b in range(B):
        for s in range(S):
            assert set(np.asarray(idx0[b, s]).tolist()) == set(
                np.asarray(idx[b, s]).tolist()
            ), (radius, b, s)
    np.testing.assert_allclose(
        np.asarray(feats), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_sa_stage_gather16_matches_gather32():
    """gather16 (bf16 tables + i16 indices) must be bitwise identical to the
    default 32-bit gathers under bf16 compute: cast-then-gather equals
    gather-then-cast, and the bf16 slot-inversion invariant holds."""
    key = jax.random.PRNGKey(2)
    B, N, S, NS, C1 = 2, 384, 16, 128, 32
    xyz = jax.random.uniform(key, (B, N, 3), minval=-0.6, maxval=0.6)
    feat = jax.random.uniform(jax.random.fold_in(key, 1), (B, N, 2))
    cent = xyz[:, :S]
    mk = lambda i, s: jax.random.normal(jax.random.fold_in(key, i), s) * 0.2
    w1, b1 = mk(2, (5, C1)), mk(3, (C1,))
    w2, b2 = mk(4, (C1, 32)), mk(5, (32,))
    w3, b3 = mk(6, (32, 48)), mk(7, (48,))
    args = (xyz, feat, cent, w1, b1, w2, b2, w3, b3)
    f32_out = pallas_ops.sa_stage(
        *args, radius=0.3, nsample=NS,
        compute_dtype=jnp.bfloat16, interpret=True, gather16=False,
    )
    b16_out = pallas_ops.sa_stage(
        *args, radius=0.3, nsample=NS,
        compute_dtype=jnp.bfloat16, interpret=True, gather16=True,
    )
    np.testing.assert_array_equal(np.asarray(f32_out[0]), np.asarray(b16_out[0]))
    np.testing.assert_array_equal(np.asarray(f32_out[1]), np.asarray(b16_out[1]))


@pytest.mark.parametrize("sa_impl", ["v3", "v5", "v8"])
def test_fused_forward_matches_flax(sa_impl):
    """Full fused forward (reduced centroid counts, full radii/nsample) must
    equal model.apply from the same parameter tree in fp32."""
    npoints = (16, 8)
    model = MotionPolicyNetwork(sa_npoints=npoints)
    key = jax.random.PRNGKey(3)
    pc = jnp.concatenate(
        [
            jax.random.uniform(key, (2, 256, 3), minval=-0.7, maxval=0.7),
            jax.random.randint(key, (2, 256, 1), 0, 3).astype(jnp.float32),
        ],
        axis=-1,
    )
    q = jax.random.uniform(
        jax.random.fold_in(key, 1), (2, 7), minval=-1, maxval=1
    )
    variables = model.init(jax.random.fold_in(key, 2), pc, q)
    ref = model.apply(variables, pc, q)
    fused = make_fused_apply(
        compute_dtype=jnp.float32, interpret=True, sa_npoints=npoints,
        sa_impl=sa_impl,
    )(variables, pc, q)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), atol=2e-5, rtol=1e-4
    )


def test_fused_rollout_matches_flax_rollout():
    """The rollout engine with the fused apply must reproduce the flax-apply
    rollout trajectory (same key stream) over compounding steps."""
    import jax
    import jax.numpy as jnp

    from mpinets_tpu.data.synthetic import random_problem_batch
    from mpinets_tpu.geom.assembly import PointCloudSizes
    from mpinets_tpu.model.fused import make_fused_apply
    from mpinets_tpu.rollout.engine import make_rollout_fn

    sizes = PointCloudSizes(robot=64, obstacle=48, target=16)
    npoints = (16, 8)
    m = MotionPolicyNetwork(sa_npoints=npoints)
    key = jax.random.PRNGKey(0)
    prob = random_problem_batch(key, 2)
    params = m.init(key, jnp.zeros((1, sizes.total, 4)), jnp.zeros((1, 7)))
    fused = make_rollout_fn(
        m, max_steps=3, sizes=sizes,
        apply_fn=make_fused_apply(jnp.float32, interpret=True,
                                  sa_npoints=npoints),
    )
    flax = make_rollout_fn(m, max_steps=3, sizes=sizes)
    res_f = fused(params, prob, key)
    res_x = flax(params, prob, key)
    np.testing.assert_allclose(
        np.asarray(res_f.trajectories), np.asarray(res_x.trajectories),
        atol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(res_f.num_steps), np.asarray(res_x.num_steps)
    )


@pytest.mark.parametrize("radius", [0.1, 0.3])
def test_sa_stage_fast_full_window_matches_oracle(radius):
    """The relaxed fast-grouping kernel, when the window covers ALL chunks
    and no neighborhood saturates nsample, selects exactly the oracle's
    in-ball SETS and reproduces the stage output (f32)."""
    key = jax.random.PRNGKey(4)
    B, N, S, NS, C1 = 2, 384, 16, 128, 32
    xyz = jax.random.uniform(key, (B, N, 3), minval=-0.6, maxval=0.6)
    feat = jax.random.uniform(jax.random.fold_in(key, 1), (B, N, 2))
    cent = xyz[:, :S]
    mk = lambda i, s: jax.random.normal(jax.random.fold_in(key, i), s) * 0.2
    w1, b1 = mk(2, (5, C1)), mk(3, (C1,))
    w2, b2 = mk(4, (C1, 32)), mk(5, (32,))
    w3, b3 = mk(6, (32, 48)), mk(7, (48,))

    idx0 = pointnet.ball_query(cent, xyz, radius, NS)
    g = jnp.concatenate(
        [
            pointnet.gather_points(xyz, idx0) - cent[:, :, None, :],
            pointnet.gather_points(feat, idx0),
        ],
        -1,
    )
    h = jnp.maximum(jnp.einsum("bsnc,cd->bsnd", g, w1) + b1, 0)
    h = jnp.maximum(jnp.einsum("bsnc,cd->bsnd", h, w2) + b2, 0)
    h = jnp.maximum(jnp.einsum("bsnc,cd->bsnd", h, w3) + b3, 0)
    ref = jnp.max(h, axis=2)

    feats, idx = pallas_ops.sa_stage_fast(
        xyz, feat, cent, w1, b1, w2, b2, w3, b3,
        radius=radius, nsample=NS, window=8,  # clamped to nc=3: full cover
        compute_dtype=jnp.float32, interpret=True,
    )
    for b in range(B):
        for s in range(S):
            assert set(np.asarray(idx0[b, s]).tolist()) == set(
                np.asarray(idx[b, s]).tolist()
            ), (radius, b, s)
    np.testing.assert_allclose(
        np.asarray(feats), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_sa_stage_fast_narrow_window_is_subset():
    """With a truncating window the selected points must still all be
    genuinely in-ball (a subset of the oracle's candidate set)."""
    key = jax.random.PRNGKey(5)
    B, N, S, NS = 2, 768, 8, 128
    xyz = jax.random.uniform(key, (B, N, 3), minval=-0.4, maxval=0.4)
    feat = jax.random.uniform(jax.random.fold_in(key, 1), (B, N, 1))
    cent = xyz[:, :S]
    mk = lambda i, s: jax.random.normal(jax.random.fold_in(key, i), s) * 0.2
    w1, b1 = mk(2, (4, 16)), mk(3, (16,))
    w2, b2 = mk(4, (16, 16)), mk(5, (16,))
    w3, b3 = mk(6, (16, 16)), mk(7, (16,))
    radius = 0.25
    _, idx = pallas_ops.sa_stage_fast(
        xyz, feat, cent, w1, b1, w2, b2, w3, b3,
        radius=radius, nsample=NS, window=2,  # nc=6: genuinely truncating
        compute_dtype=jnp.float32, interpret=True,
    )
    d2 = jnp.sum((cent[:, :, None, :] - xyz[:, None, :, :]) ** 2, -1)
    in_ball = np.asarray(d2 < radius * radius)
    idx_n = np.asarray(idx)
    for b in range(B):
        for s in range(S):
            chosen = set(idx_n[b, s].tolist())
            assert all(in_ball[b, s, i] for i in chosen), (b, s)
