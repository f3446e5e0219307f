"""Fused-kernel policy forward: the TPU performance path.

Composes the Pallas kernels (:mod:`mpinets_tpu.kernels.pallas_ops`) with a
plain-XLA tail into the exact computation of
:class:`mpinets_tpu.model.policy.MotionPolicyNetwork.__call__`
(reference architecture ``/root/reference/mpinets/model.py:35-91,355-426``),
reading the SAME flax parameter pytree -- so the flax module remains the
reference/training path and checkpoints are shared, while rollouts and
benchmarks use this function. ``tests/test_pallas_sa.py`` asserts equality
against ``model.apply``.

Stage map:
* SA0 / SA1: Pallas FPS (+selected coords) and the fused
  ball-query/group/MLP/max kernel.
* global SA (group-all), FC head with GroupNorm, q-encoder, decoder:
  ordinary XLA matmuls (MXU-friendly, nothing to hand-fuse).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from mpinets_tpu.kernels import pallas_ops

#: Reference architecture stage sizes (model.py:364-383); the npoints are
#: overridable for small-shape tests.
SA0 = dict(npoint=512, radius=0.05, nsample=128)
SA1 = dict(npoint=128, radius=0.3, nsample=128)


def _dense(p, x, compute_dtype):
    return (
        x.astype(compute_dtype) @ p["kernel"].astype(compute_dtype)
    ).astype(jnp.float32) + p["bias"]


def _leaky(x):
    return jax.nn.leaky_relu(x, negative_slope=0.01)


def _group_norm(p, x, num_groups=16, eps=1e-5):
    b, c = x.shape
    g = x.reshape(b, num_groups, c // num_groups)
    mean = jnp.mean(g, axis=-1, keepdims=True)
    var = jnp.var(g, axis=-1, keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + eps)
    return g.reshape(b, c) * p["scale"] + p["bias"]


def _mlp_params(tree):
    return tuple(
        (tree[f"conv{i}"]["kernel"], tree[f"conv{i}"]["bias"]) for i in range(3)
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "compute_dtype", "interpret", "sa_npoints", "sa_tiles", "fps_tile",
        "bf16_cloud", "fps_impl", "gather16", "sa_impl", "fast_grouping",
    ),
)
def fused_policy_apply(
    variables: Any,
    point_cloud: jnp.ndarray,  # [B, N, 4]
    q_norm: jnp.ndarray,       # [B, 7]
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    sa_npoints: tuple = (512, 128),
    sa_tiles: tuple = (16, 16),
    fps_tile: int = 128,
    bf16_cloud: bool = False,
    fps_impl: str = "v1",
    gather16: bool = False,
    sa_impl: str = "v8",
    fast_grouping: int = 0,
) -> jnp.ndarray:
    """Delta-q prediction, numerically equivalent to ``model.apply``.

    ``bf16_cloud=True`` carries the coordinates in bf16 through FPS (halves
    that kernel's VMEM-bandwidth floor). It changes which points FPS/ball
    query select at rounding ties, so it is a benchmark/deployment mode, not
    the parity mode.

    ``fast_grouping=W`` (nonzero) switches SA0 to the RELAXED chunk-window
    kernel (:func:`mpinets_tpu.kernels.pallas_ops.sa_stage_fast`): each
    centroid searches only its W nearest point chunks instead of the exact
    CUDA first-k-by-index truncation over all of them. A deployment/bench
    mode whose metric-level deltas are measured on chip; the exact-match
    eval contract stays on the exact path.
    """
    p = variables["params"]
    enc = p["point_cloud_encoder"]
    cdt = compute_dtype

    xyz = point_cloud[..., :3]
    if bf16_cloud:
        xyz = xyz.astype(jnp.bfloat16)
    feat = point_cloud[..., 3:]

    # ---- SA0: N -> 512 centroids, 64-dim features -------------------------
    (w1, b1), (w2, b2), (w3, b3) = _mlp_params(enc["sa0"]["mlp"])
    _, cent0 = pallas_ops.furthest_point_sample_with_coords(
        xyz, sa_npoints[0], interpret=interpret, batch_tile=fps_tile,
        impl=fps_impl,
    )
    if fast_grouping:
        f0, _ = pallas_ops.sa_stage_fast(
            xyz, feat, cent0, w1, b1, w2, b2, w3, b3,
            radius=SA0["radius"], nsample=SA0["nsample"],
            window=fast_grouping, compute_dtype=cdt, interpret=interpret,
            tile_s=sa_tiles[0],
        )
    else:
        f0, _ = pallas_ops.sa_stage(
            xyz, feat, cent0, w1, b1, w2, b2, w3, b3,
            radius=SA0["radius"], nsample=SA0["nsample"],
            compute_dtype=cdt, interpret=interpret, tile_s=sa_tiles[0],
            gather16=gather16, impl=sa_impl,
            pad_chunks=sa_impl in ("v5", "v8"),
            centroids_in_cloud=sa_impl in ("v5", "v8"),
        )

    # ---- SA1: 512 -> 128 centroids, 256-dim features ----------------------
    (w1, b1), (w2, b2), (w3, b3) = _mlp_params(enc["sa1"]["mlp"])
    _, cent1 = pallas_ops.furthest_point_sample_with_coords(
        cent0, sa_npoints[1], interpret=interpret, batch_tile=fps_tile,
        impl=fps_impl,
    )
    f1, _ = pallas_ops.sa_stage(
        cent0, f0, cent1, w1, b1, w2, b2, w3, b3,
        radius=SA1["radius"], nsample=SA1["nsample"],
        compute_dtype=cdt, interpret=interpret, tile_s=sa_tiles[1],
        gather16=gather16, impl=sa_impl,
        centroids_in_cloud=sa_impl in ("v5", "v8"),
    )

    return xla_tail(p, cent1, f1, q_norm, cdt)


def xla_tail(p, cent1, f1, q_norm, cdt):
    """Global SA (group all, xyz NOT recentred) + FC head + q encoder +
    decoder — the plain-XLA (and fully differentiable) back half of the
    policy, shared by the inference and train fused paths."""
    enc = p["point_cloud_encoder"]
    (w1, b1), (w2, b2), (w3, b3) = _mlp_params(enc["sa2"]["mlp"])
    g = jnp.concatenate([cent1, f1], axis=-1)            # [B, 128, 259]
    h = jnp.maximum(
        (g.astype(cdt) @ w1.astype(cdt)).astype(jnp.float32) + b1, 0
    )
    h = jnp.maximum(
        (h.astype(cdt) @ w2.astype(cdt)).astype(jnp.float32) + b2, 0
    )
    h = jnp.maximum(
        (h.astype(cdt) @ w3.astype(cdt)).astype(jnp.float32) + b3, 0
    )
    emb = jnp.max(h, axis=1)                             # [B, 1024]

    x = _leaky(_group_norm(enc["gn0"], _dense(enc["fc0"], emb, cdt)))
    x = _leaky(_group_norm(enc["gn1"], _dense(enc["fc1"], x, cdt)))
    pc_encoding = _dense(enc["fc2"], x, cdt)             # [B, 2048]

    # ---- q encoder + decoder ---------------------------------------------
    x = q_norm
    for i in range(4):
        x = _leaky(_dense(p[f"feature_encoder_{i}"], x, cdt))
    feature_encoding = _dense(p["feature_encoder_4"], x, cdt)

    x = jnp.concatenate([pc_encoding, feature_encoding], axis=-1)
    for i in range(3):
        x = _leaky(_dense(p[f"decoder_{i}"], x, cdt))
    return _dense(p["decoder_3"], x, cdt).astype(jnp.float32)


def make_fused_apply(
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    sa_npoints: tuple = (512, 128),
    sa_tiles: tuple = (16, 16),
    fps_tile: int = 128,
    bf16_cloud: bool = False,
    fps_impl: str = "v1",
    gather16: bool = False,
    sa_impl: str = "v8",
    fast_grouping: int = 0,
):
    """(variables, xyz, q) -> dq, matching the model.apply signature.

    Defaults are the r4 on-chip winners: the v8 SA kernel (hoisted gather
    table + MXU recentring bias; 319 vs 380 us/sample fwd at B=256), SA
    tiles 16, FPS batch-tile 128. ``fast_grouping=W`` enables the relaxed
    chunk-window SA0 (metric deltas in ONCHIP_EVIDENCE.json).
    """

    def apply(variables, point_cloud, q_norm):
        return fused_policy_apply(
            variables, point_cloud, q_norm,
            compute_dtype=compute_dtype, interpret=interpret,
            sa_npoints=sa_npoints, sa_tiles=sa_tiles, fps_tile=fps_tile,
            bf16_cloud=bf16_cloud, fps_impl=fps_impl, gather16=gather16,
            sa_impl=sa_impl, fast_grouping=fast_grouping,
        )

    return apply
