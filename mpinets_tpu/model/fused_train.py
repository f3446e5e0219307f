"""Differentiable fused policy forward: Pallas kernels with a custom VJP.

The Pallas FPS / set-abstraction kernels are inference-only (no AD rules),
so until now the train step ran the plain-XLA ``model.apply`` — whose
forward is dominated by exactly the machinery the backward pass does NOT
need: greedy FPS (511 sequential passes) and the ball-query first-k
selection. Both are *piecewise constant* in the parameters and the point
features: the selected indices only change at measure-zero decision
boundaries, so the true gradient flows solely through the gather → shared
MLP → max-pool chain.

This module exploits that structure (VERDICT r3 next-step #2):

* forward: the fused Pallas SA kernel (fast), which also returns the
  selected neighbor indices;
* backward: ``jax.vjp`` of a plain-XLA *reconstruction* of the stage given
  the saved indices — dense gathers + MLP matmuls + max-pool, no FPS, no
  ball query. Gradients w.r.t. ``features`` and the MLP weights are exact
  (same selected sets, same fill-with-first semantics: fills duplicate the
  first in-ball point and the count==0 fallback reproduces point 0, so the
  unmasked slot-max equals the kernel's masked max).

FPS centroids are wrapped in ``stop_gradient``: they are functions of the
input cloud only (never of parameters), so no parameter gradient ever flows
through them.

Replaces the training-time hot path of the reference's CUDA
``pointnet2_ops`` (``/root/reference/mpinets/model.py:364-383`` under
``training_step`` ``model.py:185-240``).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from mpinets_tpu.kernels import pallas_ops
from mpinets_tpu.model.fused import SA0, SA1, _mlp_params, xla_tail


def make_sa_stage_train(
    radius: float,
    nsample: int = 128,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    tile_s: int = 16,
    sa_impl: str = "v8",
    pad_chunks: bool = False,
    features_grad: bool = True,
):
    """Returns a differentiable ``sa(xyz, features, centroids, w..., b...)``
    whose primal runs the fused Pallas kernel and whose VJP recomputes the
    gather/MLP/max chain in XLA from the saved neighbor indices.

    ``features_grad=False`` skips the feature-input cotangent entirely —
    correct when the stage's features are data, as at SA0 where they are
    the segmentation labels.

    Backward design (r4d on-chip attribution): the naive saved-index
    recompute spent ~90% of the train step re-GATHERING neighbor rows
    through XLA and scattering feature cotangents back. The v8 kernel
    therefore exposes its already-gathered raw block as a third output;
    the backward is then pure dense MLP matmuls over that block (the valid
    mask is reconstructed from the index fills), and the feature cotangent
    rides ONE one-hot MXU matmul instead of an XLA scatter."""
    cdt = compute_dtype
    use_raw = sa_impl == "v8"

    def _kernel(xyz, features, centroids, w1, b1, w2, b2, w3, b3):
        return pallas_ops.sa_stage(
            xyz, features, centroids, w1, b1, w2, b2, w3, b3,
            radius=radius, nsample=nsample, compute_dtype=cdt,
            interpret=interpret, tile_s=tile_s, impl=sa_impl,
            pad_chunks=pad_chunks, centroids_in_cloud=True,
            return_raw=use_raw,
        )

    def _mlp_max(h, centroids, valid, w1, b1, w2, b2, w3, b3):
        """Dense MLP + masked max over slots; h: [B, S, ns, p] raw block
        (non-recentred; invalid slots are zero rows and masked out).
        Intermediate activations are stored in ``cdt`` exactly like the
        kernel does (halves the backward's residual HBM traffic)."""
        h = jnp.concatenate(
            [h[..., :3] - centroids[:, :, None, :], h[..., 3:]], axis=-1
        ).astype(cdt)
        for w, bias in ((w1, b1), (w2, b2)):
            h = jnp.maximum(
                (h @ w.astype(cdt)).astype(jnp.float32) + bias, 0.0
            ).astype(cdt)
        h = jnp.maximum(
            (h @ w3.astype(cdt)).astype(jnp.float32) + b3, 0.0
        )
        h = jnp.where(valid[..., None], h, -jnp.inf)
        return jnp.max(h, axis=2)                          # [B, S, C3]

    def _recompute(features, w1, b1, w2, b2, w3, b3, xyz, centroids, idx):
        """Gather-based fallback (non-v8 impls): stage value given the
        selected indices, fills included (duplicates never change a max)."""
        b = xyz.shape[0]
        flat = idx.reshape(b, -1)                          # [B, S*ns]
        gx = jnp.take_along_axis(xyz, flat[..., None], axis=1)
        gx = gx.reshape(idx.shape + (3,)) - centroids[:, :, None, :]
        gf = jnp.take_along_axis(features, flat[..., None], axis=1)
        gf = gf.reshape(idx.shape + (features.shape[-1],))
        h = jnp.concatenate([gx, gf], axis=-1)             # [B, S, ns, p]
        for w, bias in ((w1, b1), (w2, b2), (w3, b3)):
            h = jnp.maximum(
                (h.astype(cdt) @ w.astype(cdt)).astype(jnp.float32) + bias,
                0.0,
            )
        return jnp.max(h, axis=2)

    @jax.custom_vjp
    def sa(xyz, features, centroids, w1, b1, w2, b2, w3, b3):
        out = _kernel(xyz, features, centroids, w1, b1, w2, b2, w3, b3)
        return out[0]

    def fwd(xyz, features, centroids, w1, b1, w2, b2, w3, b3):
        out = _kernel(xyz, features, centroids, w1, b1, w2, b2, w3, b3)
        raw = out[2] if use_raw else None
        return out[0], (
            xyz, features, centroids, w1, b1, w2, b2, w3, b3, out[1], raw
        )

    def bwd(res, g):
        xyz, features, centroids, w1, b1, w2, b2, w3, b3, idx, raw = res
        if use_raw:
            # valid mask from the fill convention: real selected indices are
            # distinct, fills duplicate slot 0 (count >= 1 always, since
            # every centroid is a cloud member).
            slot0 = idx[..., :1]
            valid = jnp.concatenate(
                [jnp.ones_like(idx[..., :1], bool), idx[..., 1:] != slot0],
                axis=-1,
            )
            _, vjp = jax.vjp(
                lambda raw_, w1_, b1_, w2_, b2_, w3_, b3_: _mlp_max(
                    raw_, centroids, valid, w1_, b1_, w2_, b2_, w3_, b3_
                ),
                raw, w1, b1, w2, b2, w3, b3,
            )
            draw, gw1, gb1, gw2, gb2, gw3, gb3 = vjp(g)
            if features_grad:
                # draw: [B, S, ns, p] cotangent of the raw block
                c_feat = features.shape[-1]
                n = features.shape[1]
                b = features.shape[0]
                delta = (
                    draw[..., 3:] * valid[..., None]
                ).reshape(b, -1, c_feat)                   # [B, S*ns, C]
                # segment-sum as ONE one-hot MXU matmul (r4d: XLA scatter
                # ran at ~14 GB/s; this is a [n, S*ns] x [S*ns, C] einsum)
                onehot = (
                    idx.reshape(b, -1)[:, :, None]
                    == jnp.arange(n)[None, None, :]
                ).astype(cdt)
                gf = jnp.einsum(
                    "bkn,bkc->bnc", onehot, delta.astype(cdt),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
            else:
                gf = jnp.zeros_like(features)
        elif features_grad:
            _, vjp = jax.vjp(
                functools.partial(
                    _recompute, xyz=xyz, centroids=centroids, idx=idx
                ),
                features, w1, b1, w2, b2, w3, b3,
            )
            gf, gw1, gb1, gw2, gb2, gw3, gb3 = vjp(g)
        else:
            _, vjp = jax.vjp(
                functools.partial(
                    _recompute, features, xyz=xyz, centroids=centroids,
                    idx=idx,
                ),
                w1, b1, w2, b2, w3, b3,
            )
            gw1, gb1, gw2, gb2, gw3, gb3 = vjp(g)
            gf = jnp.zeros_like(features)
        return (
            jnp.zeros_like(xyz), gf, jnp.zeros_like(centroids),
            gw1, gb1, gw2, gb2, gw3, gb3,
        )

    sa.defvjp(fwd, bwd)
    return sa


@functools.partial(
    jax.jit,
    static_argnames=(
        "compute_dtype", "interpret", "sa_npoints", "sa_tiles", "fps_tile",
        "sa_impl",
    ),
)
def fused_policy_apply_train(
    variables: Any,
    point_cloud: jnp.ndarray,  # [B, N, 4]
    q_norm: jnp.ndarray,       # [B, 7]
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    sa_npoints: tuple = (512, 128),
    sa_tiles: tuple = (16, 16),
    fps_tile: int = 128,
    sa_impl: str = "v8",
) -> jnp.ndarray:
    """Differentiable twin of
    :func:`mpinets_tpu.model.fused.fused_policy_apply`: same value (fused
    Pallas forward), exact parameter gradients via the saved-index VJP."""
    p = variables["params"]
    enc = p["point_cloud_encoder"]
    cdt = compute_dtype

    xyz = point_cloud[..., :3]
    feat = point_cloud[..., 3:]

    # SA0's features input is the segmentation label column (pure data), so
    # its feature cotangent — the scatter-add over the full 6272-point cloud
    # — is never needed.
    sa0 = make_sa_stage_train(
        SA0["radius"], SA0["nsample"], cdt, interpret, sa_tiles[0], sa_impl,
        pad_chunks=sa_impl in ("v5", "v8"), features_grad=False,
    )
    sa1 = make_sa_stage_train(
        SA1["radius"], SA1["nsample"], cdt, interpret, sa_tiles[1], sa_impl,
    )

    (w1, b1), (w2, b2), (w3, b3) = _mlp_params(enc["sa0"]["mlp"])
    _, cent0 = pallas_ops.furthest_point_sample_with_coords(
        xyz, sa_npoints[0], interpret=interpret, batch_tile=fps_tile,
    )
    cent0 = jax.lax.stop_gradient(cent0)
    f0 = sa0(xyz, feat, cent0, w1, b1, w2, b2, w3, b3)

    (w1, b1), (w2, b2), (w3, b3) = _mlp_params(enc["sa1"]["mlp"])
    _, cent1 = pallas_ops.furthest_point_sample_with_coords(
        cent0, sa_npoints[1], interpret=interpret, batch_tile=fps_tile,
    )
    cent1 = jax.lax.stop_gradient(cent1)
    f1 = sa1(cent0, f0, cent1, w1, b1, w2, b2, w3, b3)

    return xla_tail(p, cent1, f1, q_norm, cdt)


def make_fused_train_apply(
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    sa_npoints: tuple = (512, 128),
    sa_tiles: tuple = (16, 16),
    fps_tile: int = 128,
    sa_impl: str = "v8",
):
    """(variables, point_cloud, q_norm) -> dq with exact parameter VJP."""

    def apply(variables, point_cloud, q_norm):
        return fused_policy_apply_train(
            variables, point_cloud, q_norm,
            compute_dtype=compute_dtype, interpret=interpret,
            sa_npoints=sa_npoints, sa_tiles=sa_tiles, fps_tile=fps_tile,
            sa_impl=sa_impl,
        )

    return apply
