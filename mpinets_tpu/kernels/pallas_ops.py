"""Pallas TPU kernels for the PointNet++ hot ops.

These are the performance path behind :mod:`mpinets_tpu.kernels.pointnet`
(the XLA-native formulations remain as the reference/CPU fallback and as the
oracle in tests). Reference CUDA semantics being replaced:
``pointnet2_ops`` furthest-point sampling and ball query used by
``/root/reference/mpinets/model.py:364-383``.

Why Pallas: the FPS greedy loop is 511 sequential [B, N] passes. In XLA each
iteration round-trips min-distance state and the point cloud through HBM
(~30 MB/iteration at B=256); here the whole loop runs out of VMEM -- the
point cloud is loaded once per batch tile and every pass is VPU-local.

Layout: coordinates are passed as three separate [B, N] planes so each block
is a natively tiled (sublane=batch, lane=point) array; N must be a multiple
of 128 (the reference cloud is 6272 = 49*128) and B a multiple of the batch
tile (padded by the wrapper).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BATCH_TILE = 8


def _fps_kernel(x_ref, y_ref, z_ref, out_ref, mind_ref, *, npoint: int):
    """Greedy FPS over one batch tile, fully VMEM-resident.

    x/y/z: [TB, N] f32; out: [TB, npoint] i32; mind: [TB, N] f32 scratch.
    """
    tb, n = x_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (tb, n), 1)

    out_ref[:, 0:1] = jnp.zeros((tb, 1), jnp.int32)
    mind_ref[:] = jnp.full((tb, n), jnp.inf, jnp.float32)

    def body(i, carry):
        cx, cy, cz = carry  # [TB, 1] coords of the last selected point
        d2 = (
            (x_ref[:] - cx) ** 2
            + (y_ref[:] - cy) ** 2
            + (z_ref[:] - cz) ** 2
        )
        md = jnp.minimum(mind_ref[:], d2)
        mind_ref[:] = md
        m = jnp.max(md, axis=1, keepdims=True)
        # argmax with lowest-index tie-breaking (matches jnp.argmax and the
        # CUDA reduction used by pointnet2_ops).
        sel = md == m
        nxt = jnp.min(jnp.where(sel, lane, n), axis=1, keepdims=True)
        out_ref[:, pl.ds(i, 1)] = nxt
        pick = lane == nxt
        zero = jnp.zeros_like(x_ref[:])
        cx = jnp.sum(jnp.where(pick, x_ref[:], zero), axis=1, keepdims=True)
        cy = jnp.sum(jnp.where(pick, y_ref[:], zero), axis=1, keepdims=True)
        cz = jnp.sum(jnp.where(pick, z_ref[:], zero), axis=1, keepdims=True)
        return cx, cy, cz

    init = (x_ref[:, 0:1], y_ref[:, 0:1], z_ref[:, 0:1])
    jax.lax.fori_loop(1, npoint, body, init)


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def furthest_point_sample(
    xyz: jnp.ndarray, npoint: int, interpret: bool = False
) -> jnp.ndarray:
    """Pallas FPS: [B, N, 3] -> int32 [B, npoint].

    Semantically identical to
    :func:`mpinets_tpu.kernels.pointnet.furthest_point_sample` (slot 0 is
    index 0; greedy max-min-distance selection; first-index tie-breaking).
    """
    b, n, _ = xyz.shape
    tb = _BATCH_TILE
    pad_b = (-b) % tb
    pad_n = (-n) % 128
    x = jnp.pad(xyz[..., 0], ((0, pad_b), (0, pad_n))).astype(jnp.float32)
    y = jnp.pad(xyz[..., 1], ((0, pad_b), (0, pad_n))).astype(jnp.float32)
    z = jnp.pad(xyz[..., 2], ((0, pad_b), (0, pad_n)))
    # Padded lanes are made to coincide with point 0 (d2 = 0 to the selected
    # set forever, so they are never the argmax while any real point remains).
    if pad_n:
        lane_pad = jnp.arange(n + pad_n) >= n
        x = jnp.where(lane_pad, x[:, :1], x)
        y = jnp.where(lane_pad, y[:, :1], y)
        z = jnp.where(lane_pad, z[:, :1], z)

    bp, np_ = x.shape
    grid = (bp // tb,)
    kernel = functools.partial(_fps_kernel, npoint=npoint)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, np_), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, np_), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, np_), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tb, npoint), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bp, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((tb, np_), jnp.float32)],
        interpret=interpret,
    )(x, y, z)
    return out[:b]
