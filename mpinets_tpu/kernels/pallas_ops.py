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


def _fps_kernel(
    x_ref, y_ref, z_ref, out_ref, ox_ref, oy_ref, oz_ref, mind_ref,
    *, npoint: int,
):
    """Greedy FPS over one batch tile, fully VMEM-resident.

    x/y/z: [TB, N] f32; out: [TB, npoint] i32 (+ selected coords per slot);
    mind: [TB, N] f32 scratch.
    """
    tb, n = x_ref.shape
    npad = out_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tb, n), 1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (tb, npad), 1)

    mind_ref[:] = jnp.full((tb, n), jnp.inf, jnp.float32)

    f32 = jnp.float32

    def body(i, carry):
        cx, cy, cz, buf, bx, by, bz = carry
        # Coordinates may be bf16 (bench mode: halves the per-iteration VMEM
        # traffic, which is the kernel's floor); min-distance state and the
        # selection compare stay f32.
        x = x_ref[:].astype(f32)
        y = y_ref[:].astype(f32)
        z = z_ref[:].astype(f32)
        d2 = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        md = jnp.minimum(mind_ref[:], d2)
        mind_ref[:] = md
        m = jnp.max(md, axis=1, keepdims=True)
        # argmax with lowest-index tie-breaking (matches jnp.argmax and the
        # CUDA reduction used by pointnet2_ops).
        sel = md == m
        nxt = jnp.min(jnp.where(sel, lane, n), axis=1, keepdims=True)
        pick = lane == nxt
        zero = jnp.zeros_like(x)
        cx = jnp.sum(jnp.where(pick, x, zero), axis=1, keepdims=True)
        cy = jnp.sum(jnp.where(pick, y, zero), axis=1, keepdims=True)
        cz = jnp.sum(jnp.where(pick, z, zero), axis=1, keepdims=True)
        # Dynamic single-lane stores are not expressible in Mosaic; keep the
        # outputs in the carry via masked merges, written once at the end.
        at = slot == i
        buf = jnp.where(at, nxt, buf)
        bx = jnp.where(at, cx, bx)
        by = jnp.where(at, cy, by)
        bz = jnp.where(at, cz, bz)
        return cx, cy, cz, buf, bx, by, bz

    x0 = x_ref[:, 0:1].astype(f32)
    y0 = y_ref[:, 0:1].astype(f32)
    z0 = z_ref[:, 0:1].astype(f32)
    init = (
        x0, y0, z0,
        jnp.zeros((tb, npad), jnp.int32),
        jnp.broadcast_to(x0, (tb, npad)) * (slot == 0),
        jnp.broadcast_to(y0, (tb, npad)) * (slot == 0),
        jnp.broadcast_to(z0, (tb, npad)) * (slot == 0),
    )
    _, _, _, buf, bx, by, bz = jax.lax.fori_loop(1, npoint, body, init)
    out_ref[:] = buf
    ox_ref[:] = bx
    oy_ref[:] = by
    oz_ref[:] = bz


def _fps_kernel_v2(
    x_ref, y_ref, z_ref, out_ref, ox_ref, oy_ref, oz_ref, mind_ref,
    *, npoint: int,
):
    """FPS v2: transposed outputs ([npoint, TB]) written by dynamic sublane
    stores each iteration instead of v1's four [TB, npoint] masked-merge
    carries, and argmax via a single fused value reduction (jnp.argmax's
    first-index tie-breaking matches the CUDA kernel and the oracle).

    Cuts ~1/3 of v1's per-iteration VPU work; selection semantics identical.
    """
    tb, n = x_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (tb, n), 1)
    mind_ref[:] = jnp.full((tb, n), jnp.inf, jnp.float32)
    f32 = jnp.float32

    x0 = x_ref[:, 0:1].astype(f32)
    y0 = y_ref[:, 0:1].astype(f32)
    z0 = z_ref[:, 0:1].astype(f32)
    out_ref[0, 0:1, :] = jnp.zeros((1, tb), jnp.int32)
    ox_ref[0, 0:1, :] = x0.reshape(1, tb)
    oy_ref[0, 0:1, :] = y0.reshape(1, tb)
    oz_ref[0, 0:1, :] = z0.reshape(1, tb)

    def body(i, carry):
        cx, cy, cz = carry
        x = x_ref[:].astype(f32)
        y = y_ref[:].astype(f32)
        z = z_ref[:].astype(f32)
        d2 = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        md = jnp.minimum(mind_ref[:], d2)
        mind_ref[:] = md
        nxt = jnp.argmax(md, axis=1)[:, None]            # [tb, 1] first-max
        pick = lane == nxt
        zero = jnp.zeros_like(x)
        cx = jnp.sum(jnp.where(pick, x, zero), axis=1, keepdims=True)
        cy = jnp.sum(jnp.where(pick, y, zero), axis=1, keepdims=True)
        cz = jnp.sum(jnp.where(pick, z, zero), axis=1, keepdims=True)
        out_ref[0, pl.ds(i, 1), :] = nxt.reshape(1, tb)
        ox_ref[0, pl.ds(i, 1), :] = cx.reshape(1, tb)
        oy_ref[0, pl.ds(i, 1), :] = cy.reshape(1, tb)
        oz_ref[0, pl.ds(i, 1), :] = cz.reshape(1, tb)
        return cx, cy, cz

    jax.lax.fori_loop(1, npoint, body, (x0, y0, z0))


@functools.partial(
    jax.jit, static_argnames=("npoint", "interpret", "batch_tile", "impl")
)
def furthest_point_sample_with_coords(
    xyz: jnp.ndarray, npoint: int, interpret: bool = False,
    batch_tile: int = _BATCH_TILE, impl: str = "v1",
):
    """Pallas FPS: [B, N, 3] -> (idx int32 [B, npoint], coords [B, npoint, 3]).

    Semantically identical to
    :func:`mpinets_tpu.kernels.pointnet.furthest_point_sample` (slot 0 is
    index 0; greedy max-min-distance selection; first-index tie-breaking),
    additionally returning the selected points' coordinates so callers avoid
    a separate (slow) XLA gather.
    """
    b, n, _ = xyz.shape
    tb = batch_tile
    pad_b = (-b) % tb
    pad_n = (-n) % 128
    x = jnp.pad(xyz[..., 0], ((0, pad_b), (0, pad_n)))
    y = jnp.pad(xyz[..., 1], ((0, pad_b), (0, pad_n)))
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
    spec = pl.BlockSpec((tb, np_), lambda i: (i, 0), memory_space=pltpu.VMEM)
    if impl == "v2":
        g = bp // tb
        out_spec = pl.BlockSpec(
            (1, npoint, tb), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        shp = lambda dt: jax.ShapeDtypeStruct((g, npoint, tb), dt)
        idx, ox, oy, oz = pl.pallas_call(
            functools.partial(_fps_kernel_v2, npoint=npoint),
            grid=grid,
            in_specs=[spec, spec, spec],
            out_specs=(out_spec, out_spec, out_spec, out_spec),
            out_shape=(
                shp(jnp.int32), shp(jnp.float32), shp(jnp.float32),
                shp(jnp.float32),
            ),
            scratch_shapes=[pltpu.VMEM((tb, np_), jnp.float32)],
            interpret=interpret,
        )(x, y, z)
        untile = lambda a: jnp.swapaxes(a, 1, 2).reshape(bp, npoint)[:b]
        coords = jnp.stack(
            [untile(ox), untile(oy), untile(oz)], axis=-1
        ).astype(xyz.dtype)
        return untile(idx), coords

    kernel = functools.partial(_fps_kernel, npoint=npoint)
    out_spec = pl.BlockSpec(
        (tb, npoint), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    idx, ox, oy, oz = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((bp, npoint), jnp.int32),
            jax.ShapeDtypeStruct((bp, npoint), jnp.float32),
            jax.ShapeDtypeStruct((bp, npoint), jnp.float32),
            jax.ShapeDtypeStruct((bp, npoint), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((tb, np_), jnp.float32)],
        interpret=interpret,
    )(x, y, z)
    coords = jnp.stack([ox[:b], oy[:b], oz[:b]], axis=-1).astype(xyz.dtype)
    return idx[:b], coords


def furthest_point_sample(
    xyz: jnp.ndarray, npoint: int, interpret: bool = False
) -> jnp.ndarray:
    """Pallas FPS indices only (see furthest_point_sample_with_coords)."""
    return furthest_point_sample_with_coords(xyz, npoint, interpret)[0]


# ---------------------------------------------------------------------------
# Fused set-abstraction stage: ball query + first-k selection + grouping +
# shared-MLP + max-pool, entirely VMEM-resident.
# ---------------------------------------------------------------------------
#
# Replaces the reference's ball_query + grouping CUDA kernels plus the
# grouped SharedMLP (``pointnet2_ops``, used at
# ``/root/reference/mpinets/model.py:364-383``). The [B, S, ns, C] grouped
# tensor never exists in HBM, and neither the indices nor the gathered data
# ever round-trip through XLA's (catastrophically slow) gather/sort paths.
#
# Mosaic's dynamic_gather only works within ONE vreg along the gathered
# dimension (lane gathers: tables <= 128 lanes wide, any number of rows), so
# the whole stage is built from per-chunk-row lane permutations:
#
# * points are split into nc = N/128 "chunks" of 128 lanes; an in-ball mask
#   per (centroid, chunk) row gives per-chunk inclusive counts via ONE
#   matmul with a lower-triangular constant (MXU) and chunk offsets via a
#   block-masked Hillis-Steele prefix scan -> cnt_global [TS*nc, 128],
#   monotone per row.
# * For every (chunk-row r, output slot j): the lane holding the point with
#   global in-ball rank j+1 is #{l : cnt_global[r, l] <= j} -- found for all
#   (r, j) at once with a 8-round lane-gather binary search.
# * Raw channels (xyz + features) are then pulled with one lane-gather per
#   (centroid, channel, chunk) row, masked to the slot range
#   [base_excl[r], base_incl[r]) each chunk owns, and merged by a sum over
#   the nc chunk rows -- slots are owned by exactly one chunk, so the sum IS
#   the select. The CUDA fill-with-first semantics reduce to masking invalid
#   slots out of the max-pool (duplicates never change a max) plus the
#   count==0 point-0 special case.
# * MLP layer 1 runs in-kernel on the gathered raw block [TS*ns, 3+C]
#   (recentred xyz via per-centroid scalars), then layers 2..3 and the
#   neighborhood max-pool -- all MXU matmuls on VMEM-resident data.

_TS = 8  # centroids per grid step


def _sa_kernel(
    pts_ref,     # [1, P*NC, 128] channel planes (x, y, z, feat...) chunked
    cx_ref,      # [1, 1, S] centroid coords (SMEM scalars)
    cy_ref,
    cz_ref,
    w1_ref,      # [P8, C1] (P padded to sublane multiple)
    b1_ref,      # [1, C1]
    w2_ref,      # [C1, C2]
    b2_ref,      # [1, C2]
    w3_ref,      # [C2, C3]
    b3_ref,      # [1, C3]
    lt_ref,      # [128, 128] lower-triangular ones (bf16)
    out_ref,     # [1, TS, C3]
    idx_ref,     # [1, TS, ns] selected indices (int32)
    *,
    radius: float,
    nsample: int,
    num_chunks: int,
    num_planes: int,
    compute_dtype,
    tile_s: int = _TS,
    gather16: bool = False,
):
    ts = tile_s
    nc = num_chunks
    ns = nsample
    p = num_planes        # 3 + C raw channels
    rb = ts * nc          # chunk-rows in the tile
    f32 = jnp.float32

    cxs = [cx_ref[0, g, 0] for g in range(ts)]
    cys = [cy_ref[0, g, 0] for g in range(ts)]
    czs = [cz_ref[0, g, 0] for g in range(ts)]

    planes = pts_ref[0]                     # [p*nc, 128]
    x = planes[0 * nc : 1 * nc].astype(f32)  # [nc, 128]
    y = planes[1 * nc : 2 * nc].astype(f32)
    z = planes[2 * nc : 3 * nc].astype(f32)

    # ---- 1. squared distances + in-ball mask, [rb, 128] -------------------
    parts = []
    for g in range(ts):
        dx = x - cxs[g]
        dy = y - cys[g]
        dz = z - czs[g]
        parts.append(dx * dx + dy * dy + dz * dz)
    d2 = jnp.concatenate(parts, axis=0)                  # [rb, 128]
    in_ball = (d2 < radius * radius).astype(jnp.bfloat16)

    # ---- 2. inclusive counts: per-chunk (MXU) + chunk offsets -------------
    # Chunk offsets via a block-masked Hillis-Steele prefix scan over the
    # sublane dimension of the [rb, 1] per-chunk totals (log2(nc) shift+add
    # rounds). v4: replaces the [rb, rb] block-diagonal matvec, whose rb^2
    # constant (9.8 MB at ts=32, 39 MB at ts=64) was streamed from VMEM
    # every grid step and capped the centroid tile size; Mosaic cannot
    # shape-cast [rb, 1] <-> [ts, nc], so the scan stays in the rb domain.
    local_cnt = jnp.dot(
        in_ball, lt_ref[:], preferred_element_type=f32,
        precision=jax.lax.Precision.DEFAULT,
    )                                                    # [rb, 128]
    tot = local_cnt[:, 127:128]                          # [rb, 1]
    pos_ib = jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0) % nc
    # Shifts via tpu.roll (wrapped rows land only where the block mask is 0,
    # because rb % nc == 0); Mosaic cannot concatenate offset-layout slices.
    psum = tot                                           # within-block incl.
    step = 1
    while step < nc:
        shifted = pltpu.roll(psum, step, 0)
        psum = psum + jnp.where(pos_ib >= step, shifted, 0.0)
        step *= 2
    base_excl = psum - tot
    base_incl = psum
    cnt = local_cnt + base_excl                          # [rb, 128] monotone

    # ---- 3. slot inversion: lane of rank j+1 per (chunk-row, slot) --------
    # pos[r, j] = #{l : cnt[r, l] <= j}; 7-round binary search, all slots at
    # once (j = lane). Mosaic's dynamic_gather requires index and data
    # bitwidths to MATCH, so the default search gathers f32 cnt with i32
    # probes; gather16=True uses bf16 cnt with i16 probes (same 16-bit
    # width — halves the lane-gather vreg traffic, which dominates this
    # kernel). bf16 correctness invariant: probes only ever compare against
    # j <= 127; cnt values <= 256 are bf16-exact and values > 256 round but
    # stay > 127, so every `gathered <= j` compare is exact. Slots with
    # j >= count are garbage here and masked by `valid` below, so no
    # 128-step round or overflow guard is needed (steps sum to 127, lo
    # stays in [0, 127]).
    assert ns == 128, "bf16 slot-inversion invariant assumes nsample == 128"
    jlane = jax.lax.broadcasted_iota(jnp.int32, (rb, 128), 1)
    jf = jlane.astype(f32)
    if gather16:
        jcmp = jlane.astype(jnp.bfloat16)
        cnt_g = cnt.astype(jnp.bfloat16)
        idx_dtype = jnp.int16
    else:
        jcmp = jf
        cnt_g = cnt
        idx_dtype = jnp.int32
    lo = jnp.zeros((rb, 128), jnp.int32)
    for step in (64, 32, 16, 8, 4, 2, 1):
        probe = (lo + (step - 1)).astype(idx_dtype)
        gathered = jnp.take_along_axis(cnt_g, probe, axis=1)
        lo = jnp.where(gathered <= jcmp, lo + step, lo)
    pos = lo                                             # [rb, 128]

    # ---- 4. per-chunk slot ownership masks ---------------------------------
    valid = (jf >= base_excl) & (jf < base_incl)         # [rb, 128]
    validf = valid.astype(jnp.bfloat16 if gather16 else f32)

    # merged indices [ts, 128]: sum over each centroid's nc chunk rows
    chunk_of = jax.lax.broadcasted_iota(jnp.int32, (rb, 128), 0) % nc
    sel_contrib = (chunk_of * 128 + pos) * valid.astype(jnp.int32)
    merged_idx = jnp.sum(sel_contrib.reshape(ts, nc, 128), axis=1)

    # per-centroid totals [ts, 1] (first-chunk rows of psum are chunk-0
    # counts, so sum the per-chunk tot instead: sum over the nc sublanes).
    totals = jnp.sum(tot.reshape(ts, nc, 1), axis=1)     # [ts, 1]

    # ---- 5-7. per centroid: gather channels, merge, layer-1 matmul ---------
    # Recentring is folded into layer 1 algebraically:
    # [xyz - c, feat] @ W1 = [xyz, feat] @ W1 - c . W1[:3], so the kernel
    # subtracts B_g = c . W1[:3] per centroid after the matmul instead of
    # editing gathered columns. The gather table is `planes` itself (no
    # copies); the channel repetition of idx/mask is a lazy broadcast.
    cdt = compute_dtype
    w1 = w1_ref[:p].astype(cdt)
    w1f = w1_ref[:p].astype(f32)
    c1 = w1.shape[-1]
    j128 = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    slot0 = j128 == 0
    pts0 = [planes[ch * nc, 0].astype(f32) for ch in range(p)]
    # Channel gathers obey the same Mosaic bitwidth rule: by default the
    # table is f32 (upcast once if the input planes are bf16) with i32
    # indices; gather16=True gathers pre-cast bf16 planes with i16 indices.
    # Pre-cast-then-gather is bitwise identical to gather-then-cast here
    # because the gathered block feeds a bf16 matmul either way.
    if gather16:
        planes_g = planes.astype(jnp.bfloat16)
    else:
        planes_g = planes.astype(f32)

    # Gather/merge per centroid (vector ops, cheap), but run MLP layer 1 as
    # ONE batched matmul over all ts*ns slot rows: on-chip ablation showed
    # per-tile cost is dominated by small-matmul launch latency (~1-2 us
    # each), so per-centroid [ns, p] matmuls are the enemy.
    raw_blocks = []
    brep_blocks = []
    fix_blocks = []
    vmask_parts = []
    for g in range(ts):
        pos_g = pos[g * nc : (g + 1) * nc].astype(idx_dtype)  # [nc, 128]
        val_g = validf[g * nc : (g + 1) * nc]
        gidx = jnp.broadcast_to(pos_g, (p, nc, 128)).reshape(p * nc, 128)
        gmask = jnp.broadcast_to(val_g, (p, nc, 128)).reshape(p * nc, 128)
        gat = jnp.take_along_axis(planes_g, gidx, axis=1) * gmask
        # Exactly one chunk owns each slot, so the chunk-sum is a select --
        # exact in any dtype (all other addends are zero).
        merged_g = jnp.sum(gat.reshape(p, nc, 128), axis=1)  # [p, 128]
        raw_blocks.append(jnp.transpose(merged_g))        # [128 slots, p]

        b_g = (
            cxs[g] * w1f[0:1] + cys[g] * w1f[1:2] + czs[g] * w1f[2:3]
        )                                                 # [1, c1]
        brep_blocks.append(jnp.broadcast_to(b_g, (ns, c1)))
        # count == 0: CUDA leaves index 0 everywhere -> point 0's layer-1 row
        # (only slot 0 survives the valid mask, so fixing it is sufficient).
        h0 = b1_ref[:].astype(f32) - b_g
        for ch in range(p):
            h0 = h0 + pts0[ch] * w1f[ch : ch + 1]
        tg = totals[g, 0]
        fix_blocks.append(
            jnp.where(
                (tg < 0.5) & slot0,
                jnp.broadcast_to(h0, (ns, c1)),
                jnp.nan,
            )
        )
        vmask_parts.append(j128 < jnp.maximum(tg, 1.0).astype(jnp.int32))
    raw_all = jnp.concatenate(raw_blocks, axis=0)         # [ts*ns, p]
    b_rep = jnp.concatenate(brep_blocks, axis=0)          # [ts*ns, c1]
    fix = jnp.concatenate(fix_blocks, axis=0)             # [ts*ns, c1]
    vmask = jnp.concatenate(vmask_parts, axis=0)          # [ts*ns, 1]

    # f32 mode: request HIGHEST precision -- Mosaic otherwise runs "f32" MXU
    # matmuls in bf16 passes (measured 4-7e-3 on-chip parity error, r3b).
    prec = (
        jax.lax.Precision.HIGHEST if cdt == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    h1 = (
        jnp.dot(raw_all.astype(cdt), w1, preferred_element_type=f32,
                precision=prec)
        + b1_ref[:].astype(f32)
        - b_rep
    )
    if fix is not None:
        h1 = jnp.where(jnp.isnan(fix), h1, fix)
    h = jnp.maximum(h1, 0).astype(cdt)
    h = jnp.maximum(
        jnp.dot(h, w2_ref[:].astype(cdt), preferred_element_type=f32,
                precision=prec)
        + b2_ref[:].astype(f32),
        0,
    ).astype(cdt)
    h = jnp.maximum(
        jnp.dot(h, w3_ref[:].astype(cdt), preferred_element_type=f32,
                precision=prec)
        + b3_ref[:].astype(f32),
        0,
    )                                                     # [ts*ns, c3] f32
    h = jnp.where(vmask, h, -jnp.inf)
    c3 = h.shape[-1]
    out_ref[0] = jnp.max(h.reshape(ts, ns, c3), axis=1).astype(out_ref.dtype)

    # ---- 8. reference fill-with-first on the index output ------------------
    fill = jnp.where(totals >= 1.0, merged_idx[:, 0:1], 0)
    kj = jax.lax.broadcasted_iota(jnp.int32, (ts, ns), 1)
    idx_ref[0] = jnp.where(kj.astype(f32) < totals, merged_idx, fill)


def _sa_kernel_v5(
    pts_ref,     # [1, P*NC, 128] channel planes (x, y, z, feat...) chunked
    cx_ref,      # [1, TS, 1] centroid coords (as in v3)
    cy_ref,
    cz_ref,
    w1t_ref,     # [C1, P8] transposed layer weights
    b1t_ref,     # [C1, 1]
    w2t_ref,     # [C2, C1]
    b2t_ref,     # [C2, 1]
    w3t_ref,     # [C3, C2]
    b3t_ref,     # [C3, 1]
    lt_ref,      # [128, 128] lower-triangular ones (bf16)
    bd_ref,      # [RB, RB] strictly-lower block-diagonal ones (bf16)
    out_ref,     # [1, TS, C3]
    idx_ref,     # [1, TS, ns] selected indices (int32)
    *,
    radius: float,
    nsample: int,
    num_chunks: int,
    num_planes: int,
    compute_dtype,
    tile_s: int,
    debug_stop: int = 0,
    centroids_in_cloud: bool = False,
):
    """Lane-layout SA kernel (v5).

    Differences vs :func:`_sa_kernel` (v3), same semantics:

    * Slots live in LANES for the whole MLP: per-centroid merged blocks
      [p, 128] are lane-concatenated into ``raw_lanes [p, ts*128]`` and the
      MLP runs transposed (``W^T @ X``), eliminating v3's per-centroid
      [p,128]->[128,p] transposes, sublane-concat relayouts, and the skinny
      [ts*ns, p] layer-1 matmul.
    * Per-centroid columns (recentring bias, count fix, valid mask) are
      built as [*, 128] lane blocks from the already-extracted centroid
      scalars and lane-concatenated alongside the data.
    * Binary-search rounds probing 1-2 distinct columns use static slices +
      selects instead of dynamic gathers (the probe of round k ranges over
      2^(k-1) values), cutting the dominant gather traffic by 2/7.
    * ``in_ball`` is computed chunk-wise in bf16 without materializing an
      f32 d2 array.
    * When ``compute_dtype`` is f32, value-path matmuls request
      ``Precision.HIGHEST`` — Mosaic otherwise runs "f32" MXU matmuls in
      bf16 passes, which broke on-chip parity at ~5e-3 (r3b measurement).
    """
    ts = tile_s
    nc = num_chunks
    ns = nsample
    p = num_planes
    rb = ts * nc
    f32 = jnp.float32
    cdt = compute_dtype
    prec = (
        jax.lax.Precision.HIGHEST if cdt == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    cxs = [cx_ref[0, g, 0] for g in range(ts)]
    cys = [cy_ref[0, g, 0] for g in range(ts)]
    czs = [cz_ref[0, g, 0] for g in range(ts)]

    planes = pts_ref[0]                     # [p*nc, 128]
    x = planes[0 * nc : 1 * nc].astype(f32)
    y = planes[1 * nc : 2 * nc].astype(f32)
    z = planes[2 * nc : 3 * nc].astype(f32)

    # ---- 1. in-ball mask per chunk-row, [rb, 128] bf16 --------------------
    r2 = radius * radius
    parts = []
    for g in range(ts):
        dx = x - cxs[g]
        dy = y - cys[g]
        dz = z - czs[g]
        parts.append((dx * dx + dy * dy + dz * dz < r2).astype(jnp.bfloat16))
    in_ball = jnp.concatenate(parts, axis=0)             # [rb, 128]

    # ---- 2. inclusive counts + chunk offsets, all on the MXU --------------
    # The r3 narrow [rb,1] roll-scan cost 81 us/sample (pltpu.roll carries a
    # large per-op overhead); two matmuls replace it: tot broadcast over
    # lanes via an all-ones matmul, then base_excl via the strictly-lower
    # block-diagonal constant. All products are exact (0/1 weights, counts
    # <= 128 are bf16-exact, f32 accumulation).
    local_cnt = jnp.dot(in_ball, lt_ref[:], preferred_element_type=f32,
                        precision=jax.lax.Precision.DEFAULT)
    ones128 = (lt_ref[:] * 0 + 1).astype(jnp.bfloat16)
    tot_b = jnp.dot(
        in_ball, ones128, preferred_element_type=f32,
        precision=jax.lax.Precision.DEFAULT,
    )                                                    # [rb, 128] = tot
    base_b = jnp.dot(
        bd_ref[:], tot_b.astype(jnp.bfloat16), preferred_element_type=f32,
        precision=jax.lax.Precision.DEFAULT,
    )                                                    # [rb, 128] = base_excl
    tot = tot_b[:, 0:1]                                  # [rb, 1]
    base_excl = base_b[:, 0:1]
    base_incl = base_excl + tot
    cnt = local_cnt + base_b                             # [rb, 128] monotone

    # ---- 3. slot inversion: rounds 1-2 by slice-select, 3-7 by gather -----
    # Rounds 1-2 probe 1-2 static columns (free slices); deeper select
    # trees were MEASURED SLOWER than the gathers they replace (r3h: the
    # round-3/4 trees cost +63 us/sample vs 5 plain gather rounds).
    jlane = jax.lax.broadcasted_iota(jnp.int32, (rb, 128), 1)
    jf = jlane.astype(f32)
    col = lambda v: cnt[:, v : v + 1]
    lo = jnp.where(col(63) <= jf, 64, 0)
    g2 = jnp.where(lo > 0, col(95), col(31))
    lo = jnp.where(g2 <= jf, lo + 32, lo)
    for step in (16, 8, 4, 2, 1):
        probe = lo + (step - 1)
        gathered = jnp.take_along_axis(cnt, probe, axis=1)
        lo = jnp.where(gathered <= jf, lo + step, lo)
    pos = lo                                             # [rb, 128]

    # ---- 4. ownership masks + merged indices ------------------------------
    valid = (jf >= base_excl) & (jf < base_incl)
    validf = valid.astype(f32)
    chunk_of = jax.lax.broadcasted_iota(jnp.int32, (rb, 128), 0) % nc
    sel_contrib = (chunk_of * 128 + pos) * valid.astype(jnp.int32)
    merged_idx = jnp.sum(sel_contrib.reshape(ts, nc, 128), axis=1)  # [ts,128]
    totals = jnp.sum(tot.reshape(ts, nc, 1), axis=1)     # [ts, 1]

    c3_out = out_ref.shape[2]

    def _dbg_out(val):
        out_ref[0] = jnp.broadcast_to(
            jnp.sum(val).reshape(1, 1), (ts, c3_out)
        ).astype(out_ref.dtype)
        idx_ref[0] = merged_idx[:, :ns]

    if debug_stop == 4:  # stages 1-4 (counts, search, masks, indices)
        _dbg_out(pos.astype(f32) + validf)
        return

    # ---- 5. channel gather: ONE batched take_along_axis per grid step -----
    # r3d measurement: tpu.dynamic_gather carries ~0.5-1.7 us of fixed
    # overhead PER OP -- v3/v5's per-centroid gathers (512 ops/sample at
    # SA0) were ~850 us of pure op overhead. One big gather over a tiled
    # table amortizes it to ~16 ops/sample.
    # Row order (g, ch, k): the table is ts stacked copies of the planes,
    # indices/masks repeat each centroid's chunk rows p times. Everything is
    # built from 2D concats and consumed via 3D major-split reshape-sums —
    # the 4D broadcast_to/reshape formulation lowered into ~500 us/sample of
    # Mosaic relayouts (r3f ablation).
    planes_g = planes.astype(f32)
    table = jnp.concatenate([planes_g] * ts, axis=0)     # [ts*p*nc, 128]
    rep_idx, rep_mask = [], []
    for g in range(ts):
        pg = pos[g * nc : (g + 1) * nc]
        vg = validf[g * nc : (g + 1) * nc]
        rep_idx.extend([pg] * p)
        rep_mask.extend([vg] * p)
    gidx = jnp.concatenate(rep_idx, axis=0)              # [ts*p*nc, 128]
    gmask = jnp.concatenate(rep_mask, axis=0)
    gat = jnp.take_along_axis(table, gidx, axis=1) * gmask
    merged = jnp.sum(
        gat.reshape(ts * p, nc, 128), axis=1
    )                                                    # [(g,ch), 128]
    if debug_stop == 5:  # + batched channel gather/merge
        _dbg_out(merged)
        return
    raw_lanes = jnp.concatenate(
        [merged[g * p : (g + 1) * p] for g in range(ts)], axis=1
    )                                                    # [p, ts*128]
    if debug_stop == 55:  # + lane-concat
        _dbg_out(raw_lanes)
        return

    # ---- 6. per-centroid lane columns (recentre bias, fix, valid) ---------
    w1t = w1t_ref[:, :p].astype(cdt)
    w1tf = w1t_ref[:, :p].astype(f32)
    c1 = w1t.shape[0]
    slot128 = jax.lax.broadcasted_iota(jnp.int32, (1, ns), 1)
    bc_blocks, fix_blocks, vmask_blocks = [], [], []
    if not centroids_in_cloud:
        pts0 = [planes[ch * nc, 0].astype(f32) for ch in range(p)]
        h0_base = b1t_ref[:].astype(f32)                 # [c1, 1]
        for ch in range(p):
            h0_base = h0_base + pts0[ch] * w1tf[:, ch : ch + 1]
    for g in range(ts):
        bg = (
            cxs[g] * w1tf[:, 0:1]
            + cys[g] * w1tf[:, 1:2]
            + czs[g] * w1tf[:, 2:3]
        )                                                # [c1, 1]
        bc_blocks.append(jnp.broadcast_to(bg, (c1, ns)))
        tg = totals[g, 0]
        if not centroids_in_cloud:
            # count == 0: slot 0 takes point-0's layer-1 row (h0_base - bg)
            fix_blocks.append(
                jnp.where(
                    (tg < 0.5) & (slot128 == 0),
                    jnp.broadcast_to(h0_base - bg, (c1, ns)),
                    jnp.nan,
                )
            )
        vmask_blocks.append(
            slot128.astype(f32) < jnp.maximum(tg, 1.0)
        )
    bc_lanes = jnp.concatenate(bc_blocks, axis=1)        # [c1, ts*128]
    # ``centroids_in_cloud=True`` (static): every real centroid is a member
    # of the point cloud, so its own point is always in-ball and the CUDA
    # count==0 fallback can never fire for live rows (padded sentinel
    # centroids are sliced off by the wrapper) -- skip the fix machinery.
    fix = (
        None if centroids_in_cloud
        else jnp.concatenate(fix_blocks, axis=1)         # [c1, ts*128]
    )
    vmask = jnp.concatenate(vmask_blocks, axis=1)        # [1, ts*128]
    if debug_stop == 6:  # + per-centroid bc/fix/vmask lane columns
        _dbg_out(bc_lanes + fix + vmask.astype(f32) + raw_lanes[0:1])
        return

    # ---- 7. transposed MLP + masked lane-window max-pool ------------------
    h1 = (
        jnp.dot(
            w1t, raw_lanes.astype(cdt),
            preferred_element_type=f32, precision=prec,
        )
        + b1t_ref[:].astype(f32)
        - bc_lanes
    )
    if fix is not None:
        h1 = jnp.where(jnp.isnan(fix), h1, fix)
    h = jnp.maximum(h1, 0).astype(cdt)
    h = jnp.maximum(
        jnp.dot(
            w2t_ref[:].astype(cdt), h,
            preferred_element_type=f32, precision=prec,
        )
        + b2t_ref[:].astype(f32),
        0,
    ).astype(cdt)
    h = jnp.maximum(
        jnp.dot(
            w3t_ref[:].astype(cdt), h,
            preferred_element_type=f32, precision=prec,
        )
        + b3t_ref[:].astype(f32),
        0,
    )                                                    # [c3, ts*128] f32
    if debug_stop == 7:  # + the three MLP matmuls
        _dbg_out(h)
        return
    h = jnp.where(vmask, h, -jnp.inf)
    pools = [
        jnp.max(h[:, g * ns : (g + 1) * ns], axis=1, keepdims=True)
        for g in range(ts)
    ]
    # ONE [c3, ts] -> [ts, c3] transpose per grid step (vs v3's ts of them);
    # Mosaic rejects a (1, c3, ts) output block (lane dim must be the full
    # array dim or a multiple of 128), so outputs stay row-major [S, c3].
    out_ref[0] = jnp.transpose(
        jnp.concatenate(pools, axis=1)
    ).astype(out_ref.dtype)

    # ---- 8. reference fill-with-first on the index output -----------------
    fill = jnp.where(totals >= 1.0, merged_idx[:, 0:1], 0)
    kj = jax.lax.broadcasted_iota(jnp.int32, (ts, ns), 1)
    idx_ref[0] = jnp.where(kj.astype(f32) < totals, merged_idx, fill)


def _sa_kernel_v8(
    pts_ref,     # [1, P*NC, 128] channel planes (x, y, z, feat...) chunked
    tab_ref,     # [1, TS*P*NC, 128] XLA-tiled gather table, rows (g, ch, k)
    cx_ref,      # [1, TS, 1] centroid coords
    cy_ref,
    cz_ref,
    crep_ref,    # [1, 3, TS*128] centroid coords lane-repeated 128x
    w1t_ref,     # [C1, P8] transposed layer weights
    b1t_ref,     # [C1, 1]
    w2t_ref,     # [C2, C1]
    b2t_ref,     # [C2, 1]
    w3t_ref,     # [C3, C2]
    b3t_ref,     # [C3, 1]
    lt_ref,      # [128, 128] lower-triangular ones (bf16)
    bd_ref,      # [NC, NC] strictly-lower ones (bf16; applied per centroid)
    out_ref,     # [1, TS, C3]
    idx_ref,     # [1, TS, ns] selected indices (int32)
    raw_ref=None,  # [1, P, TS*128] gathered raw channels (train path)
    *,
    radius: float,
    nsample: int,
    num_chunks: int,
    num_planes: int,
    compute_dtype,
    tile_s: int,
    debug_stop: int = 0,
):
    """v8: v5 exact semantics with three measured-cost eliminations.

    * The gather TABLE is an input (XLA ``jnp.tile`` of the planes, measured
      1.17 us/sample bf16 in r4a) delivered once per sample (its BlockSpec
      ignores the centroid-tile grid axis), so the kernel no longer
      materializes a [ts*p*nc, 128] concat every grid step.
    * The recentring bias columns come from ONE MXU matmul
      ``W1[:, :3] @ crep`` against lane-repeated centroid coords (input),
      replacing ts broadcast+concat column builds.
    The in-ball test keeps v5's literal ``(x-c)^2+... < r^2`` form: the
    algebraically cheaper half-|p|^2 variant rounds differently in f32 and
    can flip boundary membership vs the CUDA-semantics oracle — reserved
    for the relaxed fast-grouping kernel.

    Assumes ``centroids_in_cloud`` (the fused-path default): every live
    centroid is a cloud member, so the CUDA count==0 fallback cannot fire.
    """
    ts = tile_s
    nc = num_chunks
    ns = nsample
    p = num_planes
    rb = ts * nc
    f32 = jnp.float32
    cdt = compute_dtype
    prec = (
        jax.lax.Precision.HIGHEST if cdt == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    cxs = [cx_ref[0, g, 0] for g in range(ts)]
    cys = [cy_ref[0, g, 0] for g in range(ts)]
    czs = [cz_ref[0, g, 0] for g in range(ts)]

    planes = pts_ref[0]                     # [p*nc, 128]
    x = planes[0 * nc : 1 * nc].astype(f32)
    y = planes[1 * nc : 2 * nc].astype(f32)
    z = planes[2 * nc : 3 * nc].astype(f32)

    # ---- 1. in-ball mask per chunk-row, [rb, 128] bf16 --------------------
    r2 = radius * radius
    parts = []
    for g in range(ts):
        dx = x - cxs[g]
        dy = y - cys[g]
        dz = z - czs[g]
        parts.append((dx * dx + dy * dy + dz * dz < r2).astype(jnp.bfloat16))
    in_ball = jnp.concatenate(parts, axis=0)             # [rb, 128]

    # ---- 2. inclusive counts + chunk offsets, all on the MXU --------------
    local_cnt = jnp.dot(in_ball, lt_ref[:], preferred_element_type=f32,
                        precision=jax.lax.Precision.DEFAULT)
    ones128 = (lt_ref[:] * 0 + 1).astype(jnp.bfloat16)
    tot_b = jnp.dot(in_ball, ones128, preferred_element_type=f32,
                    precision=jax.lax.Precision.DEFAULT)
    # Per-centroid strictly-lower [nc, nc] matmuls instead of one
    # block-diagonal [rb, rb] (r5b attribution: the big mostly-zero matmul
    # cost ~28 us/sample at SA0 — 16x wasted FLOPs). Same 0/1-weights
    # integer sums in f32 accumulation: bit-identical counts.
    tot_bf = tot_b.astype(jnp.bfloat16)
    base_b = jnp.concatenate(
        [
            jnp.dot(
                bd_ref[:], tot_bf[g * nc : (g + 1) * nc],
                preferred_element_type=f32,
                precision=jax.lax.Precision.DEFAULT,
            )
            for g in range(ts)
        ],
        axis=0,
    )
    tot = tot_b[:, 0:1]
    base_excl = base_b[:, 0:1]
    base_incl = base_excl + tot
    cnt = local_cnt + base_b                             # [rb, 128] monotone

    c3_dbg = out_ref.shape[2]

    def _dbg_early(val):
        out_ref[0] = jnp.broadcast_to(
            jnp.sum(val).reshape(1, 1), (ts, c3_dbg)
        ).astype(out_ref.dtype)
        idx_ref[0] = jnp.zeros((ts, ns), jnp.int32)
        if raw_ref is not None:
            raw_ref[0] = jnp.zeros_like(raw_ref[0])

    if debug_stop == 1:   # in-ball mask only
        _dbg_early(in_ball.astype(f32))
        return
    if debug_stop == 2:   # + MXU counts
        _dbg_early(cnt)
        return

    # ---- 3. slot inversion: rounds 1-2 by slice-select, 3-7 by gather -----
    jlane = jax.lax.broadcasted_iota(jnp.int32, (rb, 128), 1)
    jf = jlane.astype(f32)
    col = lambda v: cnt[:, v : v + 1]
    lo = jnp.where(col(63) <= jf, 64, 0)
    g2 = jnp.where(lo > 0, col(95), col(31))
    lo = jnp.where(g2 <= jf, lo + 32, lo)
    for step in (16, 8, 4, 2, 1):
        probe = lo + (step - 1)
        gathered = jnp.take_along_axis(cnt, probe, axis=1)
        lo = jnp.where(gathered <= jf, lo + step, lo)
    pos = lo                                             # [rb, 128]

    if debug_stop == 3:   # + binary-search slot inversion
        _dbg_early(pos.astype(f32))
        return

    # ---- 4. ownership masks + merged indices ------------------------------
    valid = (jf >= base_excl) & (jf < base_incl)
    validf = valid.astype(f32)
    chunk_of = jax.lax.broadcasted_iota(jnp.int32, (rb, 128), 0) % nc
    sel_contrib = (chunk_of * 128 + pos) * valid.astype(jnp.int32)
    merged_idx = jnp.sum(sel_contrib.reshape(ts, nc, 128), axis=1)  # [ts,128]
    totals = jnp.sum(tot.reshape(ts, nc, 1), axis=1)     # [ts, 1]

    c3_out = out_ref.shape[2]

    def _dbg_out(val):
        out_ref[0] = jnp.broadcast_to(
            jnp.sum(val).reshape(1, 1), (ts, c3_out)
        ).astype(out_ref.dtype)
        idx_ref[0] = merged_idx[:, :ns]

    if debug_stop == 4:
        _dbg_out(pos.astype(f32) + validf)
        return

    # ---- 5. channel gather over the pre-tiled table -----------------------
    table = tab_ref[0].astype(f32)                       # [ts*p*nc, 128]
    rep_idx, rep_mask = [], []
    for g in range(ts):
        pg = pos[g * nc : (g + 1) * nc]
        vg = validf[g * nc : (g + 1) * nc]
        rep_idx.extend([pg] * p)
        rep_mask.extend([vg] * p)
    gidx = jnp.concatenate(rep_idx, axis=0)              # [ts*p*nc, 128]
    gmask = jnp.concatenate(rep_mask, axis=0)
    gat = jnp.take_along_axis(table, gidx, axis=1) * gmask
    merged = jnp.sum(gat.reshape(ts * p, nc, 128), axis=1)
    if debug_stop == 5:
        _dbg_out(merged)
        return
    raw_lanes = jnp.concatenate(
        [merged[g * p : (g + 1) * p] for g in range(ts)], axis=1
    )                                                    # [p, ts*128]
    if raw_ref is not None:
        # train path: expose the gathered (masked, NON-recentred) raw block
        # so the backward pass never re-gathers through XLA (fused_train.py)
        raw_ref[0] = raw_lanes

    # ---- 6. recentring bias via MXU + per-centroid valid columns ----------
    w1t = w1t_ref[:, :p].astype(cdt)
    w1txyz = w1t_ref[:, :3].astype(f32)
    bc_lanes = jnp.dot(
        w1txyz, crep_ref[0].astype(f32),
        preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST,
    )                                                    # [c1, ts*128]
    slot128 = jax.lax.broadcasted_iota(jnp.int32, (1, ns), 1)
    vmask_blocks = [
        slot128.astype(f32) < jnp.maximum(totals[g, 0], 1.0)
        for g in range(ts)
    ]
    vmask = jnp.concatenate(vmask_blocks, axis=1)        # [1, ts*128]
    if debug_stop == 6:
        _dbg_out(bc_lanes + vmask.astype(f32) + raw_lanes[0:1])
        return

    # ---- 7. transposed MLP + masked lane-window max-pool ------------------
    h1 = (
        jnp.dot(
            w1t, raw_lanes.astype(cdt),
            preferred_element_type=f32, precision=prec,
        )
        + b1t_ref[:].astype(f32)
        - bc_lanes
    )
    h = jnp.maximum(h1, 0).astype(cdt)
    h = jnp.maximum(
        jnp.dot(
            w2t_ref[:].astype(cdt), h,
            preferred_element_type=f32, precision=prec,
        )
        + b2t_ref[:].astype(f32),
        0,
    ).astype(cdt)
    h = jnp.maximum(
        jnp.dot(
            w3t_ref[:].astype(cdt), h,
            preferred_element_type=f32, precision=prec,
        )
        + b3t_ref[:].astype(f32),
        0,
    )                                                    # [c3, ts*128] f32
    if debug_stop == 7:
        _dbg_out(h)
        return
    h = jnp.where(vmask, h, -jnp.inf)
    pools = [
        jnp.max(h[:, g * ns : (g + 1) * ns], axis=1, keepdims=True)
        for g in range(ts)
    ]
    out_ref[0] = jnp.transpose(
        jnp.concatenate(pools, axis=1)
    ).astype(out_ref.dtype)

    # ---- 8. reference fill-with-first on the index output -----------------
    fill = jnp.where(totals >= 1.0, merged_idx[:, 0:1], 0)
    kj = jax.lax.broadcasted_iota(jnp.int32, (ts, ns), 1)
    idx_ref[0] = jnp.where(kj.astype(f32) < totals, merged_idx, fill)


def _sa_kernel_f1(
    pts_ref,     # [1, P*NC, 128] channel planes (bf16 in fast mode)
    cw_ref,      # [1, TS*W, 1] int32: per-centroid window chunk ids
    cx_ref,      # [1, TS, 1] centroid coords
    cy_ref,
    cz_ref,
    crep_ref,    # [1, 3, TS*128] centroid coords lane-repeated 128x
    w1t_ref, b1t_ref, w2t_ref, b2t_ref, w3t_ref, b3t_ref,
    lt_ref,      # [128, 128] lower-triangular ones (bf16)
    bdw_ref,     # [TS*W, TS*W] strictly-lower block-diag ones (bf16)
    out_ref,     # [1, TS, C3]
    idx_ref,     # [1, TS, ns] selected indices (int32)
    *,
    radius: float,
    nsample: int,
    num_chunks: int,
    num_planes: int,
    window: int,
    compute_dtype,
    tile_s: int,
):
    """Relaxed fast-grouping SA kernel (``--fast-grouping``).

    RELAXED SEMANTICS (the exactness/speed tradeoff VERDICT r3 #1 asks to
    measure): instead of scanning all ``nc`` chunks per centroid (exact
    CUDA first-k-by-index truncation), each centroid examines only its
    ``window`` nearest chunks (by chunk-mean distance, chosen in XLA with
    ``top_k``) and keeps up to ``nsample`` in-ball points in
    (nearest-chunk, lane) order. The in-ball predicate itself is exact;
    what relaxes is (a) points outside the W nearest chunks are never
    considered and (b) truncation order is by chunk distance, not global
    index. Selection work drops from O(S*nc) to O(S*W) rows.

    Candidate compaction rides the MXU: a [ts*p*W, p*nc] one-hot built
    from the window ids gathers all candidate chunk rows in ONE matmul
    (exact: 0/1 weights select bf16 values with f32 accumulation), after
    which counts/search/gather run identically to v5/v8 but on ts*W rows.
    """
    ts = tile_s
    nc = num_chunks
    ns = nsample
    p = num_planes
    w = window
    rbf = ts * w
    f32 = jnp.float32
    cdt = compute_dtype
    prec = (
        jax.lax.Precision.HIGHEST if cdt == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    cxs = [cx_ref[0, g, 0] for g in range(ts)]
    cys = [cy_ref[0, g, 0] for g in range(ts)]
    czs = [cz_ref[0, g, 0] for g in range(ts)]

    planes = pts_ref[0]                                   # [p*nc, 128]
    # ids arrive pre-shaped [(g,w), 1] from XLA: Mosaic cannot shape-cast
    # a [ts, w] block into sublanes (r4b: "unsupported shape cast").
    ids = cw_ref[0]                                       # [(g,w), 1] i32

    # ---- 1. candidate compaction: ONE one-hot MXU matmul ------------------
    # rows (g, ch, w) select planes row (ch, ids[g, w]).
    rows = ts * p * w
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, p * nc), 1)
    # target column for row (g, ch, w): ch * nc + ids[g, w]
    ch_of = (jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) // w) % p
    ids_rep = jnp.concatenate(
        [ids[g * w : (g + 1) * w] for g in range(ts) for _ in range(p)],
        axis=0,
    )                                                     # [(g,ch,w), 1]
    if cdt == jnp.float32:
        # keep f32 values exact through the one-hot selection (a DEFAULT
        # f32 MXU pass would round them to bf16)
        onehot = (col_iota == ch_of * nc + ids_rep).astype(f32)
        cand = jnp.dot(
            onehot, planes.astype(f32), preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                 # [(g,ch,w), 128]
    else:
        onehot = (col_iota == ch_of * nc + ids_rep).astype(jnp.bfloat16)
        cand = jnp.dot(
            onehot, planes.astype(jnp.bfloat16), preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT,
        )                                                 # [(g,ch,w), 128]

    # ---- 2. in-ball mask on candidate rows, [(g,w), 128] ------------------
    r2 = radius * radius
    parts = []
    for g in range(ts):
        base = g * p * w
        xg = cand[base : base + w]
        yg = cand[base + w : base + 2 * w]
        zg = cand[base + 2 * w : base + 3 * w]
        dx = xg - cxs[g]
        dy = yg - cys[g]
        dz = zg - czs[g]
        parts.append((dx * dx + dy * dy + dz * dz < r2).astype(jnp.bfloat16))
    in_ball = jnp.concatenate(parts, axis=0)              # [(g,w), 128]

    # ---- 3. counts + window offsets on the MXU ----------------------------
    local_cnt = jnp.dot(in_ball, lt_ref[:], preferred_element_type=f32,
                        precision=jax.lax.Precision.DEFAULT)
    ones128 = (lt_ref[:] * 0 + 1).astype(jnp.bfloat16)
    tot_b = jnp.dot(in_ball, ones128, preferred_element_type=f32,
                    precision=jax.lax.Precision.DEFAULT)
    base_b = jnp.dot(
        bdw_ref[:], tot_b.astype(jnp.bfloat16), preferred_element_type=f32,
        precision=jax.lax.Precision.DEFAULT,
    )
    tot = tot_b[:, 0:1]
    base_excl = base_b[:, 0:1]
    base_incl = base_excl + tot
    cnt = local_cnt + base_b                              # [(g,w), 128]

    # ---- 4. slot inversion (as v5/v8, on ts*w rows) -----------------------
    jlane = jax.lax.broadcasted_iota(jnp.int32, (rbf, 128), 1)
    jf = jlane.astype(f32)
    col = lambda v: cnt[:, v : v + 1]
    lo = jnp.where(col(63) <= jf, 64, 0)
    g2 = jnp.where(lo > 0, col(95), col(31))
    lo = jnp.where(g2 <= jf, lo + 32, lo)
    for step in (16, 8, 4, 2, 1):
        probe = lo + (step - 1)
        gathered = jnp.take_along_axis(cnt, probe, axis=1)
        lo = jnp.where(gathered <= jf, lo + step, lo)
    pos = lo

    valid = (jf >= base_excl) & (jf < base_incl)
    validf = valid.astype(f32)
    sel_contrib = (ids * 128 + pos) * valid.astype(jnp.int32)
    merged_idx = jnp.sum(sel_contrib.reshape(ts, w, 128), axis=1)  # [ts,128]
    totals = jnp.sum(tot.reshape(ts, w, 1), axis=1)       # [ts, 1]

    # ---- 5. channel gather over the candidate rows ------------------------
    # table rows (g, ch, w) = cand itself; indices/masks repeat per channel.
    rep_idx, rep_mask = [], []
    for g in range(ts):
        pg = pos[g * w : (g + 1) * w]
        vg = validf[g * w : (g + 1) * w]
        rep_idx.extend([pg] * p)
        rep_mask.extend([vg] * p)
    gidx = jnp.concatenate(rep_idx, axis=0)               # [(g,ch,w), 128]
    gmask = jnp.concatenate(rep_mask, axis=0)
    gat = jnp.take_along_axis(cand, gidx, axis=1) * gmask
    merged = jnp.sum(gat.reshape(ts * p, w, 128), axis=1)  # [(g,ch), 128]
    raw_lanes = jnp.concatenate(
        [merged[g * p : (g + 1) * p] for g in range(ts)], axis=1
    )                                                     # [p, ts*128]

    # ---- 6. bias columns + masks (v8 form) --------------------------------
    w1t = w1t_ref[:, :p].astype(cdt)
    w1txyz = w1t_ref[:, :3].astype(f32)
    bc_lanes = jnp.dot(
        w1txyz, crep_ref[0].astype(f32),
        preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST,
    )
    slot128 = jax.lax.broadcasted_iota(jnp.int32, (1, ns), 1)
    vmask = jnp.concatenate(
        [slot128.astype(f32) < jnp.maximum(totals[g, 0], 1.0)
         for g in range(ts)],
        axis=1,
    )

    # ---- 7. transposed MLP + masked lane-window max-pool ------------------
    h1 = (
        jnp.dot(w1t, raw_lanes.astype(cdt),
                preferred_element_type=f32, precision=prec)
        + b1t_ref[:].astype(f32)
        - bc_lanes
    )
    h = jnp.maximum(h1, 0).astype(cdt)
    h = jnp.maximum(
        jnp.dot(w2t_ref[:].astype(cdt), h,
                preferred_element_type=f32, precision=prec)
        + b2t_ref[:].astype(f32),
        0,
    ).astype(cdt)
    h = jnp.maximum(
        jnp.dot(w3t_ref[:].astype(cdt), h,
                preferred_element_type=f32, precision=prec)
        + b3t_ref[:].astype(f32),
        0,
    )
    h = jnp.where(vmask, h, -jnp.inf)
    pools = [
        jnp.max(h[:, g * ns : (g + 1) * ns], axis=1, keepdims=True)
        for g in range(ts)
    ]
    out_ref[0] = jnp.transpose(
        jnp.concatenate(pools, axis=1)
    ).astype(out_ref.dtype)

    fill = jnp.where(totals >= 1.0, merged_idx[:, 0:1], 0)
    kj = jax.lax.broadcasted_iota(jnp.int32, (ts, ns), 1)
    idx_ref[0] = jnp.where(kj.astype(f32) < totals, merged_idx, fill)


def _bd_strict_w(ts: int, w: int) -> jnp.ndarray:
    """[ts*w, ts*w] strictly-lower block-diagonal ones for the fast kernel's
    window prefix (blocks of size w)."""
    rb = ts * w
    i = jax.lax.broadcasted_iota(jnp.int32, (rb, rb), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (rb, rb), 1)
    same_block = (i // w) == (j // w)
    return (same_block & (j < i)).astype(jnp.bfloat16)


@functools.partial(
    jax.jit,
    static_argnames=("radius", "nsample", "window", "compute_dtype",
                     "interpret", "tile_s"),
)
def sa_stage_fast(
    xyz: jnp.ndarray,        # [B, N, 3]
    features: jnp.ndarray,   # [B, N, C]
    centroids: jnp.ndarray,  # [B, S, 3]
    w1, b1, w2, b2, w3, b3,
    radius: float,
    nsample: int = 128,
    window: int = 12,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    tile_s: int = _TS,
):
    """Relaxed fast-grouping SA stage (see :func:`_sa_kernel_f1`).

    Per centroid, only the ``window`` nearest chunks (by chunk-mean
    distance) are searched; the rest of the stage is unchanged. Returns
    (features [B, S, C3] f32, idx [B, S, nsample])."""
    b, n, _ = xyz.shape
    s = centroids.shape[1]
    c = features.shape[-1]
    p = 3 + c
    assert nsample == 128, "slot layout assumes ns == 128"
    pad_n = (-n) % 128
    if pad_n:
        xyz = jnp.pad(xyz, ((0, 0), (0, pad_n), (0, 0)), constant_values=1e6)
        features = jnp.pad(features, ((0, 0), (0, pad_n), (0, 0)))
        n += pad_n
    s_in = s
    pad_s = (-s) % tile_s
    if pad_s:
        centroids = jnp.pad(
            centroids, ((0, 0), (0, pad_s), (0, 0)), constant_values=1e6
        )
        s += pad_s
    nc = n // 128
    window = min(window, nc)
    c3 = w3.shape[-1]

    planes = jnp.concatenate([xyz, features], axis=-1)
    planes = jnp.swapaxes(planes, 1, 2).reshape(b, p * nc, 128)
    if compute_dtype == jnp.bfloat16:
        planes = planes.astype(jnp.bfloat16)
    w1p = w1 if p % 8 == 0 else jnp.pad(w1, ((0, (-p) % 8), (0, 0)))

    # Window selection in XLA: chunk means -> top-W nearest per centroid
    # (measured 3.65 us/sample at W=16, r4a probe). Padded far-sentinel
    # points are excluded from the means so a partial final chunk remains
    # selectable for its real points.
    real = (jnp.arange(n) < (n - pad_n)).astype(xyz.dtype)  # [n]
    wsum = jnp.sum(
        (xyz * real[None, :, None]).reshape(b, nc, 128, 3), axis=2
    )
    wcnt = jnp.maximum(jnp.sum(real.reshape(nc, 128), axis=1), 1.0)
    chunk_means = wsum / wcnt[None, :, None]              # [B, nc, 3]
    d2 = jnp.sum(
        (centroids[:, :, None, :] - chunk_means[:, None, :, :]) ** 2, axis=-1
    )                                                     # [B, S, nc]
    _, cw = jax.lax.top_k(-d2, window)                    # [B, S, W] i32
    cw = cw.astype(jnp.int32).reshape(b, s * window, 1)

    crep = jnp.repeat(
        jnp.swapaxes(centroids, 1, 2), 128, axis=2
    ).astype(jnp.float32)                                 # [B, 3, S*128]

    kernel = functools.partial(
        _sa_kernel_f1,
        radius=radius,
        nsample=nsample,
        num_chunks=nc,
        num_planes=p,
        window=window,
        compute_dtype=compute_dtype,
        tile_s=tile_s,
    )
    grid = (b, s // tile_s)
    wspec = lambda a: pl.BlockSpec(
        a.shape, lambda i, j: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    cspec = pl.BlockSpec(
        (1, tile_s, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    feats_t, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, p * nc, 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_s * window, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            cspec, cspec, cspec,
            pl.BlockSpec((1, 3, tile_s * 128), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            wspec(w1p.T), wspec(b1.reshape(-1, 1)),
            wspec(w2.T), wspec(b2.reshape(-1, 1)),
            wspec(w3.T), wspec(b3.reshape(-1, 1)),
            pl.BlockSpec((128, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_s * window, tile_s * window),
                         lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile_s, c3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_s, nsample), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, s, c3), jnp.float32),
            jax.ShapeDtypeStruct((b, s, nsample), jnp.int32),
        ),
        interpret=interpret,
    )(
        planes, cw,
        centroids[..., 0:1], centroids[..., 1:2], centroids[..., 2:3],
        crep,
        w1p.T, b1.reshape(-1, 1), w2.T, b2.reshape(-1, 1),
        w3.T, b3.reshape(-1, 1), _lt128(), _bd_strict_w(tile_s, window),
    )
    return feats_t[:, :s_in], idx[:, :s_in]


def _lt128() -> jnp.ndarray:
    i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    return (i <= j).astype(jnp.bfloat16)  # column j counts lanes <= j


def _bd_strict(ts: int, nc: int) -> jnp.ndarray:
    """[rb, rb] strictly-lower block-diagonal ones: row (g,k) sums the tots
    of chunks k' < k of the same centroid g (the MXU prefix constant)."""
    rb = ts * nc
    i = jax.lax.broadcasted_iota(jnp.int32, (rb, rb), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (rb, rb), 1)
    same_block = (i // nc) == (j // nc)
    return (same_block & (j < i)).astype(jnp.bfloat16)


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius", "nsample", "compute_dtype", "interpret", "tile_s",
        "gather16", "impl", "debug_stop", "pad_chunks",
        "centroids_in_cloud", "return_raw",
    ),
)
def sa_stage(
    xyz: jnp.ndarray,        # [B, N, 3] points
    features: jnp.ndarray,   # [B, N, C] per-point features
    centroids: jnp.ndarray,  # [B, S, 3]
    w1: jnp.ndarray, b1: jnp.ndarray,   # [3 + C, C1], [C1]
    w2: jnp.ndarray, b2: jnp.ndarray,
    w3: jnp.ndarray, b3: jnp.ndarray,
    radius: float,
    nsample: int = 128,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    tile_s: int = _TS,
    gather16: bool = False,
    impl: str = "v3",
    debug_stop: int = 0,
    pad_chunks: bool = False,
    centroids_in_cloud: bool = False,
    return_raw: bool = False,
):
    """Fused SA stage.

    ``pad_chunks=True`` pads the point count to a multiple of 1024 so the
    chunk count is a multiple of 8 and every in-kernel chunk-row slice is
    sublane-aligned (trades ~14% extra lanes at N=6272 for relayout-free
    slicing; measure per shape). Returns (features [B, S, C3] f32, idx [B, S, nsample]).

    ``impl="v5"`` selects the lane-layout kernel (:func:`_sa_kernel_v5`),
    numerically equivalent; ``gather16`` applies to v3 only.

    ``gather16=True`` runs the in-kernel lane gathers on 16-bit data with
    int16 indices (Mosaic requires matching index/data bitwidths); it is a
    perf mode that must be validated by the on-chip compile gate before use.

    Equivalent to ball_query + query_and_group + SharedMLP + max-pool with
    pointnet2_ops CUDA semantics: the selected SET matches the CUDA
    first-k-by-index rule exactly (slot order differs, which the
    order-invariant max-pool cannot see), fills never affect the max, and the
    count==0 point-0 fallback is reproduced. ``tests/test_pallas_sa.py``
    asserts output equality against the XLA oracle path.
    """
    b, n, _ = xyz.shape
    s = centroids.shape[1]
    c = features.shape[-1]
    p = 3 + c
    assert nsample == 128, "slot layout assumes ns == 128"
    # Pad points to a chunk multiple with far-away coordinates (never
    # in-ball) and centroids to a tile multiple (outputs sliced off).
    pad_n = (-n) % (1024 if (pad_chunks and impl in ("v5", "v8")) else 128)
    if pad_n:
        xyz = jnp.pad(xyz, ((0, 0), (0, pad_n), (0, 0)), constant_values=1e6)
        features = jnp.pad(features, ((0, 0), (0, pad_n), (0, 0)))
        n += pad_n
    s_in = s
    pad_s = (-s) % tile_s
    if pad_s:
        centroids = jnp.pad(
            centroids, ((0, 0), (0, pad_s), (0, 0)), constant_values=1e6
        )
        s += pad_s
    nc = n // 128
    c3 = w3.shape[-1]

    # channel planes [B, P*NC, 128]: plane-major, chunk-minor
    planes = jnp.concatenate([xyz, features], axis=-1)    # [B, N, P]
    planes = jnp.swapaxes(planes, 1, 2).reshape(b, p * nc, 128)
    w1p = w1 if p % 8 == 0 else jnp.pad(w1, ((0, (-p) % 8), (0, 0)))
    lt = _lt128()

    if impl == "v8":
        assert centroids_in_cloud, "v8 assumes centroids are cloud members"
        grid = (b, s // tile_s)
        kernel = functools.partial(
            _sa_kernel_v8,
            radius=radius,
            nsample=nsample,
            num_chunks=nc,
            num_planes=p,
            compute_dtype=compute_dtype,
            tile_s=tile_s,
            debug_stop=debug_stop,
        )
        extra_out_specs = []
        extra_out_shapes = []
        if return_raw:
            extra_out_specs = [
                pl.BlockSpec((1, p, tile_s * 128), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM)
            ]
            extra_out_shapes = [
                jax.ShapeDtypeStruct((b, p, s * 128), jnp.float32)
            ]
        # Gather table (rows (g, ch, k)) tiled in XLA — measured
        # 1.17 us/sample (r4a) and delivered once per sample (index map
        # ignores j, so Pallas skips the re-copy across the centroid grid
        # axis). f32: Mosaic gathers need index/data bitwidths to match.
        tab = jnp.tile(planes.astype(jnp.float32), (1, tile_s, 1))
        # centroid coords lane-repeated 128x, order (g-major): [B, 3, S*128]
        crep = jnp.repeat(jnp.swapaxes(centroids, 1, 2), 128, axis=2)
        crep = crep.astype(jnp.float32)
        wspec = lambda a: pl.BlockSpec(
            a.shape, lambda i, j: (0,) * a.ndim, memory_space=pltpu.VMEM
        )
        cspec = pl.BlockSpec(
            (1, tile_s, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, p * nc, 128), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_s * p * nc, 128),
                             lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                cspec, cspec, cspec,
                pl.BlockSpec((1, 3, tile_s * 128), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
                wspec(w1p.T), wspec(b1.reshape(-1, 1)),
                wspec(w2.T), wspec(b2.reshape(-1, 1)),
                wspec(w3.T), wspec(b3.reshape(-1, 1)),
                pl.BlockSpec((128, 128), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nc, nc),
                             lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, tile_s, c3), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_s, nsample), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                *extra_out_specs,
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, s, c3), jnp.float32),
                jax.ShapeDtypeStruct((b, s, nsample), jnp.int32),
                *extra_out_shapes,
            ),
            interpret=interpret,
        )(
            planes, tab,
            centroids[..., 0:1], centroids[..., 1:2], centroids[..., 2:3],
            crep,
            w1p.T, b1.reshape(-1, 1), w2.T, b2.reshape(-1, 1),
            w3.T, b3.reshape(-1, 1), lt, _bd_strict(1, nc),
        )
        if return_raw:
            feats_t, idx, raw = out
            # [B, p, S*128] -> [B, S, ns, p] (slot-major, channel-minor)
            raw = jnp.swapaxes(raw, 1, 2).reshape(b, s, nsample, p)
            return feats_t[:, :s_in], idx[:, :s_in], raw[:, :s_in]
        feats_t, idx = out
        return feats_t[:, :s_in], idx[:, :s_in]

    if impl == "v5":
        grid = (b, s // tile_s)
        kernel = functools.partial(
            _sa_kernel_v5,
            radius=radius,
            nsample=nsample,
            num_chunks=nc,
            num_planes=p,
            compute_dtype=compute_dtype,
            tile_s=tile_s,
            debug_stop=debug_stop,
            centroids_in_cloud=centroids_in_cloud,
        )
        wspec = lambda a: pl.BlockSpec(
            a.shape, lambda i, j: (0,) * a.ndim, memory_space=pltpu.VMEM
        )
        cspec = pl.BlockSpec(
            (1, tile_s, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        )
        feats_t, idx = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, p * nc, 128), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                cspec, cspec, cspec,
                wspec(w1p.T), wspec(b1.reshape(-1, 1)),
                wspec(w2.T), wspec(b2.reshape(-1, 1)),
                wspec(w3.T), wspec(b3.reshape(-1, 1)),
                pl.BlockSpec((128, 128), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_s * nc, tile_s * nc),
                             lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, tile_s, c3), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_s, nsample), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, s, c3), jnp.float32),
                jax.ShapeDtypeStruct((b, s, nsample), jnp.int32),
            ),
            interpret=interpret,
        )(
            planes,
            centroids[..., 0:1], centroids[..., 1:2], centroids[..., 2:3],
            w1p.T, b1.reshape(-1, 1), w2.T, b2.reshape(-1, 1),
            w3.T, b3.reshape(-1, 1), lt, _bd_strict(tile_s, nc),
        )
        return feats_t[:, :s_in], idx[:, :s_in]

    grid = (b, s // tile_s)
    kernel = functools.partial(
        _sa_kernel,
        radius=radius,
        nsample=nsample,
        num_chunks=nc,
        num_planes=p,
        compute_dtype=compute_dtype,
        tile_s=tile_s,
        gather16=gather16,
    )
    feats, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, p * nc, 128), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile_s, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile_s, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile_s, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(w1p.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b1.shape[-1]), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b2.shape[-1]), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w3.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b3.shape[-1]), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, tile_s, c3), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile_s, nsample), lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, s, c3), jnp.float32),
            jax.ShapeDtypeStruct((b, s, nsample), jnp.int32),
        ),
        interpret=interpret,
    )(
        planes,
        centroids[..., 0:1], centroids[..., 1:2], centroids[..., 2:3],
        w1p, b1.reshape(1, -1), w2, b2.reshape(1, -1), w3, b3.reshape(1, -1),
        lt,
    )
    return feats[:, :s_in], idx[:, :s_in]
