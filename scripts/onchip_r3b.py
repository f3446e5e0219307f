"""On-chip session r3b: (1) bisect the f32 parity failure per kernel,
(2) ablate the SA0 kernel stage-by-stage to locate the ~20x inefficiency.

Self-bounding; appends JSONL to .onchip_r3b.jsonl.
"""
import functools
import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG = open("/root/repo/.onchip_r3b.jsonl", "a", buffering=1)


def emit(**kw):
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw)[:300], file=sys.stderr, flush=True)


emit(kind="start", t=time.strftime("%H:%M:%S"))

from mpinets_tpu.kernels import pointnet, pallas_ops

# ---------------------------------------------------------------- parity
key = jax.random.PRNGKey(3)
B, N = 8, 384
xyz = jax.random.uniform(key, (B, N, 3), minval=-0.7, maxval=0.7)
feat = jax.random.randint(
    jax.random.fold_in(key, 5), (B, N, 1), 0, 3
).astype(jnp.float32)

# 1. FPS parity on chip (XLA oracle vs Pallas kernel, compiled)
try:
    for npoint in (16, 128):
        ref = np.asarray(jax.jit(
            functools.partial(pointnet.furthest_point_sample, npoint=npoint)
        )(xyz))
        idx, coords = pallas_ops.furthest_point_sample_with_coords(
            xyz, npoint)
        idx = np.asarray(idx)
        eq = bool((idx == ref).all())
        gat = np.asarray(pointnet.gather_points(xyz, jnp.asarray(ref)))
        cerr = float(np.abs(np.asarray(coords) - gat).max()) if eq else -1.0
        emit(kind="parity", name=f"fps_np{npoint}", idx_equal=eq,
             coord_err=cerr,
             n_diff=int((idx != ref).sum()))
except Exception:
    emit(kind="parity", name="fps_EXC", err=traceback.format_exc()[-600:])

# 2. SA stage parity on chip vs XLA oracle
try:
    S, NS, C1 = 16, 128, 32
    cent = xyz[:, :S]
    mk = lambda i, s: jax.random.normal(jax.random.fold_in(key, i), s) * 0.2
    w1, b1 = mk(2, (4, C1)), mk(3, (C1,))
    w2, b2 = mk(4, (C1, 32)), mk(5, (32,))
    w3, b3 = mk(6, (32, 48)), mk(7, (48,))
    for radius in (0.05, 0.3, 0.9):
        @jax.jit
        def oracle(xyz, feat, cent):
            idx0 = pointnet.ball_query(cent, xyz, radius, NS)
            g = jnp.concatenate(
                [pointnet.gather_points(xyz, idx0) - cent[:, :, None, :],
                 pointnet.gather_points(feat, idx0)], -1)
            h = jnp.maximum(jnp.einsum("bsnc,cd->bsnd", g, w1) + b1, 0)
            h = jnp.maximum(jnp.einsum("bsnc,cd->bsnd", h, w2) + b2, 0)
            h = jnp.maximum(jnp.einsum("bsnc,cd->bsnd", h, w3) + b3, 0)
            return jnp.max(h, axis=2), idx0

        ref_f, ref_i = oracle(xyz, feat, cent)
        out_f, out_i = pallas_ops.sa_stage(
            xyz, feat, cent, w1, b1, w2, b2, w3, b3,
            radius=radius, nsample=NS, compute_dtype=jnp.float32)
        ferr = float(np.abs(np.asarray(out_f) - np.asarray(ref_f)).max())
        seteq = all(
            set(np.asarray(ref_i[b, s]).tolist())
            == set(np.asarray(out_i[b, s]).tolist())
            for b in range(B) for s in range(S)
        )
        emit(kind="parity", name=f"sa_r{radius}", feat_err=ferr,
             set_equal=bool(seteq))
except Exception:
    emit(kind="parity", name="sa_EXC", err=traceback.format_exc()[-600:])

# ------------------------------------------------- v5 kernel: parity + time
try:
    S, NS, C1 = 16, 128, 32
    cent = xyz[:, :S]
    mk = lambda i, s: jax.random.normal(jax.random.fold_in(key, i), s) * 0.2
    w1, b1 = mk(2, (4, C1)), mk(3, (C1,))
    w2, b2 = mk(4, (C1, 32)), mk(5, (32,))
    w3, b3 = mk(6, (32, 48)), mk(7, (48,))
    for radius in (0.05, 0.3):
        a_f, a_i = pallas_ops.sa_stage(
            xyz, feat, cent, w1, b1, w2, b2, w3, b3,
            radius=radius, nsample=NS, compute_dtype=jnp.float32, impl="v3")
        b_f, b_i = pallas_ops.sa_stage(
            xyz, feat, cent, w1, b1, w2, b2, w3, b3,
            radius=radius, nsample=NS, compute_dtype=jnp.float32, impl="v5")
        emit(kind="parity", name=f"v5_vs_v3_r{radius}",
             feat_err=float(np.abs(np.asarray(a_f) - np.asarray(b_f)).max()),
             idx_equal=bool((np.asarray(a_i) == np.asarray(b_i)).all()))
except Exception:
    emit(kind="parity", name="v5_EXC", err=traceback.format_exc()[-600:])

# ------------------------------------------------- SA0 stage ablation
# Debug kernels: copies of _sa_kernel truncated after each stage, with a
# cheap reduction written to out so nothing is DCE'd.
_TS = 32


def _abl_kernel(
    pts_ref, cx_ref, cy_ref, cz_ref, lt_ref, out_ref,
    *, radius, num_chunks, tile_s, stop, fuse_inball,
):
    ts, nc = tile_s, num_chunks
    rb = ts * nc
    f32 = jnp.float32
    cxs = [cx_ref[0, g, 0] for g in range(ts)]
    cys = [cy_ref[0, g, 0] for g in range(ts)]
    czs = [cz_ref[0, g, 0] for g in range(ts)]
    planes = pts_ref[0]
    x = planes[0 * nc:1 * nc].astype(f32)
    y = planes[1 * nc:2 * nc].astype(f32)
    z = planes[2 * nc:3 * nc].astype(f32)
    parts = []
    for g in range(ts):
        dx = x - cxs[g]
        dy = y - cys[g]
        dz = z - czs[g]
        d2g = dx * dx + dy * dy + dz * dz
        parts.append(
            (d2g < radius * radius).astype(jnp.bfloat16) if fuse_inball
            else d2g
        )
    if fuse_inball:
        in_ball = jnp.concatenate(parts, axis=0)
    else:
        d2 = jnp.concatenate(parts, axis=0)
        in_ball = (d2 < radius * radius).astype(jnp.bfloat16)
    if stop == 1:
        out_ref[0] = jnp.sum(
            in_ball.astype(f32).reshape(ts, nc, 128), axis=1
        )[:, :out_ref.shape[2]]
        return
    local_cnt = jnp.dot(in_ball, lt_ref[:], preferred_element_type=f32)
    tot = local_cnt[:, 127:128]
    pos_ib = jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0) % nc
    psum = tot
    step = 1
    while step < nc:
        shifted = pltpu.roll(psum, step, 0)
        psum = psum + jnp.where(pos_ib >= step, shifted, 0.0)
        step *= 2
    base_excl = psum - tot
    base_incl = psum
    cnt = local_cnt + base_excl
    if stop == 2:
        out_ref[0] = jnp.sum(
            cnt.reshape(ts, nc, 128), axis=1)[:, :out_ref.shape[2]]
        return
    jlane = jax.lax.broadcasted_iota(jnp.int32, (rb, 128), 1)
    jf = jlane.astype(f32)
    lo = jnp.zeros((rb, 128), jnp.int32)
    for st in (64, 32, 16, 8, 4, 2, 1):
        probe = lo + (st - 1)
        gathered = jnp.take_along_axis(cnt, probe, axis=1)
        lo = jnp.where(gathered <= jf, lo + st, lo)
    pos = lo
    if stop == 3:
        out_ref[0] = jnp.sum(
            pos.astype(f32).reshape(ts, nc, 128), axis=1
        )[:, :out_ref.shape[2]]
        return
    valid = (jf >= base_excl) & (jf < base_incl)
    validf = valid.astype(f32)
    p = 4
    planes_g = planes.astype(f32)
    accs = []
    for g in range(ts):
        pos_g = pos[g * nc:(g + 1) * nc]
        val_g = validf[g * nc:(g + 1) * nc]
        gidx = jnp.broadcast_to(pos_g, (p, nc, 128)).reshape(p * nc, 128)
        gmask = jnp.broadcast_to(val_g, (p, nc, 128)).reshape(p * nc, 128)
        gat = jnp.take_along_axis(planes_g, gidx, axis=1) * gmask
        merged_g = jnp.sum(gat.reshape(p, nc, 128), axis=1)   # [p, 128]
        if stop == 4:
            accs.append(jnp.sum(merged_g, axis=0, keepdims=True))  # [1,128]
        else:  # stop == 5: include the transpose that v3 does
            accs.append(
                jnp.sum(jnp.transpose(merged_g), axis=1, keepdims=True).T
            )
    out_ref[0] = jnp.concatenate(accs, axis=0)[:, :out_ref.shape[2]]


@functools.partial(jax.jit, static_argnames=("stop", "tile_s", "fuse"))
def abl_run(xyz, feat, cent, stop, tile_s=_TS, fuse=False):
    b, n, _ = xyz.shape
    s = cent.shape[1]
    nc = n // 128
    p = 4
    planes = jnp.concatenate([xyz, feat], axis=-1)
    planes = jnp.swapaxes(planes, 1, 2).reshape(b, p * nc, 128)
    lt = pallas_ops._lt128()
    grid = (b, s // tile_s)
    kernel = functools.partial(
        _abl_kernel, radius=0.05, num_chunks=nc, tile_s=tile_s,
        stop=stop, fuse_inball=fuse,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, p * nc, 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_s, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_s, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_s, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_s, 128), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, 128), jnp.float32),
    )(planes, cent[..., 0:1], cent[..., 1:2], cent[..., 2:3], lt)
    return out


BB = 256
kb = jax.random.PRNGKey(7)
xyzb = jax.random.uniform(kb, (BB, 6272, 3), minval=-0.8, maxval=0.8)
featb = jax.random.randint(
    jax.random.fold_in(kb, 1), (BB, 6272, 1), 0, 3).astype(jnp.float32)
centb = xyzb[:, :512]


def diff_time(name, make_loop, ks=(2, 10)):
    try:
        fns = {k: make_loop(k) for k in ks}
        for f in fns.values():
            float(f())
        ts = {}
        for k, f in fns.items():
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(f())
                best = min(best, time.perf_counter() - t0)
            ts[k] = best
        per = (ts[ks[1]] - ts[ks[0]]) / (ks[1] - ks[0])
        emit(kind="time", name=name, us_per_call=round(per * 1e6, 1),
             us_per_sample=round(per * 1e6 / BB, 2))
    except Exception:
        emit(kind="time", name=name, err=traceback.format_exc()[-600:])


def abl_loop(k, stop, fuse=False):
    @jax.jit
    def run():
        def body(i, acc):
            o = abl_run(xyzb + i * 1e-6, featb, centb, stop, fuse=fuse)
            return acc + jnp.sum(o)
        return jax.lax.fori_loop(0, k, body, 0.0)
    return run


for stop in (1, 2, 3, 4, 5):
    diff_time(f"sa0_abl_stop{stop}", lambda k, s=stop: abl_loop(k, s))
diff_time("sa0_abl_stop1_fused_inball",
          lambda k: abl_loop(k, 1, fuse=True))


# ------------------------------------------------- v5 full-shape timings
def sa_loop_v5(k, n_pts, s_cent, c_feat, ts, radius):
    kk = jax.random.fold_in(kb, n_pts)
    xyzl = jax.random.uniform(kk, (BB, n_pts, 3), minval=-0.8, maxval=0.8)
    featl = jax.random.normal(jax.random.fold_in(kk, 1), (BB, n_pts, c_feat))
    centl = xyzl[:, :s_cent]
    c1 = 64 if c_feat < 8 else 128
    mk = lambda i, s: jax.random.normal(jax.random.fold_in(kk, 10 + i), s) * 0.2
    w1, b1 = mk(0, (3 + c_feat, c1)), mk(1, (c1,))
    w2, b2 = mk(2, (c1, c1)), mk(3, (c1,))
    w3, b3 = mk(4, (c1, c1)), mk(5, (c1,))

    @jax.jit
    def run():
        def body(i, acc):
            f, _ = pallas_ops.sa_stage(
                xyzl + i * 1e-6, featl, centl, w1, b1, w2, b2, w3, b3,
                radius=radius, nsample=128, compute_dtype=jnp.bfloat16,
                tile_s=ts, impl="v5",
            )
            return acc + jnp.sum(f)
        return jax.lax.fori_loop(0, k, body, 0.0)
    return run


for ts in (16, 32):
    diff_time(f"sa0_v5_ts{ts}",
              lambda k, t=ts: sa_loop_v5(k, 6272, 512, 1, t, 0.05))
diff_time("sa1_v5_ts32", lambda k: sa_loop_v5(k, 512, 128, 64, 32, 0.3))

emit(kind="done", t=time.strftime("%H:%M:%S"))
