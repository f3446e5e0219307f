"""On-chip session r3c: fixed-v5 parity + timings, f32-precision parity
verification, scan-isolation ablation, FPS tile sweep.

Self-bounding; appends JSONL to .onchip_r3c.jsonl.
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

LOG = open("/root/repo/.onchip_r3c.jsonl", "a", buffering=1)


def emit(**kw):
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw)[:250], file=sys.stderr, flush=True)


emit(kind="start", t=time.strftime("%H:%M:%S"))

from mpinets_tpu.kernels import pointnet, pallas_ops
from mpinets_tpu.model.fused import make_fused_apply
from mpinets_tpu.model.policy import MotionPolicyNetwork

key = jax.random.PRNGKey(3)
B, N = 8, 384
xyz = jax.random.uniform(key, (B, N, 3), minval=-0.7, maxval=0.7)
feat = jax.random.randint(
    jax.random.fold_in(key, 5), (B, N, 1), 0, 3
).astype(jnp.float32)

# ---- 1. SA parity with the f32 precision fix (v3 + v5) --------------------
try:
    S, NS, C1 = 16, 128, 32
    cent = xyz[:, :S]
    mk = lambda i, s: jax.random.normal(jax.random.fold_in(key, i), s) * 0.2
    w1, b1 = mk(2, (4, C1)), mk(3, (C1,))
    w2, b2 = mk(4, (C1, 32)), mk(5, (32,))
    w3, b3 = mk(6, (32, 48)), mk(7, (48,))
    for radius in (0.05, 0.3):
        @jax.jit
        def oracle(xyz, feat, cent):
            idx0 = pointnet.ball_query(cent, xyz, radius, NS)
            g = jnp.concatenate(
                [pointnet.gather_points(xyz, idx0) - cent[:, :, None, :],
                 pointnet.gather_points(feat, idx0)], -1)
            hp = jax.lax.Precision.HIGHEST
            h = jnp.maximum(
                jnp.einsum("bsnc,cd->bsnd", g, w1, precision=hp) + b1, 0)
            h = jnp.maximum(
                jnp.einsum("bsnc,cd->bsnd", h, w2, precision=hp) + b2, 0)
            h = jnp.maximum(
                jnp.einsum("bsnc,cd->bsnd", h, w3, precision=hp) + b3, 0)
            return jnp.max(h, axis=2), idx0

        ref_f, ref_i = oracle(xyz, feat, cent)
        for impl in ("v3", "v5"):
            out_f, out_i = pallas_ops.sa_stage(
                xyz, feat, cent, w1, b1, w2, b2, w3, b3,
                radius=radius, nsample=NS, compute_dtype=jnp.float32,
                impl=impl)
            ferr = float(np.abs(np.asarray(out_f) - np.asarray(ref_f)).max())
            seteq = all(
                set(np.asarray(ref_i[b, s]).tolist())
                == set(np.asarray(out_i[b, s]).tolist())
                for b in range(B) for s in range(S)
            )
            emit(kind="parity", name=f"sa_{impl}_r{radius}", feat_err=ferr,
                 set_equal=bool(seteq))
except Exception:
    emit(kind="parity", name="sa_EXC", err=traceback.format_exc()[-600:])

# ---- 2. fused forward f32 vs flax on chip (was 3.4e-3 in r3a) -------------
try:
    npoints = (16, 8)
    small = MotionPolicyNetwork(sa_npoints=npoints)
    pc = jnp.concatenate(
        [jax.random.uniform(key, (8, 384, 3), minval=-0.7, maxval=0.7),
         jax.random.randint(key, (8, 384, 1), 0, 3).astype(jnp.float32)],
        axis=-1)
    q = jax.random.uniform(jax.random.fold_in(key, 1), (8, 7),
                           minval=-1, maxval=1)
    sv = small.init(jax.random.fold_in(key, 2), pc, q)
    ref = np.asarray(jax.jit(small.apply)(sv, pc, q))
    for impl in ("v3", "v5"):
        fused32 = np.asarray(
            make_fused_apply(jnp.float32, sa_npoints=npoints,
                             sa_impl=impl)(sv, pc, q))
        err = float(np.abs(fused32 - ref).max())
        emit(kind="parity", name=f"fused_f32_{impl}_vs_flax",
             max_abs_err=err, ok=bool(err < 5e-4))
except Exception:
    emit(kind="parity", name="fused_EXC", err=traceback.format_exc()[-600:])

# ---- 3. timings -----------------------------------------------------------
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
        emit(kind="time", name=name, err=traceback.format_exc()[-400:])


def sa_loop(k, n_pts, s_cent, c_feat, ts, radius, impl):
    kk = jax.random.fold_in(kb, n_pts + ts)
    xyzl = (xyzb if n_pts == 6272 else
            jax.random.uniform(kk, (BB, n_pts, 3), minval=-0.8, maxval=0.8))
    featl = (featb if c_feat == 1 else
             jax.random.normal(jax.random.fold_in(kk, 1), (BB, n_pts, c_feat)))
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
                tile_s=ts, impl=impl,
            )
            return acc + jnp.sum(f)
        return jax.lax.fori_loop(0, k, body, 0.0)
    return run


for ts in (16, 32):
    diff_time(f"sa0_v5_ts{ts}",
              lambda k, t=ts: sa_loop(k, 6272, 512, 1, t, 0.05, "v5"))
diff_time("sa1_v5_ts32", lambda k: sa_loop(k, 512, 128, 64, 32, 0.3, "v5"))
diff_time("sa1_v5_ts64", lambda k: sa_loop(k, 512, 128, 64, 64, 0.3, "v5"))


def fps_loop(k, tile):
    @jax.jit
    def run():
        def body(i, acc):
            _, c = pallas_ops.furthest_point_sample_with_coords(
                xyzb + i * 1e-6, 512, batch_tile=tile)
            return acc + jnp.sum(c.astype(jnp.float32))
        return jax.lax.fori_loop(0, k, body, 0.0)
    return run


diff_time("fps_t128", lambda k: fps_loop(k, 128))
diff_time("fps_t256", lambda k: fps_loop(k, 256))

# ---- 4. scan-isolation ablation (stage2 without the narrow roll-scan) -----
_TS = 32


def _abl2_kernel(pts_ref, cx_ref, cy_ref, cz_ref, lt_ref, out_ref,
                 *, radius, num_chunks, tile_s, with_scan):
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
    r2 = radius * radius
    parts = []
    for g in range(ts):
        dx = x - cxs[g]
        dy = y - cys[g]
        dz = z - czs[g]
        parts.append((dx * dx + dy * dy + dz * dz < r2).astype(jnp.bfloat16))
    in_ball = jnp.concatenate(parts, axis=0)
    local_cnt = jnp.dot(in_ball, lt_ref[:], preferred_element_type=f32)
    tot = local_cnt[:, 127:128]
    if with_scan:
        pos_ib = jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0) % nc
        psum = tot
        step = 1
        while step < nc:
            shifted = pltpu.roll(psum, step, 0)
            psum = psum + jnp.where(pos_ib >= step, shifted, 0.0)
            step *= 2
        cnt = local_cnt + (psum - tot)
    else:
        cnt = local_cnt + tot  # wrong values, same shapes/cost sans scan
    out_ref[0] = jnp.sum(
        cnt.reshape(ts, nc, 128), axis=1)[:, :out_ref.shape[2]]


@functools.partial(jax.jit, static_argnames=("with_scan", "tile_s"))
def abl2_run(xyz, feat, cent, with_scan, tile_s=_TS):
    b, n, _ = xyz.shape
    s = cent.shape[1]
    nc = n // 128
    p = 4
    planes = jnp.concatenate([xyz, feat], axis=-1)
    planes = jnp.swapaxes(planes, 1, 2).reshape(b, p * nc, 128)
    lt = pallas_ops._lt128()
    kernel = functools.partial(
        _abl2_kernel, radius=0.05, num_chunks=nc, tile_s=tile_s,
        with_scan=with_scan)
    cspec = pl.BlockSpec((1, tile_s, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b, s // tile_s),
        in_specs=[
            pl.BlockSpec((1, p * nc, 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            cspec, cspec, cspec,
            pl.BlockSpec((128, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_s, 128), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, 128), jnp.float32),
    )(planes, cent[..., 0:1], cent[..., 1:2], cent[..., 2:3], lt)


def abl2_loop(k, with_scan):
    @jax.jit
    def run():
        def body(i, acc):
            o = abl2_run(xyzb + i * 1e-6, featb, centb, with_scan)
            return acc + jnp.sum(o)
        return jax.lax.fori_loop(0, k, body, 0.0)
    return run


diff_time("sa0_stage2_with_scan", lambda k: abl2_loop(k, True))
diff_time("sa0_stage2_no_scan", lambda k: abl2_loop(k, False))

# ---- 5. rollout bench with v5 --------------------------------------------
try:
    from mpinets_tpu.data.synthetic import random_problem_batch
    from mpinets_tpu.rollout.engine import make_rollout_fn

    model = MotionPolicyNetwork(compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 6272, 4)), jnp.zeros((1, 7)))
    problem = random_problem_batch(jax.random.fold_in(rng, BB), BB)
    apply_fn = make_fused_apply(jnp.bfloat16, sa_impl="v5")
    rolls = {
        n: make_rollout_fn(model, max_steps=n, stop_on_success=False,
                           record_trajectory=False, apply_fn=apply_fn)
        for n in (5, 30)
    }
    for r in rolls.values():
        np.asarray(r(params, problem, rng).final_q)
    best = 0.0
    for rep in range(3):
        t = {}
        for n, r in rolls.items():
            t0 = time.perf_counter()
            np.asarray(
                r(params, problem, jax.random.fold_in(rng, rep)).final_q)
            t[n] = time.perf_counter() - t0
        if t[30] > t[5]:
            best = max(best, BB * 25 / (t[30] - t[5]))
    emit(kind="rollout", name="v5", env_steps_per_s=round(best, 1))
except Exception:
    emit(kind="rollout", name="EXC", err=traceback.format_exc()[-400:])

emit(kind="done", t=time.strftime("%H:%M:%S"))
