"""On-chip session r3d: micro-attribution of SA0 stage 3-5 costs.

Measures, at B=256 full SA0 shapes (ts=32, rb=1568):
  * stop3: stage2 + 7-round binary search    (lost to a tunnel blip in r3b)
  * stop4: + channel gathers/merge           (fixed ablation out-write)
  * pure-op microbenches: take_along_axis gather, pltpu.roll narrow/wide,
    MXU block-diag prefix (the roll-scan replacement candidate)

Appends JSONL to .onchip_r3d.jsonl. Self-bounding.
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

LOG = open("/root/repo/.onchip_r3d.jsonl", "a", buffering=1)


def emit(**kw):
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw)[:250], file=sys.stderr, flush=True)


emit(kind="start", t=time.strftime("%H:%M:%S"))

from mpinets_tpu.kernels import pallas_ops

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


# ---------------------------------------------------------------- ablation
_TS = 32


def _abl_kernel(pts_ref, cx_ref, cy_ref, cz_ref, lt_ref, out_ref,
                *, radius, num_chunks, tile_s, stop):
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
    acc = jnp.zeros((p, 128), f32)
    for g in range(ts):
        pos_g = pos[g * nc:(g + 1) * nc]
        val_g = validf[g * nc:(g + 1) * nc]
        gidx = jnp.broadcast_to(pos_g, (p, nc, 128)).reshape(p * nc, 128)
        gmask = jnp.broadcast_to(val_g, (p, nc, 128)).reshape(p * nc, 128)
        gat = jnp.take_along_axis(planes_g, gidx, axis=1) * gmask
        acc = acc + jnp.sum(gat.reshape(p, nc, 128), axis=1)
    out_ref[0] = jnp.broadcast_to(
        jnp.sum(acc, axis=0, keepdims=True), (ts, 128)
    )[:, :out_ref.shape[2]]


@functools.partial(jax.jit, static_argnames=("stop", "tile_s"))
def abl_run(xyz, feat, cent, stop, tile_s=_TS):
    b, n, _ = xyz.shape
    s = cent.shape[1]
    nc = n // 128
    p = 4
    planes = jnp.concatenate([xyz, feat], axis=-1)
    planes = jnp.swapaxes(planes, 1, 2).reshape(b, p * nc, 128)
    lt = pallas_ops._lt128()
    kernel = functools.partial(
        _abl_kernel, radius=0.05, num_chunks=nc, tile_s=tile_s, stop=stop)
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


def abl_loop(k, stop):
    @jax.jit
    def run():
        def body(i, acc):
            o = abl_run(xyzb + i * 1e-6, featb, centb, stop)
            return acc + jnp.sum(o)
        return jax.lax.fori_loop(0, k, body, 0.0)
    return run


diff_time("sa0_abl3_search", lambda k: abl_loop(k, 3))
diff_time("sa0_abl4_gathers", lambda k: abl_loop(k, 4))


# ------------------------------------------------------------ micro ops
def _micro_kernel(a_ref, i_ref, out_ref, *, op, reps):
    a = a_ref[:]
    idx = i_ref[:]
    rb = a.shape[0]
    if op == "gather":
        acc = jnp.zeros_like(a)
        cur = idx
        for _ in range(reps):
            g = jnp.take_along_axis(a, cur, axis=1)
            acc = acc + g
            cur = (cur + 1) % 128
        out_ref[:] = acc[:8]
    elif op == "roll_narrow":
        v = a[:, 0:1]
        for _ in range(reps):
            v = pltpu.roll(v, 1, 0) + 1.0
        out_ref[:] = jnp.broadcast_to(v, (rb, 128))[:8]
    elif op == "roll_wide":
        v = a
        for _ in range(reps):
            v = pltpu.roll(v, 1, 0) + 1.0
        out_ref[:] = v[:8]
    elif op == "vadd":
        v = a
        for _ in range(reps):
            v = v * 1.0000001 + 1.0
        out_ref[:] = v[:8]
    elif op == "bd_matmul":
        rbv = a.shape[0]
        i2 = jax.lax.broadcasted_iota(jnp.int32, (rbv, rbv), 0)
        j2 = jax.lax.broadcasted_iota(jnp.int32, (rbv, rbv), 1)
        bd = ((j2 < i2) & ((i2 // 49) == (j2 // 49))).astype(jnp.bfloat16)
        v = a.astype(jnp.bfloat16)
        acc = jnp.zeros_like(a)
        for _ in range(reps):
            acc = acc + jnp.dot(bd, v, preferred_element_type=jnp.float32)
            v = (acc[:, :1] * 0 + v.astype(jnp.float32)).astype(jnp.bfloat16)
        out_ref[:] = acc[:8]


@functools.partial(jax.jit, static_argnames=("op", "reps", "rb"))
def micro_run(a, idx, op, reps, rb):
    kernel = functools.partial(_micro_kernel, op=op, reps=reps)
    return pl.pallas_call(
        kernel,
        grid=(a.shape[0] // rb,),
        in_specs=[
            pl.BlockSpec((rb, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8 * (a.shape[0] // rb), 128),
                                       jnp.float32),
    )(a, idx)


RB = 1568
ROWS = RB * 16
a_big = jax.random.uniform(kb, (ROWS, 128), dtype=jnp.float32)
i_big = jax.random.randint(jax.random.fold_in(kb, 2), (ROWS, 128), 0, 128)


def micro_loop(k, op, reps):
    @jax.jit
    def run():
        def body(i, acc):
            o = micro_run(a_big + i * 1e-6, i_big, op, reps, RB)
            return acc + jnp.sum(o)
        return jax.lax.fori_loop(0, k, body, 0.0)
    return run


# Each call touches ROWS/RB=16 grid steps x rb=1568 rows x reps ops.
for op, reps in [("vadd", 8), ("vadd", 32), ("gather", 8), ("gather", 32),
                 ("roll_narrow", 8), ("roll_narrow", 32),
                 ("roll_wide", 8), ("roll_wide", 32)]:
    diff_time(f"micro_{op}_r{reps}", lambda k, o=op, r=reps: micro_loop(k, o, r))

emit(kind="done", t=time.strftime("%H:%M:%S"))
