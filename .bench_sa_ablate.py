"""Ablate stages of _sa_kernel to find the slow one (SA0 + SA1 shapes).
All stages compile+run in ONE process (tunnel discipline)."""
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from mpinets_tpu.kernels.pallas_ops import _lt128, _bd_strict, _TS

B = 64
CASES = {"sa0": (6272, 512, 4), "sa1": (512, 128, 67)}


def make_kern(STAGE, nc, P):
    def kern(pts_ref, cx_ref, cy_ref, cz_ref, lt_ref, bd_ref, out_ref):
        ts, ns = _TS, 128
        rb = ts * nc
        f32 = jnp.float32
        jt = pl.program_id(1)
        cxs = [cx_ref[0, 0, jt * ts + g] for g in range(ts)]
        cys = [cy_ref[0, 0, jt * ts + g] for g in range(ts)]
        czs = [cz_ref[0, 0, jt * ts + g] for g in range(ts)]
        planes = pts_ref[0]
        x = planes[0 * nc : 1 * nc].astype(f32)
        y = planes[1 * nc : 2 * nc].astype(f32)
        z = planes[2 * nc : 3 * nc].astype(f32)
        parts = []
        for g in range(ts):
            dx = x - cxs[g]; dy = y - cys[g]; dz = z - czs[g]
            parts.append(dx * dx + dy * dy + dz * dz)
        d2 = jnp.concatenate(parts, axis=0)
        in_ball = (d2 < 0.0025).astype(jnp.bfloat16)
        local_cnt = jnp.dot(in_ball, lt_ref[:], preferred_element_type=f32)
        tot = local_cnt[:, 127:128]
        base_excl = jnp.dot(bd_ref[:], tot, preferred_element_type=f32)
        base_incl = base_excl + tot
        cnt = local_cnt + base_excl
        if STAGE == 1:
            out_ref[0] = jnp.sum(cnt.reshape(ts, nc, 128), axis=1); return
        jlane = jax.lax.broadcasted_iota(jnp.int32, (rb, 128), 1)
        jf = jlane.astype(f32)
        lo = jnp.zeros((rb, 128), jnp.int32)
        for step in (128, 64, 32, 16, 8, 4, 2, 1):
            probe = jnp.minimum(lo + step - 1, 127)
            gathered = jnp.take_along_axis(cnt, probe, axis=1)
            ok = (gathered <= jf) & (lo + step <= 128)
            lo = jnp.where(ok, lo + step, lo)
        pos = jnp.minimum(lo, 127)
        if STAGE == 2:
            out_ref[0] = jnp.sum(pos.astype(f32).reshape(ts, nc, 128), axis=1); return
        valid = (jf >= base_excl) & (jf < base_incl)
        validf = valid.astype(f32)
        planes_f = planes.astype(f32)
        acc = []
        for g in range(ts):
            pos_g = pos[g * nc : (g + 1) * nc]
            val_g = validf[g * nc : (g + 1) * nc]
            gidx = jnp.broadcast_to(pos_g, (P, nc, 128)).reshape(P * nc, 128)
            gmask = jnp.broadcast_to(val_g, (P, nc, 128)).reshape(P * nc, 128)
            gat = jnp.take_along_axis(planes_f, gidx, axis=1) * gmask
            merged_g = jnp.sum(gat.reshape(P, nc, 128), axis=1)  # [P, 128]
            if STAGE >= 4:
                merged_g = jnp.transpose(merged_g)  # [128, P]
                acc.append(jnp.sum(merged_g, axis=1, keepdims=True))
            else:
                acc.append(jnp.sum(merged_g, axis=0, keepdims=True))
        if STAGE == 3:
            out_ref[0] = jnp.broadcast_to(
                jnp.concatenate(acc, axis=0), (ts, 128)
            ); return
        col = jnp.concatenate(acc, axis=1)  # [128, ts]
        out_ref[0] = jnp.broadcast_to(jnp.transpose(col), (ts, 128))
    return kern


def run_case(name, STAGE):
    N, S, P = CASES[name]
    nc = N // 128
    args = dict(
        grid=(B, S // _TS),
        in_specs=[
            pl.BlockSpec((1, P * nc, 128), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), lambda i, j: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, S), lambda i, j: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, S), lambda i, j: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((128, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TS * nc, _TS * nc), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TS, 128), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, 128), jnp.float32),
    )
    key = jax.random.PRNGKey(0)
    planes = jax.random.uniform(key, (B, P * nc, 128))
    cents = jax.random.uniform(key, (B, 1, S))
    lt = _lt128(); bd = _bd_strict(_TS, nc)
    kern = make_kern(STAGE, nc, P)
    f = jax.jit(lambda *a: pl.pallas_call(kern, **args)(*a))
    try:
        r = f(planes, cents, cents, cents, lt, bd); np.asarray(r).ravel()[:1]
        t0 = time.perf_counter(); n = 5
        for _ in range(n):
            r = f(planes, cents, cents, cents, lt, bd)
        np.asarray(r).ravel()[:1]
        dt = (time.perf_counter() - t0) / n
        print(f"{name} stage {STAGE}: {dt*1e3:8.1f} ms ({dt/B*1e6:.0f} us/sample)", flush=True)
    except Exception as e:
        msg = str(e); i = msg.find("Mosaic")
        print(f"{name} stage {STAGE}: FAIL {msg[max(i,0):max(i,0)+160]}", flush=True)


for case in ("sa0", "sa1"):
    for st in (1, 2, 3, 4):
        run_case(case, st)
