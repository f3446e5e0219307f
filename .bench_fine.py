"""Fine-grained SA0 ablation: find the 29us/tile. One process, SA0 shapes."""
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from mpinets_tpu.kernels.pallas_ops import _lt128, _bd_strict

B, N, S, P, TS = 64, 6272, 512, 4, 8
nc = N // 128
rb = TS * nc

def mk_call(kern, extra_in=()):
    specs = [
        pl.BlockSpec((1, P * nc, 128), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),   # planes
        pl.BlockSpec((1, TS * nc, 128), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),  # x tiled
        pl.BlockSpec((1, TS * nc, 128), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),  # y tiled
        pl.BlockSpec((1, TS * nc, 128), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),  # z tiled
        pl.BlockSpec((1, TS * nc, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),    # cx rep
        pl.BlockSpec((1, TS * nc, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TS * nc, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((128, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),            # LT
        pl.BlockSpec((rb, rb), lambda i, j: (0, 0), memory_space=pltpu.VMEM),              # BD
        pl.BlockSpec((8, P * nc), lambda i, j: (0, 0), memory_space=pltpu.VMEM),           # SUMP (p-merge const)
    ]
    return pl.pallas_call(
        kern,
        grid=(B, S // TS),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, 8, 128), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
    )

def body_common(xt, yt, zt, cxr, cyr, czr):
    dx = xt[0].astype(jnp.float32) - cxr[0]
    dy = yt[0].astype(jnp.float32) - cyr[0]
    dz = zt[0].astype(jnp.float32) - czr[0]
    return dx * dx + dy * dy + dz * dz      # [rb, 128]

def k_null(pl_, xt, yt, zt, cxr, cyr, czr, lt, bd, sump, out):
    out[0] = xt[0][:8]

def k_a(pl_, xt, yt, zt, cxr, cyr, czr, lt, bd, sump, out):
    d2 = body_common(xt, yt, zt, cxr, cyr, czr)
    out[0] = d2[:8]

def k_c(pl_, xt, yt, zt, cxr, cyr, czr, lt, bd, sump, out):
    d2 = body_common(xt, yt, zt, cxr, cyr, czr)
    ib = (d2 < 0.0025).astype(jnp.bfloat16)
    cnt = jnp.dot(ib, lt[:], preferred_element_type=jnp.float32)
    out[0] = cnt[:8]

def k_d(pl_, xt, yt, zt, cxr, cyr, czr, lt, bd, sump, out):
    d2 = body_common(xt, yt, zt, cxr, cyr, czr)
    ib = (d2 < 0.0025).astype(jnp.bfloat16)
    local = jnp.dot(ib, lt[:], preferred_element_type=jnp.float32)
    tot = local[:, 127:128]
    be = jnp.dot(bd[:], tot, preferred_element_type=jnp.float32)
    cnt = local + be
    out[0] = cnt[:8]

def k_e(pl_, xt, yt, zt, cxr, cyr, czr, lt, bd, sump, out):
    d2 = body_common(xt, yt, zt, cxr, cyr, czr)
    ib = (d2 < 0.0025).astype(jnp.bfloat16)
    local = jnp.dot(ib, lt[:], preferred_element_type=jnp.float32)
    tot = local[:, 127:128]
    be = jnp.dot(bd[:], tot, preferred_element_type=jnp.float32)
    cnt = local + be
    jf = jax.lax.broadcasted_iota(jnp.int32, (rb, 128), 1).astype(jnp.float32)
    lo = jnp.zeros((rb, 128), jnp.int32)
    for step in (128, 64, 32, 16, 8, 4, 2, 1):
        probe = jnp.minimum(lo + step - 1, 127)
        g = jnp.take_along_axis(cnt, probe, axis=1)
        ok = (g <= jf) & (lo + step <= 128)
        lo = jnp.where(ok, lo + step, lo)
    out[0] = lo[:8].astype(jnp.float32)

def k_f(pl_, xt, yt, zt, cxr, cyr, czr, lt, bd, sump, out):
    planes = pl_[0].astype(jnp.float32)
    d2 = body_common(xt, yt, zt, cxr, cyr, czr)
    ib = (d2 < 0.0025).astype(jnp.bfloat16)
    local = jnp.dot(ib, lt[:], preferred_element_type=jnp.float32)
    tot = local[:, 127:128]
    be = jnp.dot(bd[:], tot, preferred_element_type=jnp.float32)
    cnt = local + be
    jf = jax.lax.broadcasted_iota(jnp.int32, (rb, 128), 1).astype(jnp.float32)
    lo = jnp.zeros((rb, 128), jnp.int32)
    for step in (128, 64, 32, 16, 8, 4, 2, 1):
        probe = jnp.minimum(lo + step - 1, 127)
        g = jnp.take_along_axis(cnt, probe, axis=1)
        ok = (g <= jf) & (lo + step <= 128)
        lo = jnp.where(ok, lo + step, lo)
    pos = jnp.minimum(lo, 127)
    valid = ((jf >= be) & (jf < be + tot)).astype(jnp.float32)
    acc = None
    for g_ in range(TS):
        pos_g = pos[g_ * nc : (g_ + 1) * nc]
        val_g = valid[g_ * nc : (g_ + 1) * nc]
        gidx = jnp.broadcast_to(pos_g, (P, nc, 128)).reshape(P * nc, 128)
        gmask = jnp.broadcast_to(val_g, (P, nc, 128)).reshape(P * nc, 128)
        gat = jnp.take_along_axis(planes, gidx, axis=1) * gmask
        m = jnp.dot(sump[:], gat, preferred_element_type=jnp.float32)  # [8,128]
        acc = m if acc is None else acc + m
    out[0] = acc

import time
def bench(name, f, *args, n=10):
    try:
        r = f(*args); np.asarray(r).ravel()[:1]
        t0 = time.perf_counter()
        for _ in range(n): r = f(*args)
        np.asarray(r).ravel()[:1]
        dt = (time.perf_counter() - t0) / n
        print(f"{name:22s} {dt*1e3:9.2f} ms ({dt/B*1e6:6.0f} us/sample, {dt/(B*S/TS)*1e6:5.1f} us/tile)", flush=True)
    except Exception as e:
        m = str(e); i = max(m.find("Mosaic"), 0)
        print(f"{name:22s} FAIL {m[i:i+160]}", flush=True)

key = jax.random.PRNGKey(0)
planes = jax.random.uniform(key, (B, P * nc, 128))
x = planes[:, :nc]
xt = jnp.tile(x, (1, TS, 1)); yt = jnp.tile(planes[:, nc:2*nc], (1, TS, 1))
zt = jnp.tile(planes[:, 2*nc:3*nc], (1, TS, 1))
c = jax.random.uniform(key, (B, S, 1))
crep = jnp.repeat(c, nc, axis=1)  # [B, S*nc, 1]
lt = _lt128(); bd = _bd_strict(TS, nc)
# SUMP [8, rb_p]: merge P*nc rows -> 8?? actually merges p*nc gat rows into [8,128]:
# sum over chunks per plane: SUMP[r8?, p*nc]: here approximating with [8, P*nc] const
sump = (jax.lax.broadcasted_iota(jnp.int32, (8, P * nc), 0) // 1 == 
        jax.lax.broadcasted_iota(jnp.int32, (8, P * nc), 1) // nc).astype(jnp.float32)
sump = sump[:8]

for name, k in (("0: null", k_null), ("a: d2 only", k_a), ("c: +LT", k_c),
                ("d: +BD", k_d), ("e: +search", k_e), ("f: +gather+merge", k_f)):
    f = jax.jit(lambda *ar, k=k: mk_call(k)(*ar))
    bench(name, f, planes, xt, yt, zt, crep, crep, crep, lt, bd, sump, n=10)
