"""Probe: which gather/selection formulations are fast on this TPU.

1. In-Pallas dynamic gather (jnp.take along sublanes of a VMEM array).
2. XLA take_along_axis (baseline) vs one-hot matmul gather.
3. XLA top_k full vs chunked tree-merge for first-k selection.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(fn, *args, iters=20):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters


B, S, NS, N, C = 64, 512, 128, 6272, 8

key = jax.random.PRNGKey(0)
F = jax.random.normal(key, (B, N, C), jnp.float32)
idx = jax.random.randint(key, (B, S, NS), 0, N)

# --- 1. Pallas in-kernel dynamic gather --------------------------------------
def gather_kernel(f_ref, idx_ref, out_ref):
    # f: [N, C]; idx: [TS, NS]; out: [TS, NS, C]
    ii = idx_ref[:]  # [TS, NS]
    flat = ii.reshape(-1)  # [TS*NS]
    out_ref[:] = jnp.take(f_ref[:], flat, axis=0).reshape(out_ref.shape)


def pallas_gather(f, ii):
    TS = 8
    return pl.pallas_call(
        gather_kernel,
        grid=(B, S // TS),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TS, NS), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TS, NS, C), lambda b, s: (b, s, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, NS, C), f.dtype),
    )(f, ii)


def gather_kernel2(f_ref, idx_ref, out_ref):
    ii = idx_ref[0]  # [TS, NS]
    f = f_ref[0]  # [N, C]
    out = jax.vmap(lambda row: f[row])(ii)  # [TS, NS, C]? via take
    out_ref[0] = out


try:
    def k1(f_ref, idx_ref, out_ref):
        ii = idx_ref[0].reshape(-1)
        out_ref[0] = jnp.take(f_ref[0], ii, axis=0).reshape(out_ref.shape[1:])

    TS = 8
    g = pl.pallas_call(
        k1,
        grid=(B, S // TS),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TS, NS), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TS, NS, C), lambda b, s: (b, s, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, NS, C), F.dtype),
    )
    t = bench(g, F, idx, iters=5)
    print(f"pallas dynamic take:      {t*1e3:9.2f} ms")
except Exception as e:
    print("pallas dynamic take FAILED:", str(e)[:300])

# --- 2. XLA gathers -----------------------------------------------------------
t = bench(
    lambda f, ii: jnp.take_along_axis(
        f, ii.reshape(B, -1)[..., None], axis=1
    ).reshape(B, S, NS, C),
    F, idx, iters=5,
)
print(f"XLA take_along_axis:      {t*1e3:9.2f} ms")

# one-hot matmul gather (SA1 scale: N=512)
N1, C1 = 512, 72
F1 = jax.random.normal(key, (B, N1, C1), jnp.float32)
idx1 = jax.random.randint(key, (B, 128, NS), 0, N1)
t = bench(
    lambda f, ii: jnp.take_along_axis(
        f, ii.reshape(B, -1)[..., None], axis=1
    ).reshape(B, 128, NS, C1),
    F1, idx1, iters=5,
)
print(f"XLA take_along (SA1):     {t*1e3:9.2f} ms")


def onehot_gather(f, ii):
    oh = jax.nn.one_hot(ii.reshape(B, -1), N1, dtype=jnp.bfloat16)
    return jnp.einsum(
        "bmn,bnc->bmc", oh, f.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).reshape(B, 128, NS, C1)


t = bench(onehot_gather, F1, idx1, iters=5)
print(f"onehot matmul (SA1):      {t*1e3:9.2f} ms")

# --- 3. top_k variants ---------------------------------------------------------
d2 = jax.random.uniform(key, (B, S, N))
inball = d2 < 0.0025


def topk_full(ib):
    lane = jax.lax.broadcasted_iota(jnp.int32, ib.shape, 2)
    k = jnp.where(ib, lane, N)
    neg, _ = jax.lax.top_k(-k, NS)
    return -neg


t = bench(topk_full, inball, iters=3)
print(f"top_k full (6272):        {t*1e3:9.2f} ms")


def topk_merge(ib):
    lane = jax.lax.broadcasted_iota(jnp.int32, ib.shape, 2)
    k = jnp.where(ib, lane, N)
    chunks = k.reshape(B, S, 49, 128)
    neg, _ = jax.lax.top_k(-chunks, NS)  # sort each 128-chunk
    cur = -neg  # [B,S,49,128] ascending
    m = 49
    while m > 1:
        if m % 2:
            pad = jnp.full((B, S, 1, NS), N, jnp.int32)
            cur = jnp.concatenate([cur, pad], axis=2)
            m += 1
        a = cur[:, :, 0::2]
        b = cur[:, :, 1::2]
        both = jnp.concatenate([a, b], axis=-1)  # [B,S,m/2,256]
        neg, _ = jax.lax.top_k(-both, NS)
        cur = -neg
        m //= 2
    return cur[:, :, 0]


t = bench(topk_merge, inball, iters=3)
print(f"top_k chunked merge:      {t*1e3:9.2f} ms")

# sanity
a = topk_full(inball[:2, :16])
b = topk_merge(inball[:2, :16])
print("merge == full:", bool(jnp.all(a == b)))
