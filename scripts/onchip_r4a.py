"""On-chip session r4a: design probes for the v8 SA kernel + fused VJP.

Questions this session answers (JSONL to .onchip_r4a.jsonl, self-bounding):

  1. wide_gather: does Mosaic accept take_along_axis with an index array
     WIDER than the 128-lane data table ([224,128] data, [224,2048] idx)?
     If yes, the SA gather needs NO table replication and no per-g
     lane-concat of raw blocks. Parity vs numpy + differential cost.
  2. scratch_when: does VMEM scratch persist across grid steps so per-sample
     tables can be built once under pl.when(j == 0)?
  3. xla_tile: cost of building the replicated gather table in XLA
     ([256, 224, 128] -> [256, 3584, 128] bf16) if (1) fails.
  4. topk_chunks: cost of lax.top_k over [256, 512, 56] chunk distances
     (fast-grouping chunk-window selection, W=16).
  5. scatter_add: cost of the train-path feature-gradient scatter
     ([64, 6272, 64] .at[:, idx].add) at B=64 training shapes.
  6. sort_cost: lax.sort_key_val on [256, 6272] + 4-channel gather
     (spatial-sort option for fast grouping).
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

LOG = open("/root/repo/.onchip_r4a.jsonl", "a", buffering=1)


def emit(**kw):
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw)[:250], file=sys.stderr, flush=True)


emit(kind="start", t=time.strftime("%H:%M:%S"))


def diff_time(name, make_loop, ks=(2, 10), scale=1):
    """Differential in-jit loop timing; us per call and per 'sample'."""
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
             us_per_sample=round(per * 1e6 / scale, 2))
    except Exception:
        emit(kind="time", name=name, err=traceback.format_exc()[-400:])


# ------------------------------------------------------------- 1. wide gather
P, NC, TS = 4, 56, 16
ROWS = P * NC


def _wide_kernel(tab_ref, idx_ref, out_ref):
    gat = jnp.take_along_axis(tab_ref[0], idx_ref[0], axis=1)  # [224, 2048]?
    out_ref[0] = jnp.sum(gat.reshape(P, NC, TS * 128), axis=1)


@jax.jit
def wide_gather(tab, idx):
    b = tab.shape[0]
    return pl.pallas_call(
        _wide_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, ROWS, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, TS * 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P, TS * 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, P, TS * 128), jnp.float32),
    )(tab, idx)


try:
    B = 8
    key = jax.random.PRNGKey(0)
    tab = jax.random.normal(key, (B, ROWS, 128), jnp.float32)
    idx = jax.random.randint(jax.random.fold_in(key, 1),
                             (B, ROWS, TS * 128), 0, 128)
    out = np.asarray(wide_gather(tab, idx))
    tab_n, idx_n = np.asarray(tab), np.asarray(idx)
    gat = np.take_along_axis(
        tab_n[:, :, :], idx_n, axis=2
    )  # numpy broadcast gather [B, ROWS, 2048]
    exp = gat.reshape(B, P, NC, TS * 128).sum(2)
    err = float(np.abs(out - exp).max())
    emit(kind="probe", name="wide_gather", ok=True, max_err=err)

    BB = 256
    tabb = jax.random.normal(key, (BB, ROWS, 128), jnp.float32)
    idxb = jax.random.randint(key, (BB, ROWS, TS * 128), 0, 128)

    def mk(k):
        @jax.jit
        def loop():
            def body(i, c):
                o = wide_gather(tabb + c, idxb)
                return c + jnp.sum(o) * 1e-20
            return jax.lax.fori_loop(0, k, body, 0.0)
        return loop

    diff_time("wide_gather_b256", mk, scale=BB)
except Exception:
    emit(kind="probe", name="wide_gather", ok=False,
         err=traceback.format_exc()[-600:])


# -------------------------------------------------- 2. scratch persistence
def _scratch_kernel(out_ref, scr_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        scr_ref[:] = jax.lax.broadcasted_iota(jnp.float32, (8, 128), 1)

    out_ref[0] = scr_ref[:] + jnp.float32(j)


try:
    out = pl.pallas_call(
        _scratch_kernel,
        grid=(4,),
        out_specs=pl.BlockSpec((1, 8, 128), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, 8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )()
    out = np.asarray(out)
    iota = np.broadcast_to(np.arange(128, dtype=np.float32), (8, 128))
    ok = all(np.allclose(out[j], iota + j) for j in range(4))
    emit(kind="probe", name="scratch_when", ok=bool(ok))
except Exception:
    emit(kind="probe", name="scratch_when", ok=False,
         err=traceback.format_exc()[-600:])


# ------------------------------------------------------------- 3. xla tile
try:
    BB = 256
    planes = jax.random.normal(jax.random.PRNGKey(2), (BB, ROWS, 128),
                               jnp.bfloat16)

    def mk(k):
        @jax.jit
        def loop():
            def body(i, c):
                t = jnp.tile(planes + c.astype(jnp.bfloat16),
                             (1, TS, 1))
                return c + jnp.sum(t[:, ::997, ::31].astype(jnp.float32)) * 1e-20
            return jax.lax.fori_loop(0, k, body, 0.0)
        return loop

    diff_time("xla_tile_b256_bf16", mk, scale=BB)
except Exception:
    emit(kind="time", name="xla_tile_b256_bf16",
         err=traceback.format_exc()[-400:])


# ----------------------------------------------------------- 4. top_k chunks
try:
    BB = 256
    S = 512
    d = jax.random.normal(jax.random.PRNGKey(3), (BB, S, NC))

    def mk(k):
        @jax.jit
        def loop():
            def body(i, c):
                _, ids = jax.lax.top_k(-(d + c), 16)
                return c + jnp.sum(ids) * 1e-20
            return jax.lax.fori_loop(0, k, body, 0.0)
        return loop

    diff_time("topk16_of_56_b256", mk, scale=BB)
except Exception:
    emit(kind="time", name="topk16_of_56_b256",
         err=traceback.format_exc()[-400:])


# ---------------------------------------------------------- 5. scatter add
try:
    BT = 64
    N, S, NS, C = 6272, 512, 128, 64
    vals = jax.random.normal(jax.random.PRNGKey(4), (BT, S * NS, C))
    sidx = jax.random.randint(jax.random.PRNGKey(5), (BT, S * NS), 0, N)

    def mk(k):
        @jax.jit
        def loop():
            def body(i, c):
                z = jnp.zeros((BT, N, C))
                z = z.at[
                    jnp.arange(BT)[:, None], sidx
                ].add(vals + c)
                return c + jnp.sum(z[:, ::511, ::17]) * 1e-20
            return jax.lax.fori_loop(0, k, body, 0.0)
        return loop

    diff_time("scatter_add_train_b64", mk, ks=(2, 6), scale=BT)
except Exception:
    emit(kind="time", name="scatter_add_train_b64",
         err=traceback.format_exc()[-400:])


# --------------------------------------------------------------- 6. sort
try:
    BB = 256
    keys = jax.random.normal(jax.random.PRNGKey(6), (BB, 6272))
    valsx = jax.random.normal(jax.random.PRNGKey(7), (BB, 6272, 4))

    def mk(k):
        @jax.jit
        def loop():
            def body(i, c):
                sk, si = jax.lax.sort_key_val(
                    keys + c, jax.lax.broadcasted_iota(jnp.int32, keys.shape, 1)
                )
                g = jnp.take_along_axis(valsx, si[..., None], axis=1)
                return c + jnp.sum(g[:, ::997]) * 1e-20
            return jax.lax.fori_loop(0, k, body, 0.0)
        return loop

    diff_time("sort6272_gather4_b256", mk, ks=(2, 6), scale=BB)
except Exception:
    emit(kind="time", name="sort6272_gather4_b256",
         err=traceback.format_exc()[-400:])

emit(kind="done", t=time.strftime("%H:%M:%S"))
