"""On-chip session r3f: stage attribution inside the v6 SA kernel via the
debug_stop hook (4=masks, 5=batched gather, 55=lane concat, 6=bc/fix
columns, 7=MLP, 0=full incl. pool+transpose). ts=16, SA0 shapes.
"""
import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

LOG = open("/root/repo/.onchip_r3f.jsonl", "a", buffering=1)


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
mk = lambda i, s: jax.random.normal(jax.random.fold_in(kb, 10 + i), s) * 0.2
w1, b1 = mk(0, (4, 64)), mk(1, (64,))
w2, b2 = mk(2, (64, 64)), mk(3, (64,))
w3, b3 = mk(4, (64, 64)), mk(5, (64,))


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


def loop(k, stop, ts=16):
    @jax.jit
    def run():
        def body(i, acc):
            f, _ = pallas_ops.sa_stage(
                xyzb + i * 1e-6, featb, centb, w1, b1, w2, b2, w3, b3,
                radius=0.05, nsample=128, compute_dtype=jnp.bfloat16,
                tile_s=ts, impl="v5", debug_stop=stop,
            )
            return acc + jnp.sum(f)
        return jax.lax.fori_loop(0, k, body, 0.0)
    return run


for stop in (4, 5, 55, 6, 7, 0):
    diff_time(f"v6_stop{stop}_ts16", lambda k, s=stop: loop(k, s))

emit(kind="done", t=time.strftime("%H:%M:%S"))
