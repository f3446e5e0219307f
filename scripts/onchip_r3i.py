"""On-chip session r3i: FINAL r3 config (v7 gather block + pad_chunks SA0,
rounds-1-2-only select search) — SA0 timing, fused fwd, rollout bench, and
the FULL-SHAPE fused-vs-flax integration check (VERDICT r2 #3).
"""
import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

LOG = open("/root/repo/.onchip_r3i.jsonl", "a", buffering=1)


def emit(**kw):
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw)[:250], file=sys.stderr, flush=True)


emit(kind="start", t=time.strftime("%H:%M:%S"))

from mpinets_tpu.kernels import pallas_ops
from mpinets_tpu.model.fused import make_fused_apply
from mpinets_tpu.model.policy import MotionPolicyNetwork

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


def sa0_loop(k):
    @jax.jit
    def run():
        def body(i, acc):
            f, _ = pallas_ops.sa_stage(
                xyzb + i * 1e-6, featb, centb, w1, b1, w2, b2, w3, b3,
                radius=0.05, nsample=128, compute_dtype=jnp.bfloat16,
                tile_s=16, impl="v5", pad_chunks=True,
            )
            return acc + jnp.sum(f)
        return jax.lax.fori_loop(0, k, body, 0.0)
    return run


diff_time("final_sa0", sa0_loop)

model = MotionPolicyNetwork(compute_dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
params = model.init(rng, jnp.zeros((1, 6272, 4)), jnp.zeros((1, 7)))
pc_full = jnp.concatenate([xyzb, featb], axis=-1)
qb = jax.random.uniform(jax.random.fold_in(kb, 2), (BB, 7),
                        minval=-1, maxval=1)


def fwd_loop(k):
    ap = make_fused_apply(jnp.bfloat16)

    @jax.jit
    def run():
        def body(i, acc):
            dq = ap(params, pc_full.at[0, 0, 0].add(i * 1e-6), qb)
            return acc + jnp.sum(dq)
        return jax.lax.fori_loop(0, k, body, 0.0)
    return run


diff_time("final_fused_fwd", fwd_loop)

# ---- full-shape fused vs flax integration check ---------------------------
try:
    small = pc_full[:8]
    qs = qb[:8]
    ref16 = np.asarray(jax.jit(model.apply)(params, small, qs))
    fused16 = np.asarray(make_fused_apply(jnp.bfloat16)(params, small, qs))
    emit(kind="parity", name="fullshape_bf16_fused_vs_flax",
         max_abs_err=float(np.abs(ref16 - fused16).max()),
         mean_abs=float(np.abs(ref16).mean()))
except Exception:
    emit(kind="parity", name="fullshape_EXC", err=traceback.format_exc()[-400:])

try:
    from mpinets_tpu.data.synthetic import random_problem_batch
    from mpinets_tpu.rollout.engine import make_rollout_fn

    problem = random_problem_batch(jax.random.fold_in(rng, BB), BB)
    apply_fn = make_fused_apply(jnp.bfloat16)
    rolls = {
        n: make_rollout_fn(model, max_steps=n, stop_on_success=False,
                           record_trajectory=False, apply_fn=apply_fn)
        for n in (5, 30)
    }
    for r in rolls.values():
        np.asarray(r(params, problem, rng).final_q)
    best = 0.0
    for rep in range(4):
        t = {}
        for n, r in rolls.items():
            t0 = time.perf_counter()
            np.asarray(
                r(params, problem, jax.random.fold_in(rng, rep)).final_q)
            t[n] = time.perf_counter() - t0
        if t[30] > t[5]:
            best = max(best, BB * 25 / (t[30] - t[5]))
    emit(kind="rollout", name="final_b256", env_steps_per_s=round(best, 1))
except Exception:
    emit(kind="rollout", name="EXC", err=traceback.format_exc()[-400:])

emit(kind="done", t=time.strftime("%H:%M:%S"))
