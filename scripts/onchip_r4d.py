"""On-chip session r4d: precision-correct parity + train-step breakdown.

1. Re-measure full-shape f32 parity vs flax with
   jax_default_matmul_precision=highest (r4c ran at DEFAULT, where TPU f32
   matmuls execute as bf16 passes in BOTH paths but with different op
   order — the 3.3e-3 it recorded is that artifact, not kernel error).
   Updates ONCHIP_EVIDENCE.json in place.
2. Train-step cost attribution: network-grad only, loss-grad only,
   SA1-scatter ablation, and an XLA gather micro — names the bottleneck
   behind the ~380 env-samples/s plateau.
3. Rollout batch sweep for the bench headline config (fast16/fast8/np256).
4. v8 exact with tile_s=32.
"""
import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

LOG = open("/root/repo/.onchip_r4d.jsonl", "a", buffering=1)


def emit(**kw):
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw)[:250], file=sys.stderr, flush=True)


emit(kind="start", t=time.strftime("%H:%M:%S"))

from mpinets_tpu.model.fused import make_fused_apply
from mpinets_tpu.model.fused_train import (
    make_fused_train_apply, make_sa_stage_train,
)
from mpinets_tpu.model.policy import MotionPolicyNetwork

model = MotionPolicyNetwork(compute_dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
params = model.init(rng, jnp.zeros((1, 6272, 4)), jnp.zeros((1, 7)))

kb = jax.random.PRNGKey(7)

# ---------------------------------------------- 1. parity at HIGHEST prec
try:
    B_PAR = 8
    pc_par = jnp.concatenate(
        [
            jax.random.uniform(kb, (B_PAR, 6272, 3), minval=-0.8, maxval=0.8),
            jax.random.randint(jax.random.fold_in(kb, 1), (B_PAR, 6272, 1),
                               0, 3).astype(jnp.float32),
        ],
        axis=-1,
    )
    q_par = jax.random.uniform(jax.random.fold_in(kb, 2), (B_PAR, 7),
                               minval=-1, maxval=1)
    fm = MotionPolicyNetwork(compute_dtype=jnp.float32)
    flax_out = np.asarray(fm.apply(params, pc_par, q_par))
    parity = {}
    for name, cfg in (("v5", dict(sa_impl="v5")),
                      ("v8", dict(sa_impl="v8")),
                      ("fast16", dict(sa_impl="v8", fast_grouping=16)),
                      ("fast12", dict(sa_impl="v8", fast_grouping=12)),
                      ("fast8", dict(sa_impl="v8", fast_grouping=8))):
        f = make_fused_apply(jnp.float32, **cfg)
        o = np.asarray(f(params, pc_par, q_par))
        parity[name] = {
            "max_abs_vs_flax": float(np.abs(o - flax_out).max()),
            "mean_abs_vs_flax": float(np.abs(o - flax_out).mean()),
        }
        emit(kind="parity_hi", config=name, **parity[name])
    ev = json.load(open("/root/repo/ONCHIP_EVIDENCE.json"))
    ev["parity_f32_vs_flax_B8"] = parity
    ev["parity_matmul_precision"] = "highest"
    json.dump(ev, open("/root/repo/ONCHIP_EVIDENCE.json", "w"), indent=1)
except Exception:
    emit(kind="parity_hi", err=traceback.format_exc()[-500:])

# ------------------------------------- 2. train-step cost attribution B=64
from mpinets_tpu.data.synthetic import training_batch
from mpinets_tpu.train import learner

BT = 64
batch = training_batch(jax.random.fold_in(rng, 21), BT)


def timeit(name, fn, ks=(2, 6), scale=BT):
    try:
        fn()  # compile
        ts = {}
        for k in ks:
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(k):
                    out = fn()
                np.asarray(out)
                best = min(best, time.perf_counter() - t0)
            ts[k] = best
        per = (ts[ks[1]] - ts[ks[0]]) / (ks[1] - ks[0])
        emit(kind="attr", name=name, ms_per_call=round(per * 1e3, 2),
             env_samples_per_s=round(scale / per, 1))
    except Exception:
        emit(kind="attr", name=name, err=traceback.format_exc()[-400:])


fused_apply = make_fused_train_apply(jnp.bfloat16)

# (a) network grad only (no loss machinery)
netgrad = jax.jit(jax.grad(
    lambda p: jnp.sum(jnp.sin(fused_apply(p, batch["xyz"],
                                          batch["configuration"])))
))
timeit("grad_network_only", lambda: netgrad(params)[
    "params"]["decoder_3"]["bias"])

# (b) loss machinery only (identity network): FK sampling + sdf fwd+bwd
from mpinets_tpu.train import loss as losses


def loss_only(q):
    c, pm, _ = losses.bc_losses(
        q, batch["supervision"], learner.scene_from_batch(batch)
    )
    return pm + 5.0 * c


lossgrad = jax.jit(jax.grad(loss_only))
timeit("grad_loss_only", lambda: lossgrad(batch["configuration"]))

# (c) full fused train step (reference)
step = learner.make_train_step(model, apply_fn=fused_apply)
state = learner.init_state(model, rng, batch)


def full_step():
    s, m = step(state, batch)
    return m["val_loss"]


timeit("full_fused_step", full_step)

# (d) forward-only at B=64 for scale
fwd = jax.jit(lambda: jnp.sum(make_fused_apply(jnp.bfloat16)(
    params, batch["xyz"], batch["configuration"])))
timeit("fwd_only", fwd)

# (e) XLA gather micro: the recompute's [B, S*ns] gather from [B, N, 4]
gidx = jax.random.randint(kb, (BT, 512 * 128), 0, 6272)
data4 = jax.random.normal(kb, (BT, 6272, 4))


@jax.jit
def gather_micro():
    # full-sum scalarization: slicing the output lets XLA gather only the
    # sliced indices (the first r4d run measured ~0 because of this)
    g = jnp.take_along_axis(data4, gidx[..., None], axis=1)
    return jnp.sum(g)


timeit("xla_gather_65536x4", gather_micro)

# (f) SA1 recompute vjp alone at train shapes
sa1_tr = make_sa_stage_train(0.3, 128, jnp.bfloat16)
c0 = jax.random.uniform(kb, (BT, 512, 3), minval=-0.6, maxval=0.6)
f0 = jax.random.normal(kb, (BT, 512, 64))
c1 = c0[:, :128]
mkw = lambda i, s: jax.random.normal(jax.random.fold_in(kb, i), s) * 0.1
w1, b1 = mkw(3, (67, 128)), mkw(4, (128,))
w2, b2 = mkw(5, (128, 128)), mkw(6, (128,))
w3, b3 = mkw(7, (128, 256)), mkw(8, (256,))
sa1grad = jax.jit(jax.grad(
    lambda f: jnp.sum(jnp.sin(sa1_tr(c0, f, c1, w1, b1, w2, b2, w3, b3)))
))
timeit("grad_sa1_stage_only", lambda: sa1grad(f0))

# --------------------------------------------- 3. rollout batch sweep
from mpinets_tpu.data.synthetic import random_problem_batch
from mpinets_tpu.rollout.engine import make_rollout_fn

sweep = {}
for name, kw in (("fast16", dict(fast_grouping=16)),
                 ("fast8", dict(fast_grouping=8))):
    apply_fn = make_fused_apply(jnp.bfloat16, sa_impl="v8", **kw)
    for bb in (256, 512):
        try:
            problem = random_problem_batch(jax.random.fold_in(rng, 3), bb)
            rollouts = {
                n: make_rollout_fn(model, max_steps=n, stop_on_success=False,
                                   record_trajectory=False, apply_fn=apply_fn)
                for n in (5, 30)
            }
            times = {}
            for n, r in rollouts.items():
                res = r(params, problem, jax.random.fold_in(rng, 4))
                np.asarray(res.final_q)
                best = 1e9
                for _ in range(3):
                    t0 = time.perf_counter()
                    res = r(params, problem, jax.random.fold_in(rng, 5))
                    np.asarray(res.final_q)
                    best = min(best, time.perf_counter() - t0)
                times[n] = best
            rate = bb * 25 / (times[30] - times[5])
            sweep[f"{name}_b{bb}"] = round(rate, 1)
            emit(kind="sweep", config=f"{name}_b{bb}",
                 env_steps_per_s=round(rate, 1))
        except Exception:
            emit(kind="sweep", config=f"{name}_b{bb}",
                 err=traceback.format_exc()[-300:])

# --------------------------------------------- 4. v8 exact tile_s=32
try:
    BB = 256
    pc_b = jnp.concatenate(
        [
            jax.random.uniform(kb, (BB, 6272, 3), minval=-0.8, maxval=0.8),
            jax.random.randint(jax.random.fold_in(kb, 1), (BB, 6272, 1),
                               0, 3).astype(jnp.float32),
        ],
        axis=-1,
    )
    q_b = jax.random.uniform(jax.random.fold_in(kb, 2), (BB, 7),
                             minval=-1, maxval=1)
    for ts in (16, 32):
        f = make_fused_apply(jnp.bfloat16, sa_impl="v8", sa_tiles=(ts, 16))

        def mk(k, f=f):
            @jax.jit
            def loop():
                def body(i, c):
                    out = f(params, pc_b + (c * 1e-9).astype(jnp.float32), q_b)
                    return c + jnp.sum(out) * 1e-6
                return jax.lax.fori_loop(0, k, body, 0.0)
            return loop

        fns = {k: mk(k) for k in (2, 10)}
        for fn in fns.values():
            float(fn())
        ts_times = {}
        for k, fn in fns.items():
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(fn())
                best = min(best, time.perf_counter() - t0)
            ts_times[k] = best
        per = (ts_times[10] - ts_times[2]) / 8
        emit(kind="time", name=f"fwd_v8_ts{ts}",
             us_per_sample=round(per * 1e6 / BB, 2))
except Exception:
    emit(kind="time", name="fwd_v8_ts32", err=traceback.format_exc()[-400:])

emit(kind="done", t=time.strftime("%H:%M:%S"))
