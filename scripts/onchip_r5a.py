"""On-chip session r5a (VERDICT r4 #2/#5): exact-path stage attribution,
fast-W sweep, batch sweep, and the 150-step f32 exact drift curve.

Self-bounding; JSONL to .onchip_r5a.jsonl. NEVER kill (axon tunnel).
"""
import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

LOG = open("/root/repo/.onchip_r5a.jsonl", "a", buffering=1)


def emit(**kw):
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw)[:250], file=sys.stderr, flush=True)


emit(kind="start", t=time.strftime("%H:%M:%S"))

from mpinets_tpu.kernels import pallas_ops
from mpinets_tpu.model.fused import make_fused_apply, xla_tail
from mpinets_tpu.model.policy import MotionPolicyNetwork

model = MotionPolicyNetwork(compute_dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
params = model.init(rng, jnp.zeros((1, 6272, 4)), jnp.zeros((1, 7)))
kb = jax.random.PRNGKey(7)
BB = 256
pc_b = jnp.concatenate(
    [
        jax.random.uniform(kb, (BB, 6272, 3), minval=-0.8, maxval=0.8),
        jax.random.randint(jax.random.fold_in(kb, 1), (BB, 6272, 1), 0, 3
                           ).astype(jnp.float32),
    ],
    axis=-1,
)
q_b = jax.random.uniform(jax.random.fold_in(kb, 2), (BB, 7), minval=-1,
                         maxval=1)


def diff_time_fn(name, fn, k_small=2, k_large=10, scale=1):
    """fn(carry_scalar) -> scalar; differential-timed jitted loops."""
    try:
        def mk(k):
            @jax.jit
            def loop():
                def body(i, c):
                    return c + fn(c) * 1e-9
                return jax.lax.fori_loop(0, k, body, 0.0)
            return loop
        fns = {k: mk(k) for k in (k_small, k_large)}
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
        per = (ts[k_large] - ts[k_small]) / (k_large - k_small)
        us = per * 1e6 / (BB * scale)
        emit(kind="time", name=name, us_per_sample=round(us, 2))
        return us
    except Exception:
        emit(kind="time", name=name, err=traceback.format_exc()[-300:])
        return None


p_enc = params["params"]["point_cloud_encoder"]


def mlp_p(tree):
    return tuple(
        (tree[f"conv{i}"]["kernel"], tree[f"conv{i}"]["bias"])
        for i in range(3)
    )


xyz_b = pc_b[..., :3]
feat_b = pc_b[..., 3:]

# Precompute stage inputs once (device-resident).
(w1a, b1a), (w2a, b2a), (w3a, b3a) = mlp_p(p_enc["sa0"]["mlp"])
(w1b, b1b), (w2b, b2b), (w3b, b3b) = mlp_p(p_enc["sa1"]["mlp"])
_, cent0 = pallas_ops.furthest_point_sample_with_coords(xyz_b, 512)
f0, _ = pallas_ops.sa_stage(
    xyz_b, feat_b, cent0, w1a, b1a, w2a, b2a, w3a, b3a,
    radius=0.05, nsample=128, impl="v8", pad_chunks=True,
    centroids_in_cloud=True,
)
_, cent1 = pallas_ops.furthest_point_sample_with_coords(cent0, 128)
f1, _ = pallas_ops.sa_stage(
    cent0, f0, cent1, w1b, b1b, w2b, b2b, w3b, b3b,
    radius=0.3, nsample=128, impl="v8", centroids_in_cloud=True,
)
jax.block_until_ready(f1)

# ---- 1. per-stage attribution ---------------------------------------------
def fps0_fn(c):
    _, cc = pallas_ops.furthest_point_sample_with_coords(
        xyz_b + (c * 1e-9).astype(jnp.float32), 512
    )
    return jnp.sum(cc)


def fps1_fn(c):
    _, cc = pallas_ops.furthest_point_sample_with_coords(
        cent0 + (c * 1e-9).astype(jnp.float32), 128
    )
    return jnp.sum(cc)


def sa0_fn(ds):
    def fn(c):
        f, idx = pallas_ops.sa_stage(
            xyz_b + (c * 1e-9).astype(jnp.float32), feat_b, cent0,
            w1a, b1a, w2a, b2a, w3a, b3a,
            radius=0.05, nsample=128, impl="v8", pad_chunks=True,
            centroids_in_cloud=True, debug_stop=ds,
        )
        return jnp.sum(f) + jnp.sum(idx).astype(jnp.float32) * 1e-9
    return fn


def sa1_fn(ds):
    def fn(c):
        f, idx = pallas_ops.sa_stage(
            cent0 + (c * 1e-9).astype(jnp.float32), f0, cent1,
            w1b, b1b, w2b, b2b, w3b, b3b,
            radius=0.3, nsample=128, impl="v8",
            centroids_in_cloud=True, debug_stop=ds,
        )
        return jnp.sum(f) + jnp.sum(idx).astype(jnp.float32) * 1e-9
    return fn


def tail_fn(c):
    out = xla_tail(
        params["params"], cent1, f1 + (c * 1e-9).astype(jnp.float32),
        q_b, jnp.bfloat16,
    )
    return jnp.sum(out)


diff_time_fn("fps0", fps0_fn)
diff_time_fn("fps1", fps1_fn)
for ds in (4, 5, 7, 0):
    diff_time_fn(f"sa0_v8_ds{ds}", sa0_fn(ds))
for ds in (4, 5, 7, 0):
    diff_time_fn(f"sa1_v8_ds{ds}", sa1_fn(ds))
diff_time_fn("xla_tail", tail_fn)

# full forwards for cross-check
for name, fn_apply in [
    ("fwd_exact_v8", make_fused_apply(jnp.bfloat16, sa_impl="v8")),
    ("fwd_fast8", make_fused_apply(jnp.bfloat16, sa_impl="v8",
                                   fast_grouping=8)),
    ("fwd_fast6", make_fused_apply(jnp.bfloat16, sa_impl="v8",
                                   fast_grouping=6)),
    ("fwd_fast4", make_fused_apply(jnp.bfloat16, sa_impl="v8",
                                   fast_grouping=4)),
]:
    diff_time_fn(
        name,
        lambda c, f=fn_apply: jnp.sum(
            f(params, pc_b + (c * 1e-9).astype(jnp.float32), q_b)
        ),
    )

# ---- 2. rollout rates: W sweep + batch sweep ------------------------------
from mpinets_tpu.data.synthetic import random_problem_batch
from mpinets_tpu.rollout.engine import make_rollout_fn


def rollout_rate(name, apply_fn, bb):
    try:
        problem = random_problem_batch(jax.random.fold_in(rng, 3), bb)
        rollouts = {
            n: make_rollout_fn(model, max_steps=n, stop_on_success=False,
                               record_trajectory=False, apply_fn=apply_fn)
            for n in (5, 30)
        }
        for r in rollouts.values():
            np.asarray(r(params, problem, rng).final_q)
        best = 0.0
        for rep in range(3):
            t0 = time.perf_counter()
            np.asarray(rollouts[5](params, problem, rng).final_q)
            t_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(rollouts[30](params, problem, rng).final_q)
            t_l = time.perf_counter() - t0
            if t_l > t_s:
                best = max(best, bb * 25 / (t_l - t_s))
        emit(kind="rollout", name=name, batch=bb, steps_per_s=round(best, 1))
    except Exception:
        emit(kind="rollout", name=name, err=traceback.format_exc()[-300:])


for w in (4, 6, 8):
    rollout_rate(f"fast{w}", make_fused_apply(
        jnp.bfloat16, sa_impl="v8", fast_grouping=w), 256)
rollout_rate("exact_v8", make_fused_apply(jnp.bfloat16, sa_impl="v8"), 256)
for bb in (384, 512, 768):
    rollout_rate("fast_best_bsweep", make_fused_apply(
        jnp.bfloat16, sa_impl="v8", fast_grouping=8), bb)

# ---- 3. 150-step f32 exact drift (VERDICT r4 #5) --------------------------
try:
    jax.config.update("jax_default_matmul_precision", "highest")
    model32 = MotionPolicyNetwork(compute_dtype=jnp.float32)
    apply32 = make_fused_apply(jnp.float32, sa_impl="v8")
    b8 = 8
    problem = random_problem_batch(jax.random.fold_in(rng, 11), b8)
    ro_fused = make_rollout_fn(model32, max_steps=150, stop_on_success=False,
                               record_trajectory=True, apply_fn=apply32)
    ro_flax = make_rollout_fn(model32, max_steps=150, stop_on_success=False,
                              record_trajectory=True, apply_fn=None)
    tf = np.asarray(ro_fused(params, problem, rng).trajectories)
    tx = np.asarray(ro_flax(params, problem, rng).trajectories)
    drift = np.abs(tf - tx).max(axis=(0, 2))  # per-step max over batch/joints
    curve = {str(s): round(float(drift[s]), 6)
             for s in (1, 5, 10, 25, 50, 75, 100, 125, 150)
             if s < drift.shape[0]}
    emit(kind="drift_f32_150", curve=curve,
         final=round(float(drift[-1]), 6),
         max=round(float(drift.max()), 6))
    jax.config.update("jax_default_matmul_precision", None)
except Exception:
    emit(kind="drift_f32_150", err=traceback.format_exc()[-400:])

# ---- 4. parity gate (exact f32 B=8 vs flax single forward) ----------------
try:
    jax.config.update("jax_default_matmul_precision", "highest")
    pc8 = pc_b[:8]
    q8 = q_b[:8]
    a = make_fused_apply(jnp.float32, sa_impl="v8")(params, pc8, q8)
    bfl = jax.jit(
        lambda v, x, q: MotionPolicyNetwork(
            compute_dtype=jnp.float32
        ).apply(v, x, q)
    )(params, pc8, q8)
    emit(kind="parity_f32",
         max_abs=float(jnp.max(jnp.abs(a - bfl))))
    jax.config.update("jax_default_matmul_precision", None)
except Exception:
    emit(kind="parity_f32", err=traceback.format_exc()[-400:])

emit(kind="done", t=time.strftime("%H:%M:%S"))
