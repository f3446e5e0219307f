"""On-chip session r4b: v8/fast-grouping validation + train-step timing.

Self-bounding; appends JSONL to .onchip_r4b.jsonl. Sections:
  A. full-shape parity (B=8): v8 vs v5 (exact paths must agree), fast-W
     output deltas vs exact.
  B. forward differential timing (B=256, bf16): v5 / v8 / fast W in
     {8,12,16} / npoint0=256 variants.
  C. closed-loop rollout env-steps/s for the interesting configs.
  D. metric-level deltas exact-vs-fast with the r3 trained checkpoint:
     final-q drift, target error, collision rate over a fixed problem set
     (the exactness/speed table VERDICT r3 #1 requires).
  E. train-step timing at B=64/128: plain-XLA model.apply vs the fused
     custom-VJP path (VERDICT r3 #2), incl. the scatter-add backward.
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

LOG = open("/root/repo/.onchip_r4b.jsonl", "a", buffering=1)


def emit(**kw):
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw)[:250], file=sys.stderr, flush=True)


emit(kind="start", t=time.strftime("%H:%M:%S"))

from mpinets_tpu.model.fused import make_fused_apply
from mpinets_tpu.model.fused_train import make_fused_train_apply
from mpinets_tpu.model.policy import MotionPolicyNetwork

model = MotionPolicyNetwork(compute_dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
params = model.init(rng, jnp.zeros((1, 6272, 4)), jnp.zeros((1, 7)))

kb = jax.random.PRNGKey(7)
B_PAR = 8
pc_par = jnp.concatenate(
    [
        jax.random.uniform(kb, (B_PAR, 6272, 3), minval=-0.8, maxval=0.8),
        jax.random.randint(jax.random.fold_in(kb, 1), (B_PAR, 6272, 1), 0, 3
                           ).astype(jnp.float32),
    ],
    axis=-1,
)
q_par = jax.random.uniform(jax.random.fold_in(kb, 2), (B_PAR, 7),
                           minval=-1, maxval=1)

CONFIGS = {
    "v5": dict(sa_impl="v5"),
    "v8": dict(sa_impl="v8"),
    "v8_fast16": dict(sa_impl="v8", fast_grouping=16),
    "v8_fast12": dict(sa_impl="v8", fast_grouping=12),
    "v8_fast8": dict(sa_impl="v8", fast_grouping=8),
}

# ---------------------------------------------------------------- A. parity
try:
    outs = {}
    for name, cfg in CONFIGS.items():
        f = make_fused_apply(jnp.float32, **cfg)
        outs[name] = np.asarray(f(params, pc_par, q_par))
        emit(kind="parity_ran", config=name)
    ref = outs["v5"]
    for name, o in outs.items():
        emit(kind="parity", config=name,
             max_abs_vs_v5=float(np.abs(o - ref).max()),
             mean_abs_vs_v5=float(np.abs(o - ref).mean()))
except Exception:
    emit(kind="parity", err=traceback.format_exc()[-500:])

# ------------------------------------------------------- B. forward timing
BB = 256
pc_b = jnp.concatenate(
    [
        jax.random.uniform(kb, (BB, 6272, 3), minval=-0.8, maxval=0.8),
        jax.random.randint(jax.random.fold_in(kb, 1), (BB, 6272, 1), 0, 3
                           ).astype(jnp.float32),
    ],
    axis=-1,
).astype(jnp.float32)
q_b = jax.random.uniform(jax.random.fold_in(kb, 2), (BB, 7), minval=-1,
                         maxval=1)


def diff_time(name, make_loop, ks=(2, 10), scale=BB):
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
        return per
    except Exception:
        emit(kind="time", name=name, err=traceback.format_exc()[-400:])
        return None


def fwd_loop(apply_fn):
    def mk(k):
        @jax.jit
        def loop():
            def body(i, c):
                shift = (c * 1e-9).astype(jnp.float32)
                out = apply_fn(params, pc_b + shift, q_b)
                return c + jnp.sum(out) * 1e-6
            return jax.lax.fori_loop(0, k, body, 0.0)
        return loop
    return mk


fwd_cfgs = dict(CONFIGS)
for name, cfg in fwd_cfgs.items():
    diff_time(f"fwd_{name}", fwd_loop(make_fused_apply(jnp.bfloat16, **cfg)))

# npoint0=256 relaxation (same weights; npoints don't touch parameters)
for name, cfg in (("v8_np256", dict(sa_impl="v8")),
                  ("v8_np256_fast12", dict(sa_impl="v8", fast_grouping=12))):
    diff_time(
        f"fwd_{name}",
        fwd_loop(make_fused_apply(jnp.bfloat16, sa_npoints=(256, 128), **cfg)),
    )

# --------------------------------------------------- C. rollout throughput
from mpinets_tpu.data.synthetic import random_problem_batch
from mpinets_tpu.rollout.engine import make_rollout_fn

problem = random_problem_batch(jax.random.fold_in(rng, 3), BB)


def rollout_rate(name, apply_fn, steps=(5, 30)):
    try:
        rollouts = {
            n: make_rollout_fn(model, max_steps=n, stop_on_success=False,
                               record_trajectory=False, apply_fn=apply_fn)
            for n in steps
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
        rate = BB * (steps[1] - steps[0]) / (times[steps[1]] - times[steps[0]])
        emit(kind="rollout", name=name, env_steps_per_s=round(rate, 1))
    except Exception:
        emit(kind="rollout", name=name, err=traceback.format_exc()[-400:])


rollout_rate("v5", make_fused_apply(jnp.bfloat16, sa_impl="v5"))
rollout_rate("v8", make_fused_apply(jnp.bfloat16, sa_impl="v8"))
rollout_rate("v8_fast12",
             make_fused_apply(jnp.bfloat16, sa_impl="v8", fast_grouping=12))
rollout_rate("v8_fast8",
             make_fused_apply(jnp.bfloat16, sa_impl="v8", fast_grouping=8))
rollout_rate(
    "v8_np256_fast12",
    make_fused_apply(jnp.bfloat16, sa_npoints=(256, 128), sa_impl="v8",
                     fast_grouping=12),
)

# ------------------------------------------- D. metric deltas (trained ckpt)
try:
    from mpinets_tpu.cli.infer import load_params
    from mpinets_tpu.kernels import kinematics, sdf
    from mpinets_tpu.robot import franka

    t_params = load_params("/root/repo/.train_r3/ckpts/bc_tabletop_r3-cdf656a8/best",
                           model)
    probs = random_problem_batch(jax.random.fold_in(rng, 11), 128)

    def run_cfg(apply_fn):
        r = make_rollout_fn(model, max_steps=69, stop_on_success=False,
                            record_trajectory=True, apply_fn=apply_fn)
        res = r(t_params, probs, jax.random.fold_in(rng, 12))
        trajs = res.trajectories
        _, eff = kinematics.eff_pose(res.final_q)
        err = jnp.linalg.norm(eff - probs.target_trans, axis=-1)
        b, t, _ = trajs.shape
        centers = kinematics.scene_collision_spheres(trajs)
        radii = jnp.asarray(franka.SCENE_SPHERE_RADII, trajs.dtype)
        vals = sdf.scene_sdf_sequence(
            centers.reshape(b, t, -1, 3), probs.scene
        ).reshape(b, t, -1)
        coll = jnp.any(vals <= radii, axis=(-1, -2))
        return (np.asarray(res.final_q), np.asarray(err),
                float(jnp.mean(coll.astype(jnp.float32))))

    fq_exact, err_exact, coll_exact = run_cfg(
        make_fused_apply(jnp.bfloat16, sa_impl="v8"))
    emit(kind="metrics", config="exact_v8",
         avg_target_error=float(err_exact.mean()),
         pct_under_5cm=float((err_exact < 0.05).mean()),
         collision_rate=coll_exact)
    for name, cfg in (("fast16", dict(fast_grouping=16)),
                      ("fast12", dict(fast_grouping=12)),
                      ("fast8", dict(fast_grouping=8))):
        fq, err, coll = run_cfg(
            make_fused_apply(jnp.bfloat16, sa_impl="v8", **cfg))
        emit(kind="metrics", config=name,
             avg_target_error=float(err.mean()),
             pct_under_5cm=float((err < 0.05).mean()),
             collision_rate=coll,
             final_q_drift_mean=float(np.abs(fq - fq_exact).mean()),
             final_q_drift_max=float(np.abs(fq - fq_exact).max()),
             target_err_delta=float(err.mean() - err_exact.mean()))
except Exception:
    emit(kind="metrics", err=traceback.format_exc()[-500:])

# ------------------------------------------------- E. train-step timing
try:
    from mpinets_tpu.data.synthetic import training_batch
    from mpinets_tpu.train import learner

    for bt in (64, 128):
        batch = training_batch(jax.random.fold_in(rng, 21), bt)
        state = learner.init_state(model, rng, batch)

        for name, apply_fn in (
            ("xla", None),
            ("fused", make_fused_train_apply(jnp.bfloat16)),
        ):
            try:
                step = learner.make_train_step(model, apply_fn=apply_fn)

                def mk(k, step=step, state=state, batch=batch):
                    def run():
                        s = state
                        t0 = time.perf_counter()
                        for _ in range(k):
                            s, m = step(s, batch)
                        jax.block_until_ready(m["val_loss"])
                        np.asarray(m["val_loss"])
                        return time.perf_counter() - t0
                    return run

                mk(1)()  # compile
                t2, t6 = mk(2)(), mk(6)()
                per = (t6 - t2) / 4
                emit(kind="train_step", path=name, batch=bt,
                     ms_per_step=round(per * 1e3, 1),
                     env_samples_per_s=round(bt / per, 1))
            except Exception:
                emit(kind="train_step", path=name, batch=bt,
                     err=traceback.format_exc()[-400:])
except Exception:
    emit(kind="train_step", err=traceback.format_exc()[-500:])

emit(kind="done", t=time.strftime("%H:%M:%S"))
