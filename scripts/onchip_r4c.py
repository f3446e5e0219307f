"""On-chip session r4c: fast-grouping measurements + committed evidence.

Self-bounding; appends JSONL to .onchip_r4c.jsonl and, on success, writes
the COMMITTED evidence artifact ONCHIP_EVIDENCE.json (VERDICT r3 #6):
compile-gate result, full-shape fused-vs-flax parity at B=8, and a
150-step full-shape fused-vs-flax rollout drift curve — plus the
exact-vs-fast speed/metric table (VERDICT r3 #1) and train-step timings
(#2, with the SA0 feature-cotangent skip).
"""
import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

LOG = open("/root/repo/.onchip_r4c.jsonl", "a", buffering=1)
EVIDENCE = {"session": "r4c", "date": time.strftime("%Y-%m-%d"),
            "device": str(jax.devices()[0])}


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

# ------------------------------------------------- 0. compile gate (v8+f1)
try:
    t0 = time.perf_counter()
    for name, cfg in (("v8", dict(sa_impl="v8")),
                      ("fast12", dict(sa_impl="v8", fast_grouping=12))):
        fn = make_fused_apply(jnp.bfloat16, **cfg)
        jax.jit(fn).lower(
            params, jax.ShapeDtypeStruct((256, 6272, 4), jnp.float32),
            jax.ShapeDtypeStruct((256, 7), jnp.float32),
        ).compile()
    EVIDENCE["compile_gate"] = {
        "ok": True, "configs": ["v8", "v8+fast12"],
        "seconds": round(time.perf_counter() - t0, 1),
    }
    emit(kind="gate", **EVIDENCE["compile_gate"])
except Exception:
    EVIDENCE["compile_gate"] = {"ok": False}
    emit(kind="gate", err=traceback.format_exc()[-400:])

# ------------------------------------------------- A. full-shape parity B=8
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
try:
    flax_out = np.asarray(model.apply(params, pc_par, q_par))
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
        emit(kind="parity", config=name, **parity[name])
    EVIDENCE["parity_f32_vs_flax_B8"] = parity
except Exception:
    emit(kind="parity", err=traceback.format_exc()[-400:])

# -------------------------------------------- B. forward timing fast modes
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
        return round(per * 1e6 / scale, 2)
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


fwd_us = {}
for name, kw in (
    ("fast16", dict(sa_impl="v8", fast_grouping=16)),
    ("fast12", dict(sa_impl="v8", fast_grouping=12)),
    ("fast8", dict(sa_impl="v8", fast_grouping=8)),
    ("np256_fast12", dict(sa_npoints=(256, 128), sa_impl="v8",
                          fast_grouping=12)),
):
    fwd_us[name] = diff_time(f"fwd_{name}",
                             fwd_loop(make_fused_apply(jnp.bfloat16, **kw)))
EVIDENCE["fwd_us_per_sample"] = fwd_us

# --------------------------------------------------- C. rollout throughput
from mpinets_tpu.data.synthetic import random_problem_batch
from mpinets_tpu.rollout.engine import make_rollout_fn

problem = random_problem_batch(jax.random.fold_in(rng, 3), BB)
rollout_rates = {}


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
        rollout_rates[name] = round(rate, 1)
        emit(kind="rollout", name=name, env_steps_per_s=round(rate, 1))
    except Exception:
        emit(kind="rollout", name=name, err=traceback.format_exc()[-400:])


rollout_rate("fast16",
             make_fused_apply(jnp.bfloat16, sa_impl="v8", fast_grouping=16))
rollout_rate("fast12",
             make_fused_apply(jnp.bfloat16, sa_impl="v8", fast_grouping=12))
rollout_rate("fast8",
             make_fused_apply(jnp.bfloat16, sa_impl="v8", fast_grouping=8))
rollout_rate(
    "np256_fast12",
    make_fused_apply(jnp.bfloat16, sa_npoints=(256, 128), sa_impl="v8",
                     fast_grouping=12),
)
EVIDENCE["rollout_env_steps_per_s"] = rollout_rates

# ------------------------------------------- D. metric deltas (trained ckpt)
try:
    from mpinets_tpu.cli.infer import load_params
    from mpinets_tpu.kernels import kinematics, sdf
    from mpinets_tpu.robot import franka

    t_params = load_params(
        "/root/repo/.train_r3/ckpts/bc_tabletop_r3-cdf656a8/step_00013650",
        model,
    )
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

    table = {}
    fq_exact, err_exact, coll_exact = run_cfg(
        make_fused_apply(jnp.bfloat16, sa_impl="v8"))
    table["exact_v8"] = {
        "avg_target_error": float(err_exact.mean()),
        "pct_under_5cm": float((err_exact < 0.05).mean()),
        "collision_rate": coll_exact,
    }
    emit(kind="metrics", config="exact_v8", **table["exact_v8"])
    for name, kw in (
        ("fast16", dict(sa_impl="v8", fast_grouping=16)),
        ("fast12", dict(sa_impl="v8", fast_grouping=12)),
        ("fast8", dict(sa_impl="v8", fast_grouping=8)),
        ("np256_fast12", dict(sa_npoints=(256, 128), sa_impl="v8",
                              fast_grouping=12)),
    ):
        fq, err, coll = run_cfg(make_fused_apply(jnp.bfloat16, **kw))
        table[name] = {
            "avg_target_error": float(err.mean()),
            "pct_under_5cm": float((err < 0.05).mean()),
            "collision_rate": coll,
            "final_q_drift_mean": float(np.abs(fq - fq_exact).mean()),
            "target_err_delta": float(err.mean() - err_exact.mean()),
        }
        emit(kind="metrics", config=name, **table[name])
    EVIDENCE["exact_vs_fast_metrics_ckpt13650_B128"] = table
except Exception:
    emit(kind="metrics", err=traceback.format_exc()[-500:])

# ---------------------------------- E. 150-step fused-vs-flax drift (B=8)
try:
    drift_probs = random_problem_batch(jax.random.fold_in(rng, 31), 8)

    def traj_of(apply_fn):
        r = make_rollout_fn(model, max_steps=150, stop_on_success=False,
                            record_trajectory=True, apply_fn=apply_fn)
        res = r(t_params, drift_probs, jax.random.fold_in(rng, 32))
        return np.asarray(res.trajectories)  # [8, 151, 7]

    tr_flax = traj_of(None)                     # plain XLA model.apply
    tr_v8 = traj_of(make_fused_apply(jnp.bfloat16, sa_impl="v8"))
    curve = {}
    for s in (10, 30, 50, 100, 150):
        curve[str(s)] = float(np.abs(tr_v8[:, s] - tr_flax[:, s]).max())
    EVIDENCE["drift_fused_bf16_vs_flax_bf16_150step_max_absq"] = curve
    emit(kind="drift", **curve)
except Exception:
    emit(kind="drift", err=traceback.format_exc()[-500:])

# ------------------------------------------------- F. train-step timing
try:
    from mpinets_tpu.data.synthetic import training_batch
    from mpinets_tpu.train import learner

    results = {}
    for bt in (64, 128, 256):
        batch = training_batch(jax.random.fold_in(rng, 21), bt)
        state = learner.init_state(model, rng, batch)
        for name, apply_fn in (
            ("fused_nofg", make_fused_train_apply(jnp.bfloat16)),
        ):
            try:
                step = learner.make_train_step(model, apply_fn=apply_fn)

                def mk(k, step=step, state=state, batch=batch):
                    def run():
                        s = state
                        t0 = time.perf_counter()
                        for _ in range(k):
                            s, m = step(s, batch)
                        np.asarray(m["val_loss"])
                        return time.perf_counter() - t0
                    return run

                mk(1)()
                t2, t6 = mk(2)(), mk(6)()
                per = (t6 - t2) / 4
                results[f"{name}_b{bt}"] = {
                    "ms_per_step": round(per * 1e3, 1),
                    "env_samples_per_s": round(bt / per, 1),
                }
                emit(kind="train_step", path=name, batch=bt,
                     **results[f"{name}_b{bt}"])
            except Exception:
                emit(kind="train_step", path=name, batch=bt,
                     err=traceback.format_exc()[-400:])
    EVIDENCE["train_step"] = results
except Exception:
    emit(kind="train_step", err=traceback.format_exc()[-500:])

with open("/root/repo/ONCHIP_EVIDENCE.json", "w") as f:
    json.dump(EVIDENCE, f, indent=1)
emit(kind="done", t=time.strftime("%H:%M:%S"))
