"""On-chip session r5c: validate the per-centroid prefix-matmul fix in the
v8 kernel (parity + timing), re-measure exact rollout, and the fast4/fast6
metric-delta table (the r5b attempt hit the pre-fix load_params bug).

Self-bounding; JSONL to .onchip_r5c.jsonl. NEVER kill (axon tunnel).
"""
import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

LOG = open("/root/repo/.onchip_r5c.jsonl", "a", buffering=1)


def emit(**kw):
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw)[:250], file=sys.stderr, flush=True)


emit(kind="start", t=time.strftime("%H:%M:%S"))

from mpinets_tpu.model.fused import make_fused_apply
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

# ---- parity of the fixed kernel (f32 vs flax) -----------------------------
try:
    jax.config.update("jax_default_matmul_precision", "highest")
    a = make_fused_apply(jnp.float32, sa_impl="v8")(params, pc_b[:8], q_b[:8])
    bfl = jax.jit(
        lambda v, x, q: MotionPolicyNetwork(compute_dtype=jnp.float32).apply(
            v, x, q)
    )(params, pc_b[:8], q_b[:8])
    emit(kind="parity_f32_fixed", max_abs=float(jnp.max(jnp.abs(a - bfl))))
    jax.config.update("jax_default_matmul_precision", None)
except Exception:
    jax.config.update("jax_default_matmul_precision", None)
    emit(kind="parity_f32_fixed", err=traceback.format_exc()[-400:])


def diff_time_fn(name, fn):
    try:
        def mk(k):
            @jax.jit
            def loop():
                def body(i, c):
                    return c + fn(c) * 1e-9
                return jax.lax.fori_loop(0, k, body, 0.0)
            return loop
        fns = {k: mk(k) for k in (2, 10)}
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
        us = (ts[10] - ts[2]) / 8 * 1e6 / BB
        emit(kind="time", name=name, us_per_sample=round(us, 2))
        return us
    except Exception:
        emit(kind="time", name=name, err=traceback.format_exc()[-300:])


for name, f in [
    ("fwd_exact_v8_fix", make_fused_apply(jnp.bfloat16, sa_impl="v8")),
    ("fwd_fast4_fix", make_fused_apply(jnp.bfloat16, sa_impl="v8",
                                       fast_grouping=4)),
]:
    diff_time_fn(
        name,
        lambda c, f=f: jnp.sum(
            f(params, pc_b + (c * 1e-9).astype(jnp.float32), q_b)
        ),
    )

from mpinets_tpu.data.synthetic import random_problem_batch
from mpinets_tpu.rollout.engine import make_rollout_fn


def rollout_rate(name, apply_fn, bb=256):
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
        for _ in range(3):
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


rollout_rate("exact_v8_fix", make_fused_apply(jnp.bfloat16, sa_impl="v8"))
rollout_rate("fast4_fix", make_fused_apply(jnp.bfloat16, sa_impl="v8",
                                           fast_grouping=4))

# ---- metric deltas with the r3 checkpoint (load_params fixed) -------------
from mpinets_tpu.cli.infer import load_params
from mpinets_tpu.kernels import kinematics, sdf
from mpinets_tpu.robot import franka

table = {}
try:
    t_params = load_params(
        "/root/repo/.train_r3/ckpts/bc_tabletop_r3-cdf656a8/best", model,
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

    fq_exact, err_exact, coll_exact = run_cfg(
        make_fused_apply(jnp.bfloat16, sa_impl="v8"))
    table["exact_v8"] = {
        "avg_target_error": float(err_exact.mean()),
        "pct_under_5cm": float((err_exact < 0.05).mean()),
        "collision_rate": coll_exact,
    }
    emit(kind="metrics", config="exact_v8", **table["exact_v8"])
    for name, kw in (
        ("fast4", dict(sa_impl="v8", fast_grouping=4)),
        ("fast6", dict(sa_impl="v8", fast_grouping=6)),
        ("fast8", dict(sa_impl="v8", fast_grouping=8)),
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
except Exception:
    emit(kind="metrics", err=traceback.format_exc()[-500:])

# ---- fold into evidence ---------------------------------------------------
try:
    ev = json.load(open("/root/repo/ONCHIP_EVIDENCE.json"))
    r5c = [json.loads(l) for l in open("/root/repo/.onchip_r5c.jsonl")]
    for r in r5c:
        if r.get("kind") == "time" and "us_per_sample" in r:
            ev["r5_stage_attribution_us_per_sample"][r["name"]] = (
                r["us_per_sample"])
        if r.get("kind") == "rollout" and "steps_per_s" in r:
            ev["r5_rollout_env_steps_per_s"][
                f"{r['name']}_b{r['batch']}"] = r["steps_per_s"]
        if r.get("kind") == "parity_f32_fixed" and "max_abs" in r:
            ev["parity_f32_vs_flax_B8"]["v8_r5_prefixfix"] = {
                "max_abs_vs_flax": r["max_abs"]
            }
    if table:
        ev["r5_exact_vs_fast_metrics_ckpt_r3best_B128"] = table
    json.dump(ev, open("/root/repo/ONCHIP_EVIDENCE.json", "w"), indent=1)
    emit(kind="evidence", ok=True)
except Exception:
    emit(kind="evidence", err=traceback.format_exc()[-400:])

emit(kind="done", t=time.strftime("%H:%M:%S"))
