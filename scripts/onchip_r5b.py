"""On-chip session r5b: selection sub-stage attribution (new debug stops
1/2/3), metric deltas for the fast4 / fast4+bf16cloud candidates, and the
ONCHIP_EVIDENCE.json r5 update (attribution table, new configs, f32 drift
and parity from r5a).

Self-bounding; JSONL to .onchip_r5b.jsonl. NEVER kill (axon tunnel).
"""
import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

LOG = open("/root/repo/.onchip_r5b.jsonl", "a", buffering=1)


def emit(**kw):
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw)[:250], file=sys.stderr, flush=True)


emit(kind="start", t=time.strftime("%H:%M:%S"))

from mpinets_tpu.kernels import pallas_ops
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
xyz_b = pc_b[..., :3]
feat_b = pc_b[..., 3:]

p_enc = params["params"]["point_cloud_encoder"]
mlp_p = lambda t: tuple(
    (t[f"conv{i}"]["kernel"], t[f"conv{i}"]["bias"]) for i in range(3)
)
(w1a, b1a), (w2a, b2a), (w3a, b3a) = mlp_p(p_enc["sa0"]["mlp"])
(w1b, b1b), (w2b, b2b), (w3b, b3b) = mlp_p(p_enc["sa1"]["mlp"])
_, cent0 = pallas_ops.furthest_point_sample_with_coords(xyz_b, 512)
f0, _ = pallas_ops.sa_stage(
    xyz_b, feat_b, cent0, w1a, b1a, w2a, b2a, w3a, b3a,
    radius=0.05, nsample=128, impl="v8", pad_chunks=True,
    centroids_in_cloud=True,
)
_, cent1 = pallas_ops.furthest_point_sample_with_coords(cent0, 128)
jax.block_until_ready(f0)


def diff_time_fn(name, fn, k_small=2, k_large=10):
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
        us = per * 1e6 / BB
        emit(kind="time", name=name, us_per_sample=round(us, 2))
        return us
    except Exception:
        emit(kind="time", name=name, err=traceback.format_exc()[-300:])
        return None


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


attrib = {}
for ds in (1, 2, 3):
    attrib[f"sa0_ds{ds}"] = diff_time_fn(f"sa0_v8_ds{ds}", sa0_fn(ds))
for ds in (1, 2, 3):
    attrib[f"sa1_ds{ds}"] = diff_time_fn(f"sa1_v8_ds{ds}", sa1_fn(ds))

# ---- metric deltas: fast4 / fast6 / fast4+bf16cloud vs exact --------------
from mpinets_tpu.cli.infer import load_params
from mpinets_tpu.data.synthetic import random_problem_batch
from mpinets_tpu.kernels import kinematics, sdf
from mpinets_tpu.robot import franka
from mpinets_tpu.rollout.engine import make_rollout_fn

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
        ("fast4_bf16cloud", dict(sa_impl="v8", fast_grouping=4,
                                 bf16_cloud=True)),
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

# rollout rate for the bf16cloud candidate
try:
    problem = random_problem_batch(jax.random.fold_in(rng, 3), 256)
    apply_fn = make_fused_apply(jnp.bfloat16, sa_impl="v8", fast_grouping=4,
                                bf16_cloud=True)
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
            best = max(best, 256 * 25 / (t_l - t_s))
    emit(kind="rollout", name="fast4_bf16cloud", batch=256,
         steps_per_s=round(best, 1))
except Exception:
    emit(kind="rollout", name="fast4_bf16cloud",
         err=traceback.format_exc()[-300:])

# ---- fold everything into ONCHIP_EVIDENCE.json ----------------------------
try:
    r5a = [json.loads(l) for l in open("/root/repo/.onchip_r5a.jsonl")]
    r5b = [json.loads(l) for l in open("/root/repo/.onchip_r5b.jsonl")]
    ev = json.load(open("/root/repo/ONCHIP_EVIDENCE.json"))
    times = {r["name"]: r["us_per_sample"] for r in r5a + r5b
             if r.get("kind") == "time" and "us_per_sample" in r}
    rolls = {}
    for r in r5a + r5b:
        if r.get("kind") == "rollout" and "steps_per_s" in r:
            rolls[f"{r['name']}_b{r['batch']}"] = r["steps_per_s"]
    ev["r5_stage_attribution_us_per_sample"] = times
    ev["r5_rollout_env_steps_per_s"] = rolls
    if table:
        ev["r5_exact_vs_fast_metrics_ckpt_r3best_B128"] = table
    for r in r5a:
        if r.get("kind") == "drift_f32_150" and "curve" in r:
            ev["drift_fused_f32_vs_flax_f32_150step_max_absq"] = r["curve"]
        if r.get("kind") == "parity_f32" and "max_abs" in r:
            ev["parity_f32_vs_flax_B8"]["v8_r5"] = {
                "max_abs_vs_flax": r["max_abs"]
            }
    json.dump(ev, open("/root/repo/ONCHIP_EVIDENCE.json", "w"), indent=1)
    emit(kind="evidence", ok=True)
except Exception:
    emit(kind="evidence", err=traceback.format_exc()[-400:])

emit(kind="done", t=time.strftime("%H:%M:%S"))
