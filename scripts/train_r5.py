"""Round-5 training: generated-data BC + real-scene DAgger actor-learner
(VERDICT r4 #1/#4/#8).

Phases:
1. dataset prep: merge every available ``.gen_r5/*/all_data.hdf5`` (and any
   ``TRAIN_R5_EXTRA`` dirs), split train/val/test;
2. profile (VERDICT #4): host loader rate disk vs RAM, device step-only
   rate, then the full-loop rate from the training logs — the end-to-end
   gap attribution the r4 run lacked;
3. train with the r5 stabilization stack: warmup+cosine lr, parameter EMA,
   closed-loop success validation, and every Nth step a real-scene DAgger
   batch (policy rollout on dataset scenes, SDF-optimizer relabel);
4. eval the best checkpoint (EMA params) on the held-out hindsight problem
   pkl through the product CLI (``cli.infer --use-ema``).

Writes .train_r5/ + TRAIN_r5.md. Self-bounding (TRAIN_BUDGET_S); never
kill this process (axon tunnel).
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

GEN = Path("/root/repo/.gen_r5")
ROOT = Path(os.environ.get("TRAIN_R5_ROOT", "/root/repo/.train_r5"))
DATA = ROOT / "data"
BUDGET_S = float(os.environ.get("TRAIN_BUDGET_S", str(2.0 * 3600)))
EVAL_MAX = int(os.environ.get("TRAIN_R5_EVAL_MAX", "192"))

t_start = time.time()

# ---- phase 1: dataset prep ------------------------------------------------
import h5py  # noqa: E402

from mpinets_tpu.data.process import downsize_and_split, merge_files  # noqa: E402

sources = sorted(GEN.glob("*/all_data.hdf5"))
for extra in os.environ.get("TRAIN_R5_EXTRA", "").split(":"):
    if extra and Path(extra).exists():
        sources.append(Path(extra))
assert sources, "no generated datasets found under .gen_r5"
print("sources:", [str(s) for s in sources], flush=True)

DATA.mkdir(parents=True, exist_ok=True)
merged = ROOT / "merged.hdf5"
n = merge_files(sources, merged, overwrite=True)
n_val = max(64, n // 50)
n_test = max(64, n // 50)
n_train = n - n_val - n_test
downsize_and_split(merged, DATA, n_train, n_val, n_test, seed=0)
print(f"merged {n} trajectories; split {(n_train, n_val, n_test)}", flush=True)

# ---- phase 2: profile (VERDICT r4 #4) -------------------------------------
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from mpinets_tpu.data import hdf5 as H  # noqa: E402
from mpinets_tpu.geom.assembly import PointCloudSizes  # noqa: E402
from mpinets_tpu.model.policy import MotionPolicyNetwork  # noqa: E402
from mpinets_tpu.train import learner  # noqa: E402

profile = {}
for name, in_memory in (("disk", False), ("ram", True)):
    ds = H.TrajectoryDataset(
        DATA, "hybrid_solutions", H.DatasetType.TRAIN, in_memory=in_memory
    )
    loader = H.InstanceLoader(ds, 64, seed=0)
    it = iter(loader)
    for _ in range(5):
        next(it)  # warm (thread spin-up, page cache)
    t0 = time.time()
    k = 200
    for _ in range(k):
        next(it)
    rate = k * 64 / (time.time() - t0)
    profile[f"loader_{name}_instances_per_s"] = round(rate, 1)
    del it, loader
print("loader profile:", profile, flush=True)

# device step-only rate (fused train step, batch 64, prepare fused in)
sizes = PointCloudSizes()
model = MotionPolicyNetwork(compute_dtype=jnp.bfloat16)
mesh = Mesh(np.array(jax.devices()), ("data",))
fused_ok = jax.default_backend() != "cpu"
train_apply = None
if fused_ok:
    from mpinets_tpu.model.fused_train import make_fused_train_apply

    train_apply = make_fused_train_apply(jnp.bfloat16)


def _prepare(raw, key):
    return H.prepare_train_batch(raw, key, sizes=sizes, train=True)


optimizer = learner.make_optimizer(1e-4, 1.0)
step_fn = learner.make_data_parallel_step(
    model, mesh, optimizer, prepare_fn=_prepare, apply_fn=train_apply,
)
ds = H.TrajectoryDataset(DATA, "hybrid_solutions", H.DatasetType.TRAIN,
                         in_memory=True)
raw = {k: jnp.asarray(v) for k, v in ds.read_instance_batch(
    np.arange(64) % ds.num_trajectories, np.arange(64) % 50
).items()}
rng = jax.random.PRNGKey(0)
prep0 = jax.device_get(_prepare(raw, rng))
state = learner.init_state(
    model, rng, {k: jnp.asarray(v) for k, v in prep0.items()}, optimizer
)
for i in range(3):  # warm/compile
    state, m = step_fn(state, raw, jax.random.fold_in(rng, i))
jax.block_until_ready(m["val_loss"])
t0 = time.time()
k = 30
for i in range(k):
    state, m = step_fn(state, raw, jax.random.fold_in(rng, 100 + i))
float(m["val_loss"])  # force sync
profile["step_only_samples_per_s"] = round(64 * k / (time.time() - t0), 1)
print("profile:", profile, flush=True)
(ROOT / "profile.json").write_text(json.dumps(profile, indent=2))
del state, step_fn, ds, raw

# ---- phase 3: train -------------------------------------------------------
from mpinets_tpu.cli.config import (  # noqa: E402
    DataConfig, OptimConfig, RolloutConfig, TrainJobConfig,
)
from mpinets_tpu.train.trainer import Trainer  # noqa: E402

spent = time.time() - t_start
train_budget = max(600.0, BUDGET_S - spent - 900.0)  # reserve ~15 min eval
est_steps_per_s = float(os.environ.get("TRAIN_R5_EST_SPS", "8.0"))
planned_steps = int(train_budget * est_steps_per_s)

cfg = TrainJobConfig(
    data=DataConfig(data_dir=str(DATA), in_memory=True),
    optim=OptimConfig(
        batch_size=64,
        max_epochs=1000,  # time-bounded, not epoch-bounded
        warmup_steps=min(2000, planned_steps // 10),
        decay_steps=planned_steps,
        ema_decay=0.999,
    ),
    rollout=RolloutConfig(
        actor_interval=int(os.environ.get("TRAIN_R5_ACTOR_INTERVAL", "8")),
        actor_rollout_steps=15,
        dagger_opt_steps=60,
    ),
    validation_interval=1000,
    checkpoint_interval=20,
    max_val_problems=64,
    save_checkpoint_dir=str(ROOT / "ckpts"),
    experiment_name="bc_r5",
)
trainer = Trainer(cfg, should_log=True, should_checkpoint=True,
                  time_budget_s=train_budget)
state = trainer.run()
exp_dir = trainer.ckpt_dir
print("trained; experiment dir:", exp_dir, flush=True)

# ---- summarize ------------------------------------------------------------
rows = [json.loads(l) for l in open(Path(exp_dir) / "metrics.jsonl")]
train_rows = [r for r in rows if "point_match_loss" in r]
closed = [r for r in rows if "avg_target_error" in r]
actor_rows = [r for r in rows if "dagger_accept_frac" in r]


def fmt(rs, k, nshow=8):
    rs = [r for r in rs if k in r]
    step = max(1, len(rs) // nshow)
    return ", ".join(f"{r['step']}: {r[k]:.4f}" for r in rs[::step][: nshow + 1])


md = ["# End-to-end training (round 5)\n"]
md.append(
    f"Data: {len(sources)} generated source sets, {n} trajectories "
    f"(split {(n_train, n_val, n_test)}); all sources carry the r5 "
    "dedup/PRM planner fixes. Stack: batch 64, Adam warmup+cosine "
    f"({cfg.optim.warmup_steps}/{cfg.optim.decay_steps}), EMA 0.999, bf16 "
    "fused Pallas train step, and a REAL-SCENE DAgger batch every "
    f"{cfg.rollout.actor_interval} steps (policy rollout on dataset "
    "scenes, SDF-optimizer relabel, invalid relabels fall back to stored "
    "expert steps). Validation = closed-loop rollouts on held-out "
    "val-split problems, judged on EMA params. Reference analogue: "
    "run_training.py:166-200.\n"
)
md.append(f"Loader/step profile (VERDICT r4 #4): `{json.dumps(profile)}`\n")
for key in ("point_match_loss", "collision_loss", "hinge_active_frac",
            "val_loss", "env_samples_per_s"):
    if any(key in r for r in train_rows):
        md.append(f"* {key}: {fmt(train_rows, key)}")
for key in ("avg_target_error", "avg_collision_rate", "val_success",
            "val_success_free", "pct_within_5cm", "pct_flip_orient"):
    if closed:
        md.append(f"* {key}: {fmt(closed, key)}")
for key in ("dagger_accept_frac", "actor_env_steps_per_s",
            "actor_learner_samples_per_s"):
    if actor_rows:
        md.append(f"* {key}: {fmt(actor_rows, key)}")
Path("/root/repo/TRAIN_r5.md").write_text("\n".join(md) + "\n")
print("\n".join(md), flush=True)

# ---- phase 4: held-out eval through the product CLI -----------------------
import contextlib  # noqa: E402
import io  # noqa: E402

from mpinets_tpu.cli import infer  # noqa: E402

def eval_pkl(pkl, fam, label, max_problems):
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            infer.main([
                str(Path(exp_dir) / "best"), str(pkl), "all", "all",
                "--use-ema",
                "--max-problems", str(max_problems),
                "--batch-size", "64",
            ])
        out = buf.getvalue()
        print(f"== {fam} eval ({label}) ==\n{out[-2600:]}", flush=True)
        with open("/root/repo/TRAIN_r5.md", "a") as f:
            f.write(
                f"\n## Closed-loop eval: {fam} {label} "
                "(exact grouping, bf16 fused, EMA params)\n"
                "\n```\n" + out[-2600:] + "\n```\n"
            )
    except Exception:
        import traceback

        traceback.print_exc()


# headline: problems from EVAL-ONLY scenes never seen in training
for pkl in sorted(GEN.glob("*/eval_problems.pkl")):
    eval_pkl(pkl, pkl.parent.name, "HELD-OUT hindsight problems "
             "(eval-only scenes)", EVAL_MAX)
# secondary diagnostic: gen-stats families — hindsight problems whose
# SCENES are in the training set (honest label; not held out)
for pkl in sorted(Path("/root/repo/.gen_stats_r5").glob("*_problems.pkl")):
    fam = pkl.name.replace("_problems.pkl", "")
    eval_pkl(pkl, fam, "hindsight problems from TRAINING scenes "
             "(not held out)", 96)
print("TRAIN_R5 SCRIPT DONE", flush=True)
