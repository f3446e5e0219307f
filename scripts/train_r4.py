"""Round-4 end-to-end BC training at MULTI-FAMILY scale (VERDICT r3 #4).

Waits for the r4 gen-at-scale datasets (all four scene families), merges
them into one training set, splits train/val/test, and trains the
full-shape model on the real backend with the FUSED Pallas train step
(model/fused_train.py custom VJP) -- logging the new hinge-activation
diagnostic every step. Then evaluates the best checkpoint on held-out
hindsight problems from every family through the product eval CLI.

Outputs: .train_r4/ (experiment dir) + TRAIN_r4.md. Self-bounding.
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

FAMILIES = ["tabletop", "cubby", "merged-cubby", "dresser"]
GEN = Path("/root/repo/.gen_scale")
ROOT = Path(os.environ.get("TRAIN_R4_ROOT", "/root/repo/.train_r4"))
DATA = ROOT / "data"
MAX_EPOCHS = int(os.environ.get("TRAIN_R4_EPOCHS", "4"))

# Wait until the at-scale gen finishes (its log ends with ALL DONE): mere
# file existence is NOT enough -- stale previous-round datasets satisfy it
# (the first r4 run trained on r3 dresser/merged-cubby files that way).
t0 = time.time()
log = Path("/root/repo/.gen_scale_r4.log")
while True:
    done = log.exists() and "ALL DONE" in log.read_text()[-2000:]
    if done:
        break
    if time.time() - t0 > 3.5 * 3600:
        have = [f for f in FAMILIES if (GEN / f / "all_data.hdf5").exists()]
        print(f"gen never finished; proceeding with {have}", flush=True)
        break
    time.sleep(60)
time.sleep(15)
have = [f for f in FAMILIES if (GEN / f / "all_data.hdf5").exists()]
print("families available:", have, flush=True)
assert have, "no datasets generated"

import h5py

from mpinets_tpu.data.process import downsize_and_split, merge_files

DATA.mkdir(parents=True, exist_ok=True)
merged = ROOT / "merged.hdf5"
n = merge_files([GEN / f / "all_data.hdf5" for f in have], merged,
                overwrite=True)
print(f"merged {n} trajectories from {len(have)} families", flush=True)

n_val = max(16, n // 20)
n_test = max(16, n // 20)
n_train = n - n_val - n_test
downsize_and_split(merged, DATA, n_train, n_val, n_test, seed=0)
print("split:", (n_train, n_val, n_test), flush=True)

from mpinets_tpu.cli.config import TrainJobConfig, DataConfig, OptimConfig
from mpinets_tpu.train.trainer import Trainer

cfg = TrainJobConfig(
    data=DataConfig(data_dir=str(DATA)),
    optim=OptimConfig(batch_size=64, max_epochs=MAX_EPOCHS),
    validation_interval=250,
    checkpoint_interval=15,
    max_val_problems=32,
    save_checkpoint_dir=str(ROOT / "ckpts"),
    experiment_name="bc_multifam_r4",
)
trainer = Trainer(cfg, should_log=True, should_checkpoint=True)
state = trainer.run()
exp_dir = trainer.ckpt_dir
print("trained; experiment dir:", exp_dir, flush=True)

# ---- summarize the curve --------------------------------------------------
rows = [json.loads(l) for l in open(Path(exp_dir) / "metrics.jsonl")]
train_rows = [r for r in rows if "point_match_loss" in r]
closed = [r for r in rows if "avg_target_error" in r]


def fmt(rs, k, nshow=7):
    step = max(1, len(rs) // nshow)
    return ", ".join(
        f"{r['step']}: {r[k]:.4f}" for r in rs[::step][: nshow + 1] if k in r
    )


md = ["# End-to-end BC training (round 4, multi-family)\n"]
md.append(
    f"Families: {have} ({n} trajectories; split {(n_train, n_val, n_test)}). "
    "Full reference shapes, batch 64, Adam 1e-4, bf16, reference losses "
    "(point-match + 5x collision hinge), FUSED Pallas train step "
    "(saved-index custom VJP, SA0 feature-cotangent skipped). "
    "hinge_active_frac = fraction of loss points within the 3 cm margin "
    "(VERDICT r3 #4 diagnostic). Reference analogue: run_training.py:166-200.\n"
)
for key in ("point_match_loss", "collision_loss", "hinge_active_frac",
            "val_loss", "env_samples_per_s"):
    if any(key in r for r in train_rows):
        md.append(f"* {key}: {fmt([r for r in train_rows if key in r], key)}")
for key in ("avg_target_error", "avg_collision_rate"):
    if closed:
        md.append(f"* {key}: {fmt(closed, key)}")
Path("/root/repo/TRAIN_r4.md").write_text("\n".join(md) + "\n")
print("\n".join(md), flush=True)

# ---- closed-loop eval of the best checkpoint on held-out problems ---------
from mpinets_tpu.cli import infer
import contextlib
import io

for fam in have:
    pkl = GEN / f"{fam}_problems.pkl"
    if not pkl.exists():
        continue
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            infer.main([
                str(Path(exp_dir) / "best"), str(pkl), "all", "all",
                "--max-problems", "48", "--batch-size", "48",
            ])
        out = buf.getvalue()
        print(f"== {fam} eval ==\n{out[-2500:]}", flush=True)
        with open("/root/repo/TRAIN_r4.md", "a") as f:
            f.write(
                f"\n## Closed-loop eval: {fam} held-out hindsight problems\n"
                "\n```\n" + out[-2500:] + "\n```\n"
            )
    except Exception:
        import traceback
        traceback.print_exc()
print("TRAIN SCRIPT DONE", flush=True)
