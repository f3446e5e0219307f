"""End-to-end BC training on generated expert data (VERDICT r2 #6).

Waits for the gen-at-scale tabletop dataset, splits it train/val/test,
trains the full-shape model for a bounded number of epochs on the real
backend, then evaluates the BEST checkpoint on the held-out hindsight
problems with the product eval CLI. Self-bounding.

Outputs: .train_r3/ (experiment dir with metrics.jsonl + checkpoints),
TRAIN_r3.md (curve summary + closed-loop eval printout).
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

SRC = Path("/root/repo/.gen_scale/tabletop/all_data.hdf5")
PROBLEMS = Path("/root/repo/.gen_scale/tabletop_problems.pkl")
ROOT = Path("/root/repo/.train_r3")
DATA = ROOT / "data"

t0 = time.time()
while not (SRC.exists() and PROBLEMS.exists()):
    if time.time() - t0 > 3600:
        print("dataset never appeared; aborting")
        sys.exit(1)
    time.sleep(30)
time.sleep(10)  # let the writer finish

import h5py

from mpinets_tpu.data.process import downsize_and_split

DATA.mkdir(parents=True, exist_ok=True)
with h5py.File(SRC, "r") as f:
    key = "hybrid_solutions" if "hybrid_solutions" in f else "global_solutions"
    n_total = f[key].shape[0]
n_val = max(8, n_total // 20)
n_test = max(8, n_total // 20)
n_train = n_total - n_val - n_test
downsize_and_split(SRC, DATA, n_train, n_val, n_test, seed=0)
counts = (n_train, n_val, n_test)
print("split:", counts, flush=True)

from mpinets_tpu.cli.config import TrainJobConfig, DataConfig, OptimConfig
from mpinets_tpu.train.trainer import Trainer

cfg = TrainJobConfig(
    data=DataConfig(data_dir=str(DATA)),
    optim=OptimConfig(batch_size=64, max_epochs=6),
    validation_interval=150,
    checkpoint_interval=10,
    max_val_problems=32,
    save_checkpoint_dir=str(ROOT / "ckpts"),
    experiment_name="bc_tabletop_r3",
)
trainer = Trainer(cfg, should_log=True, should_checkpoint=True)
state = trainer.run()
exp_dir = trainer.exp_dir
print("trained; experiment dir:", exp_dir, flush=True)

# ---- summarize the curve --------------------------------------------------
rows = [json.loads(l) for l in open(Path(exp_dir) / "metrics.jsonl")]
train_rows = [r for r in rows if "point_match_loss" in r]
val_rows = [r for r in rows if "val_loss" in r]
closed = [r for r in rows if "avg_target_error" in r]


def fmt(rs, k, n=6):
    step = max(1, len(rs) // n)
    return ", ".join(
        f"{r['step']}: {r[k]:.4f}" for r in rs[:: step][:n + 1]
    )


md = ["# End-to-end BC training (round 3)\n"]
md.append(
    "Generated tabletop expert data (`scripts/gen_at_scale.py`), "
    f"{counts} trajectories train/val/test, full reference shapes "
    "(6272-pt clouds, 512/128-centroid SA), batch 64, Adam 1e-4, bf16, "
    "reference losses (point-match + 5x collision hinge). "
    "Reference analogue: run_training.py:166-200 + jobconfig.yaml.\n"
)
for key, rs in [("point_match_loss", train_rows),
                ("collision_loss", train_rows),
                ("val_loss", val_rows),
                ("avg_target_error", closed),
                ("avg_collision_rate", closed)]:
    if rs and key in rs[0]:
        md.append(f"* {key}: {fmt(rs, key)}")
Path("/root/repo/TRAIN_r3.md").write_text("\n".join(md) + "\n")
print("\n".join(md), flush=True)

# ---- closed-loop eval of the best checkpoint on held-out problems ---------
try:
    import contextlib
    import io

    from mpinets_tpu.cli import infer

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        infer.main([
            str(Path(exp_dir) / "best"), str(PROBLEMS), "all", "all",
            "--max-problems", "64", "--batch-size", "32",
        ])
    out = buf.getvalue()
    print(out, flush=True)
    with open("/root/repo/TRAIN_r3.md", "a") as f:
        f.write(
            "\n## Closed-loop eval of the best checkpoint "
            "(held-out hindsight problems)\n\n```\n" + out[-4000:] + "\n```\n"
        )
except Exception:
    import traceback
    traceback.print_exc()
print("TRAIN SCRIPT DONE", flush=True)
