"""Round-5 phase-2 finetune: resume the plateaued BC run with the noise
sigma dropped so the PROGRESS component of the supervision dominates.

Motivation (scripts/diag_r5_stepmag.py on the step-8000 best checkpoint):
on clean expert states the policy predicted steps at 9% of the expert's
magnitude with ~zero directional correlation, while the training loss kept
falling — with sigma=0.015 joint noise of the same order as the expert's
per-step motion, early training is dominated by learning the DENOISING
component of E[q_{t+1} | q_t + eps]; the forward-progress component only
emerges much later (the reference affords it ~1000x our sample-visits,
README.md:296-305). Dropping sigma to 0.003 makes progress the gradient's
main signal; the real-scene DAgger loop stays on to supply off-manifold
corrections (the role the big sigma was playing).

Usage: FINETUNE_BUDGET_S=1500 python scripts/train_r5_finetune.py <ckpt_dir>
where <ckpt_dir> is the phase-1 experiment dir (its `best` checkpoint is
resumed). Writes a new experiment under .train_r5/ckpts and evaluates the
finetuned best on every held-out problem set through cli.infer.
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

ROOT = Path("/root/repo/.train_r5")
SRC = Path(sys.argv[1]).resolve()
BUDGET_S = float(os.environ.get("FINETUNE_BUDGET_S", "1500"))
SIGMA = float(os.environ.get("FINETUNE_SIGMA", "0.003"))

# resume dir whose `last` IS the source run's best checkpoint
resume = ROOT / "resume_from_best"
resume.mkdir(parents=True, exist_ok=True)
link = resume / "last"
if link.is_symlink() or link.exists():
    link.unlink()
link.symlink_to(SRC / "best")
best_step = (SRC / "best.step").read_text()
(resume / "last.step").write_text(best_step)
print(f"resuming from {SRC}/best (step {best_step}), sigma={SIGMA}",
      flush=True)

from mpinets_tpu.cli.config import (  # noqa: E402
    DataConfig, OptimConfig, RolloutConfig, TrainJobConfig,
)
from mpinets_tpu.train.trainer import Trainer  # noqa: E402

start_step = int(best_step)
est_sps = float(os.environ.get("FINETUNE_EST_SPS", "5.5"))
planned = start_step + int(BUDGET_S * est_sps)

cfg = TrainJobConfig(
    data=DataConfig(
        data_dir=str(ROOT / "data"), in_memory=True, random_scale=SIGMA
    ),
    optim=OptimConfig(
        batch_size=64,
        max_epochs=1000,
        warmup_steps=100,            # already past: restored count > warmup
        decay_steps=planned,         # cosine reaches ~0 at budget end
        ema_decay=0.999,
    ),
    rollout=RolloutConfig(
        actor_interval=int(os.environ.get("FINETUNE_ACTOR_INTERVAL", "8")),
        actor_rollout_steps=15,
        dagger_opt_steps=60,
    ),
    validation_interval=500,
    checkpoint_interval=10,
    max_val_problems=64,
    save_checkpoint_dir=str(ROOT / "ckpts"),
    experiment_name="bc_r5_ft",
    resume_from=str(resume),
)
trainer = Trainer(cfg, should_log=True, should_checkpoint=True,
                  time_budget_s=BUDGET_S)
state = trainer.run()
exp_dir = trainer.ckpt_dir
print("finetuned; experiment dir:", exp_dir, flush=True)

# ---- eval every held-out problem set through the product CLI --------------
import contextlib  # noqa: E402
import io  # noqa: E402

from mpinets_tpu.cli import infer  # noqa: E402

results = {}
for pkl in sorted(Path("/root/repo/.gen_r5").glob("*/eval_problems.pkl")):
    fam = pkl.parent.name
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            infer.main([
                str(Path(exp_dir) / "best"), str(pkl), "all", "all",
                "--use-ema", "--batch-size", "64",
            ])
        out = buf.getvalue()
        results[fam] = out
        print(f"== {fam} held-out eval ==\n{out[-3000:]}", flush=True)
        (ROOT / f"eval_{fam}.txt").write_text(out)
    except Exception:
        import traceback

        traceback.print_exc()
print("FINETUNE SCRIPT DONE", flush=True)
