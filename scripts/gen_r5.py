"""Round-5 TPU-resident expert data engine (VERDICT r4 #1a: scale data).

One self-bounding process owns the chip: host numpy builds scenes, and the
batched IK + vmapped multi-restart SDF planner run on the TPU with FIXED
shapes — pair batches padded to a constant bucket and scenes padded to one
per-family primitive count — so the entire run reuses a handful of jit
executables (a fresh vmap width or scene shape would recompile the full
optimizer program per scene).

Every 20th successful scene is EVAL-ONLY: its trajectories become held-out
hindsight inference problems (scene-level train/eval split, reference
semantics gen_data.py:832-845) instead of training rows.

Usage:
    nohup python scripts/gen_r5.py tabletop > .gen_r5/tabletop.log 2>&1 &
Env knobs: GEN_BUDGET_S (default 3600), GEN_SEED, GEN_OUT, GEN_CANDS,
GEN_NEUTRAL=0/1, GEN_EVAL_EVERY.

NEVER kill this process (single-tenant axon tunnel); it exits on its own
when the wall-clock budget is reached.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from mpinets_tpu.pipeline.gen import gen  # noqa: E402

#: Fixed per-family scene padding (max_cuboids, max_cylinders): generous
#: upper bounds on what each generator can emit, so one padded shape covers
#: every scene. Tabletop: <=5 table slabs + <=14 objects.
SCENE_PADS = {
    "tabletop": (24, 16),
    "cubby": (16, 8),
    "merged-cubby": (16, 8),
    "dresser": (40, 8),
}
#: Pair-batch width: 2 demo + 3 extra + 2 neutral candidates = 7 -> 42
#: directed pairs; bucket 48 covers it with minimal padding waste.
PAIR_BUCKET = 48

family = sys.argv[1] if len(sys.argv) > 1 else "tabletop"
budget = float(os.environ.get("GEN_BUDGET_S", "3600"))
seed = int(os.environ.get("GEN_SEED", "50"))
out = os.environ.get("GEN_OUT", f"/root/repo/.gen_r5/{family}")
cands = int(os.environ.get("GEN_CANDS", "3"))
neutral = os.environ.get("GEN_NEUTRAL", "1") == "1"
eval_every = int(os.environ.get("GEN_EVAL_EVERY", "20"))

t0 = time.time()
stats = gen(
    family,
    out,
    num_scenes=1_000_000,  # budget-bound, not count-bound
    candidates_per_scene=cands,
    include_neutral=neutral,
    seed=seed,
    inference_pkl=f"{out}/eval_problems.pkl",
    time_budget_s=budget,
    pair_bucket=PAIR_BUCKET,
    clear_every=0,
    eval_every=eval_every,
    scene_pad=SCENE_PADS[family],
)
print("GEN_R5_RESULT " + json.dumps(
    {"family": family, "stats": stats, "wall_s": round(time.time() - t0, 1)}
), flush=True)
