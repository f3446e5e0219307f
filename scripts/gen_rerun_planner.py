"""Rerun the hard families under the multi-restart planner; append
comparison rows to GEN_STATS.md."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from mpinets_tpu.pipeline.gen import gen

rows = []
for fam in ["cubby", "merged-cubby", "dresser"]:
    t0 = time.time()
    r = gen(fam, f"/root/repo/.gen_scale2/{fam}", num_scenes=100,
            candidates_per_scene=3, seed=23,
            time_budget_s=float(os.environ.get("GEN_BUDGET_S", "1100")))
    rate = 100.0 * r["valid"] / max(r["pairs"], 1)
    rows.append(
        f"| {fam} (multi-restart planner) | {r['scenes']}/100 | "
        f"{r['valid']} / {r['pairs']} | {rate:.1f}% | {r.get('miss',0)} | "
        f"{r.get('jerk',0)} | {r.get('self_collision',0)} | "
        f"{r.get('env_collision',0)} | {r.get('limit_violation',0)} | "
        f"{(time.time()-t0)/60:.0f} min |")
    with open("/root/repo/GEN_STATS.md", "a") as f:
        f.write(rows[-1] + "\n")
    print(rows[-1], flush=True)
print("RERUN DONE")
