"""Drive the expert pipeline at scale on CPU (VERDICT r2 #5): >=100 scenes
per family, writing per-family valid-plan rates and failure tallies to
GEN_STATS.md incrementally (reference health metric: gen_data.py:419-430).
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import sys
sys.path.insert(0, "/root/repo")
import json
import time

import jax
jax.config.update("jax_platforms", "cpu")

from mpinets_tpu.pipeline.gen import gen

FAMILIES = ["tabletop", "cubby", "merged-cubby", "dresser"]
N_SCENES = int(sys.argv[1]) if len(sys.argv) > 1 else 100
OUT = "/root/repo/.gen_scale"
results = {}

header = (
    "# Expert pipeline health at scale (r3)\n\n"
    f"Driver: `scripts/gen_at_scale.py` — {N_SCENES} scenes/family on CPU, "
    "3 extra candidates/scene (~40 plans/scene, both directions of every "
    "candidate pair; reference scale is ~98 plans/scene on an 80-node "
    "cluster, gen_data.py:78-81). Failure codes follow the reference's "
    "verify_trajectory predicates (gen_data.py:396-430). Note: a plan can "
    "carry several failure codes, and the smooth-family fallback means "
    "'valid' counts plans passing ALL five predicates.\n\n"
    "r4: failure codes are tallied on the best ATTEMPTED trajectory (the r3\n"
    "zeros-placeholder artifact is fixed, so the per-code columns diagnose\n"
    "real failure modes), the planner gained a sampled-via global stage\n"
    "(2 scene-clearance-filtered random vias feed the optimizer as extra\n"
    "restarts), and the candidate-IK rejection funnel is recorded per\n"
    "family (pose proposals -> accurate IK -> collision-free -> kept).\n\n"
    "| family | scenes | plans valid / attempted | valid % | miss | jerk | "
    "self-coll | env-coll | limits | IK funnel (poses->solved->free) | "
    "wall-clock |\n"
    "|---|---|---|---|---|---|---|---|---|---|---|\n"
)


def write_md():
    rows = []
    for fam in FAMILIES:
        if fam not in results:
            continue
        r, secs = results[fam]
        rate = 100.0 * r["valid"] / max(r["pairs"], 1)
        funnel = (
            f"{r.get('funnel_poses', 0)} -> {r.get('funnel_ik_solved', 0)} "
            f"-> {r.get('funnel_free', 0)}"
        )
        rows.append(
            f"| {fam} | {r['scenes']}/{N_SCENES} | {r['valid']} / "
            f"{r['pairs']} | {rate:.1f}% | {r.get('miss', 0)} | "
            f"{r.get('jerk', 0)} | {r.get('self_collision', 0)} | "
            f"{r.get('env_collision', 0)} | {r.get('limit_violation', 0)} | "
            f"{funnel} | {secs/60:.0f} min |"
        )
    with open("/root/repo/GEN_STATS.md", "w") as f:
        f.write(header + "\n".join(rows) + "\n")


for fam in FAMILIES:
    t0 = time.time()
    try:
        stats = gen(
            fam, f"{OUT}/{fam}", num_scenes=N_SCENES,
            candidates_per_scene=3, seed=17,
            inference_pkl=f"{OUT}/{fam}_problems.pkl",
            time_budget_s=float(os.environ.get("GEN_BUDGET_S", "1700")),
        )
        results[fam] = (stats, time.time() - t0)
    except Exception as e:
        import traceback
        traceback.print_exc()
        results[fam] = ({"scenes": 0, "pairs": 0, "valid": 0},
                        time.time() - t0)
    write_md()
    print(f"== {fam} done in {(time.time()-t0)/60:.1f} min", flush=True)
print("ALL DONE")
