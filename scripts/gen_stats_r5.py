"""Round-5 GEN_STATS re-run (VERDICT r4 #3): all four families, fresh rows,
funnels intact, with the new lazy-PRM global stage feeding the optimizer.

Runs TPU-resident with fixed shapes (pair bucket + per-family scene pads).
Budget per family via GEN_STATS_BUDGET_S (default 600 s). Writes
GEN_STATS.md in full (no reconstructions). Self-bounding; never kill.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from mpinets_tpu.pipeline.gen import gen  # noqa: E402

FAMILIES = [
    f for f in os.environ.get(
        "GEN_STATS_FAMILIES", "tabletop,cubby,merged-cubby,dresser"
    ).split(",") if f
]
ALL_FAMILIES = ["tabletop", "cubby", "merged-cubby", "dresser"]
SCENE_PADS = {
    "tabletop": (24, 16),
    "cubby": (16, 8),
    "merged-cubby": (16, 8),
    "dresser": (40, 8),
}
N_SCENES = int(os.environ.get("GEN_STATS_SCENES", "100"))
BUDGET = float(os.environ.get("GEN_STATS_BUDGET_S", "600"))
N_PRM = int(os.environ.get("GEN_STATS_PRM", "2"))
OUT = "/root/repo/.gen_stats_r5"
RESULTS_JSON = f"{OUT}/results.json"
# resumable across invocations: rows persist per family, so a transient
# compile-helper failure on one family can be retried without losing the
# others' rows
results = {}
if os.path.exists(RESULTS_JSON):
    results = {k: tuple(v) for k, v in
               json.load(open(RESULTS_JSON)).items()}

header = (
    "# Expert pipeline health at scale (r5)\n\n"
    f"Driver: `scripts/gen_stats_r5.py` — up to {N_SCENES} scenes/family, "
    "TPU-resident (fixed pair bucket 48 + per-family scene padding), "
    "3 extra candidates/scene, both directions of every candidate pair "
    "planned ONCE (the r2-r4 duplicate-direction bug is fixed, so rows are "
    "not comparable to r4 plan counts at equal scenes). Planner = smooth "
    f"family + multi-restart SDF optimizer + sampled vias + {N_PRM} "
    "lazy-PRM roadmap seeds (the r5 global stage; pipeline/expert.py "
    "prm_waypoints). Failure codes follow the reference's "
    "verify_trajectory predicates (gen_data.py:396-430) on the best "
    "ATTEMPTED trajectory. Funnels now include scenes whose generation "
    "failed (advisor r4 fix).\n\n"
    "| family | scenes | plans valid / attempted | valid % | miss | jerk | "
    "self-coll | env-coll | limits | IK funnel (poses->solved->free) | "
    "wall-clock |\n"
    "|---|---|---|---|---|---|---|---|---|---|---|\n"
)


def write_md():
    rows = []
    for fam in ALL_FAMILIES:
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
            candidates_per_scene=3, seed=1717,
            inference_pkl=f"{OUT}/{fam}_problems.pkl",
            time_budget_s=BUDGET,
            pair_bucket=48,
            clear_every=0,
            scene_pad=SCENE_PADS[fam],
            plan_kwargs={"n_prm": N_PRM},
        )
        results[fam] = (stats, time.time() - t0)
    except Exception:
        import traceback

        traceback.print_exc()
        results[fam] = ({"scenes": 0, "pairs": 0, "valid": 0},
                        time.time() - t0)
    json.dump({k: list(v) for k, v in results.items()},
              open(RESULTS_JSON, "w"))
    write_md()
    print(f"== {fam} done in {(time.time()-t0)/60:.1f} min "
          f"{json.dumps(results[fam][0])}", flush=True)
print("GEN_STATS_R5 DONE", flush=True)
