"""Collision-loss sensitivity ablation (VERDICT r4 #7).

Question: hinge_active_frac ~0.1-1.5% during r4 training means the
5x-weighted collision hinge is a near-no-op on this data. Is that a data
fact that joint-noise sigma can change, and does the reference's
cubby/dresser-heavy distribution share it?

Method: per family and per sigma in {0.015 (reference jobconfig.yaml:31),
0.03, 0.06}, draw noised expert states exactly as the train step does
(prepare_train_batch train=True) and evaluate the loss container AT the
noised state (what the policy sees at init): report hinge activation
fraction and hinge magnitude. CPU-runnable.

Output: markdown table to stdout + .hinge_ablation.json.
"""
import json
import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"  # setdefault is NOT enough: the
# ambient env pins axon, and the site plugin re-registers it; pin via
# jax.config as well (the conftest pattern).
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from mpinets_tpu.data import hdf5 as H
from mpinets_tpu.train.loss import bc_losses

SOURCES = {
    "tabletop": "/root/repo/.gen_r5/tabletop/all_data.hdf5",
    "cubby": "/root/repo/.gen_scale/cubby/all_data.hdf5",
    "merged-cubby": "/root/repo/.gen_scale/merged-cubby/all_data.hdf5",
    "dresser": "/root/repo/.gen_scale/dresser/all_data.hdf5",
}
SIGMAS = (0.015, 0.03, 0.06)
BATCH = 48
N_BATCHES = int(os.environ.get("HINGE_BATCHES", "20"))


def eval_family(path: str):
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        link = Path(td) / "train"
        link.mkdir()
        os.symlink(path, link / "data.hdf5")
        ds = H.TrajectoryDataset(td, "hybrid_solutions",
                                 H.DatasetType.TRAIN, in_memory=True)
        rng = np.random.default_rng(0)
        out = {}
        for sigma in SIGMAS:
            actives, mags = [], []
            for i in range(N_BATCHES):
                idx = rng.integers(0, ds.num_trajectories, BATCH)
                t = rng.integers(0, ds.expert_length, BATCH)
                raw = ds.read_instance_batch(idx, t)
                batch = H.prepare_train_batch(
                    {k: jnp.asarray(v) for k, v in raw.items()},
                    jax.random.PRNGKey(i), random_scale=sigma, train=True,
                )
                from mpinets_tpu.train.learner import scene_from_batch

                coll, _, active = bc_losses(
                    batch["configuration"], batch["supervision"],
                    scene_from_batch(batch),
                )
                actives.append(float(active))
                mags.append(float(coll))
            out[sigma] = (float(np.mean(actives)), float(np.mean(mags)))
        return out


results = {}
for fam, path in SOURCES.items():
    if not Path(path).exists():
        continue
    results[fam] = eval_family(path)
    print(fam, results[fam], flush=True)

Path("/root/repo/.hinge_ablation.json").write_text(
    json.dumps(results, indent=2)
)
print("\n| family | " + " | ".join(f"act@{s}" for s in SIGMAS) +
      " | " + " | ".join(f"hinge@{s}" for s in SIGMAS) + " |")
print("|---" * (1 + 2 * len(SIGMAS)) + "|")
for fam, r in results.items():
    acts = " | ".join(f"{r[s][0]*100:.2f}%" for s in SIGMAS)
    mags = " | ".join(f"{r[s][1]:.5f}" for s in SIGMAS)
    print(f"| {fam} | {acts} | {mags} |")
print("HINGE ABLATION DONE", flush=True)
