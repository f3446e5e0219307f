"""Round-5 diagnostic: is the trained policy's per-step motion magnitude
right ON-distribution (expert states) and how fast does it decay off it?

For a batch of val-split trajectories, query the policy at every expert
state q_t (noiseless, exactly the training marginal minus noise) and
compare its predicted step ||dq|| against the expert's ||q_{t+1} - q_t||,
in normalized units. A ratio near 1 on expert states with closed-loop
freezing points at covariate shift; a small ratio already on expert states
is plain underfitting of the conditional mean.

Usage: python scripts/diag_r5_stepmag.py <ckpt_dir> [n_trajectories]
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from mpinets_tpu.cli.infer import load_params  # noqa: E402
from mpinets_tpu.data import hdf5 as H  # noqa: E402
from mpinets_tpu.geom.assembly import PointCloudSizes, assemble_point_cloud  # noqa: E402
from mpinets_tpu.kernels import kinematics  # noqa: E402
from mpinets_tpu.model.policy import MotionPolicyNetwork  # noqa: E402
from mpinets_tpu.utils.normalization import normalize_franka_joints  # noqa: E402

ckpt = sys.argv[1]
n = int(sys.argv[2]) if len(sys.argv) > 2 else 8

model = MotionPolicyNetwork(compute_dtype=jnp.float32)
params = load_params(ckpt, model, use_ema=True)
sizes = PointCloudSizes()

ds = H.TrajectoryDataset(
    "/root/repo/.train_r5/data", "hybrid_solutions", H.DatasetType.VAL
)
batch = ds.read_trajectory_batch(np.arange(n))
expert = np.asarray(batch["expert"])  # [B, T, 7] raw joint configs
scene = H.scene_from_arrays(batch)
rot, trans = jax.jit(kinematics.eff_pose)(jnp.asarray(batch["raw_goal"]))

apply = jax.jit(lambda xyz, q: model.apply(params, xyz, q))
assemble = jax.jit(
    lambda k, q, r, t, s: jax.vmap(
        lambda kk, qq, rr, tt, ss: assemble_point_cloud(kk, qq, rr, tt, ss, sizes)
    )(k, q, r, t, s)
)

key = jax.random.PRNGKey(0)
ratios, coss = [], []
T = expert.shape[1]
for t in range(0, T - 1, 4):
    q_t = jnp.asarray(expert[:, t])
    q_next = jnp.asarray(expert[:, t + 1])
    keys = jax.random.split(jax.random.fold_in(key, t), n)
    xyz = assemble(keys, q_t, rot, trans, scene)
    dq_pred = np.asarray(apply(xyz, normalize_franka_joints(q_t)))
    dq_exp = np.asarray(
        normalize_franka_joints(q_next) - normalize_franka_joints(q_t)
    )
    pn = np.linalg.norm(dq_pred, axis=-1)
    en = np.linalg.norm(dq_exp, axis=-1) + 1e-12
    ratios.append(pn / en)
    coss.append(
        np.sum(dq_pred * dq_exp, axis=-1) / (pn * en + 1e-12)
    )

ratios = np.stack(ratios)  # [T/4, B]
coss = np.stack(coss)
print(f"ON expert states ({n} val trajectories, every 4th step):")
print(f"  ||dq_pred|| / ||dq_expert||: mean {ratios.mean():.3f}, "
      f"median {np.median(ratios):.3f}, p10 {np.percentile(ratios, 10):.3f}, "
      f"p90 {np.percentile(ratios, 90):.3f}")
print(f"  cosine(dq_pred, dq_expert):  mean {coss.mean():.3f}, "
      f"median {np.median(coss):.3f}, p10 {np.percentile(coss, 10):.3f}")
print(f"  by phase: early(t<16) ratio {ratios[:4].mean():.3f} "
      f"cos {coss[:4].mean():.3f}; late(t>=32) ratio {ratios[8:].mean():.3f} "
      f"cos {coss[8:].mean():.3f}")
