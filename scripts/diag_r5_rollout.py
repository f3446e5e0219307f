"""Round-5 diagnostic: per-step target-error profile of a trained policy.

Loads a trainer checkpoint (EMA params) on CPU, rolls 150 steps open-ended
(no early stop) on a handful of val-split hindsight problems, and prints the
position/orientation error vs step. Distinguishes the three failure shapes
the 0.48 m validation plateau could hide: never-approaches (error flat),
approach-and-stall (error drops then parks), approach-and-overshoot (error
dips then climbs after the expert's 50-step horizon).

Usage: python scripts/diag_r5_rollout.py <ckpt_dir> [n_problems]
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from mpinets_tpu.cli.infer import load_params  # noqa: E402
from mpinets_tpu.data import hdf5 as H  # noqa: E402
from mpinets_tpu.data.synthetic import Problem  # noqa: E402
from mpinets_tpu.geom.assembly import PointCloudSizes  # noqa: E402
from mpinets_tpu.kernels import kinematics  # noqa: E402
from mpinets_tpu.model.policy import MotionPolicyNetwork  # noqa: E402
from mpinets_tpu.rollout.engine import make_rollout_fn  # noqa: E402

ckpt = sys.argv[1]
n = int(sys.argv[2]) if len(sys.argv) > 2 else 8

model = MotionPolicyNetwork(compute_dtype=jnp.float32)
params = load_params(ckpt, model, use_ema=True)

ds = H.TrajectoryDataset(
    "/root/repo/.train_r5/data", "hybrid_solutions", H.DatasetType.VAL
)
batch = ds.read_trajectory_batch(np.arange(n))
rot, trans = jax.jit(kinematics.eff_pose)(jnp.asarray(batch["raw_goal"]))
problem = Problem(
    q0=jnp.asarray(batch["raw_configuration"]),
    target_rot=rot,
    target_trans=trans,
    scene=H.scene_from_arrays(batch),
)

rollout = make_rollout_fn(
    model, max_steps=150, sizes=PointCloudSizes(), stop_on_success=False,
    record_trajectory=True,
)
result = rollout(params, problem, jax.random.PRNGKey(0))
trajs = np.asarray(result.trajectories)  # [B, T+1, 7]

err = []
for t in range(trajs.shape[1]):
    r, p = jax.jit(kinematics.eff_pose)(jnp.asarray(trajs[:, t]))
    pos_err = np.linalg.norm(np.asarray(p) - np.asarray(trans), axis=-1)
    rel = np.einsum("bji,bjk->bik", np.asarray(rot), np.asarray(r))
    tr = np.trace(rel, axis1=-2, axis2=-1)
    ang = np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))
    err.append((pos_err, ang))

pos = np.stack([e[0] for e in err])  # [T+1, B]
ang = np.stack([e[1] for e in err])
np.set_printoptions(precision=3, suppress=True, linewidth=200)
print("per-problem position error (m) at steps 0,10,...,150:")
for b in range(pos.shape[1]):
    steps = list(range(0, pos.shape[0], 10))
    print(f"  p{b}: " + " ".join(f"{pos[s, b]:.3f}" for s in steps)
          + f" | min {pos[:, b].min():.3f} @ {pos[:, b].argmin()}"
          + f" | ang@min {ang[pos[:, b].argmin(), b]:.0f}deg"
          + f" | ang@end {ang[-1, b]:.0f}deg")
print(f"\nmean final pos err: {pos[-1].mean():.3f} m; "
      f"mean min-over-rollout: {pos.min(axis=0).mean():.3f} m; "
      f"mean step of min: {pos.argmin(axis=0).mean():.0f}")
