import numpy as np, jax, jax.numpy as jnp
from mpinets_tpu.kernels import kinematics
from mpinets_tpu.robot import franka
from mpinets_tpu.utils.normalization import normalize_franka_joints, unnormalize_franka_joints

q = jnp.asarray(franka.NEUTRAL_Q, jnp.float32)[None]
rot, tr = jax.jit(kinematics.eff_pose)(q)
print("neutral EE:", np.round(np.asarray(tr[0]), 3), flush=True)
assert abs(float(tr[0,0]) - 0.27) < 0.15 and abs(float(tr[0,2]) - 0.45) < 0.15

qs = jnp.asarray(np.random.default_rng(0).uniform(franka.REAL_JOINT_LIMITS[:,0], franka.REAL_JOINT_LIMITS[:,1], (4,7)), jnp.float32)
rt = unnormalize_franka_joints(normalize_franka_joints(qs))
assert np.allclose(np.asarray(rt), np.asarray(qs), atol=1e-5)
bad = qs.at[0,5].set(3.74)
assert bool(kinematics.within_limits(bad, use_real_constraints=False)[0])
assert not bool(kinematics.within_limits(bad, use_real_constraints=True)[0])
print("limits table OK: real[5] =", franka.REAL_JOINT_LIMITS[5], flush=True)

from mpinets_tpu.envs.cubby import CubbyEnvironment
from mpinets_tpu.envs.tabletop import TabletopEnvironment
rng = np.random.default_rng(42)
ok_cubby = sum(CubbyEnvironment().gen(rng) for _ in range(3))
print(f"cubby gen success {ok_cubby}/3", flush=True)
ok_table = sum(TabletopEnvironment().gen(rng) for _ in range(3))
print(f"tabletop gen success {ok_table}/3", flush=True)

env = CubbyEnvironment()
for _ in range(5):
    if env.gen(rng): break
c = env.demo_candidates[0]
r, t = kinematics.eff_pose(jnp.asarray(c.config, jnp.float32))
perr = np.linalg.norm(np.asarray(t) - c.pose.position)
tr_rr = np.trace(c.pose.matrix[:3,:3].T @ np.asarray(r))
ang = np.degrees(np.arccos(np.clip((tr_rr-1)/2, -1, 1)))
print(f"cubby candidate IK: pos err {perr*1000:.2f} mm, ori err {ang:.2f} deg", flush=True)
assert perr < 2e-3 and ang < 1.0, "IK acceptance violated"

from mpinets_tpu.model.policy import MotionPolicyNetwork
from mpinets_tpu.rollout.engine import make_rollout_fn
from mpinets_tpu.data.synthetic import random_problem_batch
m = MotionPolicyNetwork()
key = jax.random.PRNGKey(0)
prob = random_problem_batch(key, 2)
params = m.init(key, jnp.zeros((1, 6272, 4)), jnp.zeros((1, 7)))
res = make_rollout_fn(m, max_steps=3)(params, prob, key)
qn = normalize_franka_joints(res.trajectories)
print("rollout traj shape", res.trajectories.shape, "norm range", float(qn.min()), float(qn.max()), flush=True)
assert res.trajectories.shape == (2, 4, 7)
assert float(qn.min()) >= -1.001 and float(qn.max()) <= 1.001
print("ALL VERIFY FLOWS OK", flush=True)
