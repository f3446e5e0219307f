"""Actor side of the actor-learner loop: on-device rollout workers that feed
the learner.

The north star pairs the sharded BC learner with sharded rollout workers
(BASELINE configs 4-5): policy rollouts generate closed-loop state
distributions on device, and a DAgger-style relabeling turns the visited
states into fresh BC supervision — the expert answers "what would you do
HERE", which is exactly the correction the reference approximates offline
with its train-time joint noise (``data_loader.py:167-179``,
sigma = 0.015 around expert states).

In synthetic mode the relabeling expert is the same min-jerk pseudo-expert
the offline stream uses (:func:`mpinets_tpu.data.synthetic.min_jerk_trajectory`,
re-planned from each visited state), so learner batches from both sources
are exchangeable. All of it is jit/shard_map-compatible: the trainer wraps
:func:`dagger_batch_from_rollout` in the same data-parallel step it uses for
offline batches.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from mpinets_tpu.data.synthetic import (
    SEQUENCE_LENGTH,
    min_jerk_trajectory,
    random_configuration,
    random_scene,
)
from mpinets_tpu.geom.assembly import PointCloudSizes, assemble_point_cloud
from mpinets_tpu.kernels import kinematics
from mpinets_tpu.rollout.engine import make_rollout_fn
from mpinets_tpu.data.synthetic import Problem
from mpinets_tpu.utils.normalization import normalize_franka_joints


def make_dagger_collector(
    model,
    rollout_steps: int = 20,
    sizes: PointCloudSizes = PointCloudSizes(),
    apply_fn=None,
):
    """Build ``(params, key, batch_size) -> training batch`` that rolls the
    CURRENT policy out on fresh synthetic problems and relabels the visited
    states with the pseudo-expert.

    Returned batches use the exact key layout of
    :func:`mpinets_tpu.data.synthetic.training_batch`, so the learner step
    consumes them unchanged.
    """
    rollout = make_rollout_fn(
        model,
        max_steps=rollout_steps,
        sizes=sizes,
        stop_on_success=False,
        record_trajectory=True,
        apply_fn=apply_fn,
    )

    @functools.partial(jax.jit, static_argnames=("batch_size",))
    def collect(params, key: jax.Array, batch_size: int) -> Dict[str, jnp.ndarray]:
        keys = jax.random.split(key, 6)
        scene = jax.vmap(random_scene)(jax.random.split(keys[0], batch_size))
        q0 = random_configuration(jax.random.fold_in(keys[1], 0), (batch_size,))
        q_goal = random_configuration(jax.random.fold_in(keys[1], 1), (batch_size,))
        rot_goal, trans_goal = kinematics.eff_pose(q_goal)
        problem = Problem(
            q0=q0, target_rot=rot_goal, target_trans=trans_goal, scene=scene
        )

        result = rollout(params, problem, keys[2])
        traj = result.trajectories                      # [B, T+1, 7]
        t = jax.random.randint(keys[3], (batch_size,), 0, traj.shape[1])
        q_t = jnp.take_along_axis(traj, t[:, None, None], axis=1)[:, 0]

        # DAgger relabel: the expert's next step from the VISITED state.
        expert = min_jerk_trajectory(q_t, q_goal)       # [B, T, 7]
        q_next = expert[:, 1]

        cloud_keys = jax.random.split(keys[4], batch_size)
        xyz = jax.vmap(
            lambda k, q, r, tr, s: assemble_point_cloud(k, q, r, tr, s, sizes)
        )(cloud_keys, q_t, rot_goal, trans_goal, scene)

        return {
            "xyz": xyz,
            "configuration": normalize_franka_joints(q_t),
            "supervision": normalize_franka_joints(q_next),
            "target_position": trans_goal,
            "cuboid_centers": scene.cuboid_centers,
            "cuboid_dims": scene.cuboid_dims,
            "cuboid_quats": scene.cuboid_quats,
            "cylinder_centers": scene.cylinder_centers,
            "cylinder_radii": scene.cylinder_radii,
            "cylinder_heights": scene.cylinder_heights,
            "cylinder_quats": scene.cylinder_quats,
        }

    return collect


def make_real_dagger_collector(
    model,
    rollout_steps: int = 20,
    sizes: PointCloudSizes = PointCloudSizes(),
    apply_fn=None,
    opt_steps: int = 60,
):
    """Real-scene DAgger (r5, VERDICT r4 #1c/#8): roll the CURRENT policy
    out on problems drawn from the GENERATED dataset and relabel the visited
    states with the real expert — the SDF trajectory optimizer from
    :mod:`mpinets_tpu.pipeline.expert` planning from each visited state to
    the problem's goal configuration. This attacks compounding covariate
    shift exactly where the r4 diagnosis located it: the expert answers
    "what would you do HERE" on the states the policy actually reaches.

    Returns ``(params, key, problem_batch) -> training batch``:
    ``problem_batch`` is a raw trajectory batch from
    :meth:`mpinets_tpu.data.hdf5.TrajectoryDataset.read_trajectory_batch`
    (expert [B, T, 7] + raw configs + scene arrays). Where the optimizer's
    relabeled plan fails verification (collision/limits), the sample falls
    back to the stored expert step at a random timestep — a plain BC sample
    — so every row of the batch carries valid supervision.
    """
    from mpinets_tpu.kernels import ik as ik_mod
    from mpinets_tpu.pipeline import expert as expert_mod

    rollout = make_rollout_fn(
        model,
        max_steps=rollout_steps,
        sizes=sizes,
        stop_on_success=False,
        record_trajectory=True,
        apply_fn=apply_fn,
    )

    @jax.jit
    def collect(params, key: jax.Array, problem_batch):
        from mpinets_tpu.train.learner import scene_from_batch

        scene = scene_from_batch(problem_batch)
        expert_traj = problem_batch["expert"]            # [B, T, 7]
        q0 = problem_batch["raw_configuration"]
        q_goal = problem_batch["raw_goal"]
        b = q0.shape[0]
        rot_goal, trans_goal = kinematics.eff_pose(q_goal)
        problem = Problem(
            q0=q0, target_rot=rot_goal, target_trans=trans_goal, scene=scene
        )

        keys = jax.random.split(key, 4)
        result = rollout(params, problem, keys[0])
        traj = result.trajectories                       # [B, S+1, 7]
        t = jax.random.randint(keys[1], (b,), 1, traj.shape[1])
        q_t = jnp.take_along_axis(traj, t[:, None, None], axis=1)[:, 0]

        # Real expert relabel: SDF-optimize a path from the VISITED state to
        # the goal config over this sample's own scene.
        opt = jax.vmap(
            lambda qs, qg, sc: expert_mod.optimize_trajectory(
                qs, qg, sc, steps=opt_steps
            )
        )(q_t, q_goal, scene)                            # [B, L, 7]
        # accept iff the relabeled path is collision/limit-clean and its
        # first step starts from a feasible state
        path_ok = (
            ~jax.vmap(expert_mod.env_collision_any)(opt, scene)
            & ~jax.vmap(lambda p: jnp.any(kinematics.self_collision(p)))(opt)
            & jax.vmap(
                lambda p: jnp.all(
                    kinematics.within_limits(p, use_real_constraints=True)
                )
            )(opt)
            & ik_mod.franka_free_space(q_t, scene)
        )                                                # [B]

        # fallback: stored expert step at a random timestep (plain BC)
        t_exp = jax.random.randint(keys[2], (b,), 0, expert_traj.shape[1] - 1)
        q_bc = jnp.take_along_axis(expert_traj, t_exp[:, None, None], axis=1)[:, 0]
        q_bc_next = jnp.take_along_axis(
            expert_traj, (t_exp + 1)[:, None, None], axis=1
        )[:, 0]

        q_state = jnp.where(path_ok[:, None], q_t, q_bc)
        q_sup = jnp.where(path_ok[:, None], opt[:, 1], q_bc_next)

        cloud_keys = jax.random.split(keys[3], b)
        xyz = jax.vmap(
            lambda k, q, r, tr, s: assemble_point_cloud(k, q, r, tr, s, sizes)
        )(cloud_keys, q_state, rot_goal, trans_goal, scene)

        batch = {
            "xyz": xyz,
            "configuration": normalize_franka_joints(q_state),
            "supervision": normalize_franka_joints(q_sup),
            "target_position": trans_goal,
            "cuboid_centers": scene.cuboid_centers,
            "cuboid_dims": scene.cuboid_dims,
            "cuboid_quats": scene.cuboid_quats,
            "cylinder_centers": scene.cylinder_centers,
            "cylinder_radii": scene.cylinder_radii,
            "cylinder_heights": scene.cylinder_heights,
            "cylinder_quats": scene.cylinder_quats,
        }
        info = {"dagger_accept_frac": jnp.mean(path_ok.astype(jnp.float32))}
        return batch, info

    return collect
