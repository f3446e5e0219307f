"""The lockstep closed-loop rollout engine.

TPU-native re-design of the reference's sequential rollout loops:

* ``rollout_until_success`` (``/root/reference/mpinets/run_inference.py:137-191``):
  per-problem Python loop of <=150 policy steps with a GPU->CPU sync every
  step for the success check, early-exiting per problem.
* ``TrainingMotionPolicyNetwork.rollout`` (``mpinets/model.py:128-183``):
  fixed 69-step open-ended rollout used by validation.

Here the whole rollout is ONE jitted ``lax.scan`` over time with the batch of
problems stepping in lockstep. The data-dependent early exit becomes a
per-env done mask (SURVEY.md §7 "hard parts"): after an env first satisfies
the success predicate its configuration is frozen, so the recorded
trajectory and ``num_steps`` match the reference's sequential semantics
exactly, while the success predicate (batched FK + pose error) stays
on device -- no host round-trips inside the loop.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from mpinets_tpu.geom.assembly import (
    PointCloudSizes,
    assemble_point_cloud,
    assemble_point_cloud_with_obstacles,
    update_robot_points,
)
from mpinets_tpu.data.synthetic import Problem
from mpinets_tpu.kernels import kinematics
from mpinets_tpu.robot import sampler
from mpinets_tpu.utils.normalization import (
    normalize_franka_joints,
    unnormalize_franka_joints,
)

#: Eval-time maximum rollout length (run_inference.py:55).
MAX_ROLLOUT_LENGTH = 150
#: Validation rollout length (model.py:272).
VAL_ROLLOUT_LENGTH = 69
#: Success tolerances (run_inference.py:179-187, metrics.py:514-519).
POS_TOLERANCE = 0.01       # 1 cm
ORI_TOLERANCE_DEG = 15.0   # 15 degrees


class RolloutResult(NamedTuple):
    """Outputs of a lockstep rollout over a batch of problems."""

    trajectories: jnp.ndarray  # [B, T+1, 7] unnormalized configs (q0 first)
    success: jnp.ndarray       # [B] bool: success predicate ever hit
    num_steps: jnp.ndarray     # [B] int32: steps taken until success (or T)
    final_q: jnp.ndarray       # [B, 7]


def orientation_error_deg(rot_a: jnp.ndarray, rot_b: jnp.ndarray) -> jnp.ndarray:
    """Geodesic SO(3) angle between rotation matrices, in degrees.

    The reference compares SO3 orientations via the quaternion geodesic
    (run_inference.py:183-186); the trace form is equivalent:
    angle = arccos((tr(Ra^T Rb) - 1) / 2).
    """
    tr = jnp.einsum("...ij,...ij->...", rot_a, rot_b)
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def success_predicate(
    q: jnp.ndarray,
    target_rot: jnp.ndarray,
    target_trans: jnp.ndarray,
    pos_tol: float = POS_TOLERANCE,
    ori_tol_deg: float = ORI_TOLERANCE_DEG,
) -> jnp.ndarray:
    """On-device success check: EE within 1 cm and 15 deg of the target
    (run_inference.py:176-187). q: [..., 7] -> bool [...]."""
    rot, trans = kinematics.eff_pose(q)
    pos_err = jnp.linalg.norm(trans - target_trans, axis=-1)
    ori_err = orientation_error_deg(rot, target_rot)
    return (pos_err < pos_tol) & (ori_err < ori_tol_deg)


def make_rollout_fn(
    model,
    max_steps: int = MAX_ROLLOUT_LENGTH,
    sizes: PointCloudSizes = PointCloudSizes(),
    stop_on_success: bool = True,
    record_trajectory: bool = True,
    apply_fn: Callable[..., jnp.ndarray] | None = None,
) -> Callable[[Any, Problem, jax.Array], RolloutResult]:
    """Build the jitted lockstep rollout: (params, problem_batch, key) ->
    :class:`RolloutResult`.

    ``stop_on_success=True`` reproduces ``rollout_until_success`` semantics
    (frozen-when-done); ``False`` reproduces the validation ``rollout``
    (always step, ``model.py:170-182``). ``record_trajectory=False`` drops
    the [B, T+1, 7] trajectory stack for pure-throughput benchmarking.
    ``apply_fn`` overrides the policy forward (e.g. the Pallas fused path,
    :func:`mpinets_tpu.model.fused.make_fused_apply`); default
    ``model.apply``.
    """
    policy = apply_fn if apply_fn is not None else model.apply

    @jax.jit
    def rollout(params, problem: Problem, key: jax.Array) -> RolloutResult:
        b = problem.q0.shape[0]
        k_init, k_steps = jax.random.split(key)

        def step(carry, step_key):
            q_norm, xyz, done, num_steps = carry
            delta = policy(params, xyz, q_norm)
            q_norm_next = jnp.clip(q_norm + delta, -1.0, 1.0)  # model.py:171
            if stop_on_success:
                q_norm_next = jnp.where(done[:, None], q_norm, q_norm_next)
            q_next = unnormalize_franka_joints(q_norm_next)

            success = success_predicate(
                q_next, problem.target_rot, problem.target_trans
            )
            num_steps = num_steps + (~done).astype(jnp.int32)
            if stop_on_success:
                done = done | success

            # Resample the robot segment of the cloud at the new config
            # (model.py:180-181 / run_inference.py:188-189).
            robot = sampler.sample_robot_points(q_next, step_key, sizes.robot)
            xyz = update_robot_points(xyz, robot)
            out = q_next if record_trajectory else None
            return (q_norm_next, xyz, done, num_steps), out

        if problem.obstacle_points is not None:
            # Raw sensed obstacle cloud (depth / obstacle_point_cloud mode,
            # run_inference.py:58-134): no primitive scene sampling.
            xyz0 = jax.vmap(
                lambda k, q, r, t, o: assemble_point_cloud_with_obstacles(
                    k, q, r, t, o, sizes
                )
            )(
                jax.random.split(k_init, b),
                problem.q0,
                problem.target_rot,
                problem.target_trans,
                problem.obstacle_points,
            )
        else:
            xyz0 = jax.vmap(
                lambda k, q, r, t, s: assemble_point_cloud(k, q, r, t, s, sizes)
            )(
                jax.random.split(k_init, b),
                problem.q0,
                problem.target_rot,
                problem.target_trans,
                problem.scene,
            )
        q_norm0 = normalize_franka_joints(problem.q0)
        done0 = (
            success_predicate(problem.q0, problem.target_rot, problem.target_trans)
            if stop_on_success
            else jnp.zeros((b,), bool)
        )
        carry0 = (q_norm0, xyz0, done0, jnp.zeros((b,), jnp.int32))
        step_keys = jax.random.split(k_steps, max_steps)
        carry, qs = jax.lax.scan(step, carry0, step_keys)
        q_norm_f, _, done_f, num_steps = carry
        q_final = unnormalize_franka_joints(q_norm_f)

        if record_trajectory:
            traj = jnp.concatenate(
                [problem.q0[:, None, :], jnp.moveaxis(qs, 0, 1)], axis=1
            )
        else:
            traj = q_final[:, None, :]
        success_f = (
            done_f
            if stop_on_success
            else success_predicate(q_final, problem.target_rot, problem.target_trans)
        )
        return RolloutResult(traj, success_f, num_steps, q_final)

    return rollout


def frozen_trajectory_mask(result: RolloutResult) -> jnp.ndarray:
    """[B, T+1] bool: True for timesteps at/before each env's stop step
    (the valid prefix of the frozen-tail lockstep trajectory)."""
    t = result.trajectories.shape[1]
    steps = jnp.arange(t)[None, :]
    return steps <= result.num_steps[:, None]
