"""Batched inverse kinematics: damped-least-squares (DLS) Gauss-Newton on
the Franka chain, fully jit/vmap-friendly.

The reference gets candidate configurations from IKFast plus a PyBullet
collision check (``robofin.robots.FrankaRobot.collision_free_ik``, used by
the environment generators at
``/root/reference/mpinets/data_pipeline/environments/tabletop_environment.py:395``,
``cubby_environment.py:546``, ``dresser_environment.py:496``). IKFast is a
closed-form C++ solver; the TPU-native equivalent is a *batch* of iterative
DLS solves — the Jacobian comes from ``jax.jacfwd`` of the FK kernel, every
iteration is a few small matmuls, and thousands of (seed, target) pairs run
in one fused XLA program. Random multi-seeding covers the null space the way
IKFast's free-angle sweep does.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mpinets_tpu.kernels import kinematics, sdf
from mpinets_tpu.robot import franka

#: Convergence tolerances: 1 mm position, ~0.6 deg orientation.
POS_TOL = 1e-3
ORI_TOL = 1e-2  # radians


class IKResult(NamedTuple):
    q: jnp.ndarray          # [..., 7] best solution per target
    converged: jnp.ndarray  # [...] bool
    pos_err: jnp.ndarray    # [...]
    ori_err: jnp.ndarray    # [...] radians


def _rot_log(r: jnp.ndarray) -> jnp.ndarray:
    """SO(3) log map: rotation matrix [..., 3, 3] -> rotation vector [..., 3].

    Uses the skew-part formula with a Taylor-safe small-angle branch; accurate
    for |theta| < pi - eps, which holds along a converging IK path.
    """
    tr = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos)
    skew = jnp.stack(
        [
            r[..., 2, 1] - r[..., 1, 2],
            r[..., 0, 2] - r[..., 2, 0],
            r[..., 1, 0] - r[..., 0, 1],
        ],
        axis=-1,
    )
    # factor = theta / (2 sin theta); -> 1/2 as theta -> 0.
    sin = jnp.sin(theta)
    factor = jnp.where(theta < 1e-6, 0.5, theta / jnp.maximum(2.0 * sin, 1e-12))
    return skew * factor[..., None]


def pose_residual(
    q: jnp.ndarray, target_rot: jnp.ndarray, target_trans: jnp.ndarray
) -> jnp.ndarray:
    """6D task-space error for the *solver*: position plus the skew part of
    the error rotation (axis * sin(theta)), [..., 6].

    The sin-axis form is polynomial in the rotation entries, so its
    ``jacfwd`` is smooth everywhere (the log map's arccos has an unbounded
    derivative at zero error, which poisons Gauss-Newton with NaNs).
    """
    rot, trans = kinematics.eff_pose(q)
    pos_err = target_trans - trans
    r = jnp.einsum("...ij,...kj->...ik", target_rot, rot)
    skew = 0.5 * jnp.stack(
        [
            r[..., 2, 1] - r[..., 1, 2],
            r[..., 0, 2] - r[..., 2, 0],
            r[..., 1, 0] - r[..., 0, 1],
        ],
        axis=-1,
    )
    # Rescale the sin-axis vector toward the log map: |skew| = sin(theta),
    # so multiplying by theta/sin(theta) gives magnitude theta. The bare
    # sin-axis form vanishes as theta -> pi, making the antipodal flip a
    # spurious GN plateau (r2 fix: seeds visibly converged to pi flips).
    # The factor is clipped so jacfwd stays bounded at both ends.
    tr = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0 + 1e-6, 1.0 - 1e-6)
    theta = jnp.arccos(cos)
    sin = jnp.sqrt(jnp.maximum(1.0 - cos * cos, 1e-12))
    factor = jnp.clip(theta / sin, 1.0, 16.0)
    ori_err = skew * factor[..., None]
    return jnp.concatenate([pos_err, ori_err], axis=-1)


def pose_errors(
    q: jnp.ndarray, target_rot: jnp.ndarray, target_trans: jnp.ndarray
):
    """(pos_err [...], ori_err_rad [...]) true geodesic metrics for
    acceptance tests (not differentiated).

    The angle comes from the trace form arccos((tr - 1)/2), which is valid on
    ALL of SO(3) including exactly-pi flips — the log map's skew part
    vanishes there, which is precisely the blind spot this gate closes."""
    rot, trans = kinematics.eff_pose(q)
    pos = jnp.linalg.norm(target_trans - trans, axis=-1)
    r = jnp.einsum("...ij,...ij->...", target_rot, rot)  # tr(Rt^T R)
    ori = jnp.arccos(jnp.clip((r - 1.0) / 2.0, -1.0, 1.0))
    return pos, ori


def _dls_solve(
    q0: jnp.ndarray,
    target_rot: jnp.ndarray,
    target_trans: jnp.ndarray,
    iters: int,
    damping: float,
) -> jnp.ndarray:
    """Run ``iters`` DLS Gauss-Newton steps from ``q0`` (single problem;
    vmap for batches). dq = J^T (J J^T + lambda^2 I)^-1 e."""
    resid = functools.partial(
        pose_residual, target_rot=target_rot, target_trans=target_trans
    )
    jac_fn = jax.jacfwd(resid)
    limits = jnp.asarray(franka.REAL_JOINT_LIMITS, q0.dtype)
    eye6 = jnp.eye(6, dtype=q0.dtype)

    def body(q, _):
        e = resid(q)                      # [6]
        # jacfwd of the residual (target - fk) is the NEGATIVE manipulator
        # Jacobian; the DLS step dq = J^T (J J^T + l^2 I)^-1 e uses J = d
        # pose/dq, hence the minus sign (r2 fix: the unnegated form ascends).
        j = -jac_fn(q)                    # [6, 7]
        jjt = j @ j.T + (damping**2) * eye6
        dq = j.T @ jax.scipy.linalg.solve(jjt, e, assume_a="pos")
        q = jnp.clip(q + dq, limits[:, 0], limits[:, 1])
        return q, None

    q, _ = jax.lax.scan(body, q0, None, length=iters)
    return q


@functools.partial(jax.jit, static_argnames=("num_seeds", "iters"))
def solve_ik(
    key: jax.Array,
    target_rot: jnp.ndarray,
    target_trans: jnp.ndarray,
    q_init: jnp.ndarray | None = None,
    num_seeds: int = 16,
    iters: int = 30,
    damping: float = 0.05,
) -> IKResult:
    """Multi-seed batched IK for a batch of targets.

    :param target_rot: [B, 3, 3] right_gripper orientations.
    :param target_trans: [B, 3].
    :param q_init: optional [B, 7] warm start included among the seeds.
    :returns: best solution per target with convergence flags.
    """
    b = target_trans.shape[0]
    limits = jnp.asarray(franka.REAL_JOINT_LIMITS, target_trans.dtype)
    u = jax.random.uniform(key, (num_seeds, b, franka.DOF))
    seeds = limits[:, 0] + u * (limits[:, 1] - limits[:, 0])
    # Seed 0 biases to the neutral pose (a reliable basin for front-of-robot
    # targets); optional warm start replaces seed 1.
    seeds = seeds.at[0].set(jnp.asarray(franka.NEUTRAL_Q, seeds.dtype))
    if q_init is not None:
        seeds = seeds.at[1 % num_seeds].set(q_init)

    solve = jax.vmap(  # over seeds
        jax.vmap(_dls_solve, in_axes=(0, 0, 0, None, None)),
        in_axes=(0, None, None, None, None),
    )
    qs = solve(seeds, target_rot, target_trans, iters, damping)  # [S, B, 7]

    # Acceptance uses the true geodesic angle (pose_errors), NOT the sin-axis
    # residual: |sin(theta)| is ~0 at theta~pi, so gating on the residual
    # would accept 180-degree-flipped solutions (advisor finding r1).
    pos_err, ori_err = jax.vmap(pose_errors, in_axes=(0, None, None))(
        qs, target_rot, target_trans
    )  # [S, B] each
    score = pos_err + 0.1 * ori_err
    best = jnp.argmin(score, axis=0)  # [B]

    q_best = jnp.take_along_axis(qs, best[None, :, None], axis=0)[0]
    pos_best = jnp.take_along_axis(pos_err, best[None], axis=0)[0]
    ori_best = jnp.take_along_axis(ori_err, best[None], axis=0)[0]
    converged = (pos_best < POS_TOL) & (ori_best < ORI_TOL)
    return IKResult(q_best, converged, pos_best, ori_best)


def franka_free_space(q: jnp.ndarray, scene, margin: float = 0.0) -> jnp.ndarray:
    """True where the 57-sphere robot model at ``q`` clears the scene and
    itself (the Bullet-check half of ``collision_free_ik``).

    q: [B, 7]; scene: SceneSet batched [B] or unbatched -> bool [B].
    """
    # Scene checks exclude the base-link sphere (reference
    # with_base_link=False convention, mpinets/model.py:270).
    centers = kinematics.scene_collision_spheres(q)  # [B, 56, 3]
    radii = jnp.asarray(franka.SCENE_SPHERE_RADII, q.dtype)
    d = sdf.scene_sdf(centers, scene)  # [B, 57]
    env_clear = jnp.all(d > radii + margin, axis=-1)
    return env_clear & ~kinematics.self_collision(q)


@functools.partial(jax.jit, static_argnames=("num_seeds", "iters"))
def collision_free_ik(
    key: jax.Array,
    target_rot: jnp.ndarray,
    target_trans: jnp.ndarray,
    scene,
    num_seeds: int = 16,
    iters: int = 30,
    margin: float = 0.0,
) -> IKResult:
    """IK + free-space acceptance (``FrankaRobot.collision_free_ik``
    equivalent): per-seed solutions are filtered by scene/self collision
    before picking the best, so a colliding basin does not shadow a clear
    one.
    """
    b = target_trans.shape[0]
    limits = jnp.asarray(franka.REAL_JOINT_LIMITS, target_trans.dtype)
    u = jax.random.uniform(key, (num_seeds, b, franka.DOF))
    seeds = limits[:, 0] + u * (limits[:, 1] - limits[:, 0])
    seeds = seeds.at[0].set(jnp.asarray(franka.NEUTRAL_Q, seeds.dtype))

    solve = jax.vmap(
        jax.vmap(_dls_solve, in_axes=(0, 0, 0, None, None)),
        in_axes=(0, None, None, None, None),
    )
    qs = solve(seeds, target_rot, target_trans, iters, 0.05)  # [S, B, 7]

    # Geodesic acceptance metrics (see solve_ik): the sin-axis residual norm
    # is blind to antipodal (theta~pi) orientation flips.
    pos_err, ori_err = jax.vmap(pose_errors, in_axes=(0, None, None))(
        qs, target_rot, target_trans
    )  # [S, B] each
    free = jax.vmap(franka_free_space, in_axes=(0, None, None))(qs, scene, margin)
    ok = (pos_err < POS_TOL) & (ori_err < ORI_TOL) & free

    # Prefer feasible solutions; among those, the most accurate one.
    score = pos_err + 0.1 * ori_err + jnp.where(ok, 0.0, 1e6)
    best = jnp.argmin(score, axis=0)  # [B]
    q_best = jnp.take_along_axis(qs, best[None, :, None], axis=0)[0]
    return IKResult(
        q_best,
        jnp.take_along_axis(ok, best[None], axis=0)[0],
        jnp.take_along_axis(pos_err, best[None], axis=0)[0],
        jnp.take_along_axis(ori_err, best[None], axis=0)[0],
    )
