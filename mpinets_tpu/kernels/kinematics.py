"""Batched forward kinematics for the Franka Panda, jit/vmap friendly.

TPU-native replacement for robofin's ``FrankaRobot.fk`` /
``FrankaSampler``-style FK (used by the reference at
``mpinets/data_loader.py:155``, ``mpinets/run_inference.py:176``,
``mpinets/model.py:267-271``). Instead of per-config Python FK, the whole
chain is evaluated as a short unrolled sequence of batched 3x3 matmuls so a
[B, 7] batch of configurations turns into [B, F, 3, 3] + [B, F, 3] frame
poses in one fused XLA computation.

Frames are indexed by :data:`mpinets_tpu.robot.franka.FRAMES`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mpinets_tpu.robot import franka
from mpinets_tpu.kernels.rotations import matrix_to_quat


def _rotz_apply(rot: jnp.ndarray, c: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Right-multiply a batch of rotation matrices by Rz(theta).

    R @ Rz only mixes the first two columns, so this costs 12 flops/matrix
    instead of a 3x3 matmul.
    rot: [..., 3, 3]; c, s: [...] -> [..., 3, 3]
    """
    c = c[..., None]
    s = s[..., None]
    col0 = rot[..., 0] * c + rot[..., 1] * s
    col1 = -rot[..., 0] * s + rot[..., 1] * c
    return jnp.stack([col0, col1, rot[..., 2]], axis=-1)


def fk_frames(q: jnp.ndarray, finger_open: float = franka.FINGER_OPEN):
    """All Franka frames for a batch of configurations.

    :param q: joint configurations, [..., 7]
    :returns: (rots [..., F, 3, 3], trans [..., F, 3]) where F = NUM_FRAMES.
    """
    dtype = q.dtype
    origins = jnp.asarray(franka.JOINT_ORIGINS, dtype=dtype)
    batch_shape = q.shape[:-1]

    cos = jnp.cos(q)
    sin = jnp.sin(q)

    rot = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
    trans = jnp.zeros(batch_shape + (3,), dtype=dtype)

    rots = [rot]
    transs = [trans]
    for i in range(franka.DOF):
        o_rot = origins[i, :3, :3]
        o_trans = origins[i, :3, 3]
        trans = trans + jnp.einsum("...ij,j->...i", rot, o_trans)
        rot = jnp.einsum("...ij,jk->...ik", rot, o_rot)
        rot = _rotz_apply(rot, cos[..., i], sin[..., i])
        rots.append(rot)
        transs.append(trans)

    def _fixed(parent_idx, offset):
        offset = jnp.asarray(offset, dtype=dtype)
        p_rot, p_trans = rots[parent_idx], transs[parent_idx]
        t = p_trans + jnp.einsum("...ij,j->...i", p_rot, offset[:3, 3])
        r = jnp.einsum("...ij,jk->...ik", p_rot, offset[:3, :3])
        return r, t

    # panda_link8 (idx 8), panda_hand (9)
    r8, t8 = _fixed(7, franka.LINK8_OFFSET)
    rots.append(r8)
    transs.append(t8)
    rh, th = _fixed(8, franka.HAND_OFFSET)
    rots.append(rh)
    transs.append(th)

    # Fingers: prismatic along +/- y of the hand, mounted at FINGER_MOUNT_Z.
    mount = jnp.asarray([0.0, 0.0, franka.FINGER_MOUNT_Z], dtype=dtype)
    y_hand = rh[..., :, 1]
    base_t = th + jnp.einsum("...ij,j->...i", rh, mount)
    t_left = base_t + finger_open * y_hand
    t_right = base_t - finger_open * y_hand
    rots.extend([rh, rh])
    transs.extend([t_left, t_right])

    # Fingertips: FINGERTIP_Z along the finger (= hand) z axis.
    z_hand = rh[..., :, 2]
    tip = franka.FINGERTIP_Z * z_hand
    rots.extend([rh, rh])
    transs.extend([t_left + tip, t_right + tip])

    # right_gripper
    rg, tg = _fixed(8, franka.RIGHT_GRIPPER_OFFSET)
    rots.append(rg)
    transs.append(tg)

    return jnp.stack(rots, axis=-3), jnp.stack(transs, axis=-2)


def eff_pose(q: jnp.ndarray):
    """End-effector (right_gripper) pose: (rot [..., 3, 3], trans [..., 3])."""
    rots, transs = fk_frames(q)
    return rots[..., franka.EFF_FRAME, :, :], transs[..., franka.EFF_FRAME, :]


def eff_pose_quat(q: jnp.ndarray):
    """End-effector pose as (position [..., 3], wxyz quaternion [..., 4])."""
    rot, trans = eff_pose(q)
    return trans, matrix_to_quat(rot)


@partial(jax.jit, static_argnames=())
def collision_spheres(q: jnp.ndarray):
    """World-frame centers of the 57-sphere collision model.

    Replacement for robofin's ``FrankaCollisionSampler.compute_spheres``
    (used at ``mpinets/model.py:300-303``).

    :param q: [..., 7]
    :returns: centers [..., 57, 3]; radii are the static table
              :data:`mpinets_tpu.robot.franka.SPHERE_RADII`.
    """
    rots, transs = fk_frames(q)
    frames = jnp.asarray(franka.SPHERE_FRAMES)
    local = jnp.asarray(franka.SPHERE_CENTERS, dtype=q.dtype)
    s_rot = jnp.take(rots, frames, axis=-3)     # [..., 57, 3, 3]
    s_trans = jnp.take(transs, frames, axis=-2)  # [..., 57, 3]
    return jnp.einsum("...sij,sj->...si", s_rot, local) + s_trans


@partial(jax.jit, static_argnames=())
def scene_collision_spheres(q: jnp.ndarray):
    """Collision spheres used against SCENE geometry: the 57-sphere table
    minus the base link (reference ``with_base_link=False`` convention,
    ``mpinets/model.py:270``). Radii:
    :data:`mpinets_tpu.robot.franka.SCENE_SPHERE_RADII`."""
    rots, transs = fk_frames(q)
    frames = jnp.asarray(franka.SCENE_SPHERE_FRAMES)
    local = jnp.asarray(franka.SCENE_SPHERE_CENTERS, dtype=q.dtype)
    s_rot = jnp.take(rots, frames, axis=-3)
    s_trans = jnp.take(transs, frames, axis=-2)
    return jnp.einsum("...sij,sj->...si", s_rot, local) + s_trans


def self_collision(q: jnp.ndarray, margin: float = 0.0) -> jnp.ndarray:
    """Sphere-model self-collision predicate.

    Replacement for robofin's ``FrankaSelfCollisionChecker.has_self_collision``
    (reference usage: ``mpinets/metrics.py:266``). True when any allowed
    sphere pair is closer than the sum of radii (+margin).

    :param q: [..., 7]
    :returns: bool [...]
    """
    centers = collision_spheres(q)
    pairs = jnp.asarray(franka.SELF_COLLISION_PAIRS)
    thresh = jnp.asarray(franka.SELF_COLLISION_THRESH, dtype=q.dtype) + margin
    a = jnp.take(centers, pairs[:, 0], axis=-2)
    b = jnp.take(centers, pairs[:, 1], axis=-2)
    d2 = jnp.sum((a - b) ** 2, axis=-1)
    return jnp.any(d2 < thresh**2, axis=-1)


def within_limits(q: jnp.ndarray, use_real_constraints: bool = False) -> jnp.ndarray:
    """Joint-limit predicate (``FrankaRobot.within_limits`` equivalent,
    reference usage: ``mpinets/metrics.py:320``). q: [..., 7] -> bool [...]."""
    table = franka.REAL_JOINT_LIMITS if use_real_constraints else franka.JOINT_LIMITS
    limits = jnp.asarray(table, dtype=q.dtype)
    return jnp.all((q >= limits[:, 0]) & (q <= limits[:, 1]), axis=-1)
