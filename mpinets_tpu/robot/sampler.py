"""Batched robot surface-point sampling under FK.

TPU-native replacement for robofin's ``FrankaSampler`` (reference call sites:
``mpinets/model.py:267``, ``mpinets/loss.py:141-153``,
``mpinets/data_loader.py:101,158-185``, ``mpinets/run_inference.py:264-265``).
Design: each bank's points are link-local and grouped by frame, so a batched
FK produces the full world-frame bank with one small einsum per frame (11
frames); random 2048-point resampling for rollouts is then a cheap gather.
Everything is jit/vmap friendly and runs on device inside the rollout scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mpinets_tpu.robot import franka, point_banks
from mpinets_tpu.kernels import kinematics


def _group_slices(frames: np.ndarray):
    """Contiguous (frame, start, stop) runs of a frame-sorted bank."""
    order = np.argsort(frames, kind="stable")
    sorted_frames = frames[order]
    boundaries = np.flatnonzero(np.diff(sorted_frames)) + 1
    starts = np.concatenate([[0], boundaries])
    stops = np.concatenate([boundaries, [len(frames)]])
    return order, [
        (int(sorted_frames[a]), int(a), int(b)) for a, b in zip(starts, stops)
    ]


@functools.lru_cache(maxsize=None)
def _prepared_bank(bank_key: str, num_points: int, seed: int):
    """Returns (points_sorted [P, 3] float32, groups [(frame, a, b)])."""
    bank = {
        "full": point_banks.full_robot_bank,
        "loss": point_banks.loss_bank,
    }[bank_key](num_points, seed)
    order, groups = _group_slices(bank.frames)
    return bank.points[order], groups


def bank_point_cloud(
    q: jnp.ndarray, bank_key: str = "full",
    num_bank_points: int = point_banks.DEFAULT_BANK_SIZE, seed: int = 0,
) -> jnp.ndarray:
    """World-frame positions of every bank point. q: [..., 7] -> [..., P, 3]."""
    points, groups = _prepared_bank(bank_key, num_bank_points, seed)
    rots, transs = kinematics.fk_frames(q)
    pts = jnp.asarray(points, dtype=q.dtype)
    chunks = []
    for frame, a, b in groups:
        r = rots[..., frame, :, :]
        t = transs[..., frame, :]
        chunks.append(jnp.einsum("...ij,pj->...pi", r, pts[a:b]) + t[..., None, :])
    return jnp.concatenate(chunks, axis=-2)


def sample_robot_points(
    q: jnp.ndarray, key: jax.Array, num_points: int = 2048
) -> jnp.ndarray:
    """Random robot surface cloud, resampled per call (rollout semantics of
    ``FrankaSampler.sample(q, n)``, reference ``model.py:180-181``).

    q: [..., 7] -> [..., num_points, 3]. Sampling is with replacement from
    the bank (the reference subsamples a larger cached mesh bank; with a
    bank >> num_points the distributions agree to sampling noise, and the
    with-replacement gather keeps the step free of device-side sorts).
    """
    world = bank_point_cloud(q, "full")
    p = world.shape[-2]
    idx = jax.random.randint(key, q.shape[:-1] + (num_points,), 0, p)
    return jnp.take_along_axis(world, idx[..., None], axis=-2)


def fixed_robot_points(q: jnp.ndarray, num_points: int = 1024) -> jnp.ndarray:
    """Deterministic fixed-point cloud for the point-match loss
    (``FrankaSampler(num_fixed_points=1024, use_cache=True,
    with_base_link=False)``, reference ``loss.py:141-147``): the k-th output
    point is always the same link-local point, so pointwise MSE between two
    configurations is meaningful. q: [..., 7] -> [..., num_points, 3]."""
    return bank_point_cloud(q, "loss", num_points, 1)


@functools.lru_cache(maxsize=None)
def _gripper_bank_eff_local(num_points: int, seed: int) -> np.ndarray:
    """Gripper-surface bank expressed in the right_gripper frame [P, 3]."""
    bank = point_banks.gripper_bank(num_points, seed)
    # Fixed transforms of each gripper frame relative to right_gripper.
    rg = franka.RIGHT_GRIPPER_OFFSET  # link8 -> right_gripper
    hand = franka.HAND_OFFSET         # link8 -> hand
    rg_inv = np.linalg.inv(rg)
    rel_hand = rg_inv @ hand

    def _finger_tip(sign):
        mount = np.eye(4)
        mount[2, 3] = franka.FINGER_MOUNT_Z
        mount[1, 3] = sign * franka.FINGER_OPEN
        tip = np.eye(4)
        tip[2, 3] = franka.FINGERTIP_Z
        return rel_hand @ mount @ tip

    rel = {
        franka.FRAME_INDEX["panda_hand"]: rel_hand,
        franka.FRAME_INDEX["panda_leftfingertip"]: _finger_tip(+1.0),
        franka.FRAME_INDEX["panda_rightfingertip"]: _finger_tip(-1.0),
    }
    out = np.empty_like(bank.points)
    for f, t in rel.items():
        m = bank.frames == f
        out[m] = bank.points[m] @ t[:3, :3].T + t[:3, 3]
    return out.astype(np.float32)


def sample_end_effector(
    eff_rot: jnp.ndarray, eff_trans: jnp.ndarray, num_points: int = 128, seed: int = 2
) -> jnp.ndarray:
    """Gripper surface cloud at a given end-effector pose
    (``FrankaSampler.sample_end_effector``, reference
    ``data_loader.py:158-161``). Deterministic bank.

    eff_rot: [..., 3, 3]; eff_trans: [..., 3] (right_gripper frame pose)
    -> [..., num_points, 3]
    """
    local = jnp.asarray(_gripper_bank_eff_local(num_points, seed), dtype=eff_trans.dtype)
    return jnp.einsum("...ij,pj->...pi", eff_rot, local) + eff_trans[..., None, :]
