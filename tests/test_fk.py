"""Golden-value tests for the batched Franka FK.

The independent oracle is a straightforward per-config homogeneous-matrix FK
written here in numpy directly from URDF semantics; it validates the
optimized column-mixing composition in kernels/kinematics.py. On top of that
we pin known workspace facts about the Panda (ready-pose flange height) so
the constant tables themselves are checked against public knowledge.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mpinets_tpu.robot import franka
from mpinets_tpu.kernels import kinematics
from mpinets_tpu.kernels.rotations import matrix_to_quat, quat_angle


def _oracle_fk(q: np.ndarray) -> dict:
    """Independent numpy FK: T_i = T_{i-1} @ Origin_i @ RotZ(q_i)."""
    def rotz(theta):
        c, s = np.cos(theta), np.sin(theta)
        m = np.eye(4)
        m[0, 0], m[0, 1], m[1, 0], m[1, 1] = c, -s, s, c
        return m

    frames = {"panda_link0": np.eye(4)}
    t = np.eye(4)
    for i in range(7):
        t = t @ franka.JOINT_ORIGINS[i] @ rotz(q[i])
        frames[f"panda_link{i + 1}"] = t
    frames["panda_link8"] = frames["panda_link7"] @ franka.LINK8_OFFSET
    frames["panda_hand"] = frames["panda_link8"] @ franka.HAND_OFFSET
    frames["right_gripper"] = frames["panda_link8"] @ franka.RIGHT_GRIPPER_OFFSET
    mount = np.eye(4)
    mount[2, 3] = franka.FINGER_MOUNT_Z
    for name, sign in (("panda_leftfinger", 1.0), ("panda_rightfinger", -1.0)):
        slide = np.eye(4)
        slide[1, 3] = sign * franka.FINGER_OPEN
        frames[name] = frames["panda_hand"] @ mount @ slide
    tip = np.eye(4)
    tip[2, 3] = franka.FINGERTIP_Z
    frames["panda_leftfingertip"] = frames["panda_leftfinger"] @ tip
    frames["panda_rightfingertip"] = frames["panda_rightfinger"] @ tip
    return frames


@pytest.fixture(scope="module")
def random_configs():
    rng = np.random.default_rng(0)
    lo, hi = franka.JOINT_LIMITS[:, 0], franka.JOINT_LIMITS[:, 1]
    return rng.uniform(lo, hi, size=(16, 7)).astype(np.float32)


def test_fk_matches_oracle(random_configs):
    rots, transs = kinematics.fk_frames(jnp.asarray(random_configs))
    rots = np.asarray(rots)
    transs = np.asarray(transs)
    for b in range(random_configs.shape[0]):
        oracle = _oracle_fk(random_configs[b].astype(np.float64))
        for name, idx in franka.FRAME_INDEX.items():
            exp = oracle[name]
            np.testing.assert_allclose(rots[b, idx], exp[:3, :3], atol=2e-5)
            np.testing.assert_allclose(transs[b, idx], exp[:3, 3], atol=2e-5)


def test_fk_ready_pose_flange():
    """Panda 'ready pose' flange position is public knowledge:
    approximately (0.307, 0, 0.590) with the flange z-axis pointing down."""
    q = jnp.asarray([0.0, -np.pi / 4, 0.0, -3 * np.pi / 4, 0.0, np.pi / 2, np.pi / 4])
    rots, transs = kinematics.fk_frames(q)
    flange_pos = np.asarray(transs[franka.FRAME_INDEX["panda_link8"]])
    np.testing.assert_allclose(flange_pos, [0.30695, 0.0, 0.59026], atol=1e-3)
    flange_z = np.asarray(rots[franka.FRAME_INDEX["panda_link8"]])[:, 2]
    np.testing.assert_allclose(flange_z, [0.0, 0.0, -1.0], atol=1e-3)
    # right_gripper sits 0.1 m further along flange z (downward here).
    eff = np.asarray(transs[franka.EFF_FRAME])
    np.testing.assert_allclose(eff, [0.30695, 0.0, 0.49026], atol=1e-3)


def test_fk_rotations_orthonormal(random_configs):
    rots, _ = kinematics.fk_frames(jnp.asarray(random_configs))
    rots = np.asarray(rots)
    prod = np.einsum("bfij,bfkj->bfik", rots, rots)
    np.testing.assert_allclose(
        prod, np.broadcast_to(np.eye(3), prod.shape), atol=1e-5
    )
    det = np.linalg.det(rots)
    np.testing.assert_allclose(det, np.ones_like(det), atol=1e-5)


def test_collision_spheres_shapes_and_ground(random_configs):
    centers = kinematics.collision_spheres(jnp.asarray(random_configs))
    assert centers.shape == (16, 57, 3)
    # link0 sphere is rigid: always at (0, 0, 0.05)
    link0 = np.asarray(centers)[:, 0]
    np.testing.assert_allclose(
        link0, np.broadcast_to([0.0, 0.0, 0.05], link0.shape), atol=1e-6
    )


def test_self_collision_neutral_free():
    q = jnp.asarray(franka.NEUTRAL_Q, dtype=jnp.float32)
    assert not bool(kinematics.self_collision(q))


def test_within_limits():
    q = jnp.asarray(franka.NEUTRAL_Q, dtype=jnp.float32)
    assert bool(kinematics.within_limits(q))
    q_bad = q.at[0].set(3.5)
    assert not bool(kinematics.within_limits(q_bad))


def test_quat_roundtrip(random_configs):
    rots, _ = kinematics.fk_frames(jnp.asarray(random_configs))
    quats = matrix_to_quat(rots)
    norms = np.linalg.norm(np.asarray(quats), axis=-1)
    np.testing.assert_allclose(norms, np.ones_like(norms), atol=1e-5)
    # Angle between a rotation and itself is ~0.
    ang = np.asarray(quat_angle(quats, quats))
    np.testing.assert_allclose(ang, np.zeros_like(ang), atol=1e-3)
