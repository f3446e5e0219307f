"""Batched DLS IK: convergence on reachable poses and geodesic acceptance.

Regression anchors for two round-1 advisor/verify findings:
* the DLS step sign (jacfwd of the residual is the negative manipulator
  Jacobian) — without the fix nothing converges;
* acceptance must use the geodesic angle, not the sin-axis norm, which is
  blind to antipodal (180°-flipped) solutions.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpinets_tpu.kernels import ik, kinematics
from mpinets_tpu.robot import franka


@pytest.fixture(scope="module")
def reachable_targets():
    rng = np.random.default_rng(0)
    lim = franka.REAL_JOINT_LIMITS
    qs = rng.uniform(lim[:, 0], lim[:, 1], (16, 7)).astype(np.float32)
    rot, tr = kinematics.eff_pose(jnp.asarray(qs))
    return qs, rot, tr


def test_solve_ik_converges_on_reachable(reachable_targets):
    _, rot, tr = reachable_targets
    res = ik.solve_ik(jax.random.PRNGKey(1), rot, tr, num_seeds=16, iters=30)
    # FK targets of in-limit configs are reachable by construction; the
    # multi-seed solver should land almost all of them.
    assert int(res.converged.sum()) >= 14, np.asarray(res.pos_err)
    conv = np.asarray(res.converged)
    assert np.all(np.asarray(res.pos_err)[conv] < ik.POS_TOL)
    assert np.all(np.asarray(res.ori_err)[conv] < ik.ORI_TOL)


def test_geodesic_gate_rejects_antipodal(reachable_targets):
    """A solution whose orientation is flipped 180° about the approach axis
    has |sin(theta)| ~ 0 but geodesic angle pi: the acceptance metrics must
    report the flip (advisor finding r1 on the sin-axis gate)."""
    qs, rot, tr = reachable_targets
    flip = jnp.asarray(
        np.diag([-1.0, -1.0, 1.0]).astype(np.float32)
    )  # Rz(pi)
    flipped_rot = rot @ flip
    pos_err, ori_err = ik.pose_errors(jnp.asarray(qs), flipped_rot, tr)
    assert np.all(np.asarray(pos_err) < 1e-5)
    assert np.all(np.asarray(ori_err) > 3.0), "geodesic must see the pi flip"
    # while the solver residual (sin-axis) is tiny there:
    resid = ik.pose_residual(jnp.asarray(qs), flipped_rot, tr)
    assert np.all(np.linalg.norm(np.asarray(resid)[..., 3:], axis=-1) < 1e-5)


def test_collision_free_ik_empty_scene(reachable_targets):
    from mpinets_tpu.geom.scene import pack_scenes

    _, rot, tr = reachable_targets
    scene = jax.tree_util.tree_map(lambda x: x[0], pack_scenes([[]], [[]]))
    res = ik.collision_free_ik(jax.random.PRNGKey(2), rot[:8], tr[:8], scene)
    assert int(res.converged.sum()) >= 6


def test_real_joint_limits_golden():
    """Pin the transcribed robofin FrankaRealRobot.JOINT_LIMITS values
    (mpinets/utils.py:50 default normalization range)."""
    expected = np.array(
        [
            (-2.8773, 2.8773),
            (-1.7428, 1.7428),
            (-2.8773, 2.8773),
            (-3.0518, -0.0898),
            (-2.8773, 2.8773),
            (0.0025, 3.7325),
            (-2.8773, 2.8773),
        ]
    )
    np.testing.assert_allclose(franka.REAL_JOINT_LIMITS, expected, atol=1e-12)
    np.testing.assert_allclose(
        franka.JOINT_LIMITS[:, 0] + 0.02, franka.REAL_JOINT_LIMITS[:, 0]
    )
