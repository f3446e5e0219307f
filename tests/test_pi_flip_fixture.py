"""Armed fixture test for the right_gripper yaw ambiguity (VERDICT r3 #9).

The right_gripper frame equals the hand frame up to a z-rotation of 0 or pi
(net link8 yaw -pi/4 vs +3pi/4; see ``mpinets_tpu/robot/franka.py``
RIGHT_GRIPPER_OFFSET). No artifact in this environment can settle it, but
any Zenodo problem pkl can (``/root/reference/README.md:130-131``; record
8319949): the published problem sets are hindsight-revised
(``gen_data.py:832-836,888-893``) and generated pairwise in both directions
(``forward_backward``, ``gen_data.py:433-528``), so the FK pose of one
problem's ``q0`` (= the paired candidate's configuration) lands within the
fabric termination tolerance of ANOTHER problem's stored target. Under the
correct yaw constant those orientation residuals are small; under the
pi-flipped constant they sit near 180 degrees.

This test SKIPS until a problem pkl exists at one of the candidate paths
(or ``$MPINETS_PROBLEMS_PKL``); the moment one appears it asserts which
constant matches and, if the flip is wrong, fails with the instruction to
swap RIGHT_GRIPPER_OFFSET's yaw to -pi/4.
"""

import glob
import math
import os

import numpy as np
import pytest

_CANDIDATE_GLOBS = [
    "/root/artifacts/*.pkl",
    "/root/data/*.pkl",
    "/root/repo/fixtures/*.pkl",
    "/root/fixtures/*.pkl",
]


def _find_problem_pkl():
    env = os.environ.get("MPINETS_PROBLEMS_PKL")
    if env and os.path.exists(env):
        return env
    for pattern in _CANDIDATE_GLOBS:
        for path in sorted(glob.glob(pattern)):
            if "problem" in os.path.basename(path).lower():
                return path
    return None


def _orientation_angle(r_a: np.ndarray, r_b: np.ndarray) -> np.ndarray:
    """Geodesic angle between rotation matrices [..., 3, 3] (radians)."""
    tr = np.einsum("...ij,...ij->...", r_a, r_b)
    return np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0))


def test_right_gripper_yaw_resolves_against_fixture():
    pkl = _find_problem_pkl()
    if pkl is None:
        pytest.skip(
            "no Zenodo problem pkl present (set MPINETS_PROBLEMS_PKL or drop "
            "one under /root/artifacts); the right_gripper pi-flip stays "
            "documented-unresolved until then"
        )

    import jax
    import jax.numpy as jnp

    from mpinets_tpu.data.problems import load_problems
    from mpinets_tpu.kernels import kinematics
    from mpinets_tpu.robot import franka

    pset = load_problems(pkl)
    problems = [
        p
        for scenes in pset.values()
        for plist in scenes.values()
        for p in plist
    ][:400]
    assert problems, f"{pkl} contained no problems"

    q0 = np.stack([np.asarray(p.q0, np.float64) for p in problems])
    tgt_pos = np.stack([np.asarray(p.target.position) for p in problems])
    tgt_rot = np.stack([np.asarray(p.target.matrix[:3, :3]) for p in problems])

    rot, trans = jax.jit(kinematics.eff_pose)(jnp.asarray(q0, jnp.float32))
    rot = np.asarray(rot, np.float64)
    trans = np.asarray(trans, np.float64)

    # Pair each problem's FK(q0) with the nearest stored target by position;
    # keep pairs within the fabric termination radius scale (<= 10 cm).
    flip = np.array(
        [[-1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, 1.0]]
    )  # z-rotation by pi: the alternative yaw convention
    angles_ours, angles_flip = [], []
    for i in range(len(problems)):
        d = np.linalg.norm(tgt_pos - trans[i], axis=-1)
        j = int(np.argmin(d))
        if d[j] > 0.10:
            continue
        angles_ours.append(_orientation_angle(rot[i], tgt_rot[j]))
        angles_flip.append(_orientation_angle(rot[i] @ flip, tgt_rot[j]))
    assert len(angles_ours) >= 5, (
        "fixture did not contain enough paired problems to resolve the flip"
    )
    med_ours = float(np.median(angles_ours))
    med_flip = float(np.median(angles_flip))
    assert abs(med_ours - med_flip) > math.pi / 4, (
        "fixture is orientation-ambiguous; cannot resolve the flip"
    )
    assert med_ours < med_flip, (
        f"RIGHT_GRIPPER_OFFSET yaw is PI-FLIPPED vs the published problems "
        f"(median orientation residual ours={math.degrees(med_ours):.1f} deg "
        f"vs flipped={math.degrees(med_flip):.1f} deg). Swap the yaw constant "
        f"in mpinets_tpu/robot/franka.py RIGHT_GRIPPER_OFFSET to -pi/4 "
        f"(currently +3pi/4 = {franka.RIGHT_GRIPPER_OFFSET[2, 2]:.3f}...)."
    )
