"""Host-side primitive types vs. the device SDF kernels."""

import numpy as np
import jax.numpy as jnp

from mpinets_tpu import types
from mpinets_tpu.geom.scene import pack_scenes
from mpinets_tpu.kernels import sdf


def test_host_sdf_matches_device():
    rng = np.random.default_rng(3)
    quat = rng.normal(size=4)
    quat /= np.linalg.norm(quat)
    cub = types.Cuboid((0.2, -0.1, 0.5), (0.3, 0.2, 0.4), quat)
    cyl = types.Cylinder((-0.3, 0.4, 0.2), 0.15, 0.5, quat)
    pts = rng.uniform(-1, 1, (16, 3))

    scene = pack_scenes(
        [[types.cuboid_tuple(cub)]], [[types.cylinder_tuple(cyl)]]
    )
    device = np.asarray(sdf.scene_sdf(jnp.asarray(pts[None], jnp.float32), scene))[0]
    host = np.minimum(
        [cub.sdf(p) for p in pts], [cyl.sdf(p) for p in pts]
    )
    np.testing.assert_allclose(device, host, atol=1e-5)


def test_pose_roundtrip():
    rng = np.random.default_rng(5)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    pose = types.Pose(rng.normal(size=3), q)
    back = types.Pose.from_matrix(pose.matrix)
    np.testing.assert_allclose(back.position, pose.position, atol=1e-12)
    np.testing.assert_allclose(back.quaternion, pose.quaternion, atol=1e-10)


def test_planning_problem_schema():
    p = types.PlanningProblem(
        target=types.Pose(np.zeros(3), [1, 0, 0, 0]),
        target_volume=types.Cuboid(np.zeros(3), np.ones(3), [1, 0, 0, 0]),
        q0=np.zeros(7),
    )
    assert p.obstacles is None
    assert p.target_negative_volumes == []
