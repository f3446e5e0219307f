"""Independent collision-proxy bank: mesh parsing, capsule sampling,
inflate semantics (mpinets_tpu.eval.hull_proxy)."""

import numpy as np
import pytest

from mpinets_tpu.eval import hull_proxy
from mpinets_tpu.robot import franka


def test_gripper_mesh_is_right_gripper_frame():
    tri = hull_proxy.load_gripper_mesh()
    pts = tri.reshape(-1, 3)
    # TCP at the fingertips: z spans ~[-0.126, +0.012]
    assert -0.14 < pts[:, 2].min() < -0.11
    assert 0.0 < pts[:, 2].max() < 0.03
    # finger spread along y, ~±0.1 m
    assert 0.09 < pts[:, 1].max() < 0.12


def test_capsule_samples_on_surface():
    rng = np.random.default_rng(0)
    p0, p1, r = np.zeros(3), np.array([0.0, 0.0, 0.3]), 0.05
    pts = hull_proxy.sample_capsule_surface(p0, p1, r, 500, rng)
    axis = p1 - p0
    t = np.clip((pts @ axis) / (axis @ axis), 0.0, 1.0)
    foot = p0 + t[:, None] * axis
    d = np.linalg.norm(pts - foot, axis=1)
    np.testing.assert_allclose(d, r, atol=1e-5)


def test_hull_bank_frames_and_inflate():
    bank = hull_proxy.hull_bank(2048)
    assert len(bank.points) >= 2048 - 8
    rg = franka.FRAME_INDEX["right_gripper"]
    assert (bank.frames == rg).sum() > 200  # mesh region present
    # every capsule frame contributes
    for frame, *_ in hull_proxy.ARM_CAPSULES:
        assert (bank.frames == franka.FRAME_INDEX[frame]).sum() > 0
    fat = hull_proxy.inflate_bank(bank, 1.2)
    m = bank.frames != rg
    # capsule points move strictly outward, mesh points untouched
    assert (
        np.linalg.norm(fat.points[m], axis=1)
        >= np.linalg.norm(bank.points[m], axis=1) - 1e-6
    ).all()
    np.testing.assert_array_equal(fat.points[~m], bank.points[~m])


def test_hull_collision_detects_obvious_hit():
    import jax
    import jax.numpy as jnp

    from mpinets_tpu.data.synthetic import random_scene
    from mpinets_tpu.eval.calibration import hull_collision, sphere_collision

    q = jnp.asarray(franka.NEUTRAL_Q)
    scene = random_scene(jax.random.PRNGKey(4))
    h = hull_collision(q, scene)
    s = sphere_collision(q, scene)
    assert h.shape == () and h.dtype == bool
    assert s.shape == ()
