"""Environment-generator conventions: candidate-pose frames and scene
structure vs the reference distributions (advisor r1 findings)."""

import numpy as np
import pytest


def _axes(pose):
    m = pose.matrix
    return m[:3, 0], m[:3, 1], m[:3, 2]


def test_cubby_candidates_horizontal_approach():
    """Cubby approach axis z = [cos t, sin t, 0], |t| <= pi/4, finger axis
    x = [0, 0, -1] (cubby_environment.py:532-541)."""
    from mpinets_tpu.envs.cubby import CubbyEnvironment

    rng = np.random.default_rng(0)
    env = CubbyEnvironment()
    env.params = env.params or None
    from mpinets_tpu.envs.cubby import CubbyParams

    env.params = CubbyParams.random(rng)
    env._build(rng)
    poses = env.sample_candidate_poses(rng, 32)
    for p in poses:
        x, y, z = _axes(p)
        assert abs(z[2]) < 1e-9, "approach must be horizontal"
        assert z[0] >= np.cos(np.pi / 4) - 1e-6, "approach within +-45 deg of +x"
        np.testing.assert_allclose(x, [0.0, 0.0, -1.0], atol=1e-9)


def test_dresser_candidates_downward_approach():
    """Dresser approach z = [0, 0, -1], finger axis horizontal with
    |theta| <= pi/4 (dresser_environment.py:481-491)."""
    from mpinets_tpu.envs.dresser import DresserEnvironment

    rng = np.random.default_rng(1)
    env = DresserEnvironment()
    env._sample(rng)
    if not env.open_drawers():
        env.drawers[0].open_frac = 0.8
    env._assemble()
    poses = env.sample_candidate_poses(rng, 32)
    assert poses
    for p in poses:
        x, y, z = _axes(p)
        np.testing.assert_allclose(z, [0.0, 0.0, -1.0], atol=1e-9)
        assert abs(x[2]) < 1e-9
        assert x[0] >= np.cos(np.pi / 4) - 1e-6


def test_tabletop_candidates_offset_distribution():
    """Tabletop candidate z-offsets above the support surface lie in
    [0.01, 0.12] with decreasing density (tabletop_environment.py:386)."""
    from mpinets_tpu.envs.tabletop import TabletopEnvironment

    rng = np.random.default_rng(2)
    env = TabletopEnvironment()
    env._gen_table(rng)
    env._place_objects(rng, 5)
    poses = env.sample_candidate_poses(rng, 256)
    # compare against table/object top heights: offset bounds
    table_top = max(
        t.center[2] + t.dims[2] / 2 for t in env.table_tops
    )
    zs = np.array([p.position[2] for p in poses])
    tops = []
    for o in env.obstacles[len(env.table_tops):]:
        if hasattr(o, "dims"):
            tops.append(o.center[2] + o.dims[2] / 2)
        else:
            tops.append(o.center[2] + o.height / 2)
    max_top = max([table_top] + tops)
    assert np.all(zs >= table_top + 0.01 - 1e-9)
    assert np.all(zs <= max_top + 0.12 + 1e-9)
    # roll distribution: downward-pointing gripper family
    down = [(_axes(p)[2] @ np.array([0, 0, -1])) for p in poses]
    assert np.mean(np.array(down) > 0.5) > 0.9
