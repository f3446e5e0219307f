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
    env._build()
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
    env._setup_tables(rng)
    env._place_objects(rng, 5)
    poses = env.sample_candidate_poses(rng, 256)
    # compare against table/object top heights: offset bounds
    table_top = max(
        t.center[2] + t.dims[2] / 2 for t in env.task_tables
    )
    zs = np.array([p.position[2] for p in poses])
    tops = []
    for o in env._objects:
        if hasattr(o, "dims"):
            tops.append(o.center[2] + o.dims[2] / 2)
        else:
            tops.append(o.center[2] + o.height / 2)
    max_top = max([table_top] + tops)
    assert np.all(zs >= table_top + 0.01 - 1e-9)
    assert np.all(zs <= max_top + 0.12 + 1e-9)
    # linearly-decreasing offset density: the mean offset of the points on
    # the bare table must sit below the uniform midpoint
    bare = zs[zs <= table_top + 0.12]
    off = bare - table_top
    assert off.mean() < 0.01 + (0.12 - 0.01) * 0.45
    # roll distribution: downward-pointing gripper family
    down = [(_axes(p)[2] @ np.array([0, 0, -1])) for p in poses]
    assert np.mean(np.array(down) > 0.5) > 0.9


def test_tabletop_scene_distribution_envelopes():
    """Reference distribution envelopes (tabletop_environment.py:215-330,
    404-441): table heights, front-table extents, task/clear split, object
    counts/dims, mount table presence."""
    from mpinets_tpu.envs.tabletop import TabletopEnvironment

    rng = np.random.default_rng(7)
    heights, side_count, obj_counts = [], 0, []
    for _ in range(20):
        env = TabletopEnvironment()
        env._setup_tables(rng)
        n = int(rng.integers(3, 15))
        env._place_objects(rng, n)
        front = env.task_tables[0]
        surface_z = front.center[2] + front.dims[2] / 2
        heights.append(surface_z)
        # slab is a solid block from z=-0.02 to the surface
        assert abs((front.center[2] - front.dims[2] / 2) - (-0.02)) < 1e-9
        # front table x extent: [0.275..0.375, 1.275..1.375]
        x0 = front.center[0] - front.dims[0] / 2
        x1 = front.center[0] + front.dims[0] / 2
        assert 0.275 - 1e-9 <= x0 <= 0.375 + 1e-9
        assert 1.275 - 1e-9 <= x1 <= 1.375 + 1e-9
        # task region is 55-65% of the full front-table y extent
        clear = env.clear_tables[0]
        total_y = front.dims[1] + clear.dims[1]
        assert 0.55 - 1e-6 <= front.dims[1] / total_y <= 0.65 + 1e-6
        if len(env.task_tables) == 2:
            side_count += 1
        # mount table under the robot: last clear slab, contains the origin
        mount = env.clear_tables[-1]
        assert abs(mount.center[0]) < mount.dims[0] / 2
        assert abs(mount.center[1]) < mount.dims[1] / 2
        obj_counts.append(len(env._objects))
        for o in env._objects:
            if hasattr(o, "dims"):
                assert 0.05 - 1e-6 <= o.dims[0] <= 0.15 + 1e-6
                assert 0.05 - 1e-6 <= o.dims[2] <= 0.35 + 1e-6
            else:
                assert 0.05 - 1e-6 <= o.radius <= 0.15 + 1e-6
                assert 0.05 - 1e-6 <= o.height <= 0.35 + 1e-6
    # height mix: 0 w.p. 0.35, else U(0, 0.4)
    heights = np.array(heights)
    assert np.all((heights >= -1e-9) & (heights <= 0.4 + 1e-9))
    assert (heights < 1e-9).sum() >= 2  # some flat-floor tables
    assert (heights > 0.05).sum() >= 5  # some raised tables
    # L-shape roughly half the time
    assert 3 <= side_count <= 17
    assert min(obj_counts) >= 1 and max(obj_counts) <= 14


def test_cubby_scene_distribution_envelopes():
    """Reference cubby geometry envelopes (cubby_environment.py:62-72,
    124-264): extents, panel count, asymmetric splits, center-pivot yaw."""
    from mpinets_tpu.envs.cubby import CubbyEnvironment, CubbyParams

    rng = np.random.default_rng(11)
    for _ in range(20):
        env = CubbyEnvironment()
        p = CubbyParams.random(rng)
        env.params = p
        env._build()
        assert 0.6 <= p.left <= 0.8 and -0.8 <= p.right <= -0.6
        assert 0.45 <= p.front <= 0.65
        assert 0.15 - 1e-9 <= p.back - p.front <= 0.55 + 1e-9
        assert 0.35 <= p.mid_h_z <= 0.55 and -0.1 <= p.mid_v_y <= 0.1
        assert abs(p.rotation) <= np.pi / 18 + 1e-9
        # full cubby: back + 2 shelves + 2 side walls + wall + shelf = 7
        assert len(env.obstacles) == 7
        assert len(env.support_volumes()) == 4
        # center-pivot rotation: the cabinet center is a fixed point
        np.testing.assert_allclose(p.world_point(p.center), p.center,
                                   atol=1e-12)
        # pocket index layout: {0,1} share a z level, {0,2} share a y side
        sv = env.support_volumes()
        assert abs(sv[0].center[2] - sv[1].center[2]) < 1e-9
        assert sv[2].center[2] > sv[0].center[2]


def test_merged_cubby_drops_dividers():
    """MergedCubbyEnvironment zeroes the divider(s) separating the two
    chosen pockets (cubby_environment.py:660-704)."""
    from mpinets_tpu.envs.cubby import MergedCubbyEnvironment

    rng = np.random.default_rng(3)
    done = False
    for _ in range(8):
        env = MergedCubbyEnvironment()
        if not env.gen(rng):
            continue
        done = True
        i, j = env._pockets_chosen
        p = env.params
        if (i in (0, 1)) != (j in (0, 1)):
            assert p.middle_shelf_thickness == 0.0
        if (i in (0, 2)) != (j in (0, 2)):
            assert p.center_wall_thickness == 0.0
        # fewer panels than the full 7
        assert len(env.obstacles) < 7
        assert len(env.support_volumes()) < 4
        break
    assert done, "merged cubby never generated"


def test_dresser_recursive_split_envelopes():
    """Reference dresser distributions (dresser_environment.py:198-223,
    967-1085): dims, recursive midpoint splits, leaf sizes, wall budget."""
    from mpinets_tpu.envs.dresser import DresserEnvironment, MIN_CELL

    rng = np.random.default_rng(5)
    leaf_counts = []
    for _ in range(30):
        env = DresserEnvironment()
        env._sample(rng)
        assert 0.8 <= env.width <= 1.2
        assert 0.2 <= env.depth <= 0.4
        assert 0.55 <= env.height <= 0.85
        assert abs(env.yaw - np.pi) <= np.pi / 3 + 1e-9
        leaf_counts.append(len(env.drawers))
        for dr in env.drawers:
            w = dr.y1 - dr.y0
            h = dr.z1 - dr.z0
            # a leaf is only produced when it cannot be split further or the
            # split coin failed; either way halving stops near MIN_CELL
            assert w > MIN_CELL / 2 - 0.02 and h > MIN_CELL / 8
            assert w <= env.width + 1e-9 and h <= env.height + 1e-9
    counts = np.array(leaf_counts)
    # recursion produces a spread of drawer counts, frequently > 2
    assert counts.min() >= 1
    assert counts.max() >= 4
    assert (counts >= 2).mean() > 0.6


def test_dresser_gen_opens_start_and_target():
    """gen() pulls exactly the two chosen drawers fully open
    (dresser_environment.py:83-176,410-421)."""
    from mpinets_tpu.envs.dresser import DresserEnvironment

    rng = np.random.default_rng(9)
    ok = False
    for _ in range(6):
        env = DresserEnvironment()
        if env.gen(rng):
            ok = True
            opened = env.open_drawers()
            assert len(opened) == 2
            assert all(d.open_frac == 1.0 for d in opened)
            assert len(env.demo_candidates) == 2
            # each candidate lies inside one of the two support volumes
            sv = env.support_volumes()
            for cand in env.demo_candidates:
                assert any(s.sdf(cand.pose.position) < 0 for s in sv)
            break
    assert ok, "dresser never generated"
