"""Lazy-PRM global planner stage (r5, VERDICT r4 #3).

The reference's global expert is a sampling-based planner (AIT*,
gen_data.py:106-153); our batched stand-in must (a) find multi-hop routes
the straight-line optimizer basin cannot, (b) degrade to the straight seed
when no roadmap path exists, (c) keep fixed shapes for vmap/jit.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpinets_tpu.geom.scene import empty_scene, pack_scenes
from mpinets_tpu.pipeline import expert
from mpinets_tpu.robot import franka


def _unbatched(scene):
    return jax.tree_util.tree_map(lambda x: x[0], scene)


@pytest.fixture(scope="module")
def qs():
    neutral = np.asarray(franka.NEUTRAL_Q, np.float32)
    q_a = neutral.copy()
    q_b = neutral.copy()
    q_a[0] = -1.2
    q_b[0] = 1.2
    return jnp.asarray(q_a), jnp.asarray(q_b)


def test_prm_empty_scene_connects(qs):
    q_a, q_b = qs
    scene = _unbatched(empty_scene((1,)))
    wps, found = expert.prm_waypoints(
        jax.random.PRNGKey(0), q_a, q_b, scene,
        n_nodes=30, knn=8, n_edge_samples=4, max_hops=8,
    )
    assert wps.shape == (10, 7)
    assert bool(found)
    # start-padded chain ends at the goal and starts at the start
    np.testing.assert_allclose(np.asarray(wps[-1]), np.asarray(q_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(wps[0]), np.asarray(q_a), atol=1e-5)


def test_prm_seed_endpoints_and_shape(qs):
    q_a, q_b = qs
    scene = _unbatched(empty_scene((1,)))
    seed = expert.prm_seed(jax.random.PRNGKey(1), q_a, q_b, scene)
    assert seed.shape == (expert.OPT_PATH_LEN, 7)
    np.testing.assert_allclose(np.asarray(seed[0]), np.asarray(q_a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(seed[-1]), np.asarray(q_b), atol=1e-5)


def test_prm_routes_around_blocking_wall(qs):
    """A wall between the two elbow-down basins: the direct joint-space
    segment sweeps the arm through it, so the straight seed is blocked and
    the PRM must find a retract-over route."""
    q_a, q_b = qs
    # Wall crossing the arm's yaw sweep at y=0 (x in [0.2, 0.45], z < 0.7):
    # blocks the direct joint-space segment; routes exist over/around it.
    wall = ([0.32, 0.0, 0.35], [0.25, 0.12, 0.7], [1.0, 0.0, 0.0, 0.0])
    scene = _unbatched(pack_scenes([[wall]], [[]]))

    # Sanity: the straight dense path collides.
    direct = expert.min_jerk_interp(q_a, q_b, 64)
    assert bool(expert.env_collision_any(direct, scene))

    wps, found = expert.prm_waypoints(
        jax.random.PRNGKey(3), q_a, q_b, scene,
        n_nodes=126, knn=14, n_edge_samples=6, max_hops=12,
    )
    assert bool(found), "PRM failed to connect around the wall"
    # Every returned waypoint is itself collision-free (nodes were checked).
    from mpinets_tpu.kernels import ik as ik_mod

    free = ik_mod.franka_free_space(wps, scene, margin=0.0)
    assert bool(jnp.all(free))


def test_prm_no_path_falls_back_straight(qs):
    """Sealed scene (robot fully boxed in tight): no roadmap path; found is
    False and the waypoints equal the straight-chain fallback."""
    q_a, q_b = qs
    box = ([0.0, 0.0, 0.4], [4.0, 4.0, 4.0], [1.0, 0.0, 0.0, 0.0])
    scene = _unbatched(pack_scenes([[box]], [[]]))
    wps, found = expert.prm_waypoints(
        jax.random.PRNGKey(4), q_a, q_b, scene,
        n_nodes=30, knn=8, n_edge_samples=4, max_hops=8,
    )
    assert not bool(found)
    np.testing.assert_allclose(np.asarray(wps[0]), np.asarray(q_a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(wps[-1]), np.asarray(q_b), atol=1e-5)


def test_plan_pair_optimized_accepts_prm_seeds(qs):
    q_a, q_b = qs
    scene = _unbatched(empty_scene((1,)))
    rot, trans = jax.jit(
        lambda q: jax.tree_util.tree_map(
            lambda x: x, __import__(
                "mpinets_tpu.kernels.kinematics", fromlist=["eff_pose"]
            ).eff_pose(q)
        )
    )(q_b)
    res = expert.plan_pair_optimized(
        q_a, q_b, rot, trans, scene, opt_steps=30, n_vias=1, n_prm=1,
    )
    assert res.trajectory.shape == (expert.SEQUENCE_LENGTH, 7)
    assert bool(res.valid)
