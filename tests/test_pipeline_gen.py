"""Expert generation driver: scene fan-out -> verified plans -> schema HDF5
with hindsight problems (mpinets_tpu.pipeline.gen vs gen_data.py:531-795)."""

import pickle

import h5py
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # batched planner compiles are heavy on CPU


def test_gen_tabletop_writes_schema_and_problems(tmp_path):
    from mpinets_tpu.pipeline import gen

    stats = gen.gen(
        "tabletop",
        tmp_path / "data",
        num_scenes=2,
        candidates_per_scene=2,
        seed=3,
        inference_pkl=tmp_path / "problems.pkl",
    )
    assert stats["scenes"] >= 1
    assert stats["pairs"] > 0
    if stats["valid"] == 0:
        pytest.skip("no valid plans in this tiny sample")

    with h5py.File(tmp_path / "data" / "all_data.hdf5", "r") as f:
        n = f["hybrid_solutions"].shape[0]
        assert n == stats["valid"]
        assert f["hybrid_solutions"].shape[1:] == (50, 7)
        assert f["cuboid_centers"].ndim == 3

    with open(tmp_path / "problems.pkl", "rb") as f:
        pset = pickle.load(f)
    problems = pset["tabletop"]["task-oriented"]
    assert len(problems) == stats["valid"]

    # Hindsight revision: the stored target IS the FK pose of the stored
    # trajectory's final configuration -> every problem solvable by
    # construction (gen_data.py:832-845).
    import jax.numpy as jnp
    from mpinets_tpu.kernels import kinematics

    with h5py.File(tmp_path / "data" / "all_data.hdf5", "r") as f:
        final_q = f["hybrid_solutions"][:, -1]
    _, trans = kinematics.eff_pose(jnp.asarray(final_q))
    for i, p in enumerate(problems):
        np.testing.assert_allclose(
            p.target.position, np.asarray(trans[i]), atol=1e-4
        )


def test_optimizer_routes_around_obstacle():
    """The SDF-cost optimizer must clear a wall the straight path crosses."""
    import jax
    import jax.numpy as jnp

    from mpinets_tpu.geom.scene import pack_scenes
    from mpinets_tpu.pipeline import expert
    from mpinets_tpu.kernels import kinematics
    from mpinets_tpu.robot import franka

    # Start/goal on either side of the workspace; a thin wall in between.
    q_start = jnp.asarray(franka.NEUTRAL_Q, jnp.float32).at[0].set(-0.9)
    q_goal = jnp.asarray(franka.NEUTRAL_Q, jnp.float32).at[0].set(0.9)
    wall = ((0.35, 0.0, 0.5), (0.3, 0.04, 1.0), (1.0, 0.0, 0.0, 0.0))
    scene = jax.tree_util.tree_map(
        lambda x: x[0], pack_scenes([[wall]], [[]])
    )

    straight = expert.min_jerk_interp(q_start, q_goal, 50)
    assert bool(expert.env_collision_any(straight, scene)), (
        "test setup: straight path should hit the wall"
    )
    opt = expert.optimize_trajectory(q_start, q_goal, scene)
    assert not bool(expert.env_collision_any(opt, scene)), (
        "optimizer failed to clear the wall"
    )
    # endpoints preserved
    np.testing.assert_allclose(np.asarray(opt[0]), np.asarray(q_start), atol=1e-6)
    np.testing.assert_allclose(np.asarray(opt[-1]), np.asarray(q_goal), atol=1e-6)


@pytest.mark.slow
def test_via_restarts_solve_wall_blocked_pairs():
    """The multi-restart optimizer's via seeds must fire and produce valid
    plans on cubby pocket-to-pocket pairs that the straight-line basin
    cannot solve (r3: cubby valid-rate 26.8% -> 41.6% at scale; which codes
    100/101 mark the via restarts)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mpinets_tpu.envs.cubby import CubbyEnvironment
    from mpinets_tpu.pipeline import expert

    rng = np.random.default_rng(4)
    planned = 0
    via_used = 0
    for _ in range(6):
        env = CubbyEnvironment()
        if not env.gen(rng):
            continue
        a, b = env.demo_candidates
        scene = jax.tree_util.tree_map(lambda x: x[0], env.scene_set())
        res = expert.plan_pair_optimized(
            jnp.asarray(a.config, jnp.float32),
            jnp.asarray(b.config, jnp.float32),
            jnp.asarray(b.pose.matrix[:3, :3], jnp.float32),
            jnp.asarray(b.pose.position, jnp.float32),
            scene,
        )
        if bool(res.valid):
            planned += 1
            if int(res.which) >= 100:
                via_used += 1
        if planned >= 3 and via_used >= 1:
            break
    assert planned >= 1, "no cubby demo pair planned at all"
    # the via restarts must be reachable machinery (fire at least once
    # across several scenes, or every pair was solvable without them)
    assert via_used >= 1 or planned >= 3


def test_failed_plan_returns_best_attempt_not_zeros():
    """When no restart is valid, plan_pair_optimized must return the best
    ATTEMPTED trajectory so failure codes diagnose a real failure mode --
    never the zeros placeholder whose verify trips miss+self-collision+
    limits simultaneously (the r3 GEN_STATS artifact; reference attributes
    codes to the actual failed trajectory, gen_data.py:419-430)."""
    import jax
    import jax.numpy as jnp

    from mpinets_tpu.geom.scene import pack_scenes
    from mpinets_tpu.pipeline import expert
    from mpinets_tpu.robot import franka

    # Unreachable target: kinematically impossible position 3 m away.
    # Every candidate/restart fails on miss and nothing else.
    q = jnp.asarray(franka.NEUTRAL_Q, jnp.float32)
    q_goal = q.at[0].set(0.4)
    scene = jax.tree_util.tree_map(lambda x: x[0], pack_scenes([[]], [[]]))
    res = expert.plan_pair_optimized(
        q, q_goal, jnp.eye(3, dtype=jnp.float32),
        jnp.asarray([3.0, 0.0, 0.5], jnp.float32), scene,
    )
    assert not bool(res.valid)
    traj = np.asarray(res.trajectory)
    # best attempt, not the placeholder: endpoints are the requested configs
    assert np.abs(traj).max() > 0.1
    np.testing.assert_allclose(traj[0], np.asarray(q), atol=1e-5)
    # and its failure signature is genuine: miss only
    ver = expert.verify_trajectory(
        res.trajectory, jnp.eye(3, dtype=jnp.float32),
        jnp.asarray([3.0, 0.0, 0.5], jnp.float32), scene,
    )
    assert bool(ver.miss > expert.MISS_TOLERANCE)
    assert not bool(ver.has_self_collision)
    assert not bool(ver.has_env_collision)
    assert bool(ver.within_limits)
