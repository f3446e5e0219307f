"""Evaluator / SPARC tests (reference semantics: mpinets/metrics.py,
mpinets/third_party/sparc.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpinets_tpu.eval import metrics as M
from mpinets_tpu.eval.sparc import sparc, sparc_batched
from mpinets_tpu.geom.scene import SceneSet, empty_scene, pack_scenes
from mpinets_tpu.kernels import kinematics
from mpinets_tpu.robot import franka


def test_sparc_golden():
    # Golden value from the original SPARC paper implementation docstring:
    # a Gaussian speed profile at 100 Hz has SAL -1.41403.
    t = np.arange(-1, 1, 0.01)
    move = np.exp(-5 * t**2)
    assert abs(sparc(move, fs=100.0) - (-1.41403)) < 1e-5


def test_sparc_zero_profile():
    assert sparc(np.zeros(50), fs=12.5) == 0.0


def test_sparc_batched_matches_scalar():
    rng = np.random.default_rng(0)
    profiles = rng.uniform(0.0, 1.0, (4, 49)).astype(np.float32)
    batched = np.asarray(sparc_batched(jnp.asarray(profiles), fs=12.5))
    for i in range(4):
        assert abs(batched[i] - sparc(profiles[i], fs=12.5)) < 1e-4


def _line_trajectory(q_start, q_end, t):
    alphas = np.linspace(0.0, 1.0, t)[:, None]
    return (1 - alphas) * q_start[None] + alphas * q_end[None]


def _volumes_around(points, dims=2.0):
    """A per-problem SceneSet of one big cuboid containing each point."""
    cuboids = [[(p, (dims, dims, dims), (1.0, 0, 0, 0))] for p in points]
    return pack_scenes(cuboids, [[] for _ in points])


def _eval_batch(scene=None, target_volumes=None, negative_volumes=None,
                trajs=None, num_steps=None):
    b, t = 2, 20
    q_start = np.asarray(franka.NEUTRAL_Q)
    q_end = q_start + np.array([0.3, 0.1, -0.2, 0.2, 0.1, -0.1, 0.2])
    if trajs is None:
        traj = _line_trajectory(q_start, q_end, t)
        trajs = np.stack([traj, traj]).astype(np.float32)
    if num_steps is None:
        num_steps = np.full((b,), t - 1, np.int32)
    rot, pos = kinematics.eff_pose(jnp.asarray(trajs[:, -1]))
    if scene is None:
        scene = empty_scene((b,))
    if target_volumes is None:
        target_volumes = _volumes_around(np.asarray(pos))
    if negative_volumes is None:
        negative_volumes = empty_scene((b,))
    out = jax.device_get(
        M.check_trajectories(
            jnp.asarray(trajs), jnp.asarray(num_steps), rot, pos,
            scene, target_volumes, negative_volumes,
        )
    )
    return out, trajs, np.asarray(rot), np.asarray(pos)


def test_success_on_exact_final_pose():
    out, *_ = _eval_batch()
    assert out["position_error"].max() < 1e-3  # cm
    assert out["orientation_error"].max() < 0.1
    assert bool(out["correct_region"].all())
    assert not out["physical_violations"].any()
    assert bool(out["success"].all())


def test_collision_detected_and_fails():
    b = 2
    # A huge cuboid swallowing the whole workspace: every config collides.
    cuboids = [[((0.0, 0.0, 0.5), (3.0, 3.0, 3.0), (1.0, 0, 0, 0))]] * b
    scene = pack_scenes(cuboids, [[]] * b)
    out, *_ = _eval_batch(scene=scene)
    assert bool(out["collision"].all())
    assert bool(out["physical_violations"].all())
    assert not out["success"].any()
    assert (np.asarray(out["collision_depths"]) > 0).any()


def test_negative_volume_blocks_region():
    out0, trajs, rot, pos = _eval_batch()
    neg = _volumes_around(np.asarray(pos))  # final pose inside the negative
    # ... but also containing the target itself -> corrected away, so pass.
    out, *_ = _eval_batch(negative_volumes=neg)
    assert bool(out["correct_region"].all())
    # A negative volume at the final pose but NOT containing the target:
    # shift targets far away (target check vs region check decouple).
    shifted = np.asarray(pos) + np.array([5.0, 0.0, 0.0])
    tv = _volumes_around(shifted, dims=0.5)
    out2, *_ = _eval_batch(target_volumes=tv, negative_volumes=neg)
    assert not out2["correct_region"].any()


def test_joint_limit_violation_flagged():
    b, t = 2, 20
    bad = np.tile(np.asarray(franka.NEUTRAL_Q, np.float32), (t, 1))
    bad[:, 0] = 3.5  # beyond the 2.8973 limit
    trajs = np.stack([bad, bad])
    out, *_ = _eval_batch(trajs=trajs)
    assert bool(out["joint_limit_violation"].all())


def test_frozen_tail_masked():
    """Checks confined to the live prefix: a limit violation after
    num_steps must not count."""
    b, t = 2, 20
    traj = np.tile(np.asarray(franka.NEUTRAL_Q, np.float32), (t, 1))
    traj[10:, 0] = 3.5  # violation only in the frozen tail
    trajs = np.stack([traj, traj])
    out, *_ = _eval_batch(trajs=trajs, num_steps=np.array([5, 5], np.int32))
    assert not out["joint_limit_violation"].any()


def test_evaluator_group_aggregation():
    ev = M.Evaluator()
    ev.create_new_group("tabletop_task-oriented")
    b, t = 2, 20
    q_start = np.asarray(franka.NEUTRAL_Q)
    q_end = q_start + 0.2
    traj = _line_trajectory(q_start, q_end, t).astype(np.float32)
    trajs = np.stack([traj, traj])
    rot, pos = kinematics.eff_pose(jnp.asarray(trajs[:, -1]))
    ev.evaluate_batch(
        trajs, np.full((b,), t - 1, np.int32), np.asarray(rot), np.asarray(pos),
        empty_scene((b,)), _volumes_around(np.asarray(pos)), empty_scene((b,)),
        times=np.full((b,), 0.5),
    )
    m = ev.metrics(ev.groups["tabletop_task-oriented"])
    assert m["total"] == 2
    assert m["success"] == 100.0
    assert m["1 cm"] == 100.0
    assert m["env collision"] == 0.0
    assert m["time"][0] == pytest.approx(0.5)
    # Reporting shouldn't raise.
    ev.print_group_metrics()
    ev.print_overall_metrics()


def test_evaluator_skips():
    ev = M.Evaluator()
    ev.create_new_group("g")
    b, t = 2, 10
    traj = np.tile(np.asarray(franka.NEUTRAL_Q, np.float32), (t, 1))
    trajs = np.stack([traj, traj])
    rot, pos = kinematics.eff_pose(jnp.asarray(trajs[:, -1]))
    ev.evaluate_batch(
        trajs, np.full((b,), t - 1, np.int32), np.asarray(rot), np.asarray(pos),
        empty_scene((b,)), _volumes_around(np.asarray(pos)), empty_scene((b,)),
        times=np.full((b,), 0.5), skip_mask=np.array([False, True]),
    )
    m = ev.metrics(ev.groups["g"])
    assert m["skips"] == 1
    assert m["total"] == 2


def test_depth_render_points_on_surface():
    """Sphere-traced depth points must lie on the scene surface
    (geom/depth.py, the --use-depth conversion, run_inference.py:194-257)."""
    import jax
    import jax.numpy as jnp

    from mpinets_tpu.geom.depth import Camera, scene_to_point_cloud
    from mpinets_tpu.geom.scene import pack_scenes
    from mpinets_tpu.kernels.sdf import scene_sdf

    scene = jax.tree_util.tree_map(
        lambda x: x[0],
        pack_scenes(
            [[((0.6, 0.0, 0.3), (0.4, 0.4, 0.6), (1.0, 0.0, 0.0, 0.0))]], [[]]
        ),
    )
    cloud = scene_to_point_cloud(
        scene, jax.random.PRNGKey(0), 256, Camera(width=64, height=48)
    )
    sd = np.asarray(scene_sdf(cloud[None], scene)[0])
    assert np.abs(sd).max() < 0.02, "depth points must sit on the surface"
    # visible faces only: all points on the camera side (x <= front face)
    assert float(cloud[:, 0].max()) <= 0.6 + 0.21


def test_compare_harness_detects_drift(tmp_path):
    """eval/compare.py: identical pickles pass, drifted rates are flagged."""
    import pickle

    from mpinets_tpu.eval.compare import compare_files

    ours = {"tabletop_task-oriented": {"total": 10, "success": 90.0,
                                       "position_error": 0.005}}
    same = tmp_path / "a.pkl"
    drift = tmp_path / "b.pkl"
    with open(same, "wb") as f:
        pickle.dump(ours, f)
    theirs = {"tabletop_task-oriented": {"total": 10, "success": 85.0,
                                         "position_error": 0.005}}
    with open(drift, "wb") as f:
        pickle.dump(theirs, f)

    rep = compare_files(same, same)
    assert rep == {"tabletop_task-oriented": []}
    rep = compare_files(same, drift)
    bad = rep["tabletop_task-oriented"]
    assert len(bad) == 1 and bad[0][0] == "success"
