"""Trainer / CLI smoke tests on the 8-virtual-device CPU mesh."""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: run via `pytest -m ''`

from mpinets_tpu.cli.config import TrainJobConfig, load_config
from mpinets_tpu.data import writer


TINY = dict(
    data=dict(num_robot_points=64, num_obstacle_points=96, num_target_points=32),
    model=dict(sa_npoints=[16, 8], sa_nsamples=[8, 8], sa_radii=[0.05, 0.3]),
    optim=dict(batch_size=1, bf16=False),
    rollout=dict(val_rollout_length=3),
    max_val_problems=8,
)


def test_load_reference_jobconfig():
    cfg = load_config("/root/reference/jobconfig.yaml")
    assert cfg.loss.collision_loss_weight == 5
    assert cfg.optim.batch_size == 10
    assert cfg.validation_interval == 3000
    assert cfg.data.num_obstacle_points == 4096


def test_load_config_rejects_unknown():
    import yaml, tempfile, os

    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
        yaml.safe_dump({"not_a_key": 1}, f)
        path = f.name
    try:
        with pytest.raises(KeyError):
            load_config(path)
    finally:
        os.unlink(path)


def test_trainer_synthetic_smoke(tmp_path):
    from mpinets_tpu.train.trainer import Trainer

    cfg = load_config(None, overrides={**TINY, "save_checkpoint_dir": str(tmp_path)})
    cfg.data.synthetic = True
    trainer = Trainer(cfg, test=True, should_log=True, should_checkpoint=True)
    state = trainer.run()
    assert int(state.step) == 10
    # Metrics were logged and a checkpoint was written.
    metrics_file = trainer.ckpt_dir / "metrics.jsonl"
    rows = [json.loads(line) for line in open(metrics_file)]
    assert any("val_loss" in r for r in rows)
    assert any("avg_target_error" in r for r in rows)
    from mpinets_tpu.model.checkpoint import latest_checkpoint

    assert latest_checkpoint(trainer.ckpt_dir) is not None


def test_trainer_hdf5_smoke(tmp_path):
    from mpinets_tpu.train.trainer import Trainer

    data_dir = tmp_path / "data"
    writer.write_synthetic_dataset(data_dir, "train", num_trajectories=8, seed=0)
    writer.write_synthetic_dataset(data_dir, "val", num_trajectories=8, seed=1)
    cfg = load_config(
        None, overrides={**TINY, "save_checkpoint_dir": str(tmp_path / "ckpt")}
    )
    cfg.data.data_dir = str(data_dir)
    trainer = Trainer(cfg, test=True, should_log=False, should_checkpoint=False)
    state = trainer.run()
    assert int(state.step) == 10


def test_infer_cli_on_native_problems(tmp_path, capsys):
    import jax
    import jax.numpy as jnp

    from mpinets_tpu import types as T
    from mpinets_tpu.cli.infer import evaluate_problem_set
    from mpinets_tpu.data import problems as P
    from mpinets_tpu.kernels import kinematics
    from mpinets_tpu.model.policy import MotionPolicyNetwork
    from mpinets_tpu.robot import franka

    # Problems whose target is the FK pose of a nearby config.
    q0 = np.asarray(franka.NEUTRAL_Q)
    rot, pos = jax.jit(kinematics.eff_pose)(jnp.asarray(q0 + 0.05))
    quat = T.matrix_to_quat_np(np.asarray(rot, np.float64))
    prob = T.PlanningProblem(
        target=T.Pose(np.asarray(pos), quat),
        target_volume=T.Cuboid(np.asarray(pos), (1.0, 1.0, 1.0), (1, 0, 0, 0)),
        q0=q0,
        obstacles=[T.Cuboid((5.0, 5.0, 5.0), (0.1, 0.1, 0.1), (1, 0, 0, 0))],
    )
    pset = {"tabletop": {"task-oriented": [prob, prob]}}

    model = MotionPolicyNetwork(
        sa_npoints=(16, 8), sa_nsamples=(8, 8), sa_radii=(0.05, 0.3)
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 6272, 4)), jnp.zeros((1, 7))
    )
    ev = evaluate_problem_set(
        params, pset, "all", "all", batch_size=2, max_steps=3, model=model
    )
    metrics = ev.metrics(ev.groups["tabletop_task-oriented"])
    assert metrics["total"] == 2
    out = capsys.readouterr().out
    assert "% Success" in out


def test_infer_cli_on_point_cloud_problems(tmp_path, capsys):
    """Problems given only a raw obstacle_point_cloud (no primitives) run
    end-to-end (the reference's depth mode, run_inference.py:58-134)."""
    import jax
    import jax.numpy as jnp

    from mpinets_tpu import types as T
    from mpinets_tpu.cli.infer import evaluate_problem_set
    from mpinets_tpu.kernels import kinematics
    from mpinets_tpu.model.policy import MotionPolicyNetwork
    from mpinets_tpu.robot import franka

    rng = np.random.default_rng(0)
    q0 = np.asarray(franka.NEUTRAL_Q)
    rot, pos = jax.jit(kinematics.eff_pose)(jnp.asarray(q0 + 0.05))
    quat = T.matrix_to_quat_np(np.asarray(rot, np.float64))
    probs = [
        T.PlanningProblem(
            target=T.Pose(np.asarray(pos), quat),
            target_volume=T.Cuboid(
                np.asarray(pos), (1.0, 1.0, 1.0), (1, 0, 0, 0)
            ),
            q0=q0,
            obstacles=None,
            obstacle_point_cloud=rng.uniform(
                0.3, 1.0, size=(n_pts, 3)
            ).astype(np.float32),
        )
        for n_pts in (700, 500)  # ragged clouds exercise the repacking
    ]
    pset = {"tabletop": {"task-oriented": probs}}
    model = MotionPolicyNetwork(
        sa_npoints=(16, 8), sa_nsamples=(8, 8), sa_radii=(0.05, 0.3)
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 6272, 4)), jnp.zeros((1, 7))
    )
    ev = evaluate_problem_set(
        params, pset, "all", "all", batch_size=2, max_steps=3, model=model
    )
    metrics = ev.metrics(ev.groups["tabletop_task-oriented"])
    assert metrics["total"] == 2
    # no primitive scene -> env-collision metric trivially clear (n/a mode)
    assert metrics["env collision"] == 0.0


def test_trainer_resume_and_best_last(tmp_path):
    """save_last / monitored-best checkpoints + --resume continue the step
    counter (run_training.py:85-104 semantics)."""
    from mpinets_tpu.model import checkpoint as ckpt
    from mpinets_tpu.train.trainer import Trainer

    cfg = load_config(None, overrides={**TINY, "save_checkpoint_dir": str(tmp_path)})
    cfg.data.synthetic = True
    trainer = Trainer(cfg, test=True, should_log=True, should_checkpoint=True)
    state = trainer.run()
    assert (trainer.ckpt_dir / "last").exists()
    assert (trainer.ckpt_dir / "best").exists()
    assert ckpt.checkpoint_step(trainer.ckpt_dir / "last") == 10
    assert 0 < ckpt.checkpoint_step(trainer.ckpt_dir / "best") <= 10

    cfg2 = load_config(None, overrides={**TINY, "save_checkpoint_dir": str(tmp_path)})
    cfg2.data.synthetic = True
    cfg2.resume_from = str(trainer.ckpt_dir)
    trainer2 = Trainer(cfg2, test=True, should_log=False, should_checkpoint=True)
    state2 = trainer2.run()
    assert int(state2.step) == 20  # optimizer steps continue
    assert ckpt.checkpoint_step(trainer2.ckpt_dir / "last") == 20


def test_trainer_actor_learner_mode(tmp_path):
    """DAgger actor rollouts feed the learner (actor_interval > 0)."""
    from mpinets_tpu.train.trainer import Trainer

    cfg = load_config(None, overrides={**TINY, "save_checkpoint_dir": str(tmp_path)})
    cfg.data.synthetic = True
    cfg.rollout.actor_interval = 3
    cfg.rollout.actor_rollout_steps = 2
    trainer = Trainer(cfg, test=True, should_log=True, should_checkpoint=False)
    state = trainer.run()
    # 10 offline steps + 3 actor steps (at steps 3, 6, 9)
    assert int(state.step) == 13
    rows = [json.loads(line) for line in open(trainer.ckpt_dir / "metrics.jsonl")]
    assert any("actor_val_loss" in r for r in rows)


def test_infer_cli_use_depth_mode(tmp_path):
    """--use-depth: the policy consumes sphere-traced depth clouds while
    metrics keep the true primitives (run_inference.py:194-257 parity)."""
    import jax
    import jax.numpy as jnp

    from mpinets_tpu import types as T
    from mpinets_tpu.cli.infer import evaluate_problem_set
    from mpinets_tpu.kernels import kinematics
    from mpinets_tpu.model.policy import MotionPolicyNetwork
    from mpinets_tpu.robot import franka

    q0 = np.asarray(franka.NEUTRAL_Q)
    rot, pos = jax.jit(kinematics.eff_pose)(jnp.asarray(q0 + 0.05))
    quat = T.matrix_to_quat_np(np.asarray(rot, np.float64))
    prob = T.PlanningProblem(
        target=T.Pose(np.asarray(pos), quat),
        target_volume=T.Cuboid(np.asarray(pos), (1.0, 1.0, 1.0), (1, 0, 0, 0)),
        q0=q0,
        obstacles=[T.Cuboid((0.7, 0.0, 0.2), (0.3, 0.3, 0.4), (1, 0, 0, 0))],
    )
    pset = {"tabletop": {"task-oriented": [prob, prob]}}
    model = MotionPolicyNetwork(
        sa_npoints=(16, 8), sa_nsamples=(8, 8), sa_radii=(0.05, 0.3)
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 6272, 4)), jnp.zeros((1, 7))
    )
    ev = evaluate_problem_set(
        params, pset, "all", "all", batch_size=2, max_steps=2,
        model=model, use_depth=True,
    )
    assert ev.metrics(ev.groups["tabletop_task-oriented"])["total"] == 2
