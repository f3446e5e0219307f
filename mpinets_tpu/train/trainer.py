"""The training driver: DP-sharded BC learning with periodic closed-loop
validation, wall-clock + epoch-end checkpointing, and JSONL metric logging.

Replaces the reference's PyTorch-Lightning trainer stack
(``/root/reference/mpinets/run_training.py:43-204``): Lightning's DDP/NCCL
becomes a ``jax.shard_map`` DP step over the local device mesh
(:func:`mpinets_tpu.train.learner.make_data_parallel_step`); Lightning's
``ModelCheckpoint`` pair (every N minutes + epoch end, both monitoring
``val_loss``; ``run_training.py:85-104``) becomes orbax checkpoints on the
same cadence; W&B logging becomes a local JSONL metrics stream (the
reference's log keys are kept: ``point_match_loss``, ``collision_loss``,
``val_loss``, ``avg_target_error``, ``avg_collision_rate``,
``model.py:233-239,347-352``).

Data modes:
* ``hdf5``: the published dataset layout, streamed by
  :class:`mpinets_tpu.data.hdf5.InstanceLoader` with all per-item assembly
  fused into the sharded train step.
* ``synthetic``: fully on-device pseudo-expert batches
  (:func:`mpinets_tpu.data.synthetic.training_batch`) for environments
  without the dataset.
"""

from __future__ import annotations

import dataclasses
import json
import time
import uuid
from pathlib import Path
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpinets_tpu.cli.config import TrainJobConfig, to_dict
from mpinets_tpu.data import hdf5 as hdf5_data
from mpinets_tpu.data import synthetic
from mpinets_tpu.geom.assembly import PointCloudSizes
from mpinets_tpu.kernels import kinematics
from mpinets_tpu.model import checkpoint as ckpt
from mpinets_tpu.model.policy import MotionPolicyNetwork
from mpinets_tpu.train import learner, validate


class MetricLogger:
    """Append-only JSONL metrics + stdout echo (the W&B stand-in)."""

    def __init__(self, path: Optional[Path], echo_every: int = 50):
        self.path = path
        self.echo_every = echo_every
        if path is not None:
            path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, step: int, metrics: Dict[str, float], force_echo=False) -> None:
        row = {"step": step, "time": time.time(), **metrics}
        if self.path is not None:
            with open(self.path, "a") as f:
                f.write(json.dumps(row) + "\n")
        if force_echo or step % self.echo_every == 0:
            printable = " ".join(f"{k}={v:.5f}" for k, v in metrics.items())
            print(f"[step {step}] {printable}", flush=True)


@dataclasses.dataclass
class Trainer:
    cfg: TrainJobConfig
    test: bool = False  # --test smoke mode (run_training.py:68-70)
    should_log: bool = True
    should_checkpoint: bool = True
    #: None = auto: use the differentiable fused Pallas forward inside the
    #: train step on TPU backends at full reference shapes (the VJP flows
    #: through the saved neighbor indices, model/fused_train.py); CPU runs
    #: and reduced shapes fall back to the plain-XLA model.apply.
    fused: Optional[bool] = None
    #: Wall-clock budget in seconds (None = unbounded): the run checkpoints
    #: and returns cleanly when exceeded — required for self-bounding chip
    #: sessions that must never be killed externally (axon tunnel).
    time_budget_s: Optional[float] = None

    def __post_init__(self):
        # Multi-host rendezvous first (no-op without a coordinator env;
        # parallel/mesh.py wraps jax.distributed) so jax.devices() is global.
        from mpinets_tpu.parallel.mesh import multihost_init

        multihost_init()
        self.devices = jax.devices()
        self.mesh = Mesh(np.array(self.devices), ("data",))
        self.n_devices = len(self.devices)
        self.n_hosts = jax.process_count()
        self.global_batch = self.cfg.optim.batch_size * self.n_devices
        #: rows of the global batch this host produces (contiguous block)
        self.host_batch = self.global_batch // self.n_hosts
        self.sizes = PointCloudSizes(
            robot=self.cfg.data.num_robot_points,
            obstacle=self.cfg.data.num_obstacle_points,
            target=self.cfg.data.num_target_points,
        )
        self.model = MotionPolicyNetwork(
            compute_dtype=jnp.bfloat16 if self.cfg.optim.bf16 else jnp.float32,
            sa_npoints=tuple(self.cfg.model.sa_npoints),
            sa_nsamples=tuple(self.cfg.model.sa_nsamples),
            sa_radii=tuple(self.cfg.model.sa_radii),
        )
        self.optimizer = learner.make_optimizer(
            self.cfg.optim.learning_rate, self.cfg.optim.gradient_clip_val,
            warmup_steps=self.cfg.optim.warmup_steps,
            decay_steps=self.cfg.optim.decay_steps,
        )
        self.experiment_id = f"{self.cfg.experiment_name}-{uuid.uuid4().hex[:8]}"
        exp_dir = Path(self.cfg.save_checkpoint_dir).resolve() / self.experiment_id
        self.ckpt_dir = exp_dir
        self.logger = MetricLogger(
            exp_dir / "metrics.jsonl" if self.should_log else None
        )
        self._data_sharding = NamedSharding(self.mesh, P("data"))

    def _to_global(self, batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        """Host-local rows -> globally sharded arrays on the data axis."""
        if self.n_hosts == 1:
            return {
                k: jax.device_put(np.asarray(v), self._data_sharding)
                for k, v in batch.items()
            }
        return {
            k: jax.make_array_from_process_local_data(
                self._data_sharding, np.asarray(v)
            )
            for k, v in batch.items()
        }

    # -- data ---------------------------------------------------------------

    def _synthetic_batches(self, key) -> Iterator[Dict[str, jnp.ndarray]]:
        # Each host folds its process index in and builds only its slice of
        # the global batch (the DDP-rank data split, run_training.py:71-77).
        key = jax.random.fold_in(key, jax.process_index())
        step = 0
        while True:
            yield synthetic.training_batch(
                jax.random.fold_in(key, step), self.host_batch,
                sizes=self.sizes, random_scale=self.cfg.data.random_scale,
            )
            step += 1

    def _make_stream(self):
        """Returns (batch iterator, batches_per_epoch, prepare_fn or None)."""
        if self.cfg.data.synthetic:
            key = jax.random.PRNGKey(self.cfg.seed + 1)
            return self._synthetic_batches(key), 1000, None

        dataset = hdf5_data.TrajectoryDataset(
            self.cfg.data.data_dir,
            self.cfg.data.trajectory_key,
            hdf5_data.DatasetType.TRAIN,
            in_memory=self.cfg.data.in_memory,
        )
        self._train_dataset = dataset
        loader = hdf5_data.InstanceLoader(
            dataset, self.host_batch,
            seed=self.cfg.seed + 7919 * jax.process_index(),
        )

        def prepare_fn(raw, key):
            return hdf5_data.prepare_train_batch(
                raw, key, sizes=self.sizes,
                random_scale=self.cfg.data.random_scale, train=True,
            )

        return iter(loader), loader.batches_per_epoch(), prepare_fn

    def _val_problems(self, key) -> synthetic.Problem:
        n = 3 if self.test else self.cfg.max_val_problems
        n = max(self.n_devices, (n // self.n_devices) * self.n_devices)
        if self.cfg.data.synthetic:
            return synthetic.random_problem_batch(key, n)
        dataset = hdf5_data.TrajectoryDataset(
            self.cfg.data.data_dir,
            self.cfg.data.trajectory_key,
            hdf5_data.DatasetType.VAL,
        )
        idx = np.arange(min(n, dataset.num_trajectories))
        batch = dataset.read_trajectory_batch(idx)
        rot, trans = jax.jit(kinematics.eff_pose)(jnp.asarray(batch["raw_goal"]))
        return synthetic.Problem(
            q0=jnp.asarray(batch["raw_configuration"]),
            target_rot=rot,
            target_trans=trans,
            scene=hdf5_data.scene_from_arrays(batch),
        )

    # -- main loop ------------------------------------------------------------

    def run(self) -> learner.TrainState:
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.seed)
        stream, batches_per_epoch, prepare_fn = self._make_stream()

        example = next(stream)
        if prepare_fn is not None:
            example_prepared = jax.device_get(
                hdf5_data.prepare_train_batch(
                    {k: jnp.asarray(v[: self.n_devices]) for k, v in example.items()},
                    rng, sizes=self.sizes,
                )
            )
            init_batch = {k: jnp.asarray(v) for k, v in example_prepared.items()}
        else:
            init_batch = example
        state = learner.init_state(
            self.model, rng, init_batch, self.optimizer,
            ema=self.cfg.optim.ema_decay > 0,
        )

        start_step = 0
        if self.cfg.resume_from:
            resume_dir = ckpt.latest_checkpoint(self.cfg.resume_from)
            assert resume_dir is not None, (
                f"no checkpoint under {self.cfg.resume_from}"
            )
            state = ckpt.restore_checkpoint(resume_dir, state)
            # orbax restores onto a single device; re-replicate over the mesh
            # so the DP step sees consistent shardings.
            state = jax.device_put(state, NamedSharding(self.mesh, P()))
            start_step = ckpt.checkpoint_step(resume_dir)
            print(f"resumed from {resume_dir} at step {start_step}", flush=True)

        fused = self.fused
        if fused is None:
            fused = (
                jax.default_backend() not in ("cpu",)
                and self.sizes.total % 128 == 0
            )
        train_apply_fn = None
        if fused:
            from mpinets_tpu.model.fused_train import make_fused_train_apply

            train_apply_fn = make_fused_train_apply(
                self.model.compute_dtype, sa_npoints=self.model.sa_npoints
            )
        print(f"train forward path: {'fused-pallas' if fused else 'xla'}",
              flush=True)
        step_fn = learner.make_data_parallel_step(
            self.model, self.mesh, self.optimizer,
            point_match_weight=cfg.loss.point_match_loss_weight,
            collision_weight=cfg.loss.collision_loss_weight,
            prepare_fn=prepare_fn,
            apply_fn=train_apply_fn,
            ema_decay=cfg.optim.ema_decay,
        )
        validate_fn = validate.make_validation_fn(
            self.model, cfg.rollout.val_rollout_length, self.sizes
        )
        val_problems = self._val_problems(jax.random.fold_in(rng, 999))

        max_epochs = 1 if self.test else cfg.optim.max_epochs
        limit_batches = 10 if self.test else batches_per_epoch
        val_interval = 2 if self.test else cfg.validation_interval

        if self.should_log:
            (self.ckpt_dir).mkdir(parents=True, exist_ok=True)
            with open(self.ckpt_dir / "config.json", "w") as f:
                json.dump(to_dict(cfg), f, indent=2)
        print(
            f"experiment {self.experiment_id}: {self.n_devices} device(s), "
            f"global batch {self.global_batch}, "
            f"{limit_batches} batches/epoch x {max_epochs} epochs",
            flush=True,
        )

        # Actor-learner mode (BASELINE configs 4-5): rollout workers feed a
        # DAgger-relabeled batch into the same DP learner step. Synthetic
        # mode relabels with the min-jerk pseudo-expert; hdf5 mode (r5) rolls
        # out on REAL dataset scenes and relabels with the SDF-optimizer
        # expert (VERDICT r4 #1c/#8).
        actor_interval = cfg.rollout.actor_interval
        collect_fn = None
        real_actor = False
        if actor_interval and cfg.data.synthetic:
            from mpinets_tpu.train.actor import make_dagger_collector

            collect_fn = make_dagger_collector(
                self.model, cfg.rollout.actor_rollout_steps, self.sizes
            )
            actor_step = learner.make_data_parallel_step(
                self.model, self.mesh, self.optimizer,
                point_match_weight=cfg.loss.point_match_loss_weight,
                collision_weight=cfg.loss.collision_loss_weight,
                ema_decay=cfg.optim.ema_decay,
            )
        elif actor_interval and not cfg.data.synthetic:
            from mpinets_tpu.train.actor import make_real_dagger_collector

            real_actor = True
            rollout_apply = None
            if fused:
                from mpinets_tpu.model.fused import make_fused_apply

                rollout_apply = make_fused_apply(
                    self.model.compute_dtype, sa_npoints=self.model.sa_npoints
                )
            collect_fn = make_real_dagger_collector(
                self.model, cfg.rollout.actor_rollout_steps, self.sizes,
                apply_fn=rollout_apply,
                opt_steps=cfg.rollout.dagger_opt_steps,
            )
            actor_step = learner.make_data_parallel_step(
                self.model, self.mesh, self.optimizer,
                point_match_weight=cfg.loss.point_match_loss_weight,
                collision_weight=cfg.loss.collision_loss_weight,
                apply_fn=train_apply_fn,
                ema_decay=cfg.optim.ema_decay,
            )
            actor_rng = np.random.default_rng(cfg.seed + 0xDA66)

        last_ckpt_time = time.time()
        t_run_start = time.time()
        out_of_time = False
        best_monitor = float("inf")
        step = start_step
        for epoch in range(max_epochs):
            if out_of_time:
                break
            for _ in range(limit_batches):
                if (
                    self.time_budget_s is not None
                    and time.time() - t_run_start > self.time_budget_s
                ):
                    print(f"wall-clock budget reached at step {step}",
                          flush=True)
                    out_of_time = True
                    break
                batch = example if step == start_step else next(stream)
                batch = self._to_global(batch)
                if prepare_fn is not None:
                    state, metrics = step_fn(
                        state, batch, jax.random.fold_in(rng, step)
                    )
                else:
                    state, metrics = step_fn(state, batch)
                step += 1

                if collect_fn is not None and step % actor_interval == 0:
                    t_actor = time.time()
                    a_key = jax.random.fold_in(
                        jax.random.fold_in(rng, 0xDA66), step
                    )
                    extra = {}
                    if real_actor:
                        idx = actor_rng.integers(
                            0, self._train_dataset.num_trajectories,
                            size=self.host_batch,
                        )
                        raw = self._train_dataset.read_trajectory_batch(idx)
                        dagger, info = collect_fn(
                            state.params, a_key,
                            {k: jnp.asarray(v) for k, v in raw.items()},
                        )
                        extra = {
                            k: float(v)
                            for k, v in jax.device_get(info).items()
                        }
                    else:
                        dagger = collect_fn(state.params, a_key, self.host_batch)
                    dagger = self._to_global(jax.device_get(dagger))
                    state, a_metrics = actor_step(state, dagger)
                    a_metrics = jax.device_get(a_metrics)
                    dt_actor = time.time() - t_actor
                    # actor-learner throughput split (BASELINE config 5):
                    # closed-loop env-steps collected + learner samples
                    # consumed per second of actor wall-clock
                    extra["actor_env_steps_per_s"] = (
                        cfg.rollout.actor_rollout_steps * self.host_batch
                        / max(dt_actor, 1e-9)
                    )
                    extra["actor_learner_samples_per_s"] = (
                        self.global_batch / max(dt_actor, 1e-9)
                    )
                    self.logger.log(
                        step,
                        {**{f"actor_{k}": float(v)
                            for k, v in a_metrics.items()},
                         **extra},
                    )

                if step % 50 == 0 or step == 1:
                    host = {k: float(v) for k, v in jax.device_get(metrics).items()}
                    now = time.time()
                    if hasattr(self, "_tick"):
                        dsteps = step - self._tick_step
                        host["steps_per_s"] = dsteps / max(now - self._tick, 1e-9)
                        host["env_samples_per_s"] = (
                            host["steps_per_s"] * self.global_batch
                        )
                    self._tick, self._tick_step = now, step
                    self.logger.log(step, host)

                if step % val_interval == 0:
                    val_key = jax.random.fold_in(jax.random.fold_in(rng, 0x5A11), step)
                    # validate the EMA parameters when enabled (they are what
                    # best/last checkpoints should be judged by)
                    eval_params = (
                        state.ema_params if state.ema_params is not None
                        else state.params
                    )
                    val = jax.device_get(
                        validate_fn(eval_params, val_problems, val_key)
                    )
                    self.logger.log(
                        step, {k: float(v) for k, v in val.items()}, force_echo=True
                    )
                    # Monitored best checkpoint (Lightning monitor="val_loss"
                    # analogue, run_training.py:91-104). Monitored scalar:
                    # closed-loop success dominates (negated), target error
                    # breaks ties while success is zero.
                    monitor = float(val["avg_target_error"]) - 10.0 * float(
                        val.get("val_success_free", 0.0)
                    )
                    if self.should_checkpoint and monitor < best_monitor:
                        best_monitor = monitor
                        ckpt.save_named_checkpoint(
                            self.ckpt_dir, "best", step, state
                        )

                if (
                    self.should_checkpoint
                    and time.time() - last_ckpt_time > cfg.checkpoint_interval * 60
                ):
                    ckpt.save_checkpoint(self.ckpt_dir, step, state)
                    ckpt.save_named_checkpoint(self.ckpt_dir, "last", step, state)
                    last_ckpt_time = time.time()

            if self.should_checkpoint:
                ckpt.save_named_checkpoint(self.ckpt_dir, "last", step, state)
                last_ckpt_time = time.time()
            print(f"epoch {epoch} done at step {step}", flush=True)

        return state
