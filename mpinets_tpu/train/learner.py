"""The behavior-cloning learner: optimizer, train step, and the
data-parallel (DP) sharded step.

Replaces the reference's PyTorch-Lightning trainer + NCCL DDP
(``/root/reference/mpinets/run_training.py:71-115``,
``mpinets/model.py:185-240``) with optax + ``jax.shard_map`` over a device
mesh: the batch is sharded along the data axis, gradients are ``psum``-ed
over ICI, and parameters stay replicated -- the TPU-native equivalent of
Lightning's ``DDPStrategy`` gradient all-reduce (SURVEY.md §2.3).

Reference hyperparameters honored: Adam lr 1e-4 (``model.py:72``),
grad-clip 1.0 (``run_training.py:110``), loss weights point-match 1 :
collision 5 (``jobconfig.yaml:23-25``).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpinets_tpu.geom.scene import SceneSet
from mpinets_tpu.model.policy import MotionPolicyNetwork
from mpinets_tpu.train import loss as losses

LEARNING_RATE = 1e-4
GRAD_CLIP = 1.0
POINT_MATCH_WEIGHT = 1.0
COLLISION_WEIGHT = 5.0


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    #: exponential moving average of params for validation/checkpointing
    #: (r5 stabilization; None = disabled)
    ema_params: Any = None


def make_optimizer(
    learning_rate: float = LEARNING_RATE,
    grad_clip: float = GRAD_CLIP,
    warmup_steps: int = 0,
    decay_steps: int = 0,
    end_value_scale: float = 0.1,
) -> optax.GradientTransformation:
    """Adam + global-norm clip. With ``decay_steps`` > 0, the constant
    reference lr becomes a linear-warmup + cosine-decay schedule (r5
    stabilization, VERDICT r4 #1b — the reference's constant 1e-4 over 500
    epochs destabilized our small-data runs)."""
    if decay_steps:
        lr = optax.warmup_cosine_decay_schedule(
            init_value=learning_rate * 0.05 if warmup_steps else learning_rate,
            peak_value=learning_rate,
            warmup_steps=warmup_steps,
            decay_steps=decay_steps,
            end_value=end_value_scale * learning_rate,
        )
    else:
        lr = learning_rate
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adam(lr),
    )


def init_state(
    model: MotionPolicyNetwork,
    rng: jax.Array,
    example_batch: Dict[str, jnp.ndarray],
    optimizer: optax.GradientTransformation | None = None,
    ema: bool = False,
) -> TrainState:
    optimizer = optimizer or make_optimizer()
    params = model.init(rng, example_batch["xyz"], example_batch["configuration"])
    return TrainState(
        params, optimizer.init(params), jnp.zeros((), jnp.int32),
        jax.tree_util.tree_map(lambda x: x, params) if ema else None,
    )


def _update_ema(ema_params, params, ema_decay: float):
    if not ema_decay or ema_params is None:
        return ema_params
    return jax.tree_util.tree_map(
        lambda e, p: ema_decay * e + (1.0 - ema_decay) * p, ema_params, params
    )


def scene_from_batch(batch: Dict[str, jnp.ndarray]) -> SceneSet:
    return SceneSet(
        cuboid_centers=batch["cuboid_centers"],
        cuboid_dims=batch["cuboid_dims"],
        cuboid_quats=batch["cuboid_quats"],
        cylinder_centers=batch["cylinder_centers"],
        cylinder_radii=batch["cylinder_radii"],
        cylinder_heights=batch["cylinder_heights"],
        cylinder_quats=batch["cylinder_quats"],
    )


def loss_fn(
    model: MotionPolicyNetwork,
    params,
    batch: Dict[str, jnp.ndarray],
    point_match_weight: float = POINT_MATCH_WEIGHT,
    collision_weight: float = COLLISION_WEIGHT,
    apply_fn=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Forward + weighted loss (``model.py:185-240`` training_step).

    ``apply_fn`` overrides ``model.apply`` — pass a differentiable fused
    forward (:func:`mpinets_tpu.model.fused_train.make_fused_train_apply`)
    to run the Pallas kernels inside the train step."""
    forward = model.apply if apply_fn is None else apply_fn
    q = batch["configuration"]
    delta = forward(params, batch["xyz"], q)
    y_hat = jnp.clip(q + delta, -1.0, 1.0)  # model.py:202
    collision, point_match, hinge_active = losses.bc_losses(
        y_hat, batch["supervision"], scene_from_batch(batch)
    )
    total = point_match_weight * point_match + collision_weight * collision
    return total, {
        "point_match_loss": point_match,
        "collision_loss": collision,
        "hinge_active_frac": hinge_active,
        "val_loss": total,  # reference's (misnamed) training loss log key
    }


def make_train_step(
    model: MotionPolicyNetwork,
    optimizer: optax.GradientTransformation | None = None,
    point_match_weight: float = POINT_MATCH_WEIGHT,
    collision_weight: float = COLLISION_WEIGHT,
    apply_fn=None,
    ema_decay: float = 0.0,
):
    """Single-device (or already-sharded-by-jit) train step."""
    optimizer = optimizer or make_optimizer()
    loss = functools.partial(
        loss_fn,
        model,
        point_match_weight=point_match_weight,
        collision_weight=collision_weight,
        apply_fn=apply_fn,
    )

    @jax.jit
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        (_, metrics), grads = jax.value_and_grad(loss, has_aux=True)(
            state.params, batch
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = _update_ema(state.ema_params, params, ema_decay)
        return TrainState(params, opt_state, state.step + 1, ema), metrics

    return train_step


def make_data_parallel_step(
    model: MotionPolicyNetwork,
    mesh: Mesh,
    optimizer: optax.GradientTransformation | None = None,
    data_axis: str = "data",
    point_match_weight: float = POINT_MATCH_WEIGHT,
    collision_weight: float = COLLISION_WEIGHT,
    prepare_fn=None,
    apply_fn=None,
    ema_decay: float = 0.0,
):
    """DP train step over a device mesh: batch sharded on ``data_axis``,
    params replicated, gradient psum-mean over ICI (the NCCL all-reduce
    equivalent, SURVEY.md §2.3 item 1).

    ``prepare_fn(raw_shard, key) -> batch_shard`` optionally fuses the
    on-device input pipeline (point-cloud assembly + augmentation,
    :func:`mpinets_tpu.data.hdf5.prepare_train_batch`) into the sharded
    step, keyed per device; when set, the step signature gains a PRNG key:
    ``step(state, raw_batch, key)``. ``apply_fn`` overrides the forward
    (e.g. the differentiable fused Pallas path)."""
    optimizer = optimizer or make_optimizer()
    loss = functools.partial(
        loss_fn,
        model,
        point_match_weight=point_match_weight,
        collision_weight=collision_weight,
        apply_fn=apply_fn,
    )

    def _core(state: TrainState, batch: Dict[str, jnp.ndarray]):
        (_, metrics), grads = jax.value_and_grad(loss, has_aux=True)(
            state.params, batch
        )
        grads = jax.lax.pmean(grads, data_axis)
        metrics = jax.lax.pmean(metrics, data_axis)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = _update_ema(state.ema_params, params, ema_decay)
        return TrainState(params, opt_state, state.step + 1, ema), metrics

    batch_spec = P(data_axis)
    replicated = P()
    if prepare_fn is None:
        sharded = jax.shard_map(
            _core,
            mesh=mesh,
            in_specs=(replicated, batch_spec),
            out_specs=(replicated, replicated),
            check_vma=False,
        )
    else:
        def _step(state, raw, key):
            key = jax.random.fold_in(key, jax.lax.axis_index(data_axis))
            return _core(state, prepare_fn(raw, key))

        sharded = jax.shard_map(
            _step,
            mesh=mesh,
            in_specs=(replicated, batch_spec, replicated),
            out_specs=(replicated, replicated),
            check_vma=False,
        )
    return jax.jit(sharded)


def shard_batch(batch: Dict[str, jnp.ndarray], mesh: Mesh, data_axis: str = "data"):
    """Place a host batch with the leading axis sharded across the mesh."""
    sharding = NamedSharding(mesh, P(data_axis))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}
