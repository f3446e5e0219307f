"""Sharded lockstep rollout: the actor side of the actor/learner layout.

The reference evaluates problems one at a time in a Python loop with a
GPU->CPU sync per step (``/root/reference/mpinets/run_inference.py:137-191``)
and aggregates validation metrics across DDP ranks with Lightning's
``validation_step_end`` mean (``mpinets/model.py:320-333``). Here the batch
of problems is sharded over the mesh's data axis, every device runs the
jitted lockstep rollout (:mod:`mpinets_tpu.rollout.engine`) on its shard, and
scalar statistics reduce with ``pmean``/``psum`` over ICI -- one compiled
program, no host round-trips.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mpinets_tpu.data.synthetic import Problem
from mpinets_tpu.geom.assembly import PointCloudSizes
from mpinets_tpu.parallel.mesh import DATA_AXIS
from mpinets_tpu.rollout.engine import RolloutResult, make_rollout_fn


def make_sharded_rollout(
    model,
    mesh: Mesh,
    data_axis: str = DATA_AXIS,
    **rollout_kwargs,
) -> Callable[[Any, Problem, jax.Array], RolloutResult]:
    """Build ``(params, problems, key) -> RolloutResult`` with the problem
    batch sharded on ``data_axis`` and params replicated.

    The returned result keeps its leading axis sharded (trajectories stay
    distributed); pull them host-side with ``jax.device_get`` only when
    needed. Each device folds its axis index into the PRNG key so point-cloud
    resampling streams are independent across shards.
    """
    rollout = make_rollout_fn(model, **rollout_kwargs)

    def _shard(params, problems: Problem, key: jax.Array) -> RolloutResult:
        key = jax.random.fold_in(key, jax.lax.axis_index(data_axis))
        return rollout(params, problems, key)

    sharded = jax.shard_map(
        _shard,
        mesh=mesh,
        in_specs=(P(), P(data_axis), P()),
        out_specs=P(data_axis),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_success_stats(
    model,
    mesh: Mesh,
    data_axis: str = DATA_AXIS,
    sizes: PointCloudSizes = PointCloudSizes(),
    max_steps: int = 150,
) -> Callable[[Any, Problem, jax.Array], Dict[str, jnp.ndarray]]:
    """Cross-device-aggregated rollout statistics: success rate, mean steps
    to success, and mean final position error -- the distributed analogue of
    the reference's validation aggregation (``model.py:320-352``) running
    entirely on device.
    """
    rollout = make_rollout_fn(
        model,
        max_steps=max_steps,
        sizes=sizes,
        stop_on_success=True,
        record_trajectory=False,
    )

    def _shard(params, problems: Problem, key: jax.Array):
        key = jax.random.fold_in(key, jax.lax.axis_index(data_axis))
        result = rollout(params, problems, key)
        from mpinets_tpu.kernels import kinematics

        _, trans = kinematics.eff_pose(result.final_q)
        pos_err = jnp.linalg.norm(trans - problems.target_trans, axis=-1)
        stats = {
            "success_rate": jnp.mean(result.success.astype(jnp.float32)),
            "mean_steps": jnp.mean(result.num_steps.astype(jnp.float32)),
            "mean_final_pos_err": jnp.mean(pos_err),
        }
        return jax.lax.pmean(stats, data_axis)

    sharded = jax.shard_map(
        _shard,
        mesh=mesh,
        in_specs=(P(), P(data_axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)
