"""Training-time validation: closed-loop rollout metrics.

Re-implements the reference's ``validation_step``
(``/root/reference/mpinets/model.py:252-318``): roll the policy out 69 steps
from each validation problem (no early exit, ``rollout`` with
``unnormalize=True``), then report

* ``avg_target_error`` -- mean final end-effector position error vs the
  target (``model.py:275-279``),
* ``avg_collision_rate`` -- fraction of rollouts whose 57-sphere collision
  model ever dips below the scene SDF (``sdf <= radius`` over all 70 configs,
  ``model.py:293-314``).

Cross-device aggregation (the reference's ``validation_step_end`` pmean,
``model.py:320-333``) happens by averaging the per-batch host values.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from mpinets_tpu.data.synthetic import Problem
from mpinets_tpu.geom.assembly import PointCloudSizes
from mpinets_tpu.kernels import kinematics, sdf
from mpinets_tpu.robot import franka
from mpinets_tpu.rollout.engine import make_rollout_fn


def make_validation_fn(
    model,
    rollout_length: int = 69,
    sizes: PointCloudSizes = PointCloudSizes(),
    fused: bool | None = None,
) -> Callable[..., Dict[str, jnp.ndarray]]:
    """(params, problem_batch, key) -> {avg_target_error,
    avg_collision_rate} as device scalars.

    ``fused=None`` selects the Pallas fused forward automatically on TPU
    backends (full reference shapes only); CPU and reduced-shape runs use
    the plain-XLA path.
    """
    if fused is None:
        fused = (
            jax.default_backend() not in ("cpu",)
            and sizes.total % 128 == 0
        )
    apply_fn = None
    if fused:
        from mpinets_tpu.model.fused import make_fused_apply

        apply_fn = make_fused_apply(
            model.compute_dtype, sa_npoints=model.sa_npoints
        )
    rollout = make_rollout_fn(
        model, max_steps=rollout_length, sizes=sizes, stop_on_success=False,
        apply_fn=apply_fn,
    )

    @jax.jit
    def validate(params, problem: Problem, key: jax.Array):
        result = rollout(params, problem, key)
        _, eff_pos = kinematics.eff_pose(result.final_q)
        target_error = jnp.linalg.norm(eff_pos - problem.target_trans, axis=-1)

        trajs = result.trajectories  # [B, T+1, 7]
        b, t, _ = trajs.shape
        # FrankaCollisionSampler(with_base_link=False), model.py:270
        centers = kinematics.scene_collision_spheres(trajs)
        radii = jnp.asarray(franka.SCENE_SPHERE_RADII, trajs.dtype)
        sdf_vals = sdf.scene_sdf_sequence(
            centers.reshape(b, t, -1, 3), problem.scene
        ).reshape(b, t, -1)
        has_collision = jnp.any(sdf_vals <= radii, axis=(-1, -2))  # [B]

        return {
            "avg_target_error": jnp.mean(target_error),
            "avg_collision_rate": jnp.mean(has_collision.astype(jnp.float32)),
        }

    return validate
