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
        eff_rot, eff_pos = kinematics.eff_pose(result.final_q)
        target_error = jnp.linalg.norm(eff_pos - problem.target_trans, axis=-1)

        # orientation error vs target (and vs the pi-yaw-flipped target,
        # the ambiguity quantified in scripts/pi_flip_study.py)
        def angle_to(rot_ref):
            rel = jnp.einsum("...ji,...jk->...ik", rot_ref, eff_rot)
            tr = rel[..., 0, 0] + rel[..., 1, 1] + rel[..., 2, 2]
            return jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0))

        flip = jnp.diag(jnp.asarray([-1.0, -1.0, 1.0], eff_rot.dtype))
        orient_err = angle_to(problem.target_rot)
        orient_err_flip = angle_to(
            jnp.einsum("...ij,jk->...ik", problem.target_rot, flip)
        )
        deg15 = jnp.deg2rad(15.0)

        trajs = result.trajectories  # [B, T+1, 7]
        b, t, _ = trajs.shape
        # FrankaCollisionSampler(with_base_link=False), model.py:270
        centers = kinematics.scene_collision_spheres(trajs)
        radii = jnp.asarray(franka.SCENE_SPHERE_RADII, trajs.dtype)
        sdf_vals = sdf.scene_sdf_sequence(
            centers.reshape(b, t, -1, 3), problem.scene
        ).reshape(b, t, -1)
        has_collision = jnp.any(sdf_vals <= radii, axis=(-1, -2))  # [B]

        # online success rule (pos < 1 cm AND orient < 15 deg,
        # run_inference.py:176-187); collision-free success additionally
        # requires a clean rollout (metrics.py:514-519 physical check)
        success = (target_error < 0.01) & (orient_err < deg15)
        return {
            "avg_target_error": jnp.mean(target_error),
            "avg_collision_rate": jnp.mean(has_collision.astype(jnp.float32)),
            "avg_orient_error_deg": jnp.mean(jnp.rad2deg(orient_err)),
            "pct_within_1cm": jnp.mean((target_error < 0.01).astype(jnp.float32)),
            "pct_within_5cm": jnp.mean((target_error < 0.05).astype(jnp.float32)),
            "pct_flip_orient": jnp.mean(
                (orient_err_flip < deg15).astype(jnp.float32)
            ),
            "val_success": jnp.mean(success.astype(jnp.float32)),
            "val_success_free": jnp.mean(
                (success & ~has_collision).astype(jnp.float32)
            ),
        }

    return validate
