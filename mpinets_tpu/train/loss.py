"""Behavior-cloning and collision losses.

jnp re-implementation of ``/root/reference/mpinets/loss.py``:

* :func:`point_match_loss` -- MSE + L1 between robot surface clouds sampled
  at predicted vs supervision configurations (``loss.py:31-44``).
* :func:`collision_loss` -- hinge on the scene SDF of predicted robot points
  with a 3 cm margin (``loss.py:47-94``; margin at ``loss.py:92``): every
  point is pushed to be at least ``margin`` outside every obstacle, and
  zero-volume padding primitives contribute +inf SDF = zero loss.
* :func:`bc_losses` -- the ``CollisionAndBCLossContainer`` equivalent
  (``loss.py:97-166``): both clouds come from the *fixed* 1024-point
  deterministic sampler so the pointwise MSE is meaningful.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from mpinets_tpu.robot import sampler
from mpinets_tpu.kernels import sdf
from mpinets_tpu.utils.normalization import unnormalize_franka_joints

COLLISION_MARGIN = 0.03  # loss.py:92
NUM_LOSS_POINTS = 1024   # loss.py:109


def point_match_loss(input_pc: jnp.ndarray, target_pc: jnp.ndarray) -> jnp.ndarray:
    """MSE + L1, both mean-reduced over every element ([B, N, 3])."""
    diff = input_pc - target_pc
    return jnp.mean(diff**2) + jnp.mean(jnp.abs(diff))


def collision_loss(input_pc: jnp.ndarray, scene) -> jnp.ndarray:
    """Hinge-embedding loss on the scene SDF (margin 3 cm, mean-reduced).

    For target=-1 hinge embedding loss is ``max(0, margin - sdf)``; +inf SDFs
    from padding primitives vanish.
    """
    sdf_values = sdf.scene_sdf(input_pc, scene)
    return jnp.mean(jnp.maximum(0.0, COLLISION_MARGIN - sdf_values))


def bc_losses(
    y_hat_norm: jnp.ndarray,
    supervision_norm: jnp.ndarray,
    scene,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(collision_loss, point_match_loss, hinge_active_frac) for normalized
    prediction and supervision configurations, via the fixed-point robot
    sampler.

    ``hinge_active_frac`` — the fraction of loss points within the 3 cm
    margin of the scene — is the diagnostic VERDICT r3 #4 asked for: a
    flat-zero collision loss with a flat-zero activation fraction means the
    training distribution simply never puts the (noised) expert poses near
    obstacles, whereas zero loss with nonzero activation would indicate a
    broken gradient path."""
    input_pc = sampler.fixed_robot_points(
        unnormalize_franka_joints(y_hat_norm), NUM_LOSS_POINTS
    )
    target_pc = sampler.fixed_robot_points(
        unnormalize_franka_joints(supervision_norm), NUM_LOSS_POINTS
    )
    sdf_values = sdf.scene_sdf(input_pc, scene)
    coll = jnp.mean(jnp.maximum(0.0, COLLISION_MARGIN - sdf_values))
    active = jnp.mean((sdf_values < COLLISION_MARGIN).astype(jnp.float32))
    return coll, point_match_loss(input_pc, target_pc), active
