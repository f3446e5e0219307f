"""Joint-space normalization: affine map between Franka joint limits and
[-1, 1].

jnp re-implementation of the reference's ``(un)normalize_franka_joints``
(``/root/reference/mpinets/utils.py:30-244``). The reference defaults to the
empirical "real robot" limits (``utils.py:50``); so do we.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from mpinets_tpu.robot import franka


def _limits(use_real_constraints: bool, dtype) -> jnp.ndarray:
    table = franka.REAL_JOINT_LIMITS if use_real_constraints else franka.JOINT_LIMITS
    return jnp.asarray(table, dtype=dtype)


def normalize_franka_joints(
    q: jnp.ndarray,
    limits: Tuple[float, float] = (-1.0, 1.0),
    use_real_constraints: bool = True,
) -> jnp.ndarray:
    """[..., 7] joint angles -> [..., 7] normalized to `limits`."""
    jl = _limits(use_real_constraints, q.dtype)
    lo, hi = jl[:, 0], jl[:, 1]
    return (q - lo) / (hi - lo) * (limits[1] - limits[0]) + limits[0]


def unnormalize_franka_joints(
    q_norm: jnp.ndarray,
    limits: Tuple[float, float] = (-1.0, 1.0),
    use_real_constraints: bool = True,
) -> jnp.ndarray:
    """Inverse of :func:`normalize_franka_joints`."""
    jl = _limits(use_real_constraints, q_norm.dtype)
    lo, hi = jl[:, 0], jl[:, 1]
    return (q_norm - limits[0]) * (hi - lo) / (limits[1] - limits[0]) + lo


def clamp_to_limits(q: jnp.ndarray, use_real_constraints: bool = True) -> jnp.ndarray:
    """Clamp joint angles to the limit table (used by the train-time noise
    augmentation, reference ``data_loader.py:176-178``)."""
    jl = _limits(use_real_constraints, q.dtype)
    return jnp.clip(q, jl[:, 0], jl[:, 1])
