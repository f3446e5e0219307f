"""Rotation / transform helpers shared by the FK and SDF kernels.

All functions are pure jnp, broadcast over arbitrary leading batch dims, and
follow the reference's conventions: quaternions are scalar-first (w, x, y, z)
as in ``/root/reference/mpinets/geometry.py:140-141``.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix from a (w, x, y, z) quaternion. q: [..., 4] -> [..., 3, 3].

    The quaternion is normalized first (the reference normalizes on
    construction, ``geometry.py:151``).
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = 2 * x * x, 2 * y * y, 2 * z * z
    wx, wy, wz = 2 * w * x, 2 * w * y, 2 * w * z
    xy, xz, yz = 2 * x * y, 2 * x * z, 2 * y * z
    row0 = jnp.stack([1 - yy - zz, xy - wz, xz + wy], axis=-1)
    row1 = jnp.stack([xy + wz, 1 - xx - zz, yz - wx], axis=-1)
    row2 = jnp.stack([xz - wy, yz + wx, 1 - xx - yy], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_quat(r: jnp.ndarray) -> jnp.ndarray:
    """(w, x, y, z) quaternion from a rotation matrix. r: [..., 3, 3] -> [..., 4].

    Branch-free Shepperd-style extraction: computes all four candidate
    solutions and selects the best-conditioned one with jnp.where, which keeps
    the function jit/vmap friendly.
    """
    m00, m01, m02 = r[..., 0, 0], r[..., 0, 1], r[..., 0, 2]
    m10, m11, m12 = r[..., 1, 0], r[..., 1, 1], r[..., 1, 2]
    m20, m21, m22 = r[..., 2, 0], r[..., 2, 1], r[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by 4*q_k^2 where k is the pivot component.
    qw = jnp.stack([1 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], axis=-1)

    pivots = jnp.stack([1 + tr, 1 + m00 - m11 - m22, 1 - m00 + m11 - m22,
                        1 - m00 - m11 + m22], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4(pivot), 4(comp)]
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonicalize sign (w >= 0) for stable comparisons.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of (w, x, y, z) quaternions."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_angle(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Absolute rotation angle (radians) between two (w,x,y,z) quaternions.

    Matches the reference's orientation-error semantics
    (``metrics.py:352-362``: |angle(q_final * q_target^-1)|).
    """
    d = quat_multiply(a, quat_conjugate(b))
    # atan2 formulation: far better fp32 accuracy near zero than arccos(w).
    vec = jnp.sqrt(jnp.maximum(jnp.sum(d[..., 1:] ** 2, axis=-1), 1e-30))
    return 2.0 * jnp.arctan2(vec, jnp.abs(d[..., 0]))


def transform_points(rot: jnp.ndarray, trans: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply a rigid transform to points.

    rot: [..., 3, 3], trans: [..., 3], points: [..., N, 3] -> [..., N, 3].
    """
    return jnp.einsum("...ij,...nj->...ni", rot, points) + trans[..., None, :]


def inverse_transform(rot: jnp.ndarray, trans: jnp.ndarray):
    """Inverse of a rigid transform given as (rot, trans)."""
    inv_rot = jnp.swapaxes(rot, -1, -2)
    inv_trans = -jnp.einsum("...ij,...j->...i", inv_rot, trans)
    return inv_rot, inv_trans
