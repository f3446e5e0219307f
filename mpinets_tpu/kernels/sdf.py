"""Batched signed-distance functions for primitive scenes (spheres, cuboids,
cylinders) with zero-volume masking.

TPU-native re-design of the reference's ``TorchSpheres`` / ``TorchCuboids`` /
``TorchCylinders`` (``/root/reference/mpinets/geometry.py:30-568``): instead
of stateful classes with cached inverse frames and boolean-mask advanced
indexing (which would force dynamic shapes), these are pure static-shape jnp
functions. Zero-volume primitives contribute +inf so they are transparent to
the min-reduction, exactly like the reference's masking semantics
(``geometry.py:97-102,286-288``).

Shapes: primitives are SoA arrays with a batch prefix ``[...]`` and a
primitive axis ``M``; query points are ``[..., N, 3]`` with the same batch
prefix. Time-sequence variants (the reference's ``sdf_sequence``) are just a
reshape of the points axis -- see :func:`scene_sdf_sequence`.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpinets_tpu.kernels.rotations import quat_to_matrix

# torch.isclose defaults, used by the reference's zero-volume masks
# (geometry.py:56,154-157,384-388).
_RTOL = 1e-5
_ATOL = 1e-8


def _is_zero(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(x) <= (_ATOL + _RTOL * jnp.abs(x))


def _safe_norm(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """L2 norm with a zero-safe gradient (norm at exactly 0 has nan grad in
    jax; torch returns a 0 subgradient, which the reference's training path
    relies on for points inside cuboids)."""
    s = jnp.sum(x * x, axis=axis)
    return jnp.sqrt(jnp.maximum(s, 1e-30))


def _points_in_primitive_frames(
    points: jnp.ndarray, centers: jnp.ndarray, quats: jnp.ndarray
) -> jnp.ndarray:
    """Map world points into each primitive's local frame.

    points: [..., N, 3]; centers: [..., M, 3]; quats: [..., M, 4] (wxyz)
    -> [..., M, N, 3]
    """
    rot = quat_to_matrix(quats)  # [..., M, 3, 3] (world <- local)
    # local = R^T (p - c); einsum with R^T folded in via index swap.
    delta = points[..., None, :, :] - centers[..., :, None, :]  # [..., M, N, 3]
    return jnp.einsum("...mji,...mnj->...mni", rot, delta)


def sphere_sdf(
    points: jnp.ndarray, centers: jnp.ndarray, radii: jnp.ndarray
) -> jnp.ndarray:
    """Scene SDF of a sphere set (min over M).

    points: [..., N, 3]; centers: [..., M, 3]; radii: [..., M, 1] -> [..., N]
    Matches ``TorchSpheres.sdf`` (geometry.py:87-102): zero-radius spheres are
    masked to +inf.
    """
    mask = ~_is_zero(radii[..., 0])  # [..., M]
    d = _safe_norm(points[..., None, :, :] - centers[..., :, None, :])  # [..., M, N]
    sdf = d - radii
    sdf = jnp.where(mask[..., None], sdf, jnp.inf)
    return jnp.min(sdf, axis=-2)


def cuboid_sdf(
    points: jnp.ndarray,
    centers: jnp.ndarray,
    dims: jnp.ndarray,
    quats: jnp.ndarray,
) -> jnp.ndarray:
    """Scene SDF of an oriented-cuboid set (min over M).

    points: [..., N, 3]; centers/dims: [..., M, 3]; quats: [..., M, 4] (wxyz)
    -> [..., N]
    Same inside/outside decomposition as ``TorchCuboids.sdf``
    (geometry.py:272-288); any cuboid with a zero dim is masked to +inf.
    """
    mask = ~jnp.any(_is_zero(dims), axis=-1)  # [..., M]
    local = _points_in_primitive_frames(points, centers, quats)  # [..., M, N, 3]
    q = jnp.abs(local) - dims[..., :, None, :] / 2
    outside = _safe_norm(jnp.maximum(q, 0.0))
    inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    sdf = outside + inside
    sdf = jnp.where(mask[..., None], sdf, jnp.inf)
    return jnp.min(sdf, axis=-2)


def cylinder_sdf(
    points: jnp.ndarray,
    centers: jnp.ndarray,
    radii: jnp.ndarray,
    heights: jnp.ndarray,
    quats: jnp.ndarray,
) -> jnp.ndarray:
    """Scene SDF of an oriented-cylinder set (min over M), axis = local z.

    points: [..., N, 3]; centers: [..., M, 3]; radii/heights: [..., M, 1];
    quats: [..., M, 4] (wxyz) -> [..., N]
    Mirrors ``TorchCylinders.sdf`` (geometry.py:456-507): the cylinder is a
    2D rounded box in (radial, z); zero radius or height masks to +inf.
    """
    mask = ~(_is_zero(radii[..., 0]) | _is_zero(heights[..., 0]))  # [..., M]
    local = _points_in_primitive_frames(points, centers, quats)  # [..., M, N, 3]
    radial = _safe_norm(local[..., :2])  # [..., M, N]
    dz = jnp.abs(local[..., 2]) - heights[..., :, None, 0] / 2
    dr = radial - radii[..., :, None, 0]
    # 2D box decomposition (abs already applied to radial >= 0, and dz built
    # from |z|; mirrors the reference's abs(points_2d) since radial >= 0).
    q = jnp.stack([dr, dz], axis=-1)
    outside = _safe_norm(jnp.maximum(q, 0.0))
    inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    sdf = outside + inside
    sdf = jnp.where(mask[..., None], sdf, jnp.inf)
    return jnp.min(sdf, axis=-2)


def scene_sdf_per_primitive(points: jnp.ndarray, scene) -> jnp.ndarray:
    """Per-primitive SDF values, cuboids first then cylinders (no
    min-reduction; padding primitives give +inf).

    Needed by the evaluator's negative-volume region check
    (``/root/reference/mpinets/metrics.py:364-384,508-512``), which requires
    *each* volume's sign rather than the scene min.

    points: [..., N, 3] -> [..., M1 + M2, N]
    """
    cub_mask = ~jnp.any(_is_zero(scene.cuboid_dims), axis=-1)
    local = _points_in_primitive_frames(points, scene.cuboid_centers, scene.cuboid_quats)
    q = jnp.abs(local) - scene.cuboid_dims[..., :, None, :] / 2
    cub = _safe_norm(jnp.maximum(q, 0.0)) + jnp.minimum(jnp.max(q, axis=-1), 0.0)
    cub = jnp.where(cub_mask[..., None], cub, jnp.inf)

    cyl_mask = ~(
        _is_zero(scene.cylinder_radii[..., 0]) | _is_zero(scene.cylinder_heights[..., 0])
    )
    local = _points_in_primitive_frames(
        points, scene.cylinder_centers, scene.cylinder_quats
    )
    radial = _safe_norm(local[..., :2])
    dz = jnp.abs(local[..., 2]) - scene.cylinder_heights[..., :, None, 0] / 2
    dr = radial - scene.cylinder_radii[..., :, None, 0]
    q2 = jnp.stack([dr, dz], axis=-1)
    cyl = _safe_norm(jnp.maximum(q2, 0.0)) + jnp.minimum(jnp.max(q2, axis=-1), 0.0)
    cyl = jnp.where(cyl_mask[..., None], cyl, jnp.inf)
    return jnp.concatenate([cub, cyl], axis=-2)


def scene_sdf(points: jnp.ndarray, scene) -> jnp.ndarray:
    """Min of the cuboid and cylinder scene SDFs (the reference composes them
    with ``torch.minimum`` in both the loss (loss.py:88) and validation
    (model.py:304-307)).

    :param scene: any object with cuboid_centers/dims/quats and
        cylinder_centers/radii/heights/quats attributes (see
        :class:`mpinets_tpu.geom.scene.SceneSet`).
    """
    sdf = cuboid_sdf(points, scene.cuboid_centers, scene.cuboid_dims, scene.cuboid_quats)
    cyl = cylinder_sdf(
        points,
        scene.cylinder_centers,
        scene.cylinder_radii,
        scene.cylinder_heights,
        scene.cylinder_quats,
    )
    return jnp.minimum(sdf, cyl)


def scene_sdf_sequence(points: jnp.ndarray, scene) -> jnp.ndarray:
    """Sequence variant (`sdf_sequence`, geometry.py:104,290,509).

    points: [B, T, N, 3] with scene batch prefix [B] -> [B, T, N].
    """
    b, t, n, _ = points.shape
    flat = points.reshape(b, t * n, 3)
    return scene_sdf(flat, scene).reshape(b, t, n)
