"""Static-shape scene containers and the on-device obstacle point-cloud
sampler.

Re-design of the reference's scene handling: the reference keeps obstacles as
Python lists of ``geometrout`` primitives and samples point clouds on CPU
dataloader workers (``mpinets/geometry.py:571-608``,
``mpinets/data_loader.py:258-260``). Here a scene batch is a padded SoA
pytree (the reference's own zero-volume padding convention,
``data_loader.py:204-235``, which maps perfectly onto static TPU shapes) and
surface sampling runs on device with jax PRNG so the rollout engine can
re-sample scenes without host round-trips.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mpinets_tpu.kernels.rotations import quat_to_matrix


class SceneSet(NamedTuple):
    """A batch of primitive scenes, padded to static M1 cuboids / M2 cylinders.

    Zero-volume padding entries (all-zero dims, or zero radius/height) are
    ignored by every consumer (SDF min-reduction, area-weighted sampling),
    matching the reference convention. Quaternions are wxyz; padding entries
    must carry identity quaternions (the reference's loader patches all-zero
    quats the same way, ``data_loader.py:202,230``).
    """

    cuboid_centers: jnp.ndarray   # [..., M1, 3]
    cuboid_dims: jnp.ndarray      # [..., M1, 3]
    cuboid_quats: jnp.ndarray     # [..., M1, 4]
    cylinder_centers: jnp.ndarray  # [..., M2, 3]
    cylinder_radii: jnp.ndarray    # [..., M2, 1]
    cylinder_heights: jnp.ndarray  # [..., M2, 1]
    cylinder_quats: jnp.ndarray    # [..., M2, 4]

    @property
    def batch_shape(self):
        return self.cuboid_centers.shape[:-2]

    @property
    def num_cuboids(self):
        return self.cuboid_centers.shape[-2]

    @property
    def num_cylinders(self):
        return self.cylinder_centers.shape[-2]


def empty_scene(batch_shape=(), m_cuboids: int = 1, m_cylinders: int = 1,
                dtype=jnp.float32) -> SceneSet:
    """An all-padding scene (SDF = +inf everywhere)."""
    def z(*tail):
        return jnp.zeros(tuple(batch_shape) + tail, dtype=dtype)

    ident_c = jnp.zeros(tuple(batch_shape) + (m_cuboids, 4), dtype=dtype).at[..., 0].set(1.0)
    ident_y = jnp.zeros(tuple(batch_shape) + (m_cylinders, 4), dtype=dtype).at[..., 0].set(1.0)
    return SceneSet(
        cuboid_centers=z(m_cuboids, 3),
        cuboid_dims=z(m_cuboids, 3),
        cuboid_quats=ident_c,
        cylinder_centers=z(m_cylinders, 3),
        cylinder_radii=z(m_cylinders, 1),
        cylinder_heights=z(m_cylinders, 1),
        cylinder_quats=ident_y,
    )


def cuboid_surface_areas(dims: jnp.ndarray) -> jnp.ndarray:
    """[..., M, 3] -> [..., M]; zero for zero-volume padding."""
    a = 2.0 * (
        dims[..., 0] * dims[..., 1]
        + dims[..., 0] * dims[..., 2]
        + dims[..., 1] * dims[..., 2]
    )
    nonzero = jnp.all(jnp.abs(dims) > 1e-8, axis=-1)
    return jnp.where(nonzero, a, 0.0)


def cylinder_surface_areas(radii: jnp.ndarray, heights: jnp.ndarray) -> jnp.ndarray:
    """[..., M, 1] x2 -> [..., M]; zero for zero-volume padding."""
    r = radii[..., 0]
    h = heights[..., 0]
    a = 2.0 * jnp.pi * r * h + 2.0 * jnp.pi * r * r
    nonzero = (jnp.abs(r) > 1e-8) & (jnp.abs(h) > 1e-8)
    return jnp.where(nonzero, a, 0.0)


def _sample_cuboid_surface(key: jax.Array, dims: jnp.ndarray) -> jnp.ndarray:
    """Uniform samples on axis-aligned cuboid surfaces (local frame).

    dims: [N, 3] (one cuboid per output point) -> [N, 3].
    """
    n = dims.shape[0]
    k_face, k_uv, k_sign = jax.random.split(key, 3)
    half = dims / 2.0
    # Face-pair areas: yz, xz, xy
    face_areas = jnp.stack(
        [dims[:, 1] * dims[:, 2], dims[:, 0] * dims[:, 2], dims[:, 0] * dims[:, 1]],
        axis=-1,
    )
    axis = jax.random.categorical(k_face, jnp.log(face_areas + 1e-12), axis=-1)  # [N]
    sign = jnp.where(jax.random.bernoulli(k_sign, 0.5, (n,)), 1.0, -1.0)
    uv = jax.random.uniform(k_uv, (n, 3), minval=-1.0, maxval=1.0) * half
    onehot = jax.nn.one_hot(axis, 3, dtype=dims.dtype)
    return uv * (1.0 - onehot) + (sign[:, None] * half) * onehot


def _sample_cylinder_surface(
    key: jax.Array, radii: jnp.ndarray, heights: jnp.ndarray
) -> jnp.ndarray:
    """Uniform samples on cylinder surfaces (local frame, axis = z).

    radii, heights: [N] -> [N, 3].
    """
    n = radii.shape[0]
    k_region, k_theta, k_z, k_r, k_cap = jax.random.split(key, 5)
    side_area = 2.0 * jnp.pi * radii * heights
    cap_area = jnp.pi * radii * radii  # per cap; two caps
    region_logits = jnp.log(jnp.stack([side_area, 2.0 * cap_area], axis=-1) + 1e-12)
    on_cap = jax.random.categorical(k_region, region_logits, axis=-1) == 1
    theta = jax.random.uniform(k_theta, (n,), minval=0.0, maxval=2.0 * jnp.pi)
    # Side sample
    z_side = jax.random.uniform(k_z, (n,), minval=-0.5, maxval=0.5) * heights
    side = jnp.stack([radii * jnp.cos(theta), radii * jnp.sin(theta), z_side], axis=-1)
    # Cap sample
    r_cap = radii * jnp.sqrt(jax.random.uniform(k_r, (n,)))
    z_cap = jnp.where(jax.random.bernoulli(k_cap, 0.5, (n,)), 0.5, -0.5) * heights
    cap = jnp.stack([r_cap * jnp.cos(theta), r_cap * jnp.sin(theta), z_cap], axis=-1)
    return jnp.where(on_cap[:, None], cap, side)


def sample_obstacle_points(
    key: jax.Array, scene: SceneSet, num_points: int
) -> jnp.ndarray:
    """Surface-area-proportional point cloud over a single scene, on device.

    Functional equivalent of ``construct_mixed_point_cloud``
    (``mpinets/geometry.py:571-608``): each output point first picks an
    obstacle with probability proportional to its surface area, then samples
    uniformly on that obstacle's surface. (The reference allocates
    deterministic per-obstacle counts + oversample + downsample on CPU; the
    categorical allocation here has the same distribution with static
    shapes.) Column 3 is the obstacle index (the reference's per-obstacle
    label, which downstream consumers discard -- ``data_loader.py:274``).

    :param scene: unbatched SceneSet (fields [M, ...]).
    :returns: [num_points, 4]
    """
    m1 = scene.num_cuboids
    k_which, k_cub, k_cyl = jax.random.split(key, 3)
    areas = jnp.concatenate(
        [
            cuboid_surface_areas(scene.cuboid_dims),
            cylinder_surface_areas(scene.cylinder_radii, scene.cylinder_heights),
        ]
    )
    # If the scene is empty, fall back to uniform logits over padding; the
    # result is garbage-at-origin points, matching the reference's behavior of
    # never calling this without obstacles.
    logits = jnp.log(areas + 1e-12)
    which = jax.random.categorical(k_which, logits, shape=(num_points,))  # [N]

    is_cuboid = which < m1
    cub_idx = jnp.clip(which, 0, m1 - 1)
    cyl_idx = jnp.clip(which - m1, 0, scene.num_cylinders - 1)

    cub_local = _sample_cuboid_surface(k_cub, scene.cuboid_dims[cub_idx])
    cub_rot = quat_to_matrix(scene.cuboid_quats[cub_idx])
    cub_world = (
        jnp.einsum("nij,nj->ni", cub_rot, cub_local) + scene.cuboid_centers[cub_idx]
    )

    cyl_local = _sample_cylinder_surface(
        k_cyl, scene.cylinder_radii[cyl_idx, 0], scene.cylinder_heights[cyl_idx, 0]
    )
    cyl_rot = quat_to_matrix(scene.cylinder_quats[cyl_idx])
    cyl_world = (
        jnp.einsum("nij,nj->ni", cyl_rot, cyl_local) + scene.cylinder_centers[cyl_idx]
    )

    pts = jnp.where(is_cuboid[:, None], cub_world, cyl_world)
    return jnp.concatenate([pts, which[:, None].astype(pts.dtype)], axis=-1)


# ---------------------------------------------------------------------------
# Host-side constructors (numpy): build padded SoA batches from ragged
# per-scene primitive lists, e.g. when loading the reference's pickled
# problem sets.
# ---------------------------------------------------------------------------

def pack_scenes(
    cuboids_per_scene: Sequence[Sequence],
    cylinders_per_scene: Sequence[Sequence],
    max_cuboids: Optional[int] = None,
    max_cylinders: Optional[int] = None,
    dtype=np.float32,
) -> SceneSet:
    """Pack ragged scene lists into a padded SceneSet batch.

    Each cuboid is (center[3], dims[3], wxyz_quat[4]); each cylinder is
    (center[3], radius, height, wxyz_quat[4]). Padding uses zero volume +
    identity quaternion.
    """
    b = len(cuboids_per_scene)
    assert len(cylinders_per_scene) == b
    m1 = max(1, max_cuboids or max((len(c) for c in cuboids_per_scene), default=1))
    m2 = max(1, max_cylinders or max((len(c) for c in cylinders_per_scene), default=1))
    if max_cuboids is None:
        # Bucket the padded sizes (multiples of 8) so consecutive scenes with
        # nearby primitive counts share one jit compilation: per-scene exact
        # padding recompiled every downstream jit per unique count, which in
        # long generation runs accumulated enough XLA:CPU JIT code to exhaust
        # process memory maps (r3: "LLVM compilation error: Cannot allocate
        # memory" after ~30 scenes). Zero-volume padding is semantically
        # inert everywhere (reference convention, data_loader.py:198-235).
        m1 = -(-m1 // 8) * 8
    if max_cylinders is None:
        m2 = -(-m2 // 8) * 8

    cc = np.zeros((b, m1, 3), dtype)
    cd = np.zeros((b, m1, 3), dtype)
    cq = np.zeros((b, m1, 4), dtype)
    cq[..., 0] = 1.0
    yc = np.zeros((b, m2, 3), dtype)
    yr = np.zeros((b, m2, 1), dtype)
    yh = np.zeros((b, m2, 1), dtype)
    yq = np.zeros((b, m2, 4), dtype)
    yq[..., 0] = 1.0

    for i, cubs in enumerate(cuboids_per_scene):
        assert len(cubs) <= m1, (
            f"scene {i} has {len(cubs)} cuboids > max_cuboids={m1}"
        )
        assert len(cylinders_per_scene[i]) <= m2, (
            f"scene {i} has {len(cylinders_per_scene[i])} cylinders > "
            f"max_cylinders={m2}"
        )
        for j, (center, dims, quat) in enumerate(cubs):
            cc[i, j] = center
            cd[i, j] = dims
            cq[i, j] = quat
    for i, cyls in enumerate(cylinders_per_scene):
        for j, (center, radius, height, quat) in enumerate(cyls):
            yc[i, j] = center
            yr[i, j, 0] = radius
            yh[i, j, 0] = height
            yq[i, j] = quat

    return SceneSet(
        cuboid_centers=jnp.asarray(cc),
        cuboid_dims=jnp.asarray(cd),
        cuboid_quats=jnp.asarray(cq),
        cylinder_centers=jnp.asarray(yc),
        cylinder_radii=jnp.asarray(yr),
        cylinder_heights=jnp.asarray(yh),
        cylinder_quats=jnp.asarray(yq),
    )
