"""Synthetic scene / problem / trajectory generation.

The reference's training data comes from an offline CPU-cluster expert
pipeline (OMPL AIT* + Lula fabrics, ``mpinets/data_pipeline/gen_data.py``)
whose published output is consumed from HDF5; those artifacts are not
available in this environment (zero egress), so this module provides a
self-contained generator that emits *schema-compatible* data:

* random tabletop-like primitive scenes (cuboids + cylinders, padded SoA),
* pseudo-expert trajectories: smooth minimum-jerk interpolations between a
  start configuration and a goal configuration, length 50
  (``SEQUENCE_LENGTH``, reference ``gen_data.py:77``),
* full training batches with the reference's key layout
  (``data_loader.py:141-280``): xyz [B, 6272, 4], configuration [B, 7]
  normalized, supervision [B, 7] normalized, padded scene SoA, and
  target_position [B, 3].

This keeps training/eval/benchmarks runnable end-to-end; the HDF5 reader in
:mod:`mpinets_tpu.data.hdf5` consumes the published datasets when present.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from mpinets_tpu.geom.assembly import PointCloudSizes, assemble_point_cloud
from mpinets_tpu.geom.scene import SceneSet
from mpinets_tpu.kernels import kinematics
from mpinets_tpu.robot import franka, sampler
from mpinets_tpu.utils.normalization import (
    clamp_to_limits,
    normalize_franka_joints,
)

SEQUENCE_LENGTH = 50  # gen_data.py:77


class Problem(NamedTuple):
    """A batch of planning problems in device-friendly layout (the
    ``PlanningProblem`` equivalent, reference ``mpinets_types.py:34-45``).

    ``obstacle_points`` carries raw sensed obstacle clouds for problems
    given without primitive scenes (the reference's depth /
    ``obstacle_point_cloud`` mode, ``run_inference.py:58-134``); when set,
    the rollout uses it directly instead of sampling ``scene``.
    """

    q0: jnp.ndarray            # [..., 7]
    target_rot: jnp.ndarray    # [..., 3, 3] right_gripper frame
    target_trans: jnp.ndarray  # [..., 3]
    scene: SceneSet            # batched to [...]
    obstacle_points: jnp.ndarray | None = None  # [..., No, 3] or None


def random_configuration(key: jax.Array, shape=()) -> jnp.ndarray:
    """Uniform sample inside the real joint limits."""
    limits = jnp.asarray(franka.REAL_JOINT_LIMITS, jnp.float32)
    u = jax.random.uniform(key, tuple(shape) + (franka.DOF,))
    return limits[:, 0] + u * (limits[:, 1] - limits[:, 0])


def random_scene(key: jax.Array, max_cuboids: int = 8, max_cylinders: int = 8) -> SceneSet:
    """One random tabletop-like scene (unbatched; vmap for batches).

    A table slab plus a random number of boxes/cylinders scattered on it,
    in the spirit of the reference's TabletopEnvironment
    (``environments/tabletop_environment.py:129-153,223-324``) without the
    Bullet/IK machinery. Unused slots are zero-volume padding.
    """
    keys = jax.random.split(key, 10)
    # Table: a slab in front of the robot.
    table_center = jnp.asarray([0.6, 0.0, 0.18]) + jax.random.uniform(
        keys[0], (3,), minval=-0.05, maxval=0.05
    ) * jnp.asarray([1.0, 2.0, 1.0])
    table_dims = jnp.asarray([0.7, 1.2, 0.04]) + jax.random.uniform(
        keys[1], (3,), minval=0.0, maxval=0.2
    )
    table_top = table_center[2] + table_dims[2] / 2

    n_cub = jax.random.randint(keys[2], (), 1, max_cuboids)
    n_cyl = jax.random.randint(keys[3], (), 0, max_cylinders + 1)

    def _objects(key_c, key_d, count, m):
        centers_xy = jax.random.uniform(
            key_c, (m, 2), minval=jnp.asarray([0.3, -0.5]), maxval=jnp.asarray([0.85, 0.5])
        )
        dims = jax.random.uniform(key_d, (m, 3), minval=0.04, maxval=0.25)
        live = (jnp.arange(m) < count).astype(jnp.float32)
        return centers_xy, dims * live[:, None]

    cub_xy, cub_dims = _objects(keys[4], keys[5], n_cub, max_cuboids - 1)
    cub_centers = jnp.concatenate(
        [cub_xy, (table_top + cub_dims[:, 2] / 2)[:, None]], axis=-1
    )
    ident = jnp.zeros((max_cuboids, 4)).at[:, 0].set(1.0)

    cuboid_centers = jnp.concatenate([table_center[None], cub_centers], axis=0)
    cuboid_dims = jnp.concatenate([table_dims[None], cub_dims], axis=0)

    cyl_xy = jax.random.uniform(
        keys[6], (max_cylinders, 2), minval=jnp.asarray([0.3, -0.5]),
        maxval=jnp.asarray([0.85, 0.5]),
    )
    cyl_r = jax.random.uniform(keys[7], (max_cylinders, 1), minval=0.02, maxval=0.1)
    cyl_h = jax.random.uniform(keys[8], (max_cylinders, 1), minval=0.05, maxval=0.3)
    cyl_live = (jnp.arange(max_cylinders) < n_cyl).astype(jnp.float32)[:, None]
    cyl_r = cyl_r * cyl_live
    cyl_h = cyl_h * cyl_live
    cyl_centers = jnp.concatenate([cyl_xy, table_top + cyl_h / 2], axis=-1)
    ident_y = jnp.zeros((max_cylinders, 4)).at[:, 0].set(1.0)

    return SceneSet(
        cuboid_centers=cuboid_centers,
        cuboid_dims=cuboid_dims,
        cuboid_quats=ident,
        cylinder_centers=cyl_centers,
        cylinder_radii=cyl_r,
        cylinder_heights=cyl_h,
        cylinder_quats=ident_y,
    )


def min_jerk_trajectory(q_start: jnp.ndarray, q_goal: jnp.ndarray,
                        length: int = SEQUENCE_LENGTH) -> jnp.ndarray:
    """Smooth pseudo-expert trajectory [..., length, 7]: minimum-jerk time
    scaling of the straight configuration-space segment."""
    s = jnp.linspace(0.0, 1.0, length)
    s = 10 * s**3 - 15 * s**4 + 6 * s**5
    return q_start[..., None, :] + s[:, None] * (q_goal - q_start)[..., None, :]


def random_problem(key: jax.Array) -> Problem:
    """One problem: random scene + free-space-biased start and goal."""
    k_scene, k_q0, k_goal = jax.random.split(key, 3)
    scene = random_scene(k_scene)
    q0 = random_configuration(k_q0)
    q_goal = random_configuration(k_goal)
    rot, trans = kinematics.eff_pose(q_goal)
    return Problem(q0=q0, target_rot=rot, target_trans=trans, scene=scene)


def random_problem_batch(key: jax.Array, batch_size: int) -> Problem:
    return jax.vmap(random_problem)(jax.random.split(key, batch_size))


@functools.partial(
    jax.jit, static_argnames=("batch_size", "sizes", "random_scale")
)
def training_batch(
    key: jax.Array,
    batch_size: int,
    sizes: PointCloudSizes = PointCloudSizes(),
    random_scale: float = 0.015,
) -> Dict[str, jnp.ndarray]:
    """A full training batch with the reference's key layout, built on
    device. Timesteps are sampled uniformly along pseudo-expert
    trajectories; train-time joint noise sigma=0.015 clamped to limits
    mirrors ``data_loader.py:167-179``."""
    keys = jax.random.split(key, 6)
    scene = jax.vmap(random_scene)(jax.random.split(keys[0], batch_size))
    q0 = random_configuration(jax.random.fold_in(keys[1], 0), (batch_size,))
    q_goal = random_configuration(jax.random.fold_in(keys[1], 1), (batch_size,))
    traj = min_jerk_trajectory(q0, q_goal)  # [B, T, 7]

    t = jax.random.randint(keys[2], (batch_size,), 0, SEQUENCE_LENGTH)
    q_t = jnp.take_along_axis(traj, t[:, None, None], axis=1)[:, 0]
    t_next = jnp.clip(t + 1, 0, SEQUENCE_LENGTH - 1)
    q_next = jnp.take_along_axis(traj, t_next[:, None, None], axis=1)[:, 0]

    # The target pose comes from FK of the final trajectory config
    # (data_loader.py:155-157).
    rot_goal, trans_goal = kinematics.eff_pose(q_goal)

    noise = random_scale * jax.random.normal(keys[3], q_t.shape)
    q_noisy = clamp_to_limits(q_t + noise)

    cloud_keys = jax.random.split(keys[4], batch_size)
    xyz = jax.vmap(
        lambda k, q, r, tr, s: assemble_point_cloud(k, q, r, tr, s, sizes)
    )(cloud_keys, q_noisy, rot_goal, trans_goal, scene)

    return {
        "xyz": xyz,
        "configuration": normalize_franka_joints(q_noisy),
        "supervision": normalize_franka_joints(q_next),
        "target_position": trans_goal,
        "cuboid_centers": scene.cuboid_centers,
        "cuboid_dims": scene.cuboid_dims,
        "cuboid_quats": scene.cuboid_quats,
        "cylinder_centers": scene.cylinder_centers,
        "cylinder_radii": scene.cylinder_radii,
        "cylinder_heights": scene.cylinder_heights,
        "cylinder_quats": scene.cylinder_quats,
    }
