"""On-device assembly of the policy's input point cloud.

The policy consumes ``xyz [B, 6272, 4]``: 2048 robot points (label 0), 4096
obstacle points (label 1), 128 target-gripper points (label 2), stacked in
that order -- reference layout at ``mpinets/data_loader.py:261-278`` and
``mpinets/run_inference.py:70-90``. The reference assembles this on CPU
dataloader workers; here it is one jitted function so rollouts and training
both build clouds on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mpinets_tpu.geom.scene import SceneSet, sample_obstacle_points
from mpinets_tpu.robot import sampler

NUM_ROBOT_POINTS = 2048
NUM_OBSTACLE_POINTS = 4096
NUM_TARGET_POINTS = 128
NUM_POINTS = NUM_ROBOT_POINTS + NUM_OBSTACLE_POINTS + NUM_TARGET_POINTS


class PointCloudSizes(NamedTuple):
    robot: int = NUM_ROBOT_POINTS
    obstacle: int = NUM_OBSTACLE_POINTS
    target: int = NUM_TARGET_POINTS

    @property
    def total(self) -> int:
        return self.robot + self.obstacle + self.target


def segmentation_labels(sizes: PointCloudSizes = PointCloudSizes(), dtype=jnp.float32):
    """The static label column: 0=robot, 1=obstacle, 2=target."""
    return jnp.concatenate(
        [
            jnp.zeros((sizes.robot,), dtype),
            jnp.ones((sizes.obstacle,), dtype),
            2.0 * jnp.ones((sizes.target,), dtype),
        ]
    )


def assemble_point_cloud(
    key: jax.Array,
    q0: jnp.ndarray,
    target_rot: jnp.ndarray,
    target_trans: jnp.ndarray,
    scene: SceneSet,
    sizes: PointCloudSizes = PointCloudSizes(),
) -> jnp.ndarray:
    """Build the [N, 4] input cloud for one problem (vmap for batches).

    :param q0: starting configuration [7]
    :param target_rot/target_trans: target EE pose (right_gripper frame)
    :param scene: unbatched SceneSet
    """
    k_robot, k_obs = jax.random.split(key)
    robot = sampler.sample_robot_points(q0, k_robot, sizes.robot)
    obstacles = sample_obstacle_points(k_obs, scene, sizes.obstacle)[:, :3]
    target = sampler.sample_end_effector(target_rot, target_trans, sizes.target)
    xyz = jnp.concatenate([robot, obstacles, target], axis=0)
    labels = segmentation_labels(sizes, xyz.dtype)
    return jnp.concatenate([xyz, labels[:, None]], axis=-1)


def assemble_point_cloud_with_obstacles(
    key: jax.Array,
    q0: jnp.ndarray,
    target_rot: jnp.ndarray,
    target_trans: jnp.ndarray,
    obstacle_xyz: jnp.ndarray,
    sizes: PointCloudSizes = PointCloudSizes(),
) -> jnp.ndarray:
    """Build the [N, 4] input cloud from a RAW obstacle cloud (the
    reference's depth / ``obstacle_point_cloud`` problem mode,
    ``run_inference.py:58-134``): the obstacle segment is resampled to
    ``sizes.obstacle`` points with replacement instead of sampled from
    primitives.

    obstacle_xyz: [No, 3] sensed obstacle points (No may differ from
    sizes.obstacle).
    """
    k_robot, k_obs = jax.random.split(key)
    robot = sampler.sample_robot_points(q0, k_robot, sizes.robot)
    no = obstacle_xyz.shape[0]
    if no == sizes.obstacle:
        obstacles = obstacle_xyz
    else:
        pick = jax.random.randint(k_obs, (sizes.obstacle,), 0, no)
        obstacles = jnp.take(obstacle_xyz, pick, axis=0)
    target = sampler.sample_end_effector(target_rot, target_trans, sizes.target)
    xyz = jnp.concatenate([robot, obstacles, target], axis=0)
    labels = segmentation_labels(sizes, xyz.dtype)
    return jnp.concatenate([xyz, labels[:, None]], axis=-1)


def update_robot_points(
    xyz: jnp.ndarray, robot_points: jnp.ndarray
) -> jnp.ndarray:
    """Replace the robot segment of the cloud in-place (rollout step
    semantics: ``xyz[:, :2048, :3] = samples``, reference ``model.py:180-181``).

    xyz: [..., N, 4]; robot_points: [..., R, 3]
    """
    r = robot_points.shape[-2]
    return xyz.at[..., :r, :3].set(robot_points)
