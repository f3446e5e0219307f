"""On-device depth camera: sphere-traced rendering of primitive scenes.

The reference's ``--use-depth`` mode re-renders each primitive scene to a
depth image with a PyBullet camera and backprojects it into the problem's
``obstacle_point_cloud`` (``/root/reference/mpinets/run_inference.py:194-257``),
so evaluation exercises the sensed-cloud input path. PyBullet is a CPU/GL
dependency; the TPU-native equivalent ray-marches the scene SDF
(sphere tracing) entirely under jit/vmap -- one [H, W] ray grid per scene,
fixed iteration count, static shapes.

The default camera matches the spirit of the reference's fixed evaluation
camera: in front of and above the robot, looking at the workspace center.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mpinets_tpu.geom.scene import SceneSet
from mpinets_tpu.kernels.sdf import scene_sdf


class Camera(NamedTuple):
    """Pinhole camera: position, look-at target, intrinsics."""

    position: tuple = (1.6, -1.2, 1.2)
    look_at: tuple = (0.55, 0.0, 0.3)
    up: tuple = (0.0, 0.0, 1.0)
    fov_deg: float = 55.0
    width: int = 160
    height: int = 120
    max_depth: float = 4.0


def _camera_rays(cam: Camera):
    """Unit ray directions [H*W, 3] and origin [3] in world frame."""
    pos = jnp.asarray(cam.position, jnp.float32)
    fwd = jnp.asarray(cam.look_at, jnp.float32) - pos
    fwd = fwd / jnp.linalg.norm(fwd)
    up0 = jnp.asarray(cam.up, jnp.float32)
    right = jnp.cross(fwd, up0)
    right = right / jnp.linalg.norm(right)
    up = jnp.cross(right, fwd)

    tan = jnp.tan(jnp.radians(cam.fov_deg) / 2.0)
    xs = jnp.linspace(-1.0, 1.0, cam.width) * tan
    ys = jnp.linspace(-1.0, 1.0, cam.height) * tan * (cam.height / cam.width)
    gx, gy = jnp.meshgrid(xs, ys)
    dirs = (
        fwd[None, None]
        + gx[..., None] * right[None, None]
        - gy[..., None] * up[None, None]
    ).reshape(-1, 3)
    return dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True), pos


@functools.partial(jax.jit, static_argnames=("cam", "iters"))
def render_depth_points(
    scene: SceneSet, cam: Camera = Camera(), iters: int = 64
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sphere-trace one scene. Returns (points [H*W, 3], hit_mask [H*W]).

    scene: unbatched SceneSet (vmap for batches). Rays that never hit
    within ``cam.max_depth`` get hit_mask False (their points are at the
    far plane and should be filtered/ignored by the caller).
    """
    dirs, origin = _camera_rays(cam)
    n = dirs.shape[0]

    def step(t, _):
        p = origin[None] + t[:, None] * dirs           # [N, 3]
        d = scene_sdf(p[None], scene)[0]               # [N]
        t = jnp.minimum(t + jnp.maximum(d, 1e-4), cam.max_depth)
        return t, None

    t0 = jnp.full((n,), 0.05, jnp.float32)
    t, _ = jax.lax.scan(step, t0, None, length=iters)
    p = origin[None] + t[:, None] * dirs
    d_final = scene_sdf(p[None], scene)[0]
    hit = (d_final < 5e-3) & (t < cam.max_depth - 1e-3)
    return p, hit


def scene_to_point_cloud(
    scene: SceneSet,
    key: jax.Array,
    num_points: int,
    cam: Camera = Camera(),
) -> jnp.ndarray:
    """Depth-rendered obstacle cloud with exactly ``num_points`` points
    (hit points resampled with replacement; all-miss scenes return zeros).
    The run_inference.py:194-257 conversion, on device."""
    points, hit = render_depth_points(scene, cam)
    # Sample hit indices proportionally (replacement); guard empty.
    probs = hit.astype(jnp.float32)
    total = jnp.sum(probs)
    probs = jnp.where(total > 0, probs / jnp.maximum(total, 1.0), 0.0)
    idx = jax.random.categorical(
        key, jnp.log(jnp.maximum(probs, 1e-20)), shape=(num_points,)
    )
    out = jnp.take(points, idx, axis=0)
    return jnp.where(total > 0, out, jnp.zeros_like(out))
