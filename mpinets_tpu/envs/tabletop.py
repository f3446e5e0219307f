"""Procedural tabletop environments.

Behavioral equivalent of the reference's ``TabletopEnvironment``
(``/root/reference/mpinets/data_pipeline/environments/tabletop_environment.py:52-441``):
a table surface (rectangular or L-shaped, height 0 or ~U(0, 0.4)), 3-15
random cuboid/cylinder objects placed without overlap on the surface, and
task-oriented candidate poses above the table pointing down with randomized
roll/pitch/yaw ranges, solved to configurations with the batched
collision-free IK. The linear-decreasing height bias for candidate z follows
``tabletop_environment.py:43-49,386``.
"""

from __future__ import annotations

from typing import List

import numpy as np

from mpinets_tpu.envs.base import Environment, TaskOrientedCandidate
from mpinets_tpu import types
from mpinets_tpu.types import Cuboid, Cylinder, Pose

TABLE_HEIGHT_MAX = 0.4
NUM_OBJECTS_RANGE = (3, 15)
OBJECT_DIM_RANGE = (0.03, 0.25)
#: Candidate offset above the support surface
#: (tabletop_environment.py:386: ``random_linear_decrease() * (0.12 - 0.01)
#: + 0.01``): linearly decreasing density over [0.01, 0.12] m.
CANDIDATE_Z_RANGE = (0.01, 0.12)


def _height_biased(rng: np.random.Generator, lo: float, hi: float) -> float:
    """Linearly-decreasing density over [lo, hi]: p(h) ∝ (hi - h)."""
    u = rng.uniform()
    return float(hi - (hi - lo) * np.sqrt(u))


class TabletopEnvironment(Environment):
    """Random table + scattered objects."""

    def __init__(self) -> None:
        super().__init__()
        self.table_tops: List[Cuboid] = []

    # -- scene ----------------------------------------------------------------
    def _gen_table(self, rng: np.random.Generator) -> None:
        """One or two slabs: a main table in front of the robot, optionally an
        L-extension to the side (the reference's L/l-shaped tables)."""
        height = 0.0 if rng.uniform() < 0.5 else rng.uniform(0.0, TABLE_HEIGHT_MAX)
        thickness = rng.uniform(0.02, 0.08)
        main = Cuboid(
            center=[rng.uniform(0.55, 0.75), rng.uniform(-0.15, 0.15),
                    height - thickness / 2],
            dims=[rng.uniform(0.6, 1.0), rng.uniform(0.9, 1.6), thickness],
            quaternion=[1.0, 0.0, 0.0, 0.0],
        )
        self.table_tops = [main]
        if rng.uniform() < 0.5:  # L-shape: side wing
            side = 1.0 if rng.uniform() < 0.5 else -1.0
            wing = Cuboid(
                center=[rng.uniform(0.0, 0.25),
                        side * rng.uniform(0.55, 0.75), height - thickness / 2],
                dims=[rng.uniform(0.9, 1.4), rng.uniform(0.5, 0.9), thickness],
                quaternion=[1.0, 0.0, 0.0, 0.0],
            )
            self.table_tops.append(wing)
        self.obstacles = list(self.table_tops)

    def _surface_point(self, rng: np.random.Generator) -> np.ndarray:
        """Uniform point on a random table top (area-weighted)."""
        areas = np.array([t.dims[0] * t.dims[1] for t in self.table_tops])
        t = self.table_tops[rng.choice(len(self.table_tops), p=areas / areas.sum())]
        x = t.center[0] + rng.uniform(-0.5, 0.5) * t.dims[0]
        y = t.center[1] + rng.uniform(-0.5, 0.5) * t.dims[1]
        return np.array([x, y, t.center[2] + t.dims[2] / 2])

    def _place_objects(self, rng: np.random.Generator, how_many: int) -> None:
        """Scatter non-overlapping objects on the surfaces
        (tabletop_environment.py:129-153): rejection sample xy, skip
        placements whose footprint overlaps an existing object."""
        placed: List[np.ndarray] = []  # (x, y, half-extent)
        for _ in range(how_many):
            for _attempt in range(20):
                p = self._surface_point(rng)
                if rng.uniform() < 0.5:
                    dims = rng.uniform(*OBJECT_DIM_RANGE, size=3)
                    half = float(np.hypot(dims[0], dims[1]) / 2)
                    obj = Cuboid(
                        center=[p[0], p[1], p[2] + dims[2] / 2],
                        dims=dims,
                        quaternion=_yaw_quat(rng.uniform(0, 2 * np.pi)),
                    )
                else:
                    r = rng.uniform(0.02, 0.12)
                    h = rng.uniform(0.05, 0.35)
                    half = r
                    obj = Cylinder(
                        center=[p[0], p[1], p[2] + h / 2],
                        radius=r,
                        height=h,
                        quaternion=[1.0, 0.0, 0.0, 0.0],
                    )
                if all(
                    np.hypot(p[0] - q[0], p[1] - q[1]) > half + q[2]
                    for q in placed
                ):
                    placed.append(np.array([p[0], p[1], half]))
                    self.obstacles.append(obj)
                    break

    # -- candidates -----------------------------------------------------------
    def sample_candidate_poses(
        self, rng: np.random.Generator, how_many: int
    ) -> List[Pose]:
        """Poses above the support surface, matching the reference's
        ``gen_candidate`` (tabletop_environment.py:354-404): the sampled
        point is raised to the top of any object it lands on, offset
        0.01-0.12 m above with linearly-decreasing density, and oriented by
        rpy with roll ~ U(3π/4, 5π/4), pitch ~ U(-π/8, π/8),
        yaw ~ U(-π/2, π/2) (down-pointing gripper family)."""
        objects = self.obstacles[len(self.table_tops):]
        poses = []
        for _ in range(how_many):
            p = self._surface_point(rng)
            # Raise onto the top of any object under the sampled xy
            # (reference: o.sdf(p) <= 0.01 -> p.z := object top).
            for o in objects:
                if o.sdf(p) <= 0.01:
                    if isinstance(o, Cuboid):
                        p[2] = o.center[2] + o.dims[2] / 2
                    elif isinstance(o, Cylinder):
                        p[2] = o.center[2] + o.height / 2
            p[2] += _height_biased(rng, *CANDIDATE_Z_RANGE)
            roll = rng.uniform(3 * np.pi / 4, 5 * np.pi / 4)
            pitch = rng.uniform(-np.pi / 8, np.pi / 8)
            yaw = rng.uniform(-np.pi / 2, np.pi / 2)
            poses.append(Pose(p, _rpy_quat(roll, pitch, yaw)))
        return poses

    def gen(self, rng: np.random.Generator) -> bool:
        self._invalidate_scene()
        self._gen_table(rng)
        self._place_objects(rng, int(rng.integers(*NUM_OBJECTS_RANGE)))
        self._invalidate_scene()
        candidates = self.gen_candidates(rng, 2)
        if len(candidates) < 2:
            return False
        self.demo_candidates = candidates[:2]
        return True


def _yaw_quat(yaw: float) -> list:
    return [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))]


def _rpy_quat(roll: float, pitch: float, yaw: float) -> np.ndarray:
    """wxyz quaternion from fixed-axis rpy (Rz @ Ry @ Rx, the geometrout
    ``SO3.from_rpy`` convention the reference uses)."""
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    rz = np.array([[cy, -sy, 0.0], [sy, cy, 0.0], [0.0, 0.0, 1.0]])
    ry = np.array([[cp, 0.0, sp], [0.0, 1.0, 0.0], [-sp, 0.0, cp]])
    rx = np.array([[1.0, 0.0, 0.0], [0.0, cr, -sr], [0.0, sr, cr]])
    return types.matrix_to_quat_np(rz @ ry @ rx)
