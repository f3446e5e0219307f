"""Procedural cubby environments.

Behavioral equivalent of the reference's ``CubbyEnvironment`` /
``MergedCubbyEnvironment``
(``/root/reference/mpinets/data_pipeline/environments/cubby_environment.py:45-705``):
a parametric 2x2 shelf assembly in front of the robot (randomized extents,
wall thicknesses, and a yaw of up to ±10°), per-pocket interior support
volumes, and candidate poses inside the pockets with downward-pointing
grippers solved by the batched collision-free IK. The merged variant removes
the divider between two vertically-adjacent pockets
(``cubby_environment.py:660-704``).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from mpinets_tpu.envs.base import Environment, pose_from_xz_axes
from mpinets_tpu.types import Cuboid, Pose

MAX_YAW = np.radians(10.0)  # cubby_environment.py:57-122


@dataclasses.dataclass
class CubbyParams:
    """Randomized cubby geometry (local frame: +x away from robot)."""

    distance: float      # robot -> front face
    width: float         # total y extent
    height: float        # total z extent of the pocket region
    depth: float         # pocket depth (x)
    bottom: float        # z of the pocket region's bottom
    thickness: float     # wall thickness
    yaw: float           # rotation about world z

    @classmethod
    def random(cls, rng: np.random.Generator) -> "CubbyParams":
        return cls(
            distance=rng.uniform(0.55, 0.8),
            width=rng.uniform(0.55, 0.85),
            height=rng.uniform(0.45, 0.7),
            depth=rng.uniform(0.25, 0.4),
            bottom=rng.uniform(0.1, 0.35),
            thickness=rng.uniform(0.01, 0.03),
            yaw=rng.uniform(-MAX_YAW, MAX_YAW),
        )


def _rot_z(yaw: float) -> np.ndarray:
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _yaw_quat(yaw: float) -> list:
    return [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))]


class CubbyEnvironment(Environment):
    """2x2 cubby with randomized geometry."""

    #: When True, one randomly-chosen internal divider is omitted, merging two
    #: pockets (the MergedCubbyEnvironment behavior).
    merge: bool = False

    def __init__(self) -> None:
        super().__init__()
        self.params: CubbyParams | None = None
        self.pockets: List[Tuple[np.ndarray, np.ndarray]] = []  # (lo, hi) local

    def _panel(self, center_local, dims) -> Cuboid:
        """A wall panel given in the cubby's local (unrotated) frame."""
        p = self.params
        rot = _rot_z(p.yaw)
        world = rot @ np.asarray(center_local, dtype=np.float64)
        return Cuboid(center=world, dims=dims, quaternion=_yaw_quat(p.yaw))

    def _build(self, rng: np.random.Generator) -> None:
        p = self.params
        cx = p.distance + p.depth / 2  # pocket-region center x
        t = p.thickness
        mid_z = p.bottom + p.height / 2
        top_z = p.bottom + p.height

        panels = [
            # back wall
            ([p.distance + p.depth + t / 2, 0.0, mid_z],
             [t, p.width, p.height + 2 * t]),
            # left / right side walls
            ([cx, p.width / 2 + t / 2, mid_z], [p.depth, t, p.height + 2 * t]),
            ([cx, -p.width / 2 - t / 2, mid_z], [p.depth, t, p.height + 2 * t]),
            # top / bottom decks
            ([cx, 0.0, top_z + t / 2], [p.depth, p.width + 2 * t, t]),
            ([cx, 0.0, p.bottom - t / 2], [p.depth, p.width + 2 * t, t]),
        ]
        drop_shelf = drop_divider = False
        if self.merge:
            if rng.uniform() < 0.5:
                drop_shelf = True
            else:
                drop_divider = True
        if not drop_shelf:  # middle horizontal shelf
            panels.append(([cx, 0.0, mid_z], [p.depth, p.width, t]))
        if not drop_divider:  # middle vertical divider
            panels.append(([cx, 0.0, mid_z], [p.depth, t, p.height]))

        self.obstacles = [self._panel(c, d) for c, d in panels]

        # Pocket interiors in the local frame (shrunk by the wall thickness).
        ys = [(-p.width / 2 + t, -t), (t, p.width / 2 - t)]
        zs = [(p.bottom + t, mid_z - t), (mid_z + t, top_z - t)]
        if drop_divider:
            ys = [(-p.width / 2 + t, p.width / 2 - t)]
        if drop_shelf:
            zs = [(p.bottom + t, top_z - t)]
        self.pockets = []
        for y0, y1 in ys:
            for z0, z1 in zs:
                lo = np.array([p.distance + 0.05, y0 + 0.02, z0 + 0.02])
                hi = np.array([p.distance + p.depth - 0.05, y1 - 0.02, z1 - 0.02])
                if np.all(hi > lo):
                    self.pockets.append((lo, hi))

    def support_volumes(self) -> List[Cuboid]:
        """Per-pocket interior volumes (cubby_environment.py:266-431), used
        as target regions / negative volumes by the problem generator."""
        p = self.params
        rot = _rot_z(p.yaw)
        out = []
        for lo, hi in self.pockets:
            center_local = (lo + hi) / 2
            out.append(
                Cuboid(
                    center=rot @ center_local,
                    dims=hi - lo,
                    quaternion=_yaw_quat(p.yaw),
                )
            )
        return out

    def sample_candidate_poses(
        self, rng: np.random.Generator, how_many: int
    ) -> List[Pose]:
        """Horizontal-approach poses inside random pockets, matching the
        reference's ``random_pose_and_config``
        (cubby_environment.py:505-549): approach axis z = [cosθ, sinθ, 0]
        with θ ~ U(-π/4, π/4) pointing into the open front, finger axis
        x = [0, 0, -1]. (A downward wrist inside an enclosed pocket would
        extend into the shelf above — advisor finding r1.)"""
        poses = []
        for _ in range(how_many):
            lo, hi = self.pockets[rng.integers(len(self.pockets))]
            local = rng.uniform(lo, hi)
            world = _rot_z(self.params.yaw) @ local
            theta = rng.uniform(-np.pi / 4, np.pi / 4)
            z = np.array([np.cos(theta), np.sin(theta), 0.0])
            poses.append(pose_from_xz_axes([0.0, 0.0, -1.0], z, world))
        return poses

    def gen(self, rng: np.random.Generator) -> bool:
        self._invalidate_scene()
        self.params = CubbyParams.random(rng)
        self._build(rng)
        self._invalidate_scene()
        if not self.pockets:
            return False
        candidates = self.gen_candidates(rng, 2)
        if len(candidates) < 2:
            return False
        self.demo_candidates = candidates[:2]
        return True


class MergedCubbyEnvironment(CubbyEnvironment):
    """Cubby with one internal divider removed, merging two pockets
    (cubby_environment.py:660-704)."""

    merge = True
