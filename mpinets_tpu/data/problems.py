"""Problem-set (.pkl) loading and batching.

The reference evaluates on pickled ``ProblemSet`` dictionaries
(scene_type -> problem_type -> [PlanningProblem]) whose leaves are
``geometrout`` SE3/Cuboid/Cylinder objects and
``mpinets.mpinets_types.PlanningProblem`` dataclasses
(``/root/reference/mpinets/run_inference.py:460-468``). Neither package is
installed here, so :func:`load_problems` installs minimal unpickling shims:
stub classes registered under the original module paths that capture the
pickled ``__dict__`` and expose the handful of attributes the evaluator
needs. Everything is converted to :mod:`mpinets_tpu.types` objects at load
time, and :func:`problems_to_batch` packs a list of problems into padded
device batches for the lockstep rollout engine + evaluator.
"""

from __future__ import annotations

import pickle
import sys
import types as _pytypes
from typing import Dict, List, Sequence, Tuple

import numpy as np

from mpinets_tpu import types as T
from mpinets_tpu.data.synthetic import Problem
from mpinets_tpu.geom.scene import SceneSet, pack_scenes

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Unpickling shims
# ---------------------------------------------------------------------------

class _ShimBase:
    """Captures pickled state; attribute access falls through to the raw
    dict with and without a leading underscore."""

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        if isinstance(state, tuple):  # (dict-state, slots-state)
            merged = {}
            for part in state:
                if part:
                    merged.update(part)
            state = merged
        self.__dict__.update(state or {})

    def _get(self, *names, default=_pytypes.SimpleNamespace):
        for n in names:
            if n in self.__dict__:
                return self.__dict__[n]
            if "_" + n in self.__dict__:
                return self.__dict__["_" + n]
        raise AttributeError(f"{type(self).__name__} has none of {names}: "
                             f"{sorted(self.__dict__)}")


class _ShimQuaternion(_ShimBase):
    """pyquaternion.Quaternion stand-in (geometrout's SO3 stores one)."""

    @property
    def elements(self):
        return np.asarray(self._get("q", "elements", "wxyz"), np.float64).reshape(4)


class _ShimSO3(_ShimBase):
    @property
    def wxyz(self):
        q = self._get("quat", "quaternion", "wxyz", "q")
        q = np.asarray(getattr(q, "elements", q), np.float64).reshape(4)
        return q


class _ShimSE3(_ShimBase):
    @property
    def xyz(self):
        return np.asarray(self._get("xyz", "position", "pos"), np.float64).reshape(3)

    @property
    def so3(self):
        rot = self._get("so3", "rotation", "quat", "quaternion")
        if isinstance(rot, _ShimSO3):
            return rot
        shim = _ShimSO3()
        shim.__dict__["quat"] = rot
        return shim


class _ShimCuboid(_ShimBase):
    pass


class _ShimCylinder(_ShimBase):
    pass


class _ShimSphere(_ShimBase):
    pass


class _ShimPlanningProblem(_ShimBase):
    pass


_SHIM_MODULES = {
    "geometrout": {},
    "geometrout.transform": {"SE3": _ShimSE3, "SO3": _ShimSO3},
    "geometrout.primitive": {
        "Cuboid": _ShimCuboid,
        "Cylinder": _ShimCylinder,
        "Sphere": _ShimSphere,
    },
    "mpinets": {},
    "mpinets.mpinets_types": {"PlanningProblem": _ShimPlanningProblem},
    "pyquaternion": {"Quaternion": _ShimQuaternion},
    "pyquaternion.quaternion": {"Quaternion": _ShimQuaternion},
}


def install_unpickle_shims() -> None:
    """Register stub modules so reference pickles load without geometrout /
    mpinets installed. No-op for modules that are already importable."""
    for name, attrs in _SHIM_MODULES.items():
        if name in sys.modules:
            mod = sys.modules[name]
        else:
            try:
                mod = __import__(name)
                continue  # real package available; leave it alone
            except ImportError:
                mod = _pytypes.ModuleType(name)
                sys.modules[name] = mod
        for attr, cls in attrs.items():
            if not hasattr(mod, attr):
                setattr(mod, attr, cls)


def _pose_of(obj) -> Tuple[np.ndarray, np.ndarray]:
    """(xyz, wxyz) of a shim/real SE3-or-primitive-with-pose."""
    if isinstance(obj, _ShimSE3):
        return obj.xyz, obj.so3.wxyz
    if hasattr(obj, "xyz") and hasattr(obj, "so3"):
        so3 = obj.so3
        q = getattr(so3, "wxyz", None)
        if q is None:
            q = np.asarray(so3._quat.elements)
        return np.asarray(obj.xyz, np.float64), np.asarray(q, np.float64)
    raise TypeError(f"cannot extract a pose from {type(obj)}")


def _primitive_pose(shim: _ShimBase) -> Tuple[np.ndarray, np.ndarray]:
    d = shim.__dict__
    if "pose" in d or "_pose" in d:
        return _pose_of(shim._get("pose"))
    center = np.asarray(shim._get("center", "xyz"), np.float64).reshape(3)
    try:
        quat = np.asarray(shim._get("quaternion", "wxyz", "quat"), np.float64)
    except AttributeError:
        quat = np.array([1.0, 0.0, 0.0, 0.0])
    return center, quat.reshape(4)


def _convert_primitive(obj):
    if isinstance(obj, (T.Cuboid, T.Cylinder, T.Sphere)):
        return obj
    if isinstance(obj, _ShimCuboid):
        center, quat = _primitive_pose(obj)
        return T.Cuboid(center, np.asarray(obj._get("dims"), np.float64), quat)
    if isinstance(obj, _ShimCylinder):
        center, quat = _primitive_pose(obj)
        return T.Cylinder(
            center, float(obj._get("radius")), float(obj._get("height")), quat
        )
    if isinstance(obj, _ShimSphere):
        center, _ = _primitive_pose(obj)
        return T.Sphere(center, float(obj._get("radius")))
    raise TypeError(f"unknown primitive {type(obj)}")


def _convert_problem(obj) -> T.PlanningProblem:
    if isinstance(obj, T.PlanningProblem):
        return obj
    d = obj.__dict__
    xyz, wxyz = _pose_of(d["target"])
    return T.PlanningProblem(
        target=T.Pose(xyz, wxyz),
        target_volume=_convert_primitive(d["target_volume"]),
        q0=np.asarray(d["q0"], np.float64).reshape(-1),
        obstacles=(
            [_convert_primitive(o) for o in d["obstacles"]]
            if d.get("obstacles") is not None
            else None
        ),
        obstacle_point_cloud=d.get("obstacle_point_cloud"),
        target_negative_volumes=[
            _convert_primitive(o) for o in d.get("target_negative_volumes", [])
        ],
    )


def load_problems(path) -> T.ProblemSet:
    """Load a reference problem-set pickle into :mod:`mpinets_tpu.types`
    objects (works with or without geometrout installed)."""
    install_unpickle_shims()
    with open(path, "rb") as f:
        raw = pickle.load(f)
    return {
        scene_type: {
            problem_type: [_convert_problem(p) for p in problems]
            for problem_type, problems in by_type.items()
        }
        for scene_type, by_type in raw.items()
    }


def save_problems(path, problem_set: T.ProblemSet) -> None:
    with open(path, "wb") as f:
        pickle.dump(problem_set, f)


# ---------------------------------------------------------------------------
# Batching for the rollout engine / evaluator
# ---------------------------------------------------------------------------

def _volume_scene(volumes_per_problem: Sequence[Sequence[T.Primitive]],
                  max_cuboids=None, max_cylinders=None) -> SceneSet:
    cuboids, cylinders = [], []
    for vols in volumes_per_problem:
        cubs, cyls = T.split_obstacles(list(vols))
        cuboids.append([T.cuboid_tuple(c) for c in cubs])
        cylinders.append([T.cylinder_tuple(c) for c in cyls])
    return pack_scenes(cuboids, cylinders, max_cuboids, max_cylinders)


def problems_to_batch(
    problems: List[T.PlanningProblem],
) -> Dict[str, object]:
    """Pack problems into padded device batches: the rollout ``Problem``
    plus target/negative volume SceneSets for the evaluator."""
    q0 = np.stack([p.q0 for p in problems]).astype(np.float32)
    target_trans = np.stack([p.target.position for p in problems])
    target_rot = T.quat_to_matrix_np(
        np.stack([p.target.quaternion for p in problems])
    )
    scene = _volume_scene([p.obstacles or [] for p in problems])
    target_volumes = _volume_scene([[p.target_volume] for p in problems])
    negative_volumes = _volume_scene(
        [p.target_negative_volumes for p in problems]
    )
    # Raw-point-cloud problems (the reference's depth mode,
    # run_inference.py:58-134): pack the sensed clouds to one fixed size by
    # resampling with replacement; all problems in a batch must agree on
    # whether they carry a cloud (the reference converts whole sets at once).
    has_pc = [p.obstacle_point_cloud is not None for p in problems]
    obstacle_points = None
    if any(has_pc):
        assert all(has_pc), (
            "mixed primitive/point-cloud problems in one batch; "
            "filter the problem set by mode first"
        )
        rng = np.random.default_rng(0)
        width = max(int(np.asarray(p.obstacle_point_cloud).shape[0])
                    for p in problems)
        packed = np.zeros((len(problems), width, 3), np.float32)
        for i, p in enumerate(problems):
            pc = np.asarray(p.obstacle_point_cloud, np.float32)[:, :3]
            if pc.shape[0] < width:
                extra = rng.integers(0, pc.shape[0], width - pc.shape[0])
                pc = np.concatenate([pc, pc[extra]], axis=0)
            packed[i] = pc
        obstacle_points = jnp.asarray(packed)
    problem = Problem(
        q0=jnp.asarray(q0),
        target_rot=jnp.asarray(target_rot, jnp.float32),
        target_trans=jnp.asarray(target_trans, jnp.float32),
        scene=scene,
        obstacle_points=obstacle_points,
    )
    return {
        "problem": problem,
        "target_volumes": target_volumes,
        "negative_volumes": negative_volumes,
    }
