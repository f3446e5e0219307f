"""Data layer tests: HDF5 schema roundtrip, device-side batch prep, the
instance/trajectory streams, and problem-set pickles (incl. the geometrout
unpickling shims)."""

import pickle
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpinets_tpu import types as T
from mpinets_tpu.data import hdf5, problems, writer
from mpinets_tpu.geom.assembly import PointCloudSizes

TINY = PointCloudSizes(robot=64, obstacle=96, target=32)


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    writer.write_synthetic_dataset(root, "train", num_trajectories=6, seed=0)
    writer.write_synthetic_dataset(root, "val", num_trajectories=5, seed=1)
    return root


def test_dataset_shapes_and_quat_patching(dataset_dir):
    ds = hdf5.TrajectoryDataset(dataset_dir, "hybrid_solutions", hdf5.DatasetType.TRAIN)
    assert ds.num_trajectories == 6
    assert ds.expert_length == 50
    assert ds.num_instances == 300
    scenes = ds.read_scenes(np.array([0, 3, 3]))
    # repeated + unsorted indices must work
    np.testing.assert_array_equal(scenes["cuboid_dims"][1], scenes["cuboid_dims"][2])
    # all-zero padding quats were patched to identity
    norms = np.linalg.norm(scenes["cuboid_quats"], axis=-1)
    assert (norms > 0.99).all()


def test_prepare_train_batch_and_step(dataset_dir):
    from mpinets_tpu.model.policy import MotionPolicyNetwork
    from mpinets_tpu.train import learner

    ds = hdf5.TrajectoryDataset(dataset_dir, "hybrid_solutions", hdf5.DatasetType.TRAIN)
    raw = ds.read_instance_batch(np.array([0, 1, 2]), np.array([0, 10, 49]))
    batch = jax.device_get(
        hdf5.prepare_train_batch(
            {k: jnp.asarray(v) for k, v in raw.items()},
            jax.random.PRNGKey(0),
            sizes=TINY,
        )
    )
    assert batch["xyz"].shape == (3, TINY.total, 4)
    assert batch["configuration"].shape == (3, 7)
    assert batch["supervision"].shape == (3, 7)
    assert np.abs(batch["configuration"]).max() <= 1.0
    # t=49 supervision clips to the final config (data_loader.py:403-416).
    q49_norm = batch["supervision"][2]
    assert np.isfinite(q49_norm).all()
    labels = batch["xyz"][..., 3]
    assert set(np.unique(labels)) == {0.0, 1.0, 2.0}

    model = MotionPolicyNetwork(
        sa_npoints=(16, 8), sa_nsamples=(8, 8), sa_radii=(0.05, 0.3)
    )
    state = learner.init_state(model, jax.random.PRNGKey(0), batch)
    step = learner.make_train_step(model)
    state, metrics = step(state, batch)
    assert np.isfinite(jax.device_get(metrics["val_loss"]))


def test_instance_loader_stream(dataset_dir):
    ds = hdf5.TrajectoryDataset(dataset_dir, "hybrid_solutions", hdf5.DatasetType.TRAIN)
    loader = hdf5.InstanceLoader(ds, batch_size=8, seed=0)
    it = iter(loader)
    batches = [next(it) for _ in range(3)]
    for b in batches:
        assert b["raw_configuration"].shape == (8, 7)
        assert b["cuboid_dims"].ndim == 3
    # Shuffled: two consecutive batches shouldn't be identical.
    assert not np.array_equal(
        batches[0]["raw_configuration"], batches[1]["raw_configuration"]
    )


def test_trajectory_batches_padding(dataset_dir):
    ds = hdf5.TrajectoryDataset(dataset_dir, "hybrid_solutions", hdf5.DatasetType.VAL)
    out = list(hdf5.trajectory_batches(ds, batch_size=3))
    assert len(out) == 2
    assert out[0]["valid"].all()
    assert out[1]["valid"].tolist() == [True, True, False]
    assert out[1]["expert"].shape == (3, 50, 7)


def _fake_geometrout_problem_pickle():
    """Pickle a ProblemSet using stand-in geometrout/mpinets/pyquaternion
    modules that mimic the real attribute layouts, then unload them so
    load_problems must rely on the shims."""
    import types as pytypes

    mods = {}
    for name in [
        "geometrout", "geometrout.transform", "geometrout.primitive",
        "mpinets", "mpinets.mpinets_types", "pyquaternion",
        "pyquaternion.quaternion",
    ]:
        mods[name] = pytypes.ModuleType(name)

    def make(name, module, attrs):
        cls = type(name, (), {})
        cls.__module__ = module
        setattr(mods[module], name, cls)
        return cls

    Quaternion = make("Quaternion", "pyquaternion.quaternion", {})
    SO3 = make("SO3", "geometrout.transform", {})
    SE3 = make("SE3", "geometrout.transform", {})
    Cuboid = make("Cuboid", "geometrout.primitive", {})
    Cylinder = make("Cylinder", "geometrout.primitive", {})
    PP = make("PlanningProblem", "mpinets.mpinets_types", {})
    mods["pyquaternion"].Quaternion = Quaternion

    def quat(w, x, y, z):
        q = Quaternion.__new__(Quaternion)
        q.__dict__["q"] = np.array([w, x, y, z], np.float64)
        return q

    def se3(xyz, wxyz):
        rot = SO3.__new__(SO3)
        rot.__dict__["_quat"] = quat(*wxyz)
        pose = SE3.__new__(SE3)
        pose.__dict__.update(_xyz=np.asarray(xyz, np.float64), _so3=rot)
        return pose

    def cuboid(center, dims, wxyz):
        c = Cuboid.__new__(Cuboid)
        c.__dict__.update(_pose=se3(center, wxyz), _dims=np.asarray(dims, np.float64))
        return c

    def cylinder(center, radius, height, wxyz):
        c = Cylinder.__new__(Cylinder)
        c.__dict__.update(
            _pose=se3(center, wxyz), _radius=radius, _height=height
        )
        return c

    prob = PP.__new__(PP)
    prob.__dict__.update(
        target=se3([0.5, 0.1, 0.4], [1, 0, 0, 0]),
        target_volume=cuboid([0.5, 0.1, 0.4], [0.2, 0.2, 0.2], [1, 0, 0, 0]),
        q0=np.zeros(7),
        obstacles=[
            cuboid([0.6, 0, 0.2], [0.3, 0.3, 0.1], [1, 0, 0, 0]),
            cylinder([0.2, 0.4, 0.3], 0.05, 0.2, [1, 0, 0, 0]),
        ],
        obstacle_point_cloud=None,
        target_negative_volumes=[],
    )
    problem_set = {"tabletop": {"task-oriented": [prob]}}

    saved = {}
    for name, mod in mods.items():
        saved[name] = sys.modules.get(name)
        sys.modules[name] = mod
    try:
        data = pickle.dumps(problem_set)
    finally:
        for name, orig in saved.items():
            if orig is None:
                del sys.modules[name]
            else:
                sys.modules[name] = orig
    return data


def test_load_problems_via_shims(tmp_path):
    path = tmp_path / "problems.pkl"
    path.write_bytes(_fake_geometrout_problem_pickle())
    ps = problems.load_problems(path)
    probs = ps["tabletop"]["task-oriented"]
    assert len(probs) == 1
    p = probs[0]
    assert isinstance(p, T.PlanningProblem)
    np.testing.assert_allclose(p.target.position, [0.5, 0.1, 0.4])
    assert isinstance(p.target_volume, T.Cuboid)
    assert len(p.obstacles) == 2
    assert isinstance(p.obstacles[1], T.Cylinder)
    assert p.obstacles[1].radius == pytest.approx(0.05)


def test_problems_to_batch(tmp_path):
    p = T.PlanningProblem(
        target=T.Pose([0.5, 0.1, 0.4], [1, 0, 0, 0]),
        target_volume=T.Cuboid([0.5, 0.1, 0.4], [0.2, 0.2, 0.2], [1, 0, 0, 0]),
        q0=np.zeros(7),
        obstacles=[T.Cuboid([0.6, 0, 0.2], [0.3, 0.3, 0.1], [1, 0, 0, 0])],
    )
    path = tmp_path / "native.pkl"
    problems.save_problems(path, {"s": {"t": [p, p]}})
    ps = problems.load_problems(path)
    batch = problems.problems_to_batch(ps["s"]["t"])
    prob = batch["problem"]
    assert prob.q0.shape == (2, 7)
    assert prob.target_rot.shape == (2, 3, 3)
    # padded sizes are bucketed to multiples of 8 (shared jit shapes)
    assert batch["target_volumes"].cuboid_dims.shape == (2, 8, 3)
