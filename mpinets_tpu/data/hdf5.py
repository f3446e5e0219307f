"""HDF5-backed dataset layer for the published MPiNets expert data.

Replaces the reference's torch ``PointCloudBase`` / ``PointCloudInstanceDataset``
/ ``PointCloudTrajectoryDataset`` / ``DataModule``
(``/root/reference/mpinets/data_loader.py:42-527``) with a TPU-first split of
responsibilities:

* **Host** (this module): raw, contiguous HDF5 reads only -- expert
  trajectories ``[N, 50, 7]`` and padded scene primitive arrays, schema of
  ``gen_data.py:734-762``. All-zero padding quaternions are patched to
  identity (``data_loader.py:198-202, 229-230``) and a dummy cylinder is
  injected when the file has none (``data_loader.py:211-218``).
* **Device** (:func:`prepare_train_batch`): everything the reference does on
  CPU dataloader workers -- FK of the goal config for the target pose,
  train-time joint noise sigma clamped to limits
  (``data_loader.py:167-179``), robot/obstacle/target surface sampling, and
  [B, 6272, 4] cloud assembly -- runs as one jitted computation, so the
  input pipeline is a thin ``h5py -> pinned numpy -> device`` stream instead
  of ``os.cpu_count()`` worker processes.

A light background-thread prefetcher overlaps the host reads with device
compute (the ``pin_memory``/worker-pool equivalent).
"""

from __future__ import annotations

import enum
import functools
import queue
import threading
from pathlib import Path
from typing import Dict, Iterator, Optional

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from mpinets_tpu.geom.assembly import PointCloudSizes, assemble_point_cloud
from mpinets_tpu.geom.scene import SceneSet
from mpinets_tpu.kernels import kinematics
from mpinets_tpu.utils.normalization import clamp_to_limits, normalize_franka_joints


class DatasetType(enum.Enum):
    """Split selector (``data_loader.py:42-49``)."""

    TRAIN = 0
    VAL = 1
    TEST = 2


_SPLIT_DIR = {
    DatasetType.TRAIN: "train",
    DatasetType.VAL: "val",
    DatasetType.TEST: "test",
}

SCENE_KEYS = (
    "cuboid_centers",
    "cuboid_dims",
    "cuboid_quats",
    "cylinder_centers",
    "cylinder_radii",
    "cylinder_heights",
    "cylinder_quats",
)


def _patch_quats(quats: np.ndarray) -> np.ndarray:
    """All-zero (padding) quaternions -> identity (``data_loader.py:202``)."""
    bad = np.all(np.isclose(quats, 0.0), axis=-1)
    quats = quats.copy()
    quats[bad, 0] = 1.0
    return quats


def _sorted_gather(dset, idx: np.ndarray) -> np.ndarray:
    """Fancy-index an h5py dataset with arbitrary (possibly repeated,
    unsorted) row indices. h5py requires sorted unique indices; read those
    once and scatter back. In-memory numpy arrays gather directly."""
    if isinstance(dset, np.ndarray):
        return dset[idx]
    uniq, inverse = np.unique(idx, return_inverse=True)
    return np.asarray(dset[uniq.tolist()])[inverse]


class TrajectoryDataset:
    """One split's HDF5 file: ``directory/{train,val,test}/*.hdf5``
    (layout contract of ``data_loader.py:52-67,103-123``)."""

    def __init__(
        self,
        directory,
        trajectory_key: str = "hybrid_solutions",
        dataset_type: DatasetType = DatasetType.TRAIN,
        in_memory: bool = False,
    ):
        split_dir = Path(directory) / _SPLIT_DIR[dataset_type]
        databases = sorted(split_dir.glob("**/*.hdf5"))
        assert len(databases) == 1, (
            f"expected exactly one hdf5 under {split_dir}, found {databases}"
        )
        self.path = databases[0]
        self.trajectory_key = trajectory_key
        self.dataset_type = dataset_type
        self._file: Optional[h5py.File] = None
        self._arrays: Optional[Dict[str, np.ndarray]] = None
        with h5py.File(self.path, "r") as f:
            shape = f[trajectory_key].shape
            self.num_trajectories = int(shape[0])
            self.expert_length = int(shape[1])
            self.has_cylinders = "cylinder_radii" in f.keys()
            self.max_cuboids = int(f["cuboid_dims"].shape[1])
            self.max_cylinders = (
                int(f["cylinder_radii"].shape[1]) if self.has_cylinders else 1
            )
            if in_memory:
                # r5 (VERDICT r4 #4): the h5py random-row gathers were the
                # trainer's end-to-end bottleneck; a 40k-trajectory split is
                # ~130 MB, so cache every array in RAM once.
                self._arrays = {k: np.asarray(f[k]) for k in f.keys()}

    @property
    def file(self):
        """The backing store: a dict of RAM arrays when ``in_memory``, else
        a lazily (per-process) opened h5py file."""
        if self._arrays is not None:
            return self._arrays
        if self._file is None:
            self._file = h5py.File(self.path, "r")
        return self._file

    def __len__(self) -> int:
        return self.num_trajectories

    @property
    def num_instances(self) -> int:
        """(trajectory, timestep) count -- the training dataset length
        (``data_loader.py:385-391``)."""
        return self.num_trajectories * self.expert_length

    def read_scenes(self, traj_idx: np.ndarray) -> Dict[str, np.ndarray]:
        """Padded scene arrays for a batch of trajectory indices, with
        quaternion patching and the dummy-cylinder fallback."""
        f = self.file
        b = len(traj_idx)
        out = {
            "cuboid_centers": _sorted_gather(f["cuboid_centers"], traj_idx),
            "cuboid_dims": _sorted_gather(f["cuboid_dims"], traj_idx),
            "cuboid_quats": _patch_quats(
                _sorted_gather(f["cuboid_quaternions"], traj_idx)
            ),
        }
        if self.has_cylinders:
            radii = _sorted_gather(f["cylinder_radii"], traj_idx)
            heights = _sorted_gather(f["cylinder_heights"], traj_idx)
            if radii.ndim == 2:
                radii = radii[..., None]
                heights = heights[..., None]
            out.update(
                cylinder_centers=_sorted_gather(f["cylinder_centers"], traj_idx),
                cylinder_radii=radii,
                cylinder_heights=heights,
                cylinder_quats=_patch_quats(
                    _sorted_gather(f["cylinder_quaternions"], traj_idx)
                ),
            )
        else:  # data_loader.py:211-218
            out.update(
                cylinder_centers=np.zeros((b, 1, 3), np.float32),
                cylinder_radii=np.zeros((b, 1, 1), np.float32),
                cylinder_heights=np.zeros((b, 1, 1), np.float32),
                cylinder_quats=np.tile(
                    np.array([1.0, 0, 0, 0], np.float32), (b, 1, 1)
                ),
            )
        return {k: np.asarray(v, np.float32) for k, v in out.items()}

    def read_instance_batch(
        self, traj_idx: np.ndarray, timesteps: np.ndarray
    ) -> Dict[str, np.ndarray]:
        """Raw (un-assembled) training instances: configuration at t,
        supervision at min(t+1, T-1) (``data_loader.py:403-416``), goal
        config (for the FK target pose, ``data_loader.py:155-157``), and the
        scene arrays."""
        trajs = _sorted_gather(self.file[self.trajectory_key], traj_idx)
        t_next = np.clip(timesteps + 1, 0, self.expert_length - 1)
        rows = np.arange(len(traj_idx))
        batch = {
            "raw_configuration": trajs[rows, timesteps].astype(np.float32),
            "raw_supervision": trajs[rows, t_next].astype(np.float32),
            "raw_goal": trajs[:, -1].astype(np.float32),
        }
        batch.update(self.read_scenes(traj_idx))
        return batch

    def read_trajectory_batch(self, traj_idx: np.ndarray) -> Dict[str, np.ndarray]:
        """Whole expert trajectories + scenes (validation/eval stream,
        ``PointCloudTrajectoryDataset`` equivalent)."""
        trajs = _sorted_gather(self.file[self.trajectory_key], traj_idx)
        batch = {
            "expert": trajs.astype(np.float32),
            "raw_configuration": trajs[:, 0].astype(np.float32),
            "raw_goal": trajs[:, -1].astype(np.float32),
        }
        batch.update(self.read_scenes(traj_idx))
        return batch


def scene_from_arrays(batch: Dict[str, np.ndarray]) -> SceneSet:
    return SceneSet(*(jnp.asarray(batch[k]) for k in SCENE_KEYS))


@functools.partial(jax.jit, static_argnames=("sizes", "random_scale", "train"))
def prepare_train_batch(
    raw: Dict[str, jnp.ndarray],
    key: jax.Array,
    sizes: PointCloudSizes = PointCloudSizes(),
    random_scale: float = 0.015,
    train: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Device-side per-item construction (``get_inputs``,
    ``data_loader.py:141-280``): goal FK -> target pose; train-time joint
    noise clamped to limits; robot/obstacle/target sampling; [B, N, 4]
    assembly. One fused XLA computation for the whole batch."""
    q_t = raw["raw_configuration"]
    b = q_t.shape[0]
    k_noise, k_cloud = jax.random.split(key)

    rot_goal, trans_goal = kinematics.eff_pose(raw["raw_goal"])

    if train:
        noise = random_scale * jax.random.normal(k_noise, q_t.shape, q_t.dtype)
        q_t = clamp_to_limits(q_t + noise)

    scene = SceneSet(*(raw[k] for k in SCENE_KEYS))
    xyz = jax.vmap(
        lambda k, q, r, tr, s: assemble_point_cloud(k, q, r, tr, s, sizes)
    )(jax.random.split(k_cloud, b), q_t, rot_goal, trans_goal, scene)

    out = {
        "xyz": xyz,
        "configuration": normalize_franka_joints(q_t),
        "target_position": trans_goal,
    }
    if "raw_supervision" in raw:
        out["supervision"] = normalize_franka_joints(raw["raw_supervision"])
    for k in SCENE_KEYS:
        out[k] = raw[k]
    return out


class InstanceLoader:
    # Throughput: the r2 claim of "~24k instances/s host-side, 3x headroom"
    # was measured on a tiny synthetic file whose pages were all cached and
    # did not hold at r4 training scale (660 end-to-end vs 1,126 pure-step
    # samples/s, a 41% tax). r5 attribution (scripts/train_r5.py profile
    # phase, committed in TRAIN_r5.md) measures disk-backed vs in-memory
    # producer rates against the device step rate; pass in_memory=True to
    # TrajectoryDataset to remove the h5py random-gather cost entirely.
    """Shuffled, prefetched stream of raw training-instance batches.

    The reference fans ``get_inputs`` out over ``os.cpu_count()`` worker
    processes (``data_loader.py:490-501``); here the host work is a single
    HDF5 gather per batch, overlapped with device compute by one background
    thread. Drop-last semantics; reshuffles every epoch.
    """

    def __init__(
        self,
        dataset: TrajectoryDataset,
        batch_size: int,
        seed: int = 0,
        prefetch: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.prefetch = prefetch

    def batches_per_epoch(self) -> int:
        return self.dataset.num_instances // self.batch_size

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        rng = np.random.default_rng((self.seed, epoch))
        return rng.permutation(self.dataset.num_instances)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            epoch = 0
            while not stop.is_set():
                order = self._epoch_indices(epoch)
                n = self.batches_per_epoch() * self.batch_size
                for lo in range(0, n, self.batch_size):
                    if stop.is_set():
                        return
                    idx = order[lo : lo + self.batch_size]
                    traj_idx, t = np.divmod(idx, self.dataset.expert_length)
                    q.put(self.dataset.read_instance_batch(traj_idx, t))
                epoch += 1

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                yield q.get()
        finally:
            stop.set()
            # Unblock the producer if it's waiting on a full queue.
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass


def trajectory_batches(
    dataset: TrajectoryDataset, batch_size: int
) -> Iterator[Dict[str, np.ndarray]]:
    """Sequential full-trajectory batches (validation stream). The last
    ragged batch is padded by repeating the final row; consumers can trim
    with the returned ``valid`` mask."""
    n = dataset.num_trajectories
    for lo in range(0, n, batch_size):
        idx = np.arange(lo, min(lo + batch_size, n))
        valid = np.ones(batch_size, bool)
        if len(idx) < batch_size:
            valid[len(idx):] = False
            idx = np.concatenate([idx, np.full(batch_size - len(idx), idx[-1])])
        batch = dataset.read_trajectory_batch(idx)
        batch["valid"] = valid
        yield batch
