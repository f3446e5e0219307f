"""HDF5 dataset writing in the reference's exact schema.

Schema contract (``/root/reference/mpinets/data_pipeline/gen_data.py:734-762``):
keys ``hybrid_solutions`` / ``global_solutions`` ``[N, 50, 7]``,
``cuboid_dims/centers/quaternions`` ``[N, Mc, 3|3|4]``,
``cylinder_radii/heights/centers/quaternions`` ``[N, My, 1|1|3|4]``; padding
rows are all-zero (zero-volume primitives, all-zero quaternions). Failed
hybrid solutions are stored as all-zero trajectories
(``gen_data.py:688-691``).

Used for test fixtures, for materializing synthetic pseudo-expert datasets
(:func:`write_synthetic_dataset`), and by the post-processing tools
(:mod:`mpinets_tpu.data.process`).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import h5py
import jax
import numpy as np

SEQUENCE_LENGTH = 50  # gen_data.py:77

#: our-loader key -> on-disk key (the reference stores quats as *_quaternions)
DISK_KEYS = {
    "cuboid_dims": "cuboid_dims",
    "cuboid_centers": "cuboid_centers",
    "cuboid_quats": "cuboid_quaternions",
    "cylinder_radii": "cylinder_radii",
    "cylinder_heights": "cylinder_heights",
    "cylinder_centers": "cylinder_centers",
    "cylinder_quats": "cylinder_quaternions",
}


def write_dataset(path, arrays: Dict[str, np.ndarray], mode: str = "w") -> None:
    """Write a dict of schema arrays (our key names) to ``path``."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with h5py.File(path, mode) as f:
        for key, value in arrays.items():
            f.create_dataset(DISK_KEYS.get(key, key), data=np.asarray(value))


def write_synthetic_dataset(
    directory,
    split: str = "train",
    num_trajectories: int = 32,
    seed: int = 0,
    filename: Optional[str] = None,
) -> Path:
    """Materialize a schema-compatible pseudo-expert dataset under
    ``directory/{split}/`` using the synthetic scene/trajectory generator
    (:mod:`mpinets_tpu.data.synthetic`). Stand-in for the published Zenodo
    tarball in environments without it."""
    import jax.numpy as jnp

    from mpinets_tpu.data import synthetic

    key = jax.random.PRNGKey(seed)
    problems = synthetic.random_problem_batch(key, num_trajectories)
    k_goal = jax.random.fold_in(key, 1)
    goals = synthetic.random_configuration(k_goal, (num_trajectories,))
    trajs = synthetic.min_jerk_trajectory(problems.q0, goals)
    trajs = np.asarray(trajs, np.float64)

    scene = problems.scene
    arrays = {
        "hybrid_solutions": trajs,
        "global_solutions": trajs,
        "cuboid_dims": np.asarray(scene.cuboid_dims),
        "cuboid_centers": np.asarray(scene.cuboid_centers),
        "cuboid_quats": np.asarray(scene.cuboid_quats),
        "cylinder_radii": np.asarray(scene.cylinder_radii),
        "cylinder_heights": np.asarray(scene.cylinder_heights),
        "cylinder_centers": np.asarray(scene.cylinder_centers),
        "cylinder_quats": np.asarray(scene.cylinder_quats),
    }
    # The reference stores padding quats as all-zero; exercise the loader's
    # patching by zeroing them here.
    pad = np.all(arrays["cuboid_dims"] == 0.0, axis=-1)
    arrays["cuboid_quats"] = np.where(
        pad[..., None], 0.0, arrays["cuboid_quats"]
    )
    out = Path(directory) / split / (filename or f"{split}.hdf5")
    write_dataset(out, arrays)
    return out
