"""Round-trip tests for the dataset post-processing tools
(mpinets_tpu.data.process vs reference process_data.py:32-417)."""

import h5py
import numpy as np
import pytest

from mpinets_tpu.data import process, writer


def _make_file(tmp_path, name, n, mc, my, seed, zero_hybrid_rows=()):
    rng = np.random.default_rng(seed)
    hybrid = rng.normal(size=(n, 50, 7))
    for r in zero_hybrid_rows:
        hybrid[r] = 0.0
    arrays = {
        "global_solutions": rng.normal(size=(n, 50, 7)),
        "hybrid_solutions": hybrid,
        "cuboid_dims": rng.uniform(size=(n, mc, 3)),
        "cuboid_centers": rng.uniform(size=(n, mc, 3)),
        "cuboid_quats": rng.uniform(size=(n, mc, 4)),
        "cylinder_radii": rng.uniform(size=(n, my, 1)),
        "cylinder_heights": rng.uniform(size=(n, my, 1)),
        "cylinder_centers": rng.uniform(size=(n, my, 3)),
        "cylinder_quats": rng.uniform(size=(n, my, 4)),
    }
    path = tmp_path / name
    writer.write_dataset(path, arrays)
    return path, arrays


def test_merge_files_pads_to_max(tmp_path):
    p1, a1 = _make_file(tmp_path, "a.hdf5", 5, 3, 2, 0)
    p2, a2 = _make_file(tmp_path, "b.hdf5", 7, 6, 4, 1)
    out = tmp_path / "merged.hdf5"
    n = process.merge_files([p1, p2], out)
    assert n == 12
    with h5py.File(out, "r") as f:
        assert f["cuboid_centers"].shape == (12, 6, 3)
        assert f["cylinder_radii"].shape == (12, 4, 1)
        # first file's rows are zero-padded on the primitive axis
        np.testing.assert_allclose(
            f["cuboid_centers"][:5, :3], a1["cuboid_centers"]
        )
        assert np.all(f["cuboid_centers"][:5, 3:] == 0.0)
        np.testing.assert_allclose(
            f["hybrid_solutions"][5:], a2["hybrid_solutions"]
        )


def test_extract_hybrid_filters_zero_rows(tmp_path):
    p, a = _make_file(tmp_path, "a.hdf5", 8, 2, 2, 2, zero_hybrid_rows=(1, 4))
    out = tmp_path / "hybrid.hdf5"
    n = process.extract_hybrid(p, out)
    assert n == 6
    keep = [0, 2, 3, 5, 6, 7]
    with h5py.File(out, "r") as f:
        np.testing.assert_allclose(
            f["hybrid_solutions"][:], a["hybrid_solutions"][keep]
        )
        np.testing.assert_allclose(
            f["global_solutions"][:], a["global_solutions"][keep]
        )


def test_downsize_split_and_merge_scenes(tmp_path):
    p, _ = _make_file(tmp_path, "a.hdf5", 20, 2, 2, 3)
    scene_a = tmp_path / "scenes" / "tabletop"
    process.downsize_and_split(p, scene_a, 6, 2, 3, seed=0)
    p2, _ = _make_file(tmp_path, "b.hdf5", 15, 4, 1, 4)
    scene_b = tmp_path / "scenes" / "cubby"
    process.downsize_and_split(p2, scene_b, 5, 1, 2, seed=1)

    for scene, sizes in ((scene_a, (6, 2, 3)), (scene_b, (5, 1, 2))):
        for split, size in zip(("train", "val", "test"), sizes):
            with h5py.File(scene / split / f"{split}.hdf5", "r") as f:
                assert f["global_solutions"].shape[0] == size

    final = tmp_path / "final"
    process.merge_scenes(tmp_path / "scenes", final)
    with h5py.File(final / "train" / "train.hdf5", "r") as f:
        assert f["global_solutions"].shape[0] == 11
        assert f["cuboid_centers"].shape[1] == 4  # max-padded
    # merged output is loadable by the training reader
    from mpinets_tpu.data.hdf5 import TrajectoryDataset

    tf = TrajectoryDataset(final)  # resolves final/train/train.hdf5
    assert len(tf) == 11
    batch = tf.read_trajectory_batch(np.array([0, 5, 10]))
    assert batch["expert"].shape == (3, 50, 7)


def test_splits_are_disjoint(tmp_path):
    p, a = _make_file(tmp_path, "a.hdf5", 30, 2, 2, 5)
    out = tmp_path / "split"
    process.downsize_and_split(p, out, 10, 5, 5, seed=7)
    rows = []
    for split in ("train", "val", "test"):
        with h5py.File(out / split / f"{split}.hdf5", "r") as f:
            rows.append(f["global_solutions"][:])
    allrows = np.concatenate(rows).reshape(20, -1)
    # all rows distinct (no index reused across splits)
    assert len(np.unique(allrows, axis=0)) == 20
