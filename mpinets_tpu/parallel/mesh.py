"""Device-mesh construction and multi-host initialization.

The reference's only distribution mechanism is NCCL DDP via PyTorch
Lightning (``/root/reference/mpinets/run_training.py:71-77``). The
TPU-native equivalent is a named :class:`jax.sharding.Mesh` whose axes carry
the batch (data) dimension; gradients ride ICI collectives inserted by XLA
(``psum``/``pmean`` under ``shard_map``), and multi-host slices join through
``jax.distributed`` over DCN (SURVEY.md §2.3, §5 "Distributed communication
backend").

The model is ~20 M parameters with a fixed 6272-point input set, so data
parallelism is the only sharding the workload needs (SURVEY.md §2.3 item 4:
TP/PP/SP/EP are structurally absent in the reference and unnecessary here);
these helpers still expose a general mesh so larger variants can add axes.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def multihost_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join a multi-host TPU slice via ``jax.distributed`` (DCN rendezvous).

    No-op when the environment provides no coordinator (single-host runs,
    unit tests). Mirrors the role of Lightning's DDP process-group init
    (``run_training.py:74-77``) without any torch/NCCL machinery.
    """
    addr = coordinator_address or os.environ.get("MPINETS_COORDINATOR")
    if addr is None and num_processes is None:
        return
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = (DATA_AXIS,),
    axis_sizes: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first ``n_devices`` global devices.

    With the default single ``data`` axis this is the production DP layout;
    pass multiple ``axis_names``/``axis_sizes`` to reshape the same devices
    into e.g. ``("replica", "data")`` for per-host replica groups.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
        if len(devices) != n_devices:
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} available"
            )
    if axis_sizes is None:
        axis_sizes = (len(devices),) if len(axis_names) == 1 else None
    if axis_sizes is None:
        raise ValueError("axis_sizes required for multi-axis meshes")
    grid = np.asarray(devices).reshape(tuple(axis_sizes))
    return Mesh(grid, tuple(axis_names))


def data_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Sharding that splits the leading (batch) dimension across ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, k: int) -> int:
    """Smallest multiple of ``k`` >= ``n`` (for padding batches to shard
    evenly; padded tail entries are masked out by consumers)."""
    return ((n + k - 1) // k) * k


def shard_leading_axis(tree, mesh: Mesh, axis: str = DATA_AXIS):
    """Device-put every array in a pytree with its leading axis sharded."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def process_local_slice(n_global: int) -> slice:
    """The half-open [start, stop) range of a length-``n_global`` global
    batch owned by this host (contiguous block partitioning), for building
    per-host input pipelines under multi-host data parallelism."""
    per = n_global // jax.process_count()
    if per * jax.process_count() != n_global:
        raise ValueError(
            f"global batch {n_global} not divisible by {jax.process_count()} hosts"
        )
    start = per * jax.process_index()
    return slice(start, start + per)
