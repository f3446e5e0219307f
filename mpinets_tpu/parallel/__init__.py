"""Mesh/sharding layer: DP learner sharding, sharded rollout actors, and
multi-host bring-up (the TPU-native replacement for the reference's
Lightning/NCCL DDP, ``/root/reference/mpinets/run_training.py:71-77``)."""

from mpinets_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    data_sharding,
    make_mesh,
    multihost_init,
    pad_to_multiple,
    process_local_slice,
    replicated_sharding,
    shard_leading_axis,
)
from mpinets_tpu.parallel.rollout import (  # noqa: F401
    make_sharded_rollout,
    make_sharded_success_stats,
)
