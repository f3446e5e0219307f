"""Procedural environment generators (the reference's
``mpinets/data_pipeline/environments`` rebuilt host-side-numpy + batched
JAX IK)."""

from mpinets_tpu.envs.base import (  # noqa: F401
    Candidate,
    Environment,
    NeutralCandidate,
    TaskOrientedCandidate,
    pose_from_xz_axes,
    pose_from_z_axis,
    radius_sample,
)
from mpinets_tpu.envs.cubby import CubbyEnvironment, MergedCubbyEnvironment  # noqa: F401
from mpinets_tpu.envs.dresser import DresserEnvironment  # noqa: F401
from mpinets_tpu.envs.tabletop import TabletopEnvironment  # noqa: F401

#: CLI name -> environment class (gen_data.py's scene-type switch,
#: ``gen_data.py:975-1127``).
ENVIRONMENTS = {
    "tabletop": TabletopEnvironment,
    "cubby": CubbyEnvironment,
    "merged-cubby": MergedCubbyEnvironment,
    "dresser": DresserEnvironment,
}
