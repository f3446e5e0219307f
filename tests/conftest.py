"""Test configuration: force an 8-device virtual CPU platform so sharding
logic is exercised without TPU hardware (SURVEY.md §4 test plan).

The ambient environment pins ``JAX_PLATFORMS`` to the TPU tunnel ("axon"),
and a pytest plugin may import jax before this conftest runs, so we both
force the env vars and reconfigure through ``jax.config`` (which works as
long as no backend has been initialized yet)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Keep matmuls in full fp32 on CPU for golden-value comparisons.
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", (
    "unit tests must run on the virtual CPU platform, got "
    f"{jax.devices()[0].platform}; was jax initialized before conftest?"
)
assert len(jax.devices()) == 8, len(jax.devices())

_ = sys  # placate linters
