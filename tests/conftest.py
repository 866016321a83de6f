"""Test config: force an 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the TPU-world answer to "test multi-node
without a cluster" — see SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-updates jax_platforms to
# "axon,cpu" at interpreter start; put it back to cpu-only for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
