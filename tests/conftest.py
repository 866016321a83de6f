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


# ---------------------------------------------------------------------------
# Test tiers: `pytest -q` runs the fast tier (measured 14m12s on an
# otherwise-idle host CPU, 2026-08-19; scripts/test_shard.sh runs it
# per-file in parallel in ~4 min);
# `pytest --full` (or TFMQ_FULL_TESTS=1) adds the slow e2e tier.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--full", action="store_true", default=False,
        help="also run tests marked slow (heavy e2e: full calibration "
             "pipelines, CLI subprocesses)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy e2e tier, opt in with --full or "
                   "TFMQ_FULL_TESTS=1")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--full") or os.environ.get("TFMQ_FULL_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="slow tier (run with --full / TFMQ_FULL_TESTS=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
