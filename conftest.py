"""Pytest root conftest.

Tests run on a virtual 8-device CPU mesh so that multi-chip sharding code
paths (``shard_map`` over a ``jax.sharding.Mesh``) are exercised without TPU
hardware, and so tiny unit tests don't pay remote-TPU compile latency.

The ambient environment may pre-register a TPU platform plugin that forces
``jax_platforms``, so we override the config *after* importing jax rather
than relying on the JAX_PLATFORMS env var.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


collect_ignore_glob = []


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy interpret-mode kernel / long training-loop tests, "
        "skipped unless TRLQAS_SLOW_TESTS=1 (the fast default tier keeps "
        "one representative per subsystem)")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("TRLQAS_SLOW_TESTS"):
        return
    import pytest

    skip = pytest.mark.skip(reason="slow tier: set TRLQAS_SLOW_TESTS=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
