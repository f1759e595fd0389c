"""Test harness config: force CPU with 8 virtual devices so multi-chip
sharding tests run without TPU hardware (SURVEY.md §4(d))."""

import os

# Must happen before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running (set TD_RUN_SLOW=1 to include)")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("TD_RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow; set TD_RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
