"""Test harness config: force CPU with 8 virtual devices so multi-chip
sharding tests run without TPU hardware (SURVEY.md §4(d)).

Note: this environment's sitecustomize imports jax (axon TPU plugin) before
conftest runs, so env vars alone are too late — we must override via
jax.config.update before any backend is initialized.
"""

import os

# XLA flags are read at backend init (lazy), so setting them here still works.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: XLA compiles dominate test cost on this box.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/td_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running (set TD_RUN_SLOW=1 to include)")
    config.addinivalue_line(
        "markers",
        "core: fast cross-tier subset (`pytest -m core`, measured ~8.5 min "
        "on a 1-core box, cold == warm) — ops, data, one family per head "
        "type, engine, parallel",
    )


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
