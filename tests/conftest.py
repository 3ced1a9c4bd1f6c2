"""Test configuration.

Forces the CPU backend with 8 virtual devices BEFORE jax initializes, so
multi-chip sharding is exercised on a simulated mesh (the TPU-native
equivalent of testing multi-node without a cluster — SURVEY.md §4).  The
axon TPU plugin is disabled by clearing PALLAS_AXON_POOL_IPS (its
sitecustomize only registers when that is set).

Tests marked @pytest.mark.tpu are skipped here; they run on real hardware
via bench.py / run_scripts.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    import jax
    on_tpu = jax.default_backend() == "tpu"
    skip = pytest.mark.skip(reason="requires real TPU")
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip)
