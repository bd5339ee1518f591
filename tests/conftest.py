"""Test configuration.

Tests run on a virtual 8-device CPU platform so sharding/collective paths are
exercised without TPU hardware (the multi-host simulation tier the reference
lacks; SURVEY.md section 4).
"""

import os

# Force CPU: the ambient environment registers the axon TPU plugin at
# interpreter start (sitecustomize) and exports JAX_PLATFORMS=axon; env vars
# alone don't undo that, so override via jax.config before any computation.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(3)  # seed=3 matches reference cfg/default.yaml:26


def pytest_addoption(parser):
    parser.addoption("--slow", action="store_true", default=False, help="run slow tests")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    skip_slow = pytest.mark.skip(reason="need --slow option to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test")
