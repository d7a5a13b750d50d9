"""Test configuration.

Forces JAX onto a virtual 8-device CPU mesh BEFORE any jax import so that
multi-chip sharding tests (mesh/pjit/shard_map over the chunk axis) run
without TPU hardware, per the driver contract.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib

import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden_dir() -> pathlib.Path:
    return GOLDEN
