"""Test configuration.

Forces JAX onto a virtual 8-device CPU mesh BEFORE any jax import so that
multi-chip sharding tests (mesh/pjit/shard_map over the chunk axis) run
without TPU hardware, per the driver contract.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()


def _force_cpu_jax():
    """Env alone is not enough on axon-tunneled machines: the site hook
    calls jax.config.update('jax_platforms', 'axon,cpu') at registration.
    Re-update after import so tests run on the virtual CPU mesh."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    return jax


import pathlib

import pytest


@pytest.fixture(scope="session")
def cpu_jax():
    return _force_cpu_jax()

GOLDEN = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden_dir() -> pathlib.Path:
    return GOLDEN
