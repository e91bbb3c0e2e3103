"""Test configuration: force an 8-device virtual CPU mesh so sharding tests run
without TPU hardware (SURVEY.md §4)."""

import os

# Must be set before jax is imported anywhere. Force CPU so the suite is
# deterministic and the 8-virtual-device mesh works without TPU hardware.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def mesh8():
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices()).reshape(4, 2)
    return Mesh(devs, ("data", "model"))
