"""Test configuration: force an 8-device virtual CPU mesh so sharding tests run
without TPU hardware (SURVEY.md §4)."""

import os

# Force CPU with 8 virtual devices so the suite is deterministic and sharding
# tests run without TPU hardware. NOTE: this environment's sitecustomize.py
# imports jax at interpreter startup with JAX_PLATFORMS=axon (a tunneled TPU),
# so env vars are too late — override through jax.config, which is honored as
# long as no backend has been initialized yet.
os.environ["JAX_ENABLE_X64"] = "0"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def mesh8():
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices()).reshape(4, 2)
    return Mesh(devs, ("data", "model"))
