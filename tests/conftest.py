"""Test config: force the CPU backend with 8 virtual devices so numerics and
sharding tests run without TPU hardware (and without the axon TPU tunnel,
which the sandbox's sitecustomize pins via jax_platforms="axon,cpu"), and
expose the reference repo for parity tests."""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# sitecustomize may have already set jax_platforms="axon,cpu"; override before
# any backend is initialized so tests run CPU-only with 8 virtual devices.
jax.config.update("jax_platforms", "cpu")

REFERENCE_PATH = "/root/reference"
if os.path.isdir(REFERENCE_PATH) and REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "parity: compares against the PyTorch reference implementation"
    )
    config.addinivalue_line("markers", "slow: long-running test")
