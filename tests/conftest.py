"""Test configuration: run everything on a virtual 8-device CPU backend.

The XLA device-count flag must be set before jax initializes its backends.
The sandbox's axon TPU plugin force-selects its own platform via
``jax.config``, so we must also override ``jax_platforms`` through the config
API (the env var alone is not enough).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def has_n_cpu_devices(n: int) -> bool:
    return jax.device_count() >= n


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running subprocess smokes (bench, eval)")
