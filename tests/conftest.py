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


# The XLA:CPU backend segfaults nondeterministically in compiles once a
# single process accumulates enough live executables (observed repeatedly
# around test ~135 of the full suite, always inside
# backend_compile_and_load, at varying call sites). Dropping the JAX
# caches every N tests keeps the live-executable volume bounded; the
# recompiles cost ~1-2 min across the suite.
_TEST_COUNT = {"n": 0}


@pytest.fixture(autouse=True)
def _periodic_cache_clear():
    yield
    _TEST_COUNT["n"] += 1
    if _TEST_COUNT["n"] % 30 == 0:
        jax.clear_caches()


def has_n_cpu_devices(n: int) -> bool:
    return jax.device_count() >= n


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running subprocess smokes (bench, eval)")
