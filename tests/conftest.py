"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so that multi-chip
sharding (deepdish_tpu.parallel) is exercised without TPU hardware, per the
project build rules. This must run before jax is imported anywhere.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The JAX_PLATFORMS env var is overridden by the TPU harness in this image,
# so the config flag is the reliable way to pin tests to CPU.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    # pytest-timeout is not installed in this image; register the mark so
    # annotated budgets are documented without unknown-mark warnings.
    config.addinivalue_line(
        "markers",
        "timeout(seconds): intended wall-clock budget (no-op without the "
        "pytest-timeout plugin)")


@pytest.fixture
def rng():
    return np.random.RandomState(0)
