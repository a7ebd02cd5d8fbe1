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
    # pytest-timeout is not installed in this image; the SIGALRM hook below
    # enforces the annotated budgets instead (main-thread-only, best effort:
    # a test stuck inside a C extension is interrupted on its next return to
    # Python, which still unblocks the suite for everything but a hard hang).
    config.addinivalue_line(
        "markers",
        "timeout(seconds): wall-clock budget, enforced via SIGALRM")


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_call(item):
    import signal
    import threading

    mark = item.get_closest_marker("timeout")
    seconds = int(mark.args[0]) if mark and mark.args else 0
    active = (seconds > 0
              and threading.current_thread() is threading.main_thread())
    if active:
        def on_alarm(signum, frame):
            raise TimeoutError(
                f"test exceeded its timeout({seconds}) budget")
        prev = signal.signal(signal.SIGALRM, on_alarm)
        signal.alarm(seconds)
    try:
        yield
    finally:
        if active:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, prev)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
