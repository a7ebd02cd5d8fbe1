"""Regression tests for the driver entry points in __graft_entry__.py.

The round-1 driver dryrun failed (MULTICHIP_r01.json rc=1) because the
function inherited the axon TPU platform whose libtpu version mismatched.
dryrun_multichip must therefore force a CPU backend itself; we verify that
in a FRESH subprocess that does NOT pre-pin the platform the way
tests/conftest.py does.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("n", [8])
def test_dryrun_multichip_subprocess(n):
    env = dict(os.environ)
    # Simulate the driver environment: no CPU pinning from the outside.
    env.pop("XLA_FLAGS", None)
    code = f"import __graft_entry__; __graft_entry__.dryrun_multichip({n})"
    res = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "dryrun_multichip OK" in res.stdout
