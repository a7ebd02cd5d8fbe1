"""Importing the package must never initialize a jax backend.

A module-level jnp constant once triggered backend initialization at
import time — before the CLI's --device/--disable-edgetpu override could
run — which deadlocked the whole CLI when the shared accelerator tunnel
wedged (tracker/matching.py, pipeline/main.py). Pin the invariant by
importing every entry-point module under a platform that CANNOT
initialize: the import must succeed, and only actual array work may
fail."""
import subprocess
import sys

import pytest


@pytest.mark.timeout(300)
def test_import_does_not_initialize_backend():
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'no_such_platform')\n"
        "import deepdish_tpu\n"
        "import deepdish_tpu.pipeline.main\n"
        "import deepdish_tpu.pipeline.runtime\n"
        "import deepdish_tpu.models.registry\n"
        "import deepdish_tpu.models.qgraph\n"
        "import deepdish_tpu.tracker\n"
        "import deepdish_tpu.parallel\n"
        "print('imports ok')\n"
        "import jax.numpy as jnp\n"
        "try:\n"
        "    jnp.zeros(3)\n"
        "    print('unexpected: backend initialized')\n"
        "except RuntimeError:\n"
        "    print('backend untouched')\n")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=240, cwd="/root/repo")
    assert "imports ok" in r.stdout, r.stderr[-2000:]
    assert "backend untouched" in r.stdout, r.stdout + r.stderr[-500:]
