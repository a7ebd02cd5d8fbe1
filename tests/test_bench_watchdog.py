"""bench.py device-discovery watchdog: the shared accelerator pool can
wedge for hours with jax.devices() never returning; the driver's bench
invocation must fail informatively instead of hanging."""
import json
import subprocess
import sys

import pytest


def _run(argv_extra, body):
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import sys, time\n"
        "sys.path.insert(0, '/root/repo')\n"
        f"sys.argv += {argv_extra!r}\n"
        "import bench\n" + body)
    return subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=60)


@pytest.mark.timeout(120)
def test_watchdog_fires_with_mode_specific_metric():
    r = _run(["--streams", "16"],
             "bench._device_init_watchdog(timeout_s=0.5)\n"
             "time.sleep(20)\n")
    assert r.returncode == 3
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][0]
    d = json.loads(line)
    assert d["value"] == 0.0 and "wedged" in d["error"]
    assert "multi-stream" in d["metric"] and "UNMEASURED" in d["metric"]


@pytest.mark.timeout(120)
def test_watchdog_disarmed_after_discovery():
    r = _run([],
             "done = bench._device_init_watchdog(timeout_s=0.5)\n"
             "import jax; jax.devices()\n"
             "done.set()\n"
             "time.sleep(1.0)\n"
             "print('alive')\n")
    assert r.returncode == 0
    assert "alive" in r.stdout
    assert "UNMEASURED" not in r.stdout
