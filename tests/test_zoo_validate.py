"""tools/zoo_validate.py — the real-zoo validation harness (VERDICT r3
next #3). The environment ships no pre-trained zoo weights
(/root/reference/.MISSING_LARGE_BLOBS), so CI proves the harness itself on
the in-test artifact built with the real tf.lite converter; pointing it at
a real downloaded file is then zero-effort:

    python tools/zoo_validate.py detectors/coco/detect.tflite

Set DEEPDISH_ZOO_ARTIFACT=/path/to/real.tflite to run the battery against
a real artifact in CI (skipped when unset).
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=2400):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "zoo_validate.py"),
         *args], capture_output=True, text=True, timeout=timeout, cwd=REPO)


def _json_line(stdout):
    for line in reversed(stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError(f"no JSON verdict in output:\n{stdout[-2000:]}")


@pytest.mark.timeout(2400)
def test_battery_on_in_test_ssd_artifact(tmp_path):
    pytest.importorskip("tensorflow")
    from test_pipeline_real_tflite import _make_full_ssd_tflite
    art = _make_full_ssd_tflite(tmp_path, full_int8=True)
    r = _run([str(art), "--skip-drive"])
    verdict = _json_line(r.stdout)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-1000:]
    assert verdict["ok"] is True
    steps = verdict["steps"]
    assert steps["parse"] == "PASS"
    assert steps["convert"] == "PASS"
    assert steps["integer"] == "PASS"      # byte-exact vs BUILTIN_REF
    assert steps["detect"] in ("PASS", "SKIP")


def test_missing_artifact_is_an_error():
    r = _run(["/nonexistent/detect.tflite"], timeout=300)
    assert r.returncode == 2


@pytest.mark.timeout(3600)
@pytest.mark.skipif(not os.environ.get("DEEPDISH_ZOO_ARTIFACT"),
                    reason="set DEEPDISH_ZOO_ARTIFACT to validate a real "
                           "downloaded zoo file")
def test_battery_on_real_artifact():
    r = _run([os.environ["DEEPDISH_ZOO_ARTIFACT"]])
    verdict = _json_line(r.stdout)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-1000:]
    assert verdict["ok"] is True
