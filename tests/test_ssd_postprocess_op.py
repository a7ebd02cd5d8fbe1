"""Real-zoo-layout flatbuffer ingestion: TFLITE_DETECTION_POST_PROCESS.

The artifacts the reference actually runs — detectors/coco/detect.tflite
(mobilenet1-demo.sh, consumed at tools/ssd_mobilenet.py:100-127) and
EfficientDet-Lite0 (tools/tflite_object_detector.py:154-172) — end in this
fused custom op carrying the anchor table and NMS parameters. Here the
in-test SSD flatbuffer is exported WITH the op (pp_builder appends it the
way the TF-OD export tooling does), then:

  * read_tflite_postprocess extracts anchors + flexbuffer options,
  * generate_anchors() is cross-checked against the embedded table,
  * structural conversion still completes strictly,
  * our native decode (embedded anchors + scales) reproduces every box
    the interpreter's op kernel emits,
  * the CLI drives the file end-to-end.
"""
import asyncio
import contextlib
import io
import os

import cv2
import numpy as np
import pytest

from deepdish_tpu.models import convert as cv_mod
from test_pipeline_real_tflite import _make_full_ssd_tflite

NCLASS = 91          # score columns (90 classes + background)


def _tf():
    return pytest.importorskip("tensorflow")


@pytest.fixture(scope="module")
def pp_tflite(tmp_path_factory):
    return _make_full_ssd_tflite(tmp_path_factory.mktemp("sspp"),
                                 postprocess=True)


def test_postprocess_op_parsed(pp_tflite):
    from deepdish_tpu.models.ssd_mobilenet import generate_anchors
    pp = cv_mod.read_tflite_postprocess(pp_tflite)
    assert pp is not None
    np.testing.assert_allclose(pp.anchors, generate_anchors(), atol=1e-6)
    assert pp.scales == (10.0, 10.0, 5.0, 5.0)
    assert pp.num_classes == 90
    assert pp.max_detections == 10
    assert pp.use_regular_nms
    assert abs(pp.nms_score_threshold - 0.55) < 1e-6
    assert abs(pp.nms_iou_threshold - 0.5) < 1e-6


def test_raw_head_file_has_no_postprocess(tmp_path):
    path = _make_full_ssd_tflite(tmp_path)
    assert cv_mod.read_tflite_postprocess(path) is None


@pytest.mark.timeout(900)
def test_conversion_attaches_postprocess(pp_tflite):
    variables, report = cv_mod.load_ssd_mobilenet_tflite(pp_tflite)
    assert report["assigned"] == report["total"]
    assert not report["missing"] and not report["unused_ops"]
    assert report["postprocess"] is not None
    assert report["anchors_verified"], report.get("anchors_max_abs_diff")


@pytest.mark.timeout(900)
def test_decode_matches_interpreter_op(pp_tflite):
    """Every detection the op kernel emits must be reproduced by our
    native decode over the embedded anchors/scales: same box (some anchor
    decodes to it within tolerance) and same score at that anchor/class."""
    import jax.numpy as jnp
    from deepdish_tpu.models.ssd_mobilenet import (SSDMobileNetV1,
                                                   decode_boxes)

    variables, report = cv_mod.load_ssd_mobilenet_tflite(pp_tflite)
    pp = report["postprocess"]

    tf = _tf()
    x = np.random.RandomState(3).uniform(
        0, 255, (1, 300, 300, 3)).astype(np.float32)
    interp = tf.lite.Interpreter(model_path=pp_tflite)
    interp.allocate_tensors()
    interp.set_tensor(interp.get_input_details()[0]["index"], x)
    interp.invoke()
    # port order by ascending tensor index (the sort the reference does at
    # tools/tflite_object_detector.py:154-172)
    dets = [interp.get_tensor(d["index"]) for d in
            sorted(interp.get_output_details(), key=lambda d: d["index"])]
    op_boxes, op_classes, op_scores, op_count = (
        dets[0][0], dets[1][0], dets[2][0], int(dets[3][0]))
    assert op_count > 0, "op emitted nothing; test scene too weak"

    net = SSDMobileNetV1(compute_dtype=jnp.float32)
    box_enc, logits = net.apply(variables, x[0])
    ours = np.asarray(decode_boxes(box_enc, jnp.asarray(pp.anchors),
                                   pp.scales))
    probs = np.asarray(jnp.asarray(1 / (1 + np.exp(-np.asarray(logits)))))

    for i in range(op_count):
        diff = np.abs(ours - op_boxes[i]).max(axis=1)
        j = int(diff.argmin())
        assert diff[j] < 1e-2, f"op box {i} unmatched (best {diff[j]})"
        c = int(op_classes[i])
        assert abs(probs[j, c + 1] - op_scores[i]) < 1e-2, \
            f"score mismatch at det {i}: {probs[j, c + 1]} vs {op_scores[i]}"


@pytest.mark.timeout(900)
def test_cli_with_postprocess_flatbuffer(pp_tflite, tmp_path):
    """--model <zoo-layout .tflite> through the CLI: converts loudly and
    runs the fused device program configured from the op's parameters."""
    from deepdish_tpu.pipeline.main import amain

    video = tmp_path / "v.mp4"
    vw = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 15,
                         (320, 240))
    rng = np.random.RandomState(0)
    for _ in range(8):
        vw.write(rng.randint(0, 200, (240, 320, 3)).astype(np.uint8))
    vw.release()

    log = tmp_path / "o.log"
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        asyncio.run(amain([
            "--input", str(video), "--model", pp_tflite,
            "--encoder-model", "dummy", "--disable-graphics",
            "--disable-background-subtraction",
            "--streaming-port", "0", "--control-port", "0",
            "--log", str(log), "--wanted-labels", "person"]))
    out = buf.getvalue()
    assert "weight conversion failed" not in out
    assert out.count("Frame ") >= 8
    assert os.path.exists(log)
