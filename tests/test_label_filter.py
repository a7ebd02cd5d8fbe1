"""Native-path allow/deny/max_results options for the generic TFLite
detector (VERDICT r3 next #10), matching the reference's
ObjectDetectorOptions semantics (tools/tflite_object_detector.py:47-53,
270-295): results in descending-score order, deny filter, allow filter,
then at most max_results top-scored survivors.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from deepdish_tpu.models import create_detector
from deepdish_tpu.models.efficientdet import (EfficientDetLite0Detector,
                                              apply_result_filter,
                                              build_label_filter_lut)

LABELS = {0: "person", 1: "car", 2: "dog", 3: "cat"}


def test_lut_semantics():
    # deny wins over allow (reference applies deny first, then allow);
    # the trailing slot is the unknown-class default
    lut = np.asarray(build_label_filter_lut(
        LABELS, ["person", "car"], ["car"]))
    assert lut.tolist() == [True, False, False, False, False]
    # allow-only: unknown ids dropped (their names aren't in the list)
    lut = np.asarray(build_label_filter_lut(LABELS, ["dog"], None))
    assert lut.tolist() == [False, False, True, False, False]
    # deny-only: unknown ids kept
    lut = np.asarray(build_label_filter_lut(LABELS, None, ["person"]))
    assert lut.tolist() == [False, True, True, True, True]
    # unset -> no filtering
    assert build_label_filter_lut(LABELS, None, None) is None


def test_apply_result_filter_truncates_top_scored():
    classes = jnp.asarray([0, 1, 0, 2, 0, 0], jnp.int32)
    valid = jnp.asarray([True, True, True, True, True, False])
    lut = jnp.asarray(build_label_filter_lut(LABELS, None, ["car"]))
    out = np.asarray(apply_result_filter(classes, valid, lut, 2))
    # car at slot 1 denied; the 2 top-scored survivors are slots 0 and 2
    assert out.tolist() == [True, False, True, False, False, False]


@pytest.fixture(scope="module")
def frame():
    return jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (320, 320, 3)).astype(np.float32))


def test_efficientdet_native_filter(frame):
    """Same random-init net with and without the options: denied labels
    vanish, max_results bounds the count, and the survivors are exactly
    the base run's top-scored non-denied detections."""
    # name every class id the random-init net can emit
    full_labels = {i: LABELS[i % 4] for i in range(128)}

    base = EfficientDetLite0Detector(seed=0, score_threshold=0.0, top_k=64)
    base.labels = full_labels
    base.finalize_label_filter()
    _, cls_b, sc_b, val_b = (np.asarray(t) for t in base.detect_jit(
        frame, 320, 320))
    assert val_b.sum() >= 4, "need a busy scene for the filter test"

    filt = EfficientDetLite0Detector(seed=0, score_threshold=0.0, top_k=64,
                                     label_deny=["person"], max_results=3)
    filt.labels = full_labels
    filt.finalize_label_filter()
    _, cls_f, sc_f, val_f = (np.asarray(t) for t in filt.detect_jit(
        frame, 320, 320))

    kept_names = [full_labels[int(c)] for c in cls_f[val_f]]
    assert "person" not in kept_names
    assert val_f.sum() <= 3
    # survivors are the top-scored non-denied detections of the base run
    base_keep = [int(c) for c, v in zip(cls_b, val_b)
                 if v and full_labels[int(c)] != "person"][:3]
    got = [int(c) for c, v in zip(cls_f, val_f) if v]
    assert got == base_keep


def test_cli_plumbing(tmp_path):
    """create_detector forwards the options to the native EfficientDet."""
    det = create_detector("efficientdet", label_allow=["person"],
                          label_deny=["car"], max_results=5,
                          score_threshold=0.3)
    assert det.label_allow == ["person"]
    assert det.label_deny == ["car"]
    assert det.max_results == 5
    assert det._filter_lut is not None
