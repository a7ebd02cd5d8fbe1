"""Model-family smoke + semantics tests (shapes, decode, preprocessing)."""
import numpy as np
import cv2
import jax
import jax.numpy as jnp
import pytest

from deepdish_tpu.models import (create_box_encoder, create_detector,
                                 make_dummy_encoder, preprocess)
from deepdish_tpu.models.ssd_mobilenet import (decode_boxes,
                                               generate_anchors)


def test_resize_bilinear_matches_cv2(rng):
    img = rng.randint(0, 255, size=(48, 64, 3)).astype(np.uint8)
    got = np.asarray(preprocess.resize_bilinear(jnp.asarray(img), 24, 32))
    want = cv2.resize(img, (32, 24), interpolation=cv2.INTER_LINEAR)
    # cv2 uses fixed-point arithmetic; allow 2 LSB
    assert np.abs(got - want.astype(np.float32)).max() <= 2.0


def _ref_patch(image, bbox, patch_shape):
    """Oracle for extract_image_patch (generate_detections.py:64-84)."""
    bbox = np.array(bbox, float)
    target_aspect = float(patch_shape[1]) / patch_shape[0]
    new_width = target_aspect * bbox[3]
    bbox[0] -= (new_width - bbox[2]) / 2
    bbox[2] = new_width
    bbox[2:] += bbox[:2]
    bbox = bbox.astype(int)
    bbox[:2] = np.maximum(0, bbox[:2])
    bbox[2:] = np.minimum(np.asarray(image.shape[:2][::-1]) - 1, bbox[2:])
    if np.any(bbox[:2] >= bbox[2:]):
        return None
    sx, sy, ex, ey = bbox
    return cv2.resize(image[sy:ey, sx:ex],
                      tuple(patch_shape[::-1])).astype(np.float32)


def test_crop_resize_matches_reference(rng):
    img = rng.randint(0, 255, size=(120, 160, 3)).astype(np.uint8)
    boxes = np.array([[20, 10, 30, 60], [100, 40, 40, 70],
                      [-5, -5, 30, 40], [150, 110, 40, 40]], np.float32)
    valid = np.ones(4, bool)
    patches, ok = preprocess.crop_resize_patches(
        jnp.asarray(img), jnp.asarray(boxes), jnp.asarray(valid), 32, 16)
    patches = np.asarray(patches)
    for i, b in enumerate(boxes):
        want = _ref_patch(img, b, (32, 16))
        if want is None:
            assert not bool(ok[i])
            continue
        assert bool(ok[i])
        assert np.abs(patches[i] - want).max() <= 4.0, f"box {i}"


def test_dummy_encoder_reference_semantics(rng):
    enc = make_dummy_encoder()
    patches = rng.randint(0, 255, size=(5, 16, 8, 3)).astype(np.float32)
    got = np.asarray(enc.apply(jnp.asarray(patches)))
    mat = patches.mean(axis=3).reshape(-1, 128) - 128
    want = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    np.testing.assert_allclose(got, want, atol=1e-5)
    zero = np.full((1, 16, 8, 3), 128.0, np.float32)
    gz = np.asarray(enc.apply(jnp.asarray(zero)))
    assert gz[0, 0] == 1.0 and np.all(gz[0, 1:] == 0)


def test_mars_encoder_shapes():
    enc = create_box_encoder("mars-small128")
    x = jnp.asarray(np.random.RandomState(0).uniform(
        0, 255, size=(2, 128, 64, 3)).astype(np.float32))
    f = enc.apply(x)
    assert f.shape == (2, 128)
    n = np.linalg.norm(np.asarray(f), axis=1)
    np.testing.assert_allclose(n, 1.0, atol=1e-3)


def test_encode_boxes_fused(rng):
    enc = create_box_encoder("dummy")
    img = rng.randint(0, 255, size=(100, 100, 3)).astype(np.uint8)
    boxes = jnp.asarray(np.array([[10, 10, 20, 40], [0, 0, 0, 0]],
                                 np.float32))
    feats, ok = enc.encode_boxes(jnp.asarray(img), boxes,
                                 jnp.asarray([True, True]))
    assert feats.shape == (2, 128)
    assert bool(ok[0]) and not bool(ok[1])


def test_ssd_anchor_decode_roundtrip():
    anchors = generate_anchors()
    assert anchors.shape[1] == 4
    # zero encodings decode to the anchors themselves
    enc = jnp.zeros((anchors.shape[0], 4))
    boxes = np.asarray(decode_boxes(enc, jnp.asarray(anchors)))
    np.testing.assert_allclose(boxes[:, 2] - boxes[:, 0], anchors[:, 2],
                               rtol=1e-5)
    # anchor count matches the head layout (3+6*5 per-cell pattern)
    assert len(anchors) == (19 * 19 * 3 + 10 * 10 * 6 + 5 * 5 * 6 +
                            3 * 3 * 6 + 2 * 2 * 6 + 1 * 1 * 6)


@pytest.mark.parametrize("name", ["ssd_mobilenet", "yolov5s-fp16",
                                  "efficientdet-lite0"])
def test_detector_smoke(name):
    det = create_detector(name, max_outputs=16)
    img = jnp.zeros((det.height, det.width, 3), jnp.float32)
    boxes, classes, scores, valid = det.detect_jit(img, 640.0, 480.0)
    assert boxes.shape == (16, 4)
    assert classes.shape == (16,)
    assert scores.shape == (16,)
    assert valid.shape == (16,)
    # no NaNs even with random weights
    assert np.isfinite(np.asarray(boxes)[np.asarray(valid)]).all()


def test_crop_resize_mxu_matches_gather(rng):
    from deepdish_tpu.models.preprocess import (crop_resize_patches,
                                                crop_resize_patches_mxu)
    img = rng.randint(0, 255, size=(120, 160, 3)).astype(np.uint8)
    boxes = np.array([[20, 10, 30, 60], [100, 40, 40, 70],
                      [-5, -5, 30, 40], [150, 110, 40, 40]], np.float32)
    valid = np.ones(4, bool)
    p1, ok1 = crop_resize_patches(jnp.asarray(img), jnp.asarray(boxes),
                                  jnp.asarray(valid), 32, 16)
    p2, ok2 = crop_resize_patches_mxu(jnp.asarray(img), jnp.asarray(boxes),
                                      jnp.asarray(valid), 32, 16)
    np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok2))
    # bf16 interpolation tolerance
    assert np.abs(np.asarray(p1) - np.asarray(p2)).max() < 3.0


def test_resize_mxu_matches_gather(rng):
    from deepdish_tpu.models.preprocess import (resize_bilinear,
                                                resize_bilinear_mxu)
    img = rng.randint(0, 255, size=(72, 96, 3)).astype(np.uint8)
    a = np.asarray(resize_bilinear(jnp.asarray(img), 36, 48))
    b = np.asarray(resize_bilinear_mxu(jnp.asarray(img), 36, 48))
    assert np.abs(a - b).max() < 3.0


def test_yolov3_smoke():
    det = create_detector("yolo.h5", max_outputs=8, score_threshold=0.3)
    img = jnp.zeros((det.height, det.width, 3), jnp.float32)
    boxes, classes, scores, valid = det.detect_jit(img, 640.0, 480.0)
    assert boxes.shape == (8, 4)
    assert np.isfinite(np.asarray(boxes)[np.asarray(valid)]).all()


def test_pbtxt_labelmap():
    from deepdish_tpu.models.labelmap import parse_pbtxt_labelmap
    text = '''
item {
  name: "/m/01g317"
  id: 1
  display_name: "person"
}
item {
  name: "/m/0199g"
  id: 2
  display_name: "bicycle"
}
'''
    got = parse_pbtxt_labelmap(text)
    assert got == {1: "person", 2: "bicycle"}


def test_yolov3_letterbox_geometry():
    det = create_detector("yolo.h5", max_outputs=8, score_threshold=0.3)
    left, top, nw, nh = det.configure_letterbox(1280, 720)
    assert (nw, nh) == (416, 234)
    assert left == 0 and top == (416 - 234) // 2
    # decode inverse: a box spanning the full letterboxed content maps to
    # the full frame
    import jax.numpy as jnp
    xy = np.array([[0.5, 0.5]], np.float32)      # center of input
    wh = np.array([[nw / 416.0, nh / 416.0]], np.float32)
    off = np.array([left / 416.0, top / 416.0], np.float32)
    sc = np.array([416.0 / nw, 416.0 / nh], np.float32)
    xy2 = (xy - off) * sc
    wh2 = wh * sc
    np.testing.assert_allclose(xy2, [[0.5, 0.5]], atol=1e-5)
    np.testing.assert_allclose(wh2, [[1.0, 1.0]], atol=1e-5)
