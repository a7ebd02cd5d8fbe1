"""YUV420 device conversion vs cv2."""
import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepdish_tpu.ops.colorspace import yuv420_to_rgb, yuv420_to_rgb_pallas


def _make(rng, h=64, w=128):
    bgr = rng.randint(0, 255, size=(h, w, 3)).astype(np.uint8)
    yuv = cv2.cvtColor(bgr, cv2.COLOR_BGR2YUV_I420)  # (h*3/2, w)
    rgb = cv2.cvtColor(yuv, cv2.COLOR_YUV2RGB_I420)
    return yuv, rgb


def test_yuv420_to_rgb_matches_cv2(rng):
    yuv, want = _make(rng)
    got = np.asarray(yuv420_to_rgb(jnp.asarray(yuv), 64, 128))
    # cv2 fixed-point + rounding; allow small error on most pixels
    err = np.abs(got - want.astype(np.float32))
    assert np.median(err) <= 1.0
    assert (err <= 4).mean() > 0.99


def test_pallas_path_matches_xla(rng):
    yuv, _ = _make(rng)
    a = np.asarray(yuv420_to_rgb(jnp.asarray(yuv), 64, 128))
    # on CPU the pallas_call runs in interpret-compatible lowering or falls
    # back; compare against the XLA path
    try:
        b = np.asarray(yuv420_to_rgb_pallas(jnp.asarray(yuv), 64, 128))
    except Exception:
        pytest.skip("pallas unsupported on this backend")
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_fallback_on_bad_shape(rng):
    yuv, want = _make(rng, h=60, w=100)  # w not /128 -> fallback path
    got = np.asarray(yuv420_to_rgb_pallas(jnp.asarray(yuv), 60, 100))
    err = np.abs(got - want.astype(np.float32))
    assert np.median(err) <= 1.0
