"""Fused frame-step program tests: smoke + chunk/sequential equivalence."""
import numpy as np
import jax.numpy as jnp
import pytest

from deepdish_tpu import tracker as tt
from deepdish_tpu.models import create_box_encoder, create_detector
from deepdish_tpu.pipeline import FrameStep, FrameStepConfig


@pytest.fixture(scope="module")
def fs():
    det = create_detector("ssd_mobilenet", max_outputs=16,
                          score_threshold=0.3)
    enc = create_box_encoder("dummy")
    cfg = tt.TrackerConfig(max_tracks=16, max_detections=8,
                           gallery_size=32, num_labels=4, max_age=10)
    return FrameStep(det, enc, cfg, ["person", "car"], (96, 128),
                     FrameStepConfig(score_threshold=0.3))


def _frames(n, rng):
    return rng.randint(0, 255, size=(n, 96, 128, 3)).astype(np.uint8)


def test_single_step_smoke(fs, rng):
    state = fs.init_state()
    state, out, snap, raw = fs.step(state, _frames(1, rng)[0])
    assert np.asarray(out.track_id).shape == (16,)
    assert np.asarray(snap.tlwh).shape == (8, 4)
    assert np.isfinite(np.asarray(out.tlwh)).all()


def test_chunk_equals_sequential(fs, rng):
    frames = _frames(6, rng)
    t1 = fs.init_state()
    seq_states = []
    for f in frames:
        t1, out, _, _ = fs.step(t1, f)
        seq_states.append((np.asarray(out.track_id).copy(),
                           np.asarray(out.state).copy()))
    t2 = fs.init_state()
    t2, outs, snaps = fs.run_chunk(t2, frames)
    ids = np.asarray(outs.track_id)
    states = np.asarray(outs.state)
    for i, (want_id, want_state) in enumerate(seq_states):
        np.testing.assert_array_equal(ids[i], want_id, err_msg=f"frame {i}")
        np.testing.assert_array_equal(states[i], want_state)
    # final tables agree
    np.testing.assert_array_equal(np.asarray(t1.table.state),
                                  np.asarray(t2.table.state))
    np.testing.assert_allclose(np.asarray(t1.table.mean),
                               np.asarray(t2.table.mean),
                               rtol=1e-4, atol=1e-3)


def test_chunk_yuv_equals_rgb(fs, rng):
    import cv2
    frames = _frames(4, rng)
    yuv = np.stack([cv2.cvtColor(cv2.cvtColor(f, cv2.COLOR_RGB2BGR),
                                 cv2.COLOR_BGR2YUV_I420) for f in frames])
    t1 = fs.init_state()
    t1, outs_rgb, _ = fs.run_chunk(t1, frames)
    t2 = fs.init_state()
    t2, outs_yuv, _ = fs.run_chunk_yuv(t2, yuv)
    # colorspace roundtrip shifts pixel values slightly; detector outputs
    # with random weights are noisy, so compare shapes + finiteness and
    # that the program runs — exact equality is not expected.
    assert np.asarray(outs_yuv.track_id).shape == \
        np.asarray(outs_rgb.track_id).shape
    assert np.isfinite(np.asarray(outs_yuv.tlwh)).all()


def test_yolov3_letterbox_in_framestep(rng):
    from deepdish_tpu.models import create_box_encoder, create_detector
    det = create_detector("yolo.h5", max_outputs=8, score_threshold=0.3)
    enc = create_box_encoder("dummy")
    cfg = tt.TrackerConfig(max_tracks=8, max_detections=4, gallery_size=8,
                           pending_size=4, num_labels=2, max_age=5)
    fs2 = FrameStep(det, enc, cfg, ["person"], (96, 128),
                    FrameStepConfig(score_threshold=0.3))
    state = fs2.init_state()
    frame = rng.randint(0, 255, size=(96, 128, 3)).astype(np.uint8)
    state, out, snap, raw = fs2.step(state, frame)
    assert np.isfinite(np.asarray(snap.tlwh)).all()
    # letterbox geometry for 128x96 into 416: width-limited
    left, top, nw, nh = det._lb
    assert nw == 416 and nh == 312 and top == 52 and left == 0


def test_params_device_put_once(fs, rng):
    """Converted artifacts hold host numpy weight trees; FrameStep must put
    them on device ONCE (lazy), not re-ship per dispatch — the per-dispatch
    re-transfer measured 83x slower over the axon tunnel (commit 99290fb,
    docs/BENCH_NOTES.md round 4)."""
    import jax
    det = create_detector("ssd_mobilenet", max_outputs=16,
                          score_threshold=0.3)
    # simulate a converted artifact: host numpy tree, as models/convert.py
    # artifacts arrive through weights.load_npz
    det.params = jax.tree.map(np.asarray, det.params)
    enc = create_box_encoder("dummy")
    cfg = tt.TrackerConfig(max_tracks=16, max_detections=8,
                           gallery_size=32, num_labels=4, max_age=10)
    fs2 = FrameStep(det, enc, cfg, ["person", "car"], (96, 128),
                    FrameStepConfig(score_threshold=0.3))
    # construction alone must not touch the backend (lazy put)
    assert fs2._params_dev is None
    p1 = fs2._params
    p2 = fs2._params
    assert p1 is p2, "weight tree must be device_put exactly once"
    assert all(isinstance(leaf, jax.Array)
               for leaf in jax.tree.leaves(p1))
    # and the program still runs on the device-resident tree
    state = fs2.init_state()
    state, out, _, _ = fs2.step(state, _frames(1, rng)[0])
    assert np.isfinite(np.asarray(out.tlwh)).all()
