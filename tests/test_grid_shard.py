"""2-D grid engine (stream-DP x temporal-SP) tests on the 8-device mesh.

parallel/grid.py shards S streams' chunks over a (stream, frame) mesh:
detect+encode sharded on both axes, one all_gather of the compact
detections along the frame axis, tracker scan sharded by stream. Per
stream the semantics must match single-device `FrameStep.run_chunk`
exactly, for every (ds, dt) factorization of the mesh.
"""
import numpy as np
import jax
import pytest

from deepdish_tpu import tracker as tt
from deepdish_tpu.models import create_box_encoder, create_detector
from deepdish_tpu.parallel import GridEngine, make_grid_mesh
from deepdish_tpu.pipeline import FrameStep, FrameStepConfig


@pytest.fixture(scope="module")
def fs():
    det = create_detector("ssd_mobilenet", max_outputs=8,
                          score_threshold=0.3)
    enc = create_box_encoder("mars")
    cfg = tt.TrackerConfig(max_tracks=8, max_detections=4, gallery_size=8,
                           pending_size=4, num_labels=2, max_age=5)
    return FrameStep(det, enc, cfg, ["person"], (72, 96))


def _frames(rng, s, f, h=72, w=96):
    return rng.randint(0, 255, size=(s, f, h, w, 3)).astype(np.uint8)


def _ref_per_stream(fs, frames):
    """Single-device run_chunk per stream: the parity oracle."""
    ids, means = [], []
    for s in range(frames.shape[0]):
        st, outs, _ = fs.run_chunk(fs.init_state(), frames[s])
        ids.append(np.asarray(outs.track_id))
        means.append(np.asarray(st.table.mean))
    return np.stack(ids), np.stack(means)


@pytest.mark.parametrize("ds,dt", [(2, 4), (4, 2), (8, 1), (1, 8)])
def test_matches_single_device_per_stream(fs, rng, ds, dt):
    """Every factorization of the 8 devices reproduces the per-stream
    single-device chunk: same track ids, same table state."""
    eng = GridEngine(fs, n_streams=ds, mesh=make_grid_mesh(ds, dt))
    frames = _frames(rng, ds, 2 * dt if dt > 1 else 4)
    ids_ref, means_ref = _ref_per_stream(fs, frames)
    states, outs, _ = eng.run_chunk(eng.init_states(), frames)
    jax.block_until_ready(states)
    np.testing.assert_array_equal(ids_ref, np.asarray(outs.track_id))
    np.testing.assert_allclose(means_ref, np.asarray(states.table.mean),
                               rtol=1e-5, atol=1e-4)


def test_state_carries_across_chunks(fs, rng):
    """Two grid chunks == one long single-device chunk per stream."""
    eng = GridEngine(fs, n_streams=2, mesh=make_grid_mesh(2, 4))
    frames = _frames(rng, 2, 16)
    ids_ref, means_ref = _ref_per_stream(fs, frames)

    states = eng.init_states()
    ids = []
    for k in range(2):
        states, outs, _ = eng.run_chunk(states, frames[:, k * 8:(k + 1) * 8])
        ids.append(np.asarray(outs.track_id))
    np.testing.assert_array_equal(ids_ref, np.concatenate(ids, axis=1))
    np.testing.assert_allclose(means_ref, np.asarray(states.table.mean),
                               rtol=1e-5, atol=1e-4)


def test_yuv_matches_single_device_yuv(fs, rng):
    """Grid YUV entry vs per-stream FrameStep.run_chunk_yuv on the same
    I420 input: identical on-device conversion, identical results."""
    import cv2
    eng = GridEngine(fs, n_streams=2, mesh=make_grid_mesh(2, 4))
    frames = _frames(rng, 2, 4)
    yuv = np.stack([np.stack([
        cv2.cvtColor(cv2.cvtColor(f, cv2.COLOR_RGB2BGR),
                     cv2.COLOR_BGR2YUV_I420) for f in stream])
        for stream in frames])
    ids_ref, means_ref = [], []
    for s in range(2):
        st, outs, _ = fs.run_chunk_yuv(fs.init_state(), yuv[s])
        ids_ref.append(np.asarray(outs.track_id))
        means_ref.append(np.asarray(st.table.mean))
    states, outs, _ = eng.run_chunk_yuv(eng.init_states(), yuv)
    np.testing.assert_array_equal(np.stack(ids_ref),
                                  np.asarray(outs.track_id))
    np.testing.assert_allclose(np.stack(means_ref),
                               np.asarray(states.table.mean),
                               rtol=1e-5, atol=1e-4)


def test_shape_validation(fs, rng):
    eng = GridEngine(fs, n_streams=2, mesh=make_grid_mesh(2, 4))
    with pytest.raises(ValueError, match="multiple of"):
        eng.run_chunk(eng.init_states(), _frames(rng, 2, 6))
    with pytest.raises(ValueError, match="streams"):
        eng.run_chunk(eng.init_states(), _frames(rng, 4, 4))
    with pytest.raises(ValueError, match="multiple of"):
        GridEngine(fs, n_streams=3, mesh=make_grid_mesh(2, 4))
    with pytest.raises(ValueError, match="missing"):
        from deepdish_tpu.parallel import make_mesh
        GridEngine(fs, n_streams=2, mesh=make_mesh(8))


def test_bgsub_rejected():
    det = create_detector("ssd_mobilenet", max_outputs=8,
                          score_threshold=0.3)
    enc = create_box_encoder("dummy")
    cfg = tt.TrackerConfig(max_tracks=8, max_detections=4, gallery_size=8,
                           pending_size=4, num_labels=2, max_age=5)
    fs_bg = FrameStep(det, enc, cfg, ["person"], (72, 96),
                      FrameStepConfig(background_subtraction=True))
    with pytest.raises(ValueError, match="background"):
        GridEngine(fs_bg, n_streams=2, mesh=make_grid_mesh(2, 4))
