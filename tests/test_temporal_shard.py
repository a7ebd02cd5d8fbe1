"""Temporal sequence-parallel engine tests on the 8-device virtual CPU mesh.

One stream's chunk of F frames is sharded over the frame axis
(parallel/temporal.py): detect+encode per shard, all_gather of the compact
detections, replicated tracker scan. Semantics must match the single-device
`FrameStep.run_chunk` exactly.
"""
import numpy as np
import jax
import pytest

from deepdish_tpu import tracker as tt
from deepdish_tpu.models import create_box_encoder, create_detector
from deepdish_tpu.parallel import TemporalChunkEngine, make_mesh
from deepdish_tpu.pipeline import FrameStep, FrameStepConfig


@pytest.fixture(scope="module")
def fs():
    det = create_detector("ssd_mobilenet", max_outputs=8,
                          score_threshold=0.3)
    enc = create_box_encoder("mars")
    cfg = tt.TrackerConfig(max_tracks=8, max_detections=4, gallery_size=8,
                           pending_size=4, num_labels=2, max_age=5)
    return FrameStep(det, enc, cfg, ["person"], (72, 96))


@pytest.fixture(scope="module")
def engine(fs):
    return TemporalChunkEngine(fs, mesh=make_mesh(8, axis_name="frame"))


def _frames(rng, n, h=72, w=96):
    return rng.randint(0, 255, size=(n, h, w, 3)).astype(np.uint8)


def test_matches_single_device_chunk(engine, fs, rng):
    """The sharded chunk must reproduce run_chunk: same track ids, same
    table state, same detections."""
    frames = _frames(rng, 16)
    s_ref, outs_ref, snaps_ref = fs.run_chunk(fs.init_state(), frames)
    s_sp, outs_sp, snaps_sp = engine.run_chunk(fs.init_state(), frames)
    jax.block_until_ready(s_sp)

    np.testing.assert_array_equal(np.asarray(outs_ref.track_id),
                                  np.asarray(outs_sp.track_id))
    np.testing.assert_array_equal(np.asarray(snaps_ref.valid),
                                  np.asarray(snaps_sp.valid))
    np.testing.assert_allclose(np.asarray(snaps_ref.tlwh),
                               np.asarray(snaps_sp.tlwh),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s_ref.table.mean),
                               np.asarray(s_sp.table.mean),
                               rtol=1e-5, atol=1e-4)


def test_state_carries_across_chunks(engine, fs, rng):
    """Two sharded chunks == one 16-frame single-device chunk, carried
    through the replicated table."""
    frames = _frames(rng, 16)
    s_ref, outs_ref, _ = fs.run_chunk(fs.init_state(), frames)

    s = fs.init_state()
    ids = []
    for k in range(2):
        s, outs, _ = engine.run_chunk(s, frames[k * 8:(k + 1) * 8])
        ids.append(np.asarray(outs.track_id))
    np.testing.assert_array_equal(np.asarray(outs_ref.track_id),
                                  np.concatenate(ids, axis=0))
    np.testing.assert_allclose(np.asarray(s_ref.table.mean),
                               np.asarray(s.table.mean),
                               rtol=1e-5, atol=1e-4)


def test_outputs_replicated_for_next_chunk(engine, fs, rng):
    """The updated table must land replicated (every device holds it), so
    chunk N+1 starts with no redistribution."""
    state, _, _ = engine.run_chunk(fs.init_state(), _frames(rng, 8))
    shards = state.table.mean.addressable_shards
    assert len({s.device for s in shards}) == 8
    base = np.asarray(shards[0].data)
    for s in shards[1:]:
        np.testing.assert_array_equal(base, np.asarray(s.data))


def test_chunk_length_must_divide(engine, fs, rng):
    with pytest.raises(ValueError, match="multiple of the mesh size"):
        engine.run_chunk(fs.init_state(), _frames(rng, 12))


def test_bgsub_rejected(fs):
    det = create_detector("ssd_mobilenet", max_outputs=8,
                          score_threshold=0.3)
    enc = create_box_encoder("dummy")
    cfg = tt.TrackerConfig(max_tracks=8, max_detections=4, gallery_size=8,
                           pending_size=4, num_labels=2, max_age=5)
    fs_bg = FrameStep(det, enc, cfg, ["person"], (72, 96),
                      FrameStepConfig(background_subtraction=True))
    with pytest.raises(ValueError, match="background"):
        TemporalChunkEngine(fs_bg, mesh=make_mesh(8, axis_name="frame"))


def test_yuv_path_matches_single_device_yuv(engine, fs, rng):
    """The sharded YUV entry converts on-device per shard with the same
    kernel as the single-device path, so on the SAME YUV input the sharded
    engine must reproduce FrameStep.run_chunk_yuv exactly (track ids and
    table state), not merely execute."""
    import cv2
    frames = _frames(rng, 8)
    yuv = np.stack([
        cv2.cvtColor(cv2.cvtColor(f, cv2.COLOR_RGB2BGR),
                     cv2.COLOR_BGR2YUV_I420) for f in frames])
    s_ref, outs_ref, snaps_ref = fs.run_chunk_yuv(fs.init_state(), yuv)
    s_sp, outs_sp, snaps_sp = engine.run_chunk_yuv(fs.init_state(), yuv)
    np.testing.assert_array_equal(np.asarray(outs_ref.track_id),
                                  np.asarray(outs_sp.track_id))
    np.testing.assert_array_equal(np.asarray(snaps_ref.valid),
                                  np.asarray(snaps_sp.valid))
    np.testing.assert_allclose(np.asarray(s_ref.table.mean),
                               np.asarray(s_sp.table.mean),
                               rtol=1e-5, atol=1e-4)
