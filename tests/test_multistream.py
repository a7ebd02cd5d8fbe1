"""Multi-stream sharded engine tests on the 8-device virtual CPU mesh."""
import numpy as np
import jax
import pytest

from deepdish_tpu import tracker as tt
from deepdish_tpu.models import create_box_encoder, create_detector
from deepdish_tpu.parallel import MultiStreamEngine, make_mesh
from deepdish_tpu.pipeline import FrameStep


@pytest.fixture(scope="module")
def engine():
    det = create_detector("ssd_mobilenet", max_outputs=8,
                          score_threshold=0.3)
    enc = create_box_encoder("dummy")
    cfg = tt.TrackerConfig(max_tracks=8, max_detections=4, gallery_size=8,
                           pending_size=4, num_labels=2, max_age=5)
    fs = FrameStep(det, enc, cfg, ["person"], (72, 96))
    mesh = make_mesh(8)
    return MultiStreamEngine(fs, n_streams=16, mesh=mesh)


def test_sharded_step_runs(engine, rng):
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    states = engine.init_states()
    frames = rng.randint(0, 255, size=(16, 72, 96, 3)).astype(np.uint8)
    states, outs, snaps = engine.step(states, frames)
    jax.block_until_ready(states)
    assert np.asarray(outs.track_id).shape == (16, 8)
    # tables stay sharded over the mesh
    shard_devs = {s.device for s in states.table.mean.addressable_shards}
    assert len(shard_devs) == 8


def test_streams_independent(engine, rng):
    """Stream k's tracker must evolve identically whether run sharded in the
    batch or alone."""
    frames = rng.randint(0, 255, size=(16, 72, 96, 3)).astype(np.uint8)
    states = engine.init_states()
    for _ in range(2):
        states, outs, _ = engine.step(states, frames)
    batch_ids = np.asarray(outs.track_id)

    # single-stream run of stream 3
    fs = engine.fs
    t = fs.init_state()
    for _ in range(2):
        t, out, _, _ = fs.step(t, frames[3])
    np.testing.assert_array_equal(batch_ids[3], np.asarray(out.track_id))


def test_chunked_step_matches_per_frame(engine, rng):
    """step_chunk (F frames per stream per dispatch — the high-throughput
    mode) must produce the same final tracker state as stepping frame by
    frame."""
    F = 3
    frames = rng.randint(0, 255, size=(16, F, 72, 96, 3)).astype(np.uint8)
    s_chunk = engine.init_states()
    s_chunk, outs, _ = engine.step_chunk(s_chunk, frames)
    assert np.asarray(outs.track_id).shape == (16, F, 8)

    s_seq = engine.init_states()
    for k in range(F):
        s_seq, out_k, _ = engine.step(s_seq, frames[:, k])
    np.testing.assert_array_equal(np.asarray(outs.track_id)[:, -1],
                                  np.asarray(out_k.track_id))
    np.testing.assert_allclose(np.asarray(s_chunk.table.mean),
                               np.asarray(s_seq.table.mean),
                               rtol=1e-5, atol=1e-5)


def test_pallas_kernel_under_shardmap(rng):
    """Multi-device mesh + the Pallas JV kernel: shard_map gives each
    device a LOCAL batched kernel instance (no SPMD partitioning of the
    opaque call needed). Runs the kernel through the interpreter on the
    8-device CPU mesh and checks agreement with the XLA-solver engine."""
    det = create_detector("ssd_mobilenet", max_outputs=8,
                          score_threshold=0.3)
    enc = create_box_encoder("dummy")
    frames = rng.randint(0, 255, size=(16, 72, 96, 3)).astype(np.uint8)

    outs = {}
    for impl in ("xla", "pallas_interpret"):
        cfg = tt.TrackerConfig(max_tracks=8, max_detections=4,
                               gallery_size=8, pending_size=4, num_labels=2,
                               max_age=5, lsap_impl=impl)
        fs = FrameStep(det, enc, cfg, ["person"], (72, 96))
        eng = MultiStreamEngine(fs, n_streams=16, mesh=make_mesh(8))
        states = eng.init_states()
        for _ in range(3):
            states, out, snaps = eng.step(states, frames)
        outs[impl] = (np.asarray(out.track_id), np.asarray(out.state),
                      np.asarray(out.matched_det))
    for a, b in zip(outs["xla"], outs["pallas_interpret"]):
        np.testing.assert_array_equal(a, b)


@pytest.mark.timeout(600)
def test_quantized_detector_under_shard_map(rng, tmp_path):
    """The integer datapath (qgraph executor) composes with the
    multi-stream shard_map engine — the quantized SERVING config (16
    streams of a full-int8 artifact on one chip) — and each stream's
    tracker matches the single-stream run exactly. Covers the reference's
    quantized serving deployment (tools/ssd_mobilenet.py:100-103, EdgeTPU
    execution model) under data parallelism."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_pipeline_real_tflite import _make_full_ssd_tflite
    path = _make_full_ssd_tflite(tmp_path, full_int8=True)
    det = create_detector(str(path), max_outputs=8, quantized=True,
                          score_threshold=0.3)
    enc = create_box_encoder("dummy")
    cfg = tt.TrackerConfig(max_tracks=8, max_detections=4, gallery_size=8,
                           pending_size=4, num_labels=2, max_age=5)
    fs = FrameStep(det, enc, cfg, ["person"], (72, 96))
    eng = MultiStreamEngine(fs, n_streams=8, mesh=make_mesh(8))
    frames = rng.randint(0, 255, size=(8, 72, 96, 3)).astype(np.uint8)
    states = eng.init_states()
    states, outs, snaps = eng.step(states, frames)
    jax.block_until_ready(states)
    assert np.asarray(outs.track_id).shape == (8, 8)
    # exact parity with the unsharded single-stream step
    t = fs.init_state()
    t, out, _, _ = fs.step(t, frames[3])
    np.testing.assert_array_equal(np.asarray(outs.track_id)[3],
                                  np.asarray(out.track_id))


def test_chunked_yuv_matches_single_stream(engine, rng):
    """step_chunk_yuv (the multi-stream e2e bench transport: planar I420
    chunks, on-device conversion, VERDICT r4 #6) must evolve each stream's
    tracker exactly as the single-stream FrameStep.run_chunk_yuv does."""
    import cv2
    F = 3
    H, W = 72, 96
    rgb = rng.randint(0, 255, size=(16, F, H, W, 3)).astype(np.uint8)
    yuv = np.stack([np.stack([
        cv2.cvtColor(cv2.cvtColor(rgb[s, k], cv2.COLOR_RGB2BGR),
                     cv2.COLOR_BGR2YUV_I420)
        for k in range(F)]) for s in range(16)])
    assert yuv.shape == (16, F, H * 3 // 2, W)

    states = engine.init_states()
    states, outs, _ = engine.step_chunk_yuv(states, yuv)
    batch_ids = np.asarray(outs.track_id)
    assert batch_ids.shape == (16, F, 8)

    fs = engine.fs
    t = fs.init_state()
    t, out_s, _ = fs.run_chunk_yuv(t, yuv[3])
    np.testing.assert_array_equal(batch_ids[3], np.asarray(out_s.track_id))
    np.testing.assert_allclose(np.asarray(states.table.mean)[3],
                               np.asarray(t.table.mean),
                               rtol=1e-5, atol=1e-5)
