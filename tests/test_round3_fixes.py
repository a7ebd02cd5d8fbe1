"""Round-3 hardening: ADVICE r2 fixes + VERDICT r2 items 7/8.

Covers:
  * loud failure when a --model weight file fails to convert
    (ADVICE #1; the reference's interpreter also fails loudly on a bad file)
  * gallery growth margin sized to --chunk-size, not the last batch
    (ADVICE #2)
  * checkpoints saved after gallery growth restore with the same CLI args
    (ADVICE #3)
  * live mode pre-sizes the gallery and never rebuilds the fused program
    mid-stream (VERDICT #7)
  * --gstreamer-nvidia builds the reference's nvargus pipeline string
    (VERDICT #8, deepdish.py:698-703)
"""
import re

import cv2
import numpy as np
import pytest

from deepdish_tpu import tracker as tt
from deepdish_tpu.models.registry import create_detector, register_script
from deepdish_tpu.pipeline.checkpoint import save_state
from deepdish_tpu.pipeline.config import get_arguments
from deepdish_tpu.pipeline.framestep import PipelineState
from deepdish_tpu.pipeline.runtime import Pipeline, gstreamer_nvidia_pipeline


def _make_video(path, frames=4, size=(160, 120)):
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 15,
                         size)
    for _ in range(frames):
        vw.write(np.zeros((size[1], size[0], 3), np.uint8))
    vw.release()


register_script("r3noop", lambda f: ([], [], []))


def _pipeline(tmp_path, extra, video_name="r3.mp4"):
    video = tmp_path / video_name
    _make_video(video)
    return Pipeline(get_arguments(
        ["--input", str(video), "--model", "scripted:r3noop",
         "--encoder-model", "dummy", "--disable-graphics",
         "--disable-background-subtraction"] + extra))


# ---------------------------------------------------------------- ADVICE #1

def test_bad_weight_file_fails_loudly(tmp_path):
    bad = tmp_path / "ssd_corrupt.tflite"
    bad.write_bytes(b"\x00garbage" * 64)
    with pytest.raises(ValueError, match="weight conversion failed"):
        create_detector(str(bad))


def test_bad_weight_file_optout(tmp_path):
    bad = tmp_path / "ssd_corrupt.tflite"
    bad.write_bytes(b"\x00garbage" * 64)
    det = create_detector(str(bad), allow_random_weights=True)
    assert det is not None and det.width == 300


# ------------------------------------------------------------- VERDICT #8

def test_gstreamer_nvidia_string_matches_reference():
    src = open("/root/reference/deepdish.py").read()
    m = re.search(r'src = ("nvarguscamerasrc.*?")\.format', src)
    assert m, "reference nvargus construction not found"
    ref = eval(m.group(1)).format(640, 480)  # noqa: S307 - literal string
    assert gstreamer_nvidia_pipeline(640, 480) == ref


def test_gstreamer_nvidia_flag_selects_pipeline():
    p = Pipeline.__new__(Pipeline)
    p.args = get_arguments(["--gstreamer-nvidia",
                            "--camera-width", "1280",
                            "--camera-height", "720"])
    p._init_camera()
    assert p.input == gstreamer_nvidia_pipeline(1280, 720)
    if p.cap is not None:
        p.cap.release()


# ------------------------------------------- ADVICE #2 + VERDICT #7 (growth)

def test_offline_growth_margin_covers_full_chunk(tmp_path):
    """A 1-frame batch must still leave room for a following full chunk:
    the growth margin is --chunk-size, not the last batch length."""
    p = _pipeline(tmp_path, ["--chunk-size", "8", "--gallery-size", "16"])
    assert p._gallery_growth_ok          # file input -> offline
    G = p.tracker_cfg.gallery_size
    assert G == 16
    counts = np.zeros(p.tracker_cfg.max_tracks, np.int32)
    counts[0] = G - 4                    # 1-frame margin would NOT trigger
    p.state = p.state._replace(
        table=p.state.table._replace(gallery_count=counts))
    p._maybe_grow_gallery(1)
    assert p.tracker_cfg.gallery_size >= 2 * G


def test_live_mode_presizes_and_never_rebuilds(tmp_path):
    """Live input (interframe-interval set -> camera simulation): gallery
    pre-sized from --max-age, and _maybe_grow_gallery never rebuilds the
    fused program even under pressure."""
    p = _pipeline(tmp_path, ["--interframe-interval", "30"])
    assert not p._gallery_growth_ok
    assert p.tracker_cfg.gallery_size == max(128, 4 * p.args.max_age)
    fs = p.framestep
    counts = np.full(p.tracker_cfg.max_tracks,
                     p.tracker_cfg.gallery_size, np.int32)
    p.state = p.state._replace(
        table=p.state.table._replace(gallery_count=counts))
    p._maybe_grow_gallery(1)
    assert p.framestep is fs
    assert p.tracker_cfg.gallery_size == max(128, 4 * p.args.max_age)


def test_offline_wrapped_gallery_degrades_not_crashes(tmp_path):
    """If the ring somehow wrapped before growth, the frame worker must
    degrade to bounded-ring reuse, not crash on grow_gallery's ValueError."""
    p = _pipeline(tmp_path, ["--gallery-size", "8"])
    counts = np.zeros(p.tracker_cfg.max_tracks, np.int32)
    counts[0] = 9                        # already past capacity
    p.state = p.state._replace(
        table=p.state.table._replace(gallery_count=counts))
    fs = p.framestep
    p._maybe_grow_gallery(1)             # must not raise
    assert p.framestep is fs
    assert p._gallery_capped_warned


# ---------------------------------------------------------------- ADVICE #3

def test_checkpoint_restores_after_gallery_growth(tmp_path):
    """A --state-checkpoint saved after runtime growth restores with the
    SAME CLI args: the restore path grows the fresh tracker to match."""
    args_list = ["--gallery-size", "8",
                 "--state-checkpoint", str(tmp_path / "s.ckpt")]
    p1 = _pipeline(tmp_path, args_list)
    assert p1.tracker_cfg.gallery_size == 8
    cfg2, table2 = tt.grow_gallery(p1.tracker_cfg, p1.state.table, 32)
    table2 = table2._replace(next_id=np.asarray(17, np.int32))
    save_state(str(tmp_path / "s.ckpt"), PipelineState(table2, None),
               {"poscount_person": 7}, 55)

    p2 = _pipeline(tmp_path, args_list, video_name="r3b.mp4")
    assert p2.tracker_cfg.gallery_size == 32
    assert p2.frame_count == 55
    assert int(np.asarray(p2.state.table.next_id)) == 17
    assert p2.counting.counters_payload()["poscount_person"] == 7


# --------------------------------------------- gallery pre-normalization

def test_checkpoint_upgrades_raw_feature_galleries(tmp_path):
    """The tracker stores appearance rows unit-normalized (so the cosine
    distance skips re-normalizing the (T, G, F) gallery every frame).
    load_state must normalize gallery/pending rows, which upgrades
    checkpoints written before that change (raw features) and is a no-op
    for current ones."""
    from deepdish_tpu.pipeline.checkpoint import load_state

    cfg = tt.TrackerConfig(max_tracks=4, max_detections=4, gallery_size=3,
                           num_labels=2, feature_dim=8)
    table = tt.create_table(cfg)
    rng = np.random.RandomState(0)
    raw_gal = rng.uniform(-2.0, 2.0, (4, 3, 8)).astype(np.float32)
    raw_gal[2, 1] = 0.0                      # empty slot stays zero
    raw_pen = rng.uniform(-2.0, 2.0,
                          np.asarray(table.pending).shape
                          ).astype(np.float32)
    old_style = table._replace(gallery=raw_gal, pending=raw_pen)
    save_state(str(tmp_path / "old.ckpt"), PipelineState(old_style, None),
               {}, 3)

    state, _, _ = load_state(str(tmp_path / "old.ckpt"),
                             PipelineState(table, None))
    gal = np.asarray(state.table.gallery)
    norms = np.linalg.norm(gal, axis=-1)
    assert np.allclose(norms[norms > 0], 1.0, atol=1e-6)
    assert np.all(gal[2, 1] == 0.0)
    # direction preserved
    got = gal[0, 0]
    want = raw_gal[0, 0] / np.linalg.norm(raw_gal[0, 0])
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # idempotent for already-normalized checkpoints
    save_state(str(tmp_path / "new.ckpt"), PipelineState(state.table, None),
               {}, 3)
    state2, _, _ = load_state(str(tmp_path / "new.ckpt"),
                              PipelineState(table, None))
    np.testing.assert_allclose(np.asarray(state2.table.gallery), gal,
                               rtol=1e-6)


def test_unrecognized_weight_suffix_fails_loudly(tmp_path):
    """A file with no matching converter (e.g. a .pb) must raise, not
    silently run random-init (same contract as a conversion failure)."""
    pb = tmp_path / "frozen_ssd.pb"
    pb.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="not a loadable weight artifact"):
        create_detector(str(pb))
    det = create_detector(str(pb), allow_random_weights=True)
    assert det.width == 300


def test_mobilenet_named_tflite_routes_to_ssd(tmp_path):
    """'mobilenet' (and 'edgetpu') .tflite names must hit the SSD branch in
    BOTH family inference and detector dispatch — a mismatch builds an
    EfficientDet detector around SSD-shaped params."""
    from deepdish_tpu.models.ssd_mobilenet import SSDMobileNetDetector
    for stem in ("mobilenet_v1_coco", "detect_edgetpu"):
        bad = tmp_path / f"{stem}.tflite"
        bad.write_bytes(b"\x00garbage" * 64)
        det = create_detector(str(bad), allow_random_weights=True)
        assert isinstance(det, SSDMobileNetDetector), stem


def test_postprocess_op_max_detections_caps_valid_slots():
    """A fused op's max_detections invalidates slots past it while keeping
    the detector's slot shape (the pipeline's programs are sized by
    max_outputs)."""
    import numpy as np
    from deepdish_tpu.models.ssd_mobilenet import SSDMobileNetDetector
    det = create_detector("ssd_mobilenet", max_outputs=16,
                          score_threshold=0.0)
    capped = SSDMobileNetDetector(params=det.params, max_outputs=16,
                                  score_threshold=0.0, detections_cap=4)
    img = np.zeros((300, 300, 3), np.float32)
    b1, c1, s1, v1 = det.detect_jit(img, 640.0, 480.0)
    b2, c2, s2, v2 = capped.detect_jit(img, 640.0, 480.0)
    assert v1.shape == v2.shape == (16,)
    assert not np.any(np.asarray(v2)[4:])
    np.testing.assert_array_equal(np.asarray(v2)[:4], np.asarray(v1)[:4])
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b1))
