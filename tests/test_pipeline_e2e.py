"""End-to-end pipeline test with count-parity check against the oracle.

Synthesizes an mp4 of colored rectangles crossing the countline, runs the
FULL host pipeline (capture thread -> fused infer stage -> counting ->
render -> log) with a scripted device step that detects the rectangles by
color thresholding (deterministic, no model weights needed), and compares
the final pos/neg/int/del counters against an oracle made of the reference
Deep SORT tracker + the reference counting semantics.
"""
import json
import os

import cv2
import numpy as np
import pytest

from deepdish_tpu import tracker as tt
from deepdish_tpu.pipeline.main import amain
from deepdish_tpu.pipeline.runtime import Pipeline
from deepdish_tpu.pipeline.counting import CountingState, cross2
from oracle_deepsort import OracleTracker, CONFIRMED as O_CONFIRMED

W, H, FRAMES = 320, 240, 48


def _rect_positions(framenum):
    """Two rectangles: red crosses left->right, green right->left."""
    rects = []
    x1 = 20 + framenum * 6          # crosses x=160 around frame 23
    rects.append(('red', (x1, 60, 40, 60)))
    x2 = 260 - framenum * 6         # crosses x=160 around frame 16
    rects.append(('green', (x2, 140, 40, 60)))
    return rects


def make_video(path):
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*'mp4v'), 15,
                         (W, H))
    for i in range(FRAMES):
        frame = np.zeros((H, W, 3), np.uint8)
        for color, (x, y, w, h) in _rect_positions(i):
            bgr = (0, 0, 255) if color == 'red' else (0, 255, 0)
            cv2.rectangle(frame, (int(x), int(y)), (int(x + w), int(y + h)),
                          bgr, -1)
        vw.write(frame)
    vw.release()


def detect_rects_rgb(frame_rgb):
    """Color-threshold 'detector': tlwh boxes for red & green blobs."""
    dets = []
    for ci, color in ((0, 'red'), (1, 'green')):
        mask = frame_rgb[:, :, ci] > 128
        ys, xs = np.where(mask)
        if len(xs) > 10:
            x1, x2 = xs.min(), xs.max()
            y1, y2 = ys.min(), ys.max()
            dets.append((np.array([x1, y1, x2 - x1 + 1, y2 - y1 + 1],
                                  np.float32), 0.9, 0))
    return dets


def _feature_for(box):
    """Deterministic appearance feature keyed on box position row."""
    f = np.zeros(128, np.float32)
    f[int(box[1]) % 128] = 1.0
    f[0] += 0.1
    return f / np.linalg.norm(f)


def scripted_device_step(self, frames_rgb):
    """Replacement for Pipeline._device_step: scripted detector + real
    in-jit tracker."""
    results = []
    for frame in frames_rgb:
        dets = detect_rects_rgb(frame)
        packed = tt.pack_detections(
            self.tracker_cfg,
            [d[0] for d in dets], [d[1] for d in dets],
            [d[2] for d in dets], [_feature_for(d[0]) for d in dets])
        table, out = tt.step(self.tracker_cfg, self.state.table, packed)
        self.state = self.state._replace(table=table)
        snap_tlwh = np.asarray(packed.tlwh)
        snap = type('S', (), {})()
        from deepdish_tpu.pipeline.framestep import DetectionSnapshot
        snap = DetectionSnapshot(tlwh=packed.tlwh, label=packed.label,
                                 score=packed.confidence, valid=packed.valid)
        results.append((out, snap))
    return results


def _oracle_counts(video_path, max_age=60):
    """Reference-semantics oracle: OracleTracker + deepdish.py counting."""
    cap = cv2.VideoCapture(str(video_path))
    oracle = OracleTracker(max_age=max_age)
    counting = CountingState(['person'],
                             np.array([[W / 2, 0], [W / 2, H]], float))
    p1, q1 = counting.countline[0], counting.countline[1]
    db = {}
    pos = neg = 0
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        dets = [(d[0], d[1], d[2], _feature_for(d[0]))
                for d in detect_rects_rgb(rgb)]
        oracle.predict()
        oracle.update(dets)
        for t in oracle.tracks:
            if t.state != O_CONFIRMED or t.tsu > 1:
                continue
            tl = t.to_tlwh()
            bc = np.array([tl[0] + tl[2] / 2.0, tl[1] + tl[3]])
            db.setdefault(t.tid, []).append(bc)
            path = db[t.tid]
            if len(path) > 1:
                p2, q2 = np.array(path[-1]), np.array(path[-2])
                cp = cross2(q1 - p1, q2 - p2)
                from deepdish_tpu.pipeline.counting import _intersect
                if _intersect(p1, q1, p2, q2):
                    if cp >= 0:
                        pos += 1
                    else:
                        neg += 1
    cap.release()
    return pos, neg


@pytest.mark.timeout(600)
def test_pipeline_end_to_end(tmp_path, monkeypatch):
    video = tmp_path / "synth.mp4"
    out_video = tmp_path / "annotated.mp4"
    log = tmp_path / "events.log"
    make_video(video)

    monkeypatch.setattr(Pipeline, "_device_step", scripted_device_step)
    monkeypatch.setattr(Pipeline, "_warmup", lambda self, d: None)

    import asyncio
    asyncio.run(amain([
        "--input", str(video), "--output", str(out_video),
        "--log", str(log), "--wanted-labels", "person",
        "--model", "ssd_mobilenet", "--encoder-model", "dummy",
        "--streaming-port", "0", "--control-port", "0",
        "--device", "cpu",
    ]))

    want_pos, want_neg = _oracle_counts(video)
    assert want_pos >= 1 and want_neg >= 1  # sanity: scene produces both

    # crossing events were logged with the reference payload schema
    lines = [json.loads(l) for l in open(log)]
    assert lines, "no log lines written"
    last = lines[-1]
    assert last["poscount_person"] == want_pos
    assert last["negcount_person"] == want_neg
    assert last["intcount_person"] == want_pos + want_neg
    assert "diff_person" in last and "delcount_person" in last

    # annotated video got written
    assert out_video.exists() and out_video.stat().st_size > 1000


def test_restore_from_log(tmp_path, monkeypatch):
    log = tmp_path / "restore.log"
    log.write_text(json.dumps({
        "poscount_person": 5, "negcount_person": 2, "intcount_person": 7,
        "delcount_person": 1, "frame_count": 99}) + "\n")
    video = tmp_path / "v.mp4"
    make_video(video)
    monkeypatch.setattr(Pipeline, "_device_step", scripted_device_step)
    monkeypatch.setattr(Pipeline, "_warmup", lambda self, d: None)
    import asyncio
    asyncio.run(amain([
        "--input", str(video), "--log", str(log), "--restore-from-log",
        "--max-frames", "3", "--disable-graphics",
        "--streaming-port", "0", "--control-port", "0", "--device", "cpu",
    ]))
    lines = [json.loads(l) for l in open(log)]
    # counters continued from the restored state
    assert lines[-1]["poscount_person"] >= 5
    assert lines[-1]["negcount_person"] >= 2


@pytest.mark.timeout(600)
def test_pipeline_3d_topdown(tmp_path, monkeypatch):
    """--3d mode: pinhole unprojection + top-down elements render."""
    video = tmp_path / "v3d.mp4"
    make_video(video)
    out_video = tmp_path / "out3d.mp4"
    monkeypatch.setattr(Pipeline, "_device_step", scripted_device_step)
    monkeypatch.setattr(Pipeline, "_warmup", lambda self, d: None)
    import asyncio
    asyncio.run(amain([
        "--input", str(video), "--output", str(out_video),
        "--wanted-labels", "person", "--model", "ssd_mobilenet",
        "--encoder-model", "dummy", "--max-frames", "12",
        "--3d", "--sensor-width-mm", "6.69", "--sensor-height-mm", "5.55",
        "--focallength-mm", "3.2", "--elevation-m", "2",
        "--tilt-deg", "80", "--topdownview-size-m", "10,10",
        "--streaming-port", "0", "--control-port", "0", "--device", "cpu",
    ]))
    assert out_video.exists() and out_video.stat().st_size > 1000


def test_missing_input_is_loud(tmp_path):
    """A mistyped --input path must raise, not 'succeed' with 0 frames
    (cv2.VideoCapture opens missing files as empty streams)."""
    import asyncio
    with pytest.raises(FileNotFoundError, match="nope.mp4"):
        asyncio.run(amain([
            "--input", str(tmp_path / "nope.mp4"),
            "--model", "scripted:noop", "--encoder-model", "dummy",
            "--disable-graphics", "--streaming-port", "0",
            "--control-port", "0", "--device", "cpu",
        ]))
