"""CVAT FrameRecords subsystem tests: merge semantics, XML round trip,
and the split-mode pipeline path."""
import json
import os
import xml.etree.ElementTree as ET

import cv2
import numpy as np
import pytest

from deepdish_tpu.pipeline.framerecords import (FrameRecords, Record,
                                                overlap_fraction)
from deepdish_tpu.pipeline.framestep import DetectionSnapshot, FrameStep
from deepdish_tpu.pipeline.runtime import Pipeline
from deepdish_tpu.pipeline.main import amain
from test_pipeline_e2e import make_video, detect_rects_rgb, W, H

LABELS = {0: "person", 1: "car"}


def test_overlap_fraction():
    a = np.array([0, 0, 10, 10], float)
    b = np.array([0, 0, 5, 10], float)  # half of a, fully inside
    assert overlap_fraction(a, b) == 1.0  # by smaller-area convention
    c = np.array([20, 20, 30, 30], float)
    assert overlap_fraction(a, c) == 0.0


def test_process_boxes_merge():
    fr = FrameRecords(LABELS)
    fr.add_annotation_label_info("person", 0, "#ff0000")
    # annotation overlapping an incoming detection
    fr.add_annotated_track(1, 7, "person", [10, 10, 50, 90], False, False,
                           True, 0)
    # annotation with no matching detection
    fr.add_annotated_track(1, 8, "person", [200, 200, 240, 280], False,
                           False, True, 0)
    boxes, labels, scores = fr.process_boxes(
        1, [np.array([11, 11, 39, 79], float)], ["person"], [0.8])
    # output: matched annotation (detection absorbed) + injected annotation
    assert len(boxes) == 2
    assert labels == ["person", "person"]
    assert scores[0] == 1.0 and scores[1] == 1.0
    # second is the injected annotation at its annotated position
    np.testing.assert_allclose(boxes[1], [200, 200, 40, 80])


def test_process_boxes_label_mismatch_no_merge():
    fr = FrameRecords(LABELS)
    fr.add_annotation_label_info("car", 1, "#00ff00")
    fr.add_annotated_track(1, 3, "car", [10, 10, 50, 90], False, False,
                           True, 0)
    boxes, labels, scores = fr.process_boxes(
        1, [np.array([10, 10, 40, 80], float)], ["person"], [0.8])
    # labels differ -> detection kept as-is AND annotation injected
    assert len(boxes) == 2
    assert set(labels) == {"person", "car"}


def test_xml_output_roundtrip(tmp_path):
    fr = FrameRecords(LABELS, minimum_track_frames=2)
    fr.add_annotation_label_info("person", 0, "#ff0000")
    for f in range(1, 4):
        fr.add_annotated_track(f, 5, "person",
                               [10 + f, 10, 50 + f, 90], False, False,
                               True, 0)
        fr.process_boxes(f, [np.array([100 + f, 50, 30, 60], float)],
                         ["car"], [0.9])
        # simulate a tracker consuming the detector record
        for rec in fr.frames[f]:
            if not rec.is_annotation:
                rec.tracker_id = 42
    tree = fr.xml_output()
    out = tmp_path / "annotations.xml"
    tree.write(str(out), xml_declaration=True, encoding='utf-8')
    root = ET.parse(str(out)).getroot()
    tracks = root.findall('track')
    sources = {t.get('source') for t in tracks}
    assert sources == {"manual", "automatic"}
    manual = [t for t in tracks if t.get('source') == 'manual'][0]
    assert manual.get('id') == '5' and manual.get('label') == 'person'
    assert len(manual.findall('box')) == 3
    auto = [t for t in tracks if t.get('source') == 'automatic'][0]
    assert auto.get('label') == 'car'
    assert auto.findall('box')[-1].get('outside') == '1'

    # parse back in
    fr2 = FrameRecords.from_cvat_xml(str(out), LABELS)
    assert any(r.annotation_track_id == 5 for r in fr2.frames[1])


def _scripted_detect_only(self, state, frame_rgb):
    dets = detect_rects_rgb(np.asarray(frame_rgb))
    D = self.tracker_cfg.max_detections
    tlwh = np.zeros((D, 4), np.float32)
    label = np.zeros((D,), np.int32)
    score = np.zeros((D,), np.float32)
    valid = np.zeros((D,), bool)
    for i, d in enumerate(dets[:D]):
        tlwh[i], score[i], label[i] = d[0], d[1], d[2]
        valid[i] = True
    return state.bg, DetectionSnapshot(tlwh=tlwh, label=label, score=score,
                                       valid=valid)


@pytest.mark.timeout(600)
def test_cvat_pipeline_output(tmp_path, monkeypatch):
    """Full pipeline with --output-cvat-dir writes CVAT annotations."""
    video = tmp_path / "v.mp4"
    make_video(video)
    cvat_out = tmp_path / "cvat"
    monkeypatch.setattr(FrameStep, "detect_only", _scripted_detect_only)
    monkeypatch.setattr(Pipeline, "_warmup", lambda self, d: None)
    import asyncio
    asyncio.run(amain([
        "--input", str(video), "--output-cvat-dir", str(cvat_out),
        "--wanted-labels", "person", "--model", "ssd_mobilenet",
        "--encoder-model", "dummy", "--disable-background-subtraction",
        "--streaming-port", "0", "--control-port", "0", "--device", "cpu",
        "--max-frames", "30",
    ]))
    xml = cvat_out / "annotations.xml"
    assert xml.exists()
    root = ET.parse(str(xml)).getroot()
    autos = [t for t in root.findall('track')
             if t.get('source') == 'automatic']
    # the two moving rectangles became automatic tracks
    assert len(autos) >= 2
    assert all(len(t.findall('box')) >= 3 for t in autos)


@pytest.mark.timeout(600)
def test_cvat_input_dir_pipeline(tmp_path, monkeypatch):
    """--input-cvat-dir: frame sequence + annotations.xml drive the merge."""
    cvat_in = tmp_path / "cvat_in"
    (cvat_in / "images").mkdir(parents=True)
    # frame sequence (reference expects images/frame_%06d.jpg from 1)
    from test_pipeline_e2e import _rect_positions
    for i in range(12):
        frame = np.zeros((H, W, 3), np.uint8)
        for color, (x, y, w, h) in _rect_positions(i):
            bgr = (0, 0, 255) if color == 'red' else (0, 255, 0)
            cv2.rectangle(frame, (int(x), int(y)), (int(x + w), int(y + h)),
                          bgr, -1)
        cv2.imwrite(str(cvat_in / "images" / f"frame_{i+1:06d}.jpg"), frame)
    # annotations: one manual person track roughly on the red rectangle
    root = ET.Element('annotations')
    meta = ET.SubElement(root, 'meta')
    task = ET.SubElement(meta, 'task')
    labels = ET.SubElement(task, 'labels')
    lab = ET.SubElement(labels, 'label')
    ET.SubElement(lab, 'name').text = 'person'
    ET.SubElement(lab, 'color').text = '#ff0000'
    track = ET.SubElement(root, 'track',
                          attrib={'id': '3', 'label': 'person'})
    for f in range(1, 13):
        x = 20 + (f - 1) * 6
        ET.SubElement(track, 'box', attrib={
            'frame': str(f), 'outside': '0', 'occluded': '0',
            'keyframe': '1', 'z_order': '0',
            'xtl': str(x), 'ytl': '60', 'xbr': str(x + 40), 'ybr': '120'})
    ET.ElementTree(root).write(str(cvat_in / "annotations.xml"))

    cvat_out = tmp_path / "cvat_out"
    monkeypatch.setattr(FrameStep, "detect_only", _scripted_detect_only)
    monkeypatch.setattr(Pipeline, "_warmup", lambda self, d: None)
    import asyncio
    asyncio.run(amain([
        "--input-cvat-dir", str(cvat_in),
        "--output-cvat-dir", str(cvat_out),
        "--wanted-labels", "person", "--model", "ssd_mobilenet",
        "--encoder-model", "dummy", "--disable-background-subtraction",
        "--disable-graphics",
        "--streaming-port", "0", "--control-port", "0", "--device", "cpu",
    ]))
    xml = cvat_out / "annotations.xml"
    assert xml.exists()
    out_root = ET.parse(str(xml)).getroot()
    manual = [t for t in out_root.findall('track')
              if t.get('source') == 'manual']
    assert manual and manual[0].get('id') == '3'
