"""Parity against the ACTUAL reference implementation.

Unlike test_tracker_parity (which checks against a re-implemented oracle),
this suite imports the reference's own deep_sort package from
/root/reference (pure numpy/scipy — no model weights involved) and runs it
side by side with the in-jit tracker on identical detection streams. Skipped
automatically when the reference checkout is absent.
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "deep_sort")),
    reason="reference checkout not available")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

from deepdish_tpu import tracker as tt
from test_tracker_parity import World, F


def _import_reference():
    # numpy 2.x compatibility shims for the 2020-era reference code
    if not hasattr(np, "float"):
        np.float = float  # used at deep_sort/detection.py:30
    if not hasattr(np, "int"):
        np.int = int
    from deep_sort import nn_matching
    from deep_sort.tracker import Tracker
    from deep_sort.detection import Detection
    return nn_matching, Tracker, Detection


class _RefDetection:
    """Adaptor: reference Detection lacks a label arg in some versions."""


@pytest.mark.parametrize("seed", [0, 5, 11])
@pytest.mark.timeout(600)
def test_against_reference_deep_sort(seed):
    nn_matching, RefTracker, RefDetection = _import_reference()
    rng = np.random.RandomState(seed)
    world = World(rng)
    max_age = 12
    cfg = tt.TrackerConfig(max_tracks=32, max_detections=16, feature_dim=F,
                           gallery_size=512, pending_size=8, num_labels=4,
                           max_age=max_age)
    table = tt.create_table(cfg)
    metric = nn_matching.NearestNeighborDistanceMetric("cosine", 0.2, None)
    ref = RefTracker(metric, max_iou_distance=0.7, max_age=max_age)

    for step_i in range(60):
        if step_i % 6 == 0:
            world.spawn(label=rng.randint(0, 3))
        if step_i % 13 == 12:
            world.kill_oldest()
        dets = world.frame()

        ref.predict()
        ref_dets = [RefDetection(d[0], str(d[2]), d[1], d[3]) for d in dets]
        ref.update(ref_dets)

        packed = tt.pack_detections(
            cfg, [d[0] for d in dets], [d[1] for d in dets],
            [d[2] for d in dets], [d[3] for d in dets])
        table, out = tt.step(cfg, table, packed)

        got = sorted(
            (int(i), int(s), int(h), int(u))
            for i, s, h, u in zip(np.asarray(out.track_id),
                                  np.asarray(out.state),
                                  np.asarray(out.hits),
                                  np.asarray(out.time_since_update))
            if s != tt.EMPTY)
        want = sorted((t.track_id, t.state, t.hits, t.time_since_update)
                      for t in ref.tracks)
        assert got == want, f"seed={seed} frame={step_i}\n{got}\n{want}"

        got_del = sorted(int(i) for i in np.asarray(out.deleted_id)
                         if i >= 0)
        want_del = sorted(t.track_id for t in ref.deleted_tracks
                          if t.is_deleted())
        assert got_del == want_del, f"seed={seed} frame={step_i}"

        # box agreement (f32 vs f64 Kalman)
        ref_boxes = {t.track_id: t.to_tlwh() for t in ref.tracks}
        ids = np.asarray(out.track_id)
        boxes = np.asarray(out.tlwh)
        states = np.asarray(out.state)
        for slot in range(cfg.max_tracks):
            if states[slot] == tt.EMPTY:
                continue
            np.testing.assert_allclose(
                boxes[slot], ref_boxes[int(ids[slot])], rtol=1e-3, atol=0.5,
                err_msg=f"seed={seed} frame={step_i} id={ids[slot]}")
