"""End-to-end parity: in-jit fixed-capacity tracker vs the Deep SORT oracle.

Feeds identical synthetic detection streams (objects entering/leaving with
jittered boxes and noisy appearance features) to both trackers and checks
that every discrete decision matches frame by frame: live (id, state, hits,
tsu) tuples, match pairs, deleted ids — plus box agreement to f32 tolerance.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from deepdish_tpu import tracker as tt
from oracle_deepsort import OracleTracker, CONFIRMED as O_CONFIRMED

F = 32  # feature dim for tests


class World:
    """Synthetic scene: objects with constant velocity + noise."""

    def __init__(self, rng, miss_prob=0.1, jitter=2.0):
        self.rng = rng
        self.objs = {}
        self.miss_prob = miss_prob
        self.jitter = jitter
        self._next = 0

    def spawn(self, label=0):
        r = self.rng
        self.objs[self._next] = dict(
            pos=r.uniform(100, 500, size=2),
            vel=r.uniform(-8, 8, size=2),
            size=r.uniform(30, 60, size=2),
            feat=r.normal(size=F).astype(np.float32),
            label=label)
        self._next += 1

    def kill_oldest(self):
        if self.objs:
            del self.objs[min(self.objs)]

    def frame(self):
        dets = []
        for o in self.objs.values():
            o['pos'] += o['vel']
            if self.rng.uniform() < self.miss_prob:
                continue
            tl = o['pos'] + self.rng.normal(0, self.jitter, size=2)
            wh = o['size'] * (1 + self.rng.normal(0, 0.02, size=2))
            feat = (o['feat'] + self.rng.normal(0, 0.05, size=F)
                    ).astype(np.float32)
            conf = float(self.rng.uniform(0.5, 1.0))
            dets.append((np.r_[tl, wh].astype(np.float32), conf,
                         int(o['label']), feat))
        self.rng.shuffle(dets)
        return dets


def _run_parity(seed, steps=60, max_age=10):
    rng = np.random.RandomState(seed)
    world = World(rng)
    cfg = tt.TrackerConfig(max_tracks=32, max_detections=16, feature_dim=F,
                           gallery_size=256, pending_size=8, num_labels=4,
                           max_age=max_age)
    table = tt.create_table(cfg)
    oracle = OracleTracker(max_age=max_age)

    for step_i in range(steps):
        if step_i % 7 == 0:
            world.spawn(label=rng.randint(0, 3))
        if step_i % 13 == 12:
            world.kill_oldest()
        dets = world.frame()

        oracle.predict()
        oracle.update(dets)

        packed = tt.pack_detections(
            cfg,
            [d[0] for d in dets], [d[1] for d in dets],
            [d[2] for d in dets], [d[3] for d in dets])
        table, out = tt.step(cfg, table, packed)

        # live track tuples
        got = sorted(
            (int(i), int(s), int(h), int(u))
            for i, s, h, u in zip(np.asarray(out.track_id),
                                  np.asarray(out.state),
                                  np.asarray(out.hits),
                                  np.asarray(out.time_since_update))
            if s != tt.EMPTY)
        want = sorted((t.tid, t.state, t.hits, t.tsu) for t in oracle.tracks)
        assert got == want, f"seed={seed} frame={step_i}\n{got}\n{want}"

        # deleted ids
        got_del = sorted(int(i) for i in np.asarray(out.deleted_id) if i >= 0)
        want_del = sorted(t.tid for t in oracle.deleted_tracks)
        assert got_del == want_del, f"seed={seed} frame={step_i}"

        # boxes agree to f32 tolerance
        oracle_boxes = {t.tid: t.to_tlwh() for t in oracle.tracks}
        ids = np.asarray(out.track_id)
        boxes = np.asarray(out.tlwh)
        states = np.asarray(out.state)
        for slot in range(cfg.max_tracks):
            if states[slot] == tt.EMPTY:
                continue
            np.testing.assert_allclose(
                boxes[slot], oracle_boxes[int(ids[slot])],
                rtol=1e-3, atol=0.5,
                err_msg=f"seed={seed} frame={step_i} id={ids[slot]}")


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_tracker_parity_stream(seed):
    _run_parity(seed)


def test_tracker_parity_long_occlusion():
    # lower miss rate, longer run, deeper cascade levels
    rng = np.random.RandomState(99)
    world = World(rng, miss_prob=0.35)
    cfg = tt.TrackerConfig(max_tracks=16, max_detections=8, feature_dim=F,
                           gallery_size=256, num_labels=4, max_age=20)
    table = tt.create_table(cfg)
    oracle = OracleTracker(max_age=20)
    world.spawn()
    world.spawn(label=1)
    world.spawn(label=2)
    for step_i in range(80):
        dets = world.frame()
        oracle.predict()
        oracle.update(dets)
        packed = tt.pack_detections(
            cfg, [d[0] for d in dets], [d[1] for d in dets],
            [d[2] for d in dets], [d[3] for d in dets])
        table, out = tt.step(cfg, table, packed)
        got = sorted((int(i), int(s))
                     for i, s in zip(np.asarray(out.track_id),
                                     np.asarray(out.state))
                     if s != tt.EMPTY)
        want = sorted((t.tid, t.state) for t in oracle.tracks)
        assert got == want, f"frame={step_i}\n{got}\n{want}"


def test_label_votes():
    cfg = tt.TrackerConfig(max_tracks=8, max_detections=4, feature_dim=F,
                           num_labels=4)
    table = tt.create_table(cfg)
    feat = np.zeros((F,), np.float32)
    feat[0] = 1.0
    box = np.array([100, 100, 40, 80], np.float32)
    for i in range(5):
        lbl = 1 if i < 3 else 2
        packed = tt.pack_detections(cfg, [box], [0.9], [lbl], [feat])
        table, out = tt.step(cfg, table, packed)
    counts = np.asarray(out.label_count)
    live = np.asarray(out.state) != tt.EMPTY
    slot = int(np.where(live)[0][0])
    assert counts[slot, 1] == 3 and counts[slot, 2] == 2
    name = tt.get_label(counts[slot], np.asarray(out.label_conf)[slot],
                        ["person", "car", "bicycle", "motorbike"])
    assert name == "car"


def test_motorbike_bicycle_rule():
    # track.py:162-188: lean toward 'bicycle' unless motorbike prob
    # exceeds bicycle prob by more than 4x.
    labels = ["person", "bicycle", "motorbike", "car"]
    counts = np.zeros(4, np.int64)
    confs = np.zeros(4, np.float64)
    counts[2], confs[2] = 3, 3 * 0.9   # motorbike x3
    counts[1], confs[1] = 2, 2 * 0.8   # bicycle x2
    assert tt.get_label(counts, confs, labels) == "bicycle"
    counts[2], confs[2] = 40, 40 * 0.9  # overwhelming motorbike
    assert tt.get_label(counts, confs, labels) == "motorbike"
    name, conf = tt.get_label(counts, confs, labels, return_confidence=True)
    assert name == "motorbike" and abs(conf - 0.9) < 1e-9
