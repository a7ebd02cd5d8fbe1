"""Unbounded-gallery parity via grow-on-recompile (VERDICT round-1 item #6).

The reference keeps every appearance feature per track forever
(deepdish.py:515 budget=None, deep_sort/nn_matching.py:150-154); our fixed
ring overwrites past gallery_size. `grow_gallery` doubles the ring before
any overwrite, giving EXACT unbounded semantics for episode lengths up to
--gallery-max. Verified here with a >500-frame stream against the reference
oracle, starting from a deliberately tiny gallery so growth triggers
repeatedly.
"""
import numpy as np
import pytest

from deepdish_tpu import tracker as tt
from oracle_deepsort import OracleTracker
from test_tracker_parity import F, World


def test_grow_gallery_preserves_ring():
    cfg = tt.TrackerConfig(max_tracks=4, max_detections=2, feature_dim=8,
                           gallery_size=4, pending_size=2, num_labels=2)
    table = tt.create_table(cfg)
    g = np.zeros((4, 4, 8), np.float32)
    g[1, :, :] = np.arange(4)[:, None]
    table = table._replace(gallery=np.asarray(g, np.float32),
                           gallery_count=np.array([0, 4, 2, 0], np.int32))
    cfg2, table2 = tt.grow_gallery(cfg, table, 8)
    assert cfg2.gallery_size == 8
    assert table2.gallery.shape == (4, 8, 8)
    np.testing.assert_array_equal(np.asarray(table2.gallery[:, :4]), g)
    assert np.all(np.asarray(table2.gallery[:, 4:]) == 0)


def test_grow_gallery_rejects_wrapped():
    cfg = tt.TrackerConfig(max_tracks=2, max_detections=2, feature_dim=8,
                           gallery_size=4, pending_size=2, num_labels=2)
    table = tt.create_table(cfg)
    table = table._replace(gallery_count=np.array([5, 0], np.int32))
    with pytest.raises(ValueError, match="wrapped"):
        tt.grow_gallery(cfg, table, 8)


@pytest.mark.timeout(900)
def test_long_stream_parity_with_growth():
    """600 frames, gallery starts at 8 and must grow ~7 times; every
    discrete tracking decision still matches the unbounded-gallery oracle
    frame by frame."""
    rng = np.random.RandomState(4)
    world = World(rng, miss_prob=0.15)
    cfg = tt.TrackerConfig(max_tracks=16, max_detections=8, feature_dim=F,
                           gallery_size=8, pending_size=4, num_labels=4,
                           max_age=25)
    table = tt.create_table(cfg)
    oracle = OracleTracker(max_age=25)
    world.spawn(label=0)
    world.spawn(label=1)

    grown = 0
    steps = 600
    for step_i in range(steps):
        if step_i in (200, 400):
            world.spawn(label=2)
        if step_i == 450:
            world.kill_oldest()
        dets = world.frame()
        oracle.predict()
        oracle.update(dets)

        # the runtime's growth rule: grow before any ring can wrap
        if tt.gallery_pressure(cfg, table) + 1 >= cfg.gallery_size:
            cfg, table = tt.grow_gallery(cfg, table, 2 * cfg.gallery_size)
            grown += 1

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
        want = sorted((t.tid, t.state, t.hits, t.tsu)
                      for t in oracle.tracks)
        assert got == want, \
            f"frame={step_i} grown={grown}\n{got}\n{want}"
        got_del = sorted(int(i) for i in np.asarray(out.deleted_id)
                         if i >= 0)
        want_del = sorted(t.tid for t in oracle.deleted_tracks)
        assert got_del == want_del, f"frame={step_i}"

    assert grown >= 5, f"growth never exercised (grown={grown})"
    assert tt.gallery_overflow(cfg, table) == 0
    assert cfg.gallery_size >= 512
