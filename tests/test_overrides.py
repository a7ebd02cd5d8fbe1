"""Tracker override ops (CVAT force-update / silent delete)."""
import numpy as np
import jax.numpy as jnp

from deepdish_tpu import tracker as tt
from deepdish_tpu.tracker.overrides import delete_slots, force_update_slots


def _cfg():
    return tt.TrackerConfig(max_tracks=8, max_detections=4, feature_dim=16,
                            gallery_size=8, pending_size=4, num_labels=2)


def _mkdet(cfg, boxes):
    n = len(boxes)
    feats = np.tile(np.eye(1, cfg.feature_dim, dtype=np.float32), (n, 1))
    return tt.pack_detections(cfg, boxes, [0.9] * n, [0] * n, feats)


def test_force_update_confirms_and_zeroes_tsu(rng):
    cfg = _cfg()
    table = tt.create_table(cfg)
    dets = _mkdet(cfg, [[10, 10, 20, 40]])
    table, out = tt.step(cfg, table, dets)
    slot = int(np.where(np.asarray(out.state) != tt.EMPTY)[0][0])
    # miss a few frames -> tentative would die; force-update resurrects
    empty = _mkdet(cfg, [])
    table, out = tt.step(cfg, table, dets)          # hit again
    table, out = tt.step(cfg, table, dets)          # confirmed now
    table, out = tt.step(cfg, table, empty)         # miss -> tsu 1
    assert int(np.asarray(table.time_since_update)[slot]) == 1
    slot_det = np.full((cfg.max_tracks,), -1, np.int32)
    slot_det[slot] = 0
    table2 = force_update_slots(cfg, table, jnp.asarray(slot_det), dets)
    assert int(np.asarray(table2.time_since_update)[slot]) == 0
    assert int(np.asarray(table2.state)[slot]) == tt.CONFIRMED
    assert int(np.asarray(table2.hits)[slot]) == \
        int(np.asarray(table.hits)[slot]) + 1


def test_delete_slots_silent(rng):
    cfg = _cfg()
    table = tt.create_table(cfg)
    dets = _mkdet(cfg, [[10, 10, 20, 40], [100, 100, 30, 50]])
    table, out = tt.step(cfg, table, dets)
    live = np.where(np.asarray(table.state) != tt.EMPTY)[0]
    assert len(live) == 2
    mask = np.zeros((cfg.max_tracks,), bool)
    mask[live[0]] = True
    table2 = delete_slots(cfg, table, jnp.asarray(mask))
    assert int(np.asarray(table2.state)[live[0]]) == tt.EMPTY
    assert int(np.asarray(table2.state)[live[1]]) != tt.EMPTY
    assert int(np.asarray(table2.track_id)[live[0]]) == -1
