"""Full-state checkpoint and weight persistence tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from deepdish_tpu import tracker as tt
from deepdish_tpu.models import create_box_encoder
from deepdish_tpu.models.weights import load_npz, save_npz
from deepdish_tpu.pipeline.checkpoint import load_state, save_state
from deepdish_tpu.pipeline.framestep import PipelineState


def _random_dets(cfg, rng, n=2):
    boxes = rng.uniform(10, 200, size=(n, 4)).astype(np.float32)
    boxes[:, 2:] = rng.uniform(20, 60, size=(n, 2))
    feats = rng.normal(size=(n, cfg.feature_dim)).astype(np.float32)
    return tt.pack_detections(cfg, boxes, [0.9] * n, [0] * n, feats)


def test_state_checkpoint_roundtrip(tmp_path, rng):
    cfg = tt.TrackerConfig(max_tracks=8, max_detections=4, feature_dim=32,
                           gallery_size=8, pending_size=4, num_labels=2)
    state = PipelineState(tt.create_table(cfg), None)
    for _ in range(5):
        table, out = tt.step(cfg, state.table, _random_dets(cfg, rng))
        state = state._replace(table=table)

    ckpt = tmp_path / "state.ckpt"
    counters = {"poscount_person": 3, "negcount_person": 1}
    save_state(str(ckpt), state, counters, 42)

    # continue the original vs the restored run with identical inputs
    restored, got_counters, fc = load_state(str(ckpt),
                                            PipelineState(
                                                tt.create_table(cfg), None))
    assert fc == 42 and got_counters["poscount_person"] == 3
    dets = _random_dets(cfg, rng)
    t1, o1 = tt.step(cfg, state.table, dets)
    t2, o2 = tt.step(cfg, restored.table, dets)
    np.testing.assert_array_equal(np.asarray(o1.track_id),
                                  np.asarray(o2.track_id))
    np.testing.assert_allclose(np.asarray(t1.mean), np.asarray(t2.mean),
                               rtol=1e-6)


def test_state_checkpoint_capacity_mismatch(tmp_path, rng):
    cfg = tt.TrackerConfig(max_tracks=8, max_detections=4, feature_dim=32,
                           gallery_size=8, pending_size=4, num_labels=2)
    state = PipelineState(tt.create_table(cfg), None)
    ckpt = tmp_path / "s.ckpt"
    save_state(str(ckpt), state, {}, 0)
    cfg2 = tt.TrackerConfig(max_tracks=16, max_detections=4, feature_dim=32,
                            gallery_size=8, pending_size=4, num_labels=2)
    with pytest.raises(ValueError):
        load_state(str(ckpt), PipelineState(tt.create_table(cfg2), None))


def test_weights_npz_roundtrip(tmp_path):
    enc = create_box_encoder("mars")
    path = tmp_path / "mars.npz"
    save_npz(enc.params, str(path))
    loaded = load_npz(str(path))
    import jax
    flat1 = jax.tree_util.tree_leaves(enc.params)
    flat2 = jax.tree_util.tree_leaves(loaded)
    assert len(flat1) == len(flat2)
    # re-create the encoder with loaded params: same features
    enc2 = create_box_encoder("mars", params=loaded)
    x = jnp.asarray(np.random.RandomState(0).uniform(
        0, 255, size=(1, 128, 64, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(enc.apply(x)),
                               np.asarray(enc2.apply(x)), atol=1e-5)
