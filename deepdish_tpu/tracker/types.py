"""Fixed-capacity tracker state for TPU.

The reference keeps tracks as a Python list of `Track` objects with dynamic
feature lists and a dict-of-lists appearance gallery
(deep_sort/track.py:67-82, nn_matching.py:135). On TPU everything must be
static-shape, so the whole tracker is a table of arrays with a per-slot
state code and validity implied by ``state != EMPTY``:

  * slot lifecycle: EMPTY -> TENTATIVE -> CONFIRMED -> (freed back to EMPTY);
    "Deleted" is reported transiently in the step output, then the slot is
    reused.
  * the appearance gallery is a per-slot ring buffer standing in for the
    unbounded `metric.samples` lists (budget=None at deepdish.py:515); with
    `gallery_size` >= the episode's updates per track the semantics are
    identical.
  * per-label vote state is a count + confidence-sum histogram over the
    wanted-label vocabulary, replacing Track.dist (track.py:78-79,149-151).

All capacities are static Python ints carried in `TrackerConfig`, so one
compiled program serves every frame.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# Track slot states.
EMPTY = 0
TENTATIVE = 1
CONFIRMED = 2

INFTY_COST = 1e5  # deep_sort/linear_assignment.py:8


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    """Static tracker parameters (defaults match the reference CLI:
    deepdish.py:1412-1423 and deep_sort/tracker.py:40)."""
    max_tracks: int = 64            # track table capacity
    max_detections: int = 32        # detection table capacity
    feature_dim: int = 128          # appearance embedding size
    gallery_size: int = 128         # ring budget standing in for unbounded
    pending_size: int = 8           # pre-confirmation feature buffer
    num_labels: int = 8             # wanted-label vocabulary size
    max_cosine_distance: float = 0.2
    max_iou_distance: float = 0.7
    max_age: int = 60
    n_init: int = 3
    gating_threshold: float = 9.4877  # chi2inv95[4]
    # assignment solver backend: "auto" = Pallas kernel on TPU, XLA solver
    # elsewhere; "xla" forces the lax.while_loop solver (required under
    # vmap, e.g. the multi-stream engine); "pallas" forces the kernel.
    lsap_impl: str = "auto"


class TrackTable(NamedTuple):
    """The whole tracker state as one pytree of fixed-shape arrays."""
    mean: jnp.ndarray          # (T, 8) Kalman mean (x, y, a, h, v*)
    cov: jnp.ndarray           # (T, 8, 8) Kalman covariance
    state: jnp.ndarray         # (T,) int32: EMPTY/TENTATIVE/CONFIRMED
    track_id: jnp.ndarray      # (T,) int32, creation-ordered unique ids
    hits: jnp.ndarray          # (T,) int32
    age: jnp.ndarray           # (T,) int32
    time_since_update: jnp.ndarray  # (T,) int32
    gallery: jnp.ndarray       # (T, G, F) confirmed-track feature gallery
    gallery_count: jnp.ndarray  # (T,) int32 total appended (ring index)
    pending: jnp.ndarray       # (T, P, F) features awaiting partial_fit
    pending_count: jnp.ndarray  # (T,) int32
    label_count: jnp.ndarray   # (T, L) int32 votes per label
    label_conf: jnp.ndarray    # (T, L) f32 summed confidence per label
    next_id: jnp.ndarray       # () int32, next track id (starts at 1)


class Detections(NamedTuple):
    """Fixed-capacity per-frame detections, in pipeline-NMS pick order."""
    tlwh: jnp.ndarray     # (D, 4)
    confidence: jnp.ndarray  # (D,)
    label: jnp.ndarray    # (D,) int32 index into the wanted-label vocab
    feature: jnp.ndarray  # (D, F)
    valid: jnp.ndarray    # (D,) bool


class TrackStepOutput(NamedTuple):
    """Per-frame snapshot the host reads for analytics/rendering."""
    track_id: jnp.ndarray     # (T,) int32 (post-update slot ids)
    state: jnp.ndarray        # (T,) int32 (post-update)
    tlwh: jnp.ndarray         # (T, 4) current boxes from the Kalman mean
    time_since_update: jnp.ndarray  # (T,) int32
    hits: jnp.ndarray         # (T,) int32
    age: jnp.ndarray          # (T,) int32
    label_count: jnp.ndarray  # (T, L) int32
    label_conf: jnp.ndarray   # (T, L) f32
    matched_det: jnp.ndarray  # (T,) int32 det index matched this frame or -1
    deleted_id: jnp.ndarray   # (T,) int32 ids deleted this frame (-1 = none)
    deleted_tlwh: jnp.ndarray  # (T, 4) last box of deleted tracks
    deleted_label_count: jnp.ndarray  # (T, L)
    deleted_label_conf: jnp.ndarray   # (T, L)


def create_table(cfg: TrackerConfig, dtype=jnp.float32) -> TrackTable:
    T, G, P, F, L = (cfg.max_tracks, cfg.gallery_size, cfg.pending_size,
                     cfg.feature_dim, cfg.num_labels)
    return TrackTable(
        mean=jnp.zeros((T, 8), dtype).at[:, 3].set(1.0),  # h=1 keeps chol finite
        cov=jnp.tile(jnp.eye(8, dtype=dtype)[None], (T, 1, 1)),
        state=jnp.zeros((T,), jnp.int32),
        track_id=jnp.full((T,), -1, jnp.int32),
        hits=jnp.zeros((T,), jnp.int32),
        age=jnp.zeros((T,), jnp.int32),
        time_since_update=jnp.zeros((T,), jnp.int32),
        gallery=jnp.zeros((T, G, F), dtype),
        gallery_count=jnp.zeros((T,), jnp.int32),
        pending=jnp.zeros((T, P, F), dtype),
        pending_count=jnp.zeros((T,), jnp.int32),
        label_count=jnp.zeros((T, L), jnp.int32),
        label_conf=jnp.zeros((T, L), dtype),
        next_id=jnp.asarray(1, jnp.int32),
    )


def gallery_pressure(cfg: TrackerConfig, table: TrackTable) -> int:
    """Largest per-slot appended-feature count (host int). When this reaches
    gallery_size the ring starts overwriting and appearance costs diverge
    from the reference's unbounded gallery (deepdish.py:515 budget=None,
    nn_matching.py:150-154). The runtime grows the gallery before that."""
    return int(np.asarray(table.gallery_count).max())


def gallery_overflow(cfg: TrackerConfig, table: TrackTable) -> int:
    """Total features overwritten by the ring across live slots (0 means the
    bounded gallery is still exactly the reference's unbounded one)."""
    counts = np.asarray(table.gallery_count)
    return int(np.maximum(counts - cfg.gallery_size, 0).sum())


def grow_gallery(cfg: TrackerConfig, table: TrackTable, new_size: int):
    """Exact episode-unbounded gallery semantics: return (cfg', table') with
    the gallery ring enlarged to `new_size`. MUST be called while every
    slot's gallery_count is still <= gallery_size (before any overwrite):
    until then the ring layout is linear, so zero-padding the gallery axis
    preserves every stored feature at its index and min-cosine distances are
    bit-identical. The recompile this forces is O(log episode length) times
    per run."""
    if new_size < cfg.gallery_size:
        raise ValueError("gallery can only grow")
    if gallery_pressure(cfg, table) > cfg.gallery_size:
        raise ValueError("gallery already wrapped; growth would scramble "
                         "ring order — grow earlier (pressure threshold)")
    new_cfg = dataclasses.replace(cfg, gallery_size=new_size)
    T, G, F = table.gallery.shape
    pad = jnp.zeros((T, new_size - G, F), table.gallery.dtype)
    return new_cfg, table._replace(
        gallery=jnp.concatenate([table.gallery, pad], axis=1))


def pack_detections(cfg: TrackerConfig, tlwh, confidence, label, feature,
                    dtype=np.float32) -> Detections:
    """Host helper: pad variable-length detections to capacity."""
    D, F = cfg.max_detections, cfg.feature_dim
    n = min(len(tlwh), D)
    out_tlwh = np.zeros((D, 4), dtype)
    out_conf = np.zeros((D,), dtype)
    out_label = np.zeros((D,), np.int32)
    out_feat = np.zeros((D, F), dtype)
    valid = np.zeros((D,), bool)
    if n:
        out_tlwh[:n] = np.asarray(tlwh, dtype)[:n]
        out_conf[:n] = np.asarray(confidence, dtype)[:n]
        out_label[:n] = np.asarray(label, np.int32)[:n]
        out_feat[:n] = np.asarray(feature, dtype)[:n]
        valid[:n] = True
    return Detections(jnp.asarray(out_tlwh), jnp.asarray(out_conf),
                      jnp.asarray(out_label), jnp.asarray(out_feat),
                      jnp.asarray(valid))
