"""The multi-target tracker step, fully in-jit over the fixed track table.

TPU-native re-design of deep_sort/tracker.py:10-138 + track.py:113-209: one
call = predict + two-stage association + Kalman updates + lifecycle +
gallery partial_fit, all as masked tensor ops over the (T,)-slot table, with
the two sequential association solves as `lax.while_loop` programs. The host
never sees individual tracks — it reads the TrackStepOutput snapshot.

Semantics preserved from the reference (for crossing-count parity):
  * predict increments age/time_since_update for every live track
    (track.py:113-125);
  * appearance cascade over `max_age` levels with Mahalanobis gating at
    chi2inv95[4] and the max_distance clamp (linear_assignment.py:78-190);
  * IoU stage for unconfirmed + just-missed confirmed tracks, with
    INFTY rows for time_since_update > 1 (iou_matching.py:74-76);
  * tentative tracks deleted on first miss, confirmed after n_init hits,
    aged out when time_since_update > max_age (track.py:145,190-196);
  * new tracks created from unmatched detections in detection order with
    sequential ids (tracker.py:135-138);
  * features buffered per track and flushed to the gallery only for
    confirmed tracks at the end of the step (tracker.py:83-93).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import boxes as boxops
from ..ops import kalman
from ..ops.distance import _normalize as _normalize_rows
from ..ops.distance import gallery_min_cosine
from ..ops.onehot import (gather_1d, gather_rows, scatter_rows_unique,
                          stable_argsort)
from .matching import iou_stage, matching_cascade
from .types import (CONFIRMED, EMPTY, INFTY_COST, TENTATIVE, Detections,
                    TrackStepOutput, TrackTable, TrackerConfig)


def _gallery_valid(cfg: TrackerConfig, gallery_count: jnp.ndarray):
    g = jnp.arange(cfg.gallery_size, dtype=jnp.int32)
    return g[None, :] < jnp.minimum(gallery_count, cfg.gallery_size)[:, None]


@functools.partial(jax.jit, static_argnums=0)
def step(cfg: TrackerConfig, table: TrackTable, dets: Detections):
    """One frame: returns (new_table, TrackStepOutput)."""
    T, D, L = cfg.max_tracks, cfg.max_detections, cfg.num_labels
    live = table.state != EMPTY

    # ---- predict (tracker.py:51-57) ----
    pm, pc = kalman.predict_v(table.mean, table.cov)
    mean = jnp.where(live[:, None], pm, table.mean)
    cov = jnp.where(live[:, None, None], pc, table.cov)
    age = table.age + live.astype(jnp.int32)
    tsu = table.time_since_update + live.astype(jnp.int32)

    # ---- cost matrices, once per frame ----
    # Features are unit-normalized ONCE here and stored normalized in
    # pending/gallery, so the appearance distance never has to
    # re-normalize the whole (T, G, F) gallery per frame (cosine distance
    # is invariant; nn_matching.py normalizes on every query instead).
    feat_n = _normalize_rows(dets.feature)
    det_xyah = boxops.tlwh_to_xyah(dets.tlwh)
    app = gallery_min_cosine(
        table.gallery, _gallery_valid(cfg, table.gallery_count) &
        live[:, None], feat_n, data_is_normalized=True)
    app = jnp.where(jnp.isfinite(app), app, INFTY_COST)
    gate = kalman.gating_distance_v(mean, cov, det_xyah)
    app = jnp.where(gate > cfg.gating_threshold, INFTY_COST, app)

    track_tlwh = boxops.xyah_to_tlwh(mean[:, :4])
    iou = 1.0 - boxops.iou_matrix_tlwh(track_tlwh, dets.tlwh)
    iou = jnp.where((tsu > 1)[:, None], INFTY_COST, iou)

    # ---- two-stage association (tracker.py:95-133) ----
    matched, taken = matching_cascade(
        cfg, app, table.state, table.track_id, tsu, dets.valid)
    matched, taken = iou_stage(
        cfg, iou, table.state, table.track_id, tsu, matched,
        dets.valid, taken)
    was_matched = matched >= 0
    mdet = jnp.clip(matched, 0, D - 1)

    # ---- Kalman measurement update for matched tracks ----
    # (all det-indexed reads are one-hot contractions — see ops/onehot.py)
    um, uc = kalman.update_v(mean, cov, gather_rows(det_xyah, mdet))
    mean = jnp.where(was_matched[:, None], um, mean)
    cov = jnp.where(was_matched[:, None, None], uc, cov)
    hits = table.hits + was_matched.astype(jnp.int32)
    tsu = jnp.where(was_matched, 0, tsu)

    # label vote (track.py:147-152)
    det_label = gather_1d(dets.label, mdet)
    det_conf = gather_1d(dets.confidence, mdet)
    onehot = (jax.nn.one_hot(det_label, L, dtype=jnp.int32) *
              was_matched[:, None].astype(jnp.int32))
    label_count = table.label_count + onehot
    label_conf = table.label_conf + onehot.astype(table.label_conf.dtype) * \
        det_conf[:, None]

    # pending feature append (track.py:141)
    P = cfg.pending_size
    pslot = jnp.clip(table.pending_count, 0, P - 1)
    pending = jnp.where(
        (was_matched[:, None] &
         (jnp.arange(P, dtype=jnp.int32)[None, :] == pslot[:, None])
         )[:, :, None],
        gather_rows(feat_n, mdet)[:, None, :], table.pending)
    pending_count = jnp.minimum(
        table.pending_count + was_matched.astype(jnp.int32), P)

    # confirmation (track.py:145-146)
    state = jnp.where(
        (table.state == TENTATIVE) & was_matched & (hits >= cfg.n_init),
        CONFIRMED, table.state)

    # ---- mark_missed (track.py:190-196) ----
    unmatched_live = live & ~was_matched
    delete = (unmatched_live & (
        (state == TENTATIVE) |
        ((state == CONFIRMED) & (tsu > cfg.max_age))))

    deleted_id = jnp.where(delete, table.track_id, -1)
    deleted_tlwh = jnp.where(delete[:, None],
                             boxops.xyah_to_tlwh(mean[:, :4]), 0.0)
    deleted_lc = jnp.where(delete[:, None], label_count, 0)
    deleted_lf = jnp.where(delete[:, None], label_conf, 0.0)

    # free deleted slots
    state = jnp.where(delete, EMPTY, state)
    live = state != EMPTY
    track_id = jnp.where(delete, -1, table.track_id)
    zero_on_delete = lambda x: jnp.where(
        delete.reshape((T,) + (1,) * (x.ndim - 1)), jnp.zeros_like(x), x)
    hits = zero_on_delete(hits)
    age = zero_on_delete(age)
    tsu = zero_on_delete(tsu)
    label_count = zero_on_delete(label_count)
    label_conf = zero_on_delete(label_conf)
    pending_count = zero_on_delete(pending_count)
    gallery_count = zero_on_delete(table.gallery_count)
    mean = jnp.where(delete[:, None],
                     jnp.zeros((T, 8), mean.dtype).at[:, 3].set(1.0), mean)
    cov = jnp.where(delete[:, None, None], jnp.eye(8, dtype=cov.dtype)[None],
                    cov)

    # ---- initiate new tracks (tracker.py:78-79,135-138) ----
    new_det = dets.valid & ~taken
    det_rank = jnp.cumsum(new_det.astype(jnp.int32)) - 1     # (D,)
    free = ~live
    slot_ids = jnp.arange(T, dtype=jnp.int32)
    free_order = stable_argsort(jnp.where(free, slot_ids, T + slot_ids))
    n_free = jnp.sum(free.astype(jnp.int32))
    can_place = new_det & (det_rank < n_free)
    # slot for each new det: free_order[rank]
    det_slot = jnp.where(can_place,
                         gather_1d(free_order,
                                   jnp.clip(det_rank, 0, T - 1)), T)

    im, ic = kalman.initiate_v(det_xyah)                     # (D, 8), (D, 8, 8)
    scat = lambda arr, upd: scatter_rows_unique(arr, det_slot, upd)
    mean = scat(mean, im)
    cov = scat(cov, ic)
    state = scat(state, jnp.full((D,), TENTATIVE, state.dtype))
    new_ids = table.next_id + det_rank
    track_id = scat(track_id, new_ids.astype(jnp.int32))
    hits = scat(hits, jnp.ones((D,), jnp.int32))
    age = scat(age, jnp.ones((D,), jnp.int32))
    tsu = scat(tsu, jnp.zeros((D,), jnp.int32))
    label_count = scat(label_count, jax.nn.one_hot(dets.label, L,
                                                   dtype=jnp.int32))
    label_conf = scat(label_conf,
                      jax.nn.one_hot(dets.label, L,
                                     dtype=label_conf.dtype) *
                      dets.confidence[:, None])
    pend0 = jnp.zeros((D, P, cfg.feature_dim), pending.dtype
                      ).at[:, 0, :].set(feat_n)
    pending = scat(pending, pend0)
    pending_count = scat(pending_count, jnp.ones((D,), jnp.int32))
    gallery_count = scat(gallery_count, jnp.zeros((D,), jnp.int32))
    next_id = table.next_id + jnp.sum(can_place.astype(jnp.int32))

    # ---- gallery partial_fit for confirmed tracks (tracker.py:83-93) ----
    # One-hot formulation of the per-feature ring append: feature k of slot
    # t lands at ring position (gallery_count[t] + k) % G when k < flush_n.
    # Positions within one flush are distinct because P <= G, so a single
    # masked select reproduces the reference's sequential appends exactly
    # (and avoids P serialized TPU scatters).
    G = cfg.gallery_size
    assert P <= G, "pending_size must not exceed gallery_size"
    gallery = table.gallery
    confirmed_now = state == CONFIRMED
    flush_n = jnp.where(confirmed_now, pending_count, 0)

    ks = jnp.arange(P, dtype=jnp.int32)
    pos = (gallery_count[:, None] + ks[None, :]) % G          # (T, P)
    do = ks[None, :] < flush_n[:, None]                       # (T, P)
    # Scatter the <= T*P new rows instead of re-selecting the whole
    # (T, G, F) gallery each frame: the ring positions within one flush
    # are distinct (P <= G) so rows are written at most once, and masked
    # entries are pushed out of range and dropped. Masked rows get
    # DISTINCT out-of-range positions (G + k) so the unique_indices
    # promise holds even for them. The scan carry then updates in place
    # rather than rewriting the 4 MB gallery per frame.
    pos = jnp.where(do, pos, G + ks[None, :])
    t_idx = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[:, None],
                             (T, P))
    gallery = gallery.at[t_idx, pos].set(pending, mode="drop",
                                         unique_indices=True)
    gallery_count = gallery_count + flush_n
    pending_count = jnp.where(confirmed_now, 0, pending_count)
    # deleted slots: wipe gallery validity implicitly via gallery_count=0

    new_table = TrackTable(
        mean=mean, cov=cov, state=state, track_id=track_id, hits=hits,
        age=age, time_since_update=tsu, gallery=gallery,
        gallery_count=gallery_count, pending=pending,
        pending_count=pending_count, label_count=label_count,
        label_conf=label_conf, next_id=next_id)

    out = TrackStepOutput(
        track_id=track_id, state=state,
        tlwh=boxops.xyah_to_tlwh(mean[:, :4]),
        time_since_update=tsu, hits=hits, age=age,
        label_count=label_count, label_conf=label_conf,
        matched_det=matched, deleted_id=deleted_id,
        deleted_tlwh=deleted_tlwh, deleted_label_count=deleted_lc,
        deleted_label_conf=deleted_lf)
    return new_table, out
