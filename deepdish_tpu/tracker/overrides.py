"""Host-initiated track-table overrides for annotation-driven (CVAT) mode.

The reference's FrameRecords mutates tracker objects directly
(deepdish/framerecords.py:130-184: force-updating lost annotated tracks via
`t.update(...); t.state = Confirmed; t.time_since_update = 0`, and silently
dropping duplicate tracks from the list). With the table-based tracker the
equivalents are two small jit programs that the host invokes only when CVAT
annotation mode is active (an offline evaluation path, not the hot loop).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import boxes as boxops
from ..ops import kalman
from ..ops.distance import _normalize as _normalize_rows
from .types import CONFIRMED, EMPTY, Detections, TrackTable, TrackerConfig


@functools.partial(jax.jit, static_argnums=0)
def force_update_slots(cfg: TrackerConfig, table: TrackTable,
                       slot_det: jnp.ndarray, dets: Detections):
    """For each slot with slot_det[slot] >= 0, run a full measurement update
    against detection slot_det[slot] and force Confirmed / tsu=0
    (framerecords.py:157-160)."""
    T, D, L, P = (cfg.max_tracks, cfg.max_detections, cfg.num_labels,
                  cfg.pending_size)
    do = slot_det >= 0
    mdet = jnp.clip(slot_det, 0, D - 1)
    det_xyah = boxops.tlwh_to_xyah(dets.tlwh)

    um, uc = kalman.update_v(table.mean, table.cov, det_xyah[mdet])
    mean = jnp.where(do[:, None], um, table.mean)
    cov = jnp.where(do[:, None, None], uc, table.cov)
    hits = table.hits + do.astype(jnp.int32)

    det_label = dets.label[mdet]
    det_conf = dets.confidence[mdet]
    onehot = (jax.nn.one_hot(det_label, L, dtype=jnp.int32) *
              do[:, None].astype(jnp.int32))
    label_count = table.label_count + onehot
    label_conf = table.label_conf + \
        onehot.astype(table.label_conf.dtype) * det_conf[:, None]

    pslot = jnp.clip(table.pending_count, 0, P - 1)
    pending = jnp.where(
        (do[:, None] &
         (jnp.arange(P, dtype=jnp.int32)[None, :] == pslot[:, None])
         )[:, :, None],
        _normalize_rows(dets.feature[mdet])[:, None, :], table.pending)
    pending_count = jnp.minimum(table.pending_count + do.astype(jnp.int32),
                                P)

    state = jnp.where(do, CONFIRMED, table.state)
    tsu = jnp.where(do, 0, table.time_since_update)
    return table._replace(mean=mean, cov=cov, hits=hits, state=state,
                          time_since_update=tsu, label_count=label_count,
                          label_conf=label_conf, pending=pending,
                          pending_count=pending_count)


@functools.partial(jax.jit, static_argnums=0)
def delete_slots(cfg: TrackerConfig, table: TrackTable,
                 delete_mask: jnp.ndarray):
    """Silently free the masked slots (duplicate-track removal,
    framerecords.py:169-183 — these do NOT produce deletion events)."""
    T = cfg.max_tracks
    d = delete_mask
    z = lambda x: jnp.where(d.reshape((T,) + (1,) * (x.ndim - 1)),
                            jnp.zeros_like(x), x)
    return table._replace(
        state=jnp.where(d, EMPTY, table.state),
        track_id=jnp.where(d, -1, table.track_id),
        hits=z(table.hits), age=z(table.age),
        time_since_update=z(table.time_since_update),
        label_count=z(table.label_count), label_conf=z(table.label_conf),
        pending_count=z(table.pending_count),
        gallery_count=z(table.gallery_count),
        mean=jnp.where(d[:, None],
                       jnp.zeros((T, 8), table.mean.dtype).at[:, 3].set(1.0),
                       table.mean),
        cov=jnp.where(d[:, None, None],
                      jnp.eye(8, dtype=table.cov.dtype)[None], table.cov))
