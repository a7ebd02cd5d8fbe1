"""Fixed-capacity greedy non-max suppression, in-jit.

The reference has two NMS variants, both data-dependent Python loops:
  1. deep_sort/preprocessing.py:6-73 — class-agnostic, overlap criterion
     ``intersection(+1px) / area(candidate)`` with area ``(w+1)*(h+1)``,
     applied on tlwh boxes, picked in descending score order.
  2. tools/ssd_mobilenet.py:59-98 — per-class, true-IoU criterion with
     +1px intersection and area ``w*h``, applied on xyxy boxes.

TPU-native redesign: both become fixed-trip-count `lax.fori_loop`s over a
precomputed pairwise overlap matrix, so XLA compiles a static program.
Variable box counts are carried as validity masks; suppressed/invalid slots
stay in the arrays and are masked out downstream. The per-class variant uses
the class-offset trick (boxes of different classes are translated far apart
so cross-class overlap is exactly zero) to avoid a per-class loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import boxes as boxops
from .onehot import argsort_desc_tie_high, gather_1d, gather_rows

_NEG = -jnp.inf


def _greedy(overlap: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
            max_overlap: float, tie_high: bool = True):
    """Greedy NMS as a Jacobi fixpoint — identical results to the
    sequential pick loop, but TPU-friendly.

    Greedy NMS has a closed recursive form: in pick order (score
    descending, ties -> highest index by default, matching the reference's
    pick-from-end-of-argsort; tie_high=False breaks ties toward the LOWER
    index, the tf.image.non_max_suppression order the Faster-RCNN stages
    need), box j survives iff no surviving earlier-ranked box suppresses
    it. Instead of K sequential pick steps (slow scalar control flow on
    TPU), iterate

        keep <- valid & ~any(S_upper & keep)

    which converges to that unique fixpoint in as many sweeps as the
    longest suppression chain (2-4 in practice), each sweep one (K, K)
    masked reduction on the VPU.

    overlap[i, j]: suppression metric of candidate j against picked box i.

    Returns (order, keep):
      order: (K,) int32, pick order; entries beyond the number of picks = -1.
      keep:  (K,) bool keep mask.
    """
    k = scores.shape[0]
    idx = jnp.asarray(np.arange(k, dtype=np.int32))

    # pick order: primary score desc, secondary index desc/asc. Sorts and
    # gathers here are one-hot contractions (ops/onehot.py) because XLA's
    # sort/gather lowerings serialize on TPU.
    from .onehot import argsort_desc_tie_low
    rank = (argsort_desc_tie_high(scores) if tie_high
            else argsort_desc_tie_low(scores))  # original idx per rank
    valid_r = gather_1d(valid, rank)
    # suppression in rank space, restricted to strictly-earlier ranks
    S = (gather_rows(gather_rows(overlap, rank).T, rank).T > max_overlap)
    upper = jnp.asarray(np.arange(k)[:, None] < np.arange(k)[None, :])
    S = S & upper & valid_r[:, None]

    def cond(carry):
        return carry[1]

    def body(carry):
        keep, _ = carry
        new = valid_r & ~jnp.any(S & keep[:, None], axis=0)
        return new, jnp.any(new != keep)

    keep_r, _ = jax.lax.while_loop(cond, body,
                                   (valid_r, jnp.asarray(True)))

    # pick order = kept boxes in rank order
    n_picked = jnp.cumsum(keep_r.astype(jnp.int32)) - 1
    slot = jnp.where(keep_r, n_picked, k)
    hit = slot[:, None] == idx[None, :]                     # (k, k)
    order = jnp.where(hit.any(0),
                      (hit * rank[:, None]).sum(0), -1).astype(jnp.int32)
    kslot = jnp.where(keep_r, rank, k)
    keep = (kslot[:, None] == idx[None, :]).any(0)
    return order, keep


def nms_tlwh(boxes_tlwh: jnp.ndarray, scores: jnp.ndarray,
             valid: jnp.ndarray, max_overlap: float):
    """Class-agnostic NMS matching deep_sort/preprocessing.py:6-73.

    Overlap criterion: intersection (with +1px on w/h) divided by the
    *candidate's* area, area convention (w+1)*(h+1).
    Returns (order, keep) as in `_greedy`.
    """
    tlbr = boxops.tlwh_to_tlbr(boxes_tlwh)
    tl = jnp.maximum(tlbr[:, None, :2], tlbr[None, :, :2])
    br = jnp.minimum(tlbr[:, None, 2:4], tlbr[None, :, 2:4])
    wh = jnp.maximum(0.0, br - tl + 1.0)
    inter = wh[..., 0] * wh[..., 1]
    area = (boxes_tlwh[:, 2] + 1.0) * (boxes_tlwh[:, 3] + 1.0)
    overlap = inter / area[None, :]  # normalized by candidate j's area
    return _greedy(overlap, scores, valid, max_overlap)


def nms_xyxy_per_class(boxes_xyxy: jnp.ndarray, scores: jnp.ndarray,
                       classes: jnp.ndarray, valid: jnp.ndarray,
                       iou_threshold: float, coord_span: float = 1e4):
    """Per-class greedy NMS matching tools/ssd_mobilenet.py:59-98.

    Criterion: IoU with +1px intersection and area = w*h; suppress when
    IoU > iou_threshold. Cross-class pairs never suppress (implemented by
    translating each class's boxes by class_id * coord_span before the
    pairwise overlap, so their intersection is zero).
    Returns (order, keep) as in `_greedy`.
    """
    offset = classes.astype(boxes_xyxy.dtype)[:, None] * coord_span
    shifted = boxes_xyxy + jnp.concatenate(
        [offset, jnp.zeros_like(offset), offset, jnp.zeros_like(offset)],
        axis=-1)
    tl = jnp.maximum(shifted[:, None, :2], shifted[None, :, :2])
    br = jnp.minimum(shifted[:, None, 2:4], shifted[None, :, 2:4])
    wh = jnp.maximum(0.0, br - tl + 1.0)
    inter = wh[..., 0] * wh[..., 1]
    w = boxes_xyxy[:, 2] - boxes_xyxy[:, 0]
    h = boxes_xyxy[:, 3] - boxes_xyxy[:, 1]
    area = w * h
    denom = area[:, None] + area[None, :] - inter
    iou = inter / jnp.where(denom == 0.0, 1.0, denom)
    # Same-class guard (exact, independent of coord_span magnitude).
    same = classes[:, None] == classes[None, :]
    iou = jnp.where(same, iou, 0.0)
    return _greedy(iou, scores, valid, iou_threshold)
