"""Bounding-box representation conversions and IoU, batched for TPU.

TPU-native re-design of the per-object conversions in the reference
(`deep_sort/detection.py:35-50`, `deep_sort/track.py:84-111`,
`deep_sort/iou_matching.py:7-39`): instead of converting one box at a time in
Python, every function here operates on `(..., 4)` arrays so whole
fixed-capacity detection/track tables convert in one vector op.

Formats:
  tlwh: (top-left x, top-left y, width, height)
  tlbr: (min x, min y, max x, max y)
  xyah: (center x, center y, aspect = w/h, height)
"""
from __future__ import annotations

import jax.numpy as jnp


def tlwh_to_tlbr(tlwh: jnp.ndarray) -> jnp.ndarray:
    tl = tlwh[..., :2]
    return jnp.concatenate([tl, tl + tlwh[..., 2:4]], axis=-1)


def tlbr_to_tlwh(tlbr: jnp.ndarray) -> jnp.ndarray:
    tl = tlbr[..., :2]
    return jnp.concatenate([tl, tlbr[..., 2:4] - tl], axis=-1)


def tlwh_to_xyah(tlwh: jnp.ndarray) -> jnp.ndarray:
    """Center x/y, aspect ratio (w/h), height. Ref deep_sort/detection.py:43-50."""
    center = tlwh[..., :2] + tlwh[..., 2:4] / 2.0
    a = tlwh[..., 2:3] / tlwh[..., 3:4]
    h = tlwh[..., 3:4]
    return jnp.concatenate([center, a, h], axis=-1)


def xyah_to_tlwh(xyah: jnp.ndarray) -> jnp.ndarray:
    """Inverse of tlwh_to_xyah. Ref deep_sort/track.py:84-97 (to_tlwh)."""
    h = xyah[..., 3:4]
    w = xyah[..., 2:3] * h
    tl = xyah[..., :2] - jnp.concatenate([w, h], axis=-1) / 2.0
    return jnp.concatenate([tl, w, h], axis=-1)


def xyxy_to_tlwh(xyxy: jnp.ndarray) -> jnp.ndarray:
    return tlbr_to_tlwh(xyxy)


def iou_matrix_tlwh(a_tlwh: jnp.ndarray, b_tlwh: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between two sets of tlwh boxes -> (N, M).

    Matches the arithmetic of deep_sort/iou_matching.py:7-39 (no +1 pixel
    convention), vectorized over both sets at once.
    """
    a_tl, a_br = a_tlwh[:, None, :2], a_tlwh[:, None, :2] + a_tlwh[:, None, 2:4]
    b_tl, b_br = b_tlwh[None, :, :2], b_tlwh[None, :, :2] + b_tlwh[None, :, 2:4]
    tl = jnp.maximum(a_tl, b_tl)
    br = jnp.minimum(a_br, b_br)
    wh = jnp.maximum(0.0, br - tl)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a_tlwh[:, None, 2] * a_tlwh[:, None, 3])
    area_b = (b_tlwh[None, :, 2] * b_tlwh[None, :, 3])
    return inter / (area_a + area_b - inter)


def iou_matrix_tlbr_plus1(a_tlbr: jnp.ndarray, b_tlbr: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU with the reference's +1-pixel area convention.

    Used by the greedy NMS variants (deep_sort/preprocessing.py:48,64-67 and
    tools/ssd_mobilenet.py:85-89); note intersection uses +1 on w/h while the
    per-box areas differ between the two reference NMS variants — this helper
    implements the ssd_mobilenet convention (area = w*h with w,h = x2-x1,
    y2-y1, intersection +1).
    """
    tl = jnp.maximum(a_tlbr[:, None, :2], b_tlbr[None, :, :2])
    br = jnp.minimum(a_tlbr[:, None, 2:4], b_tlbr[None, :, 2:4])
    wh = jnp.maximum(0.0, br - tl + 1.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = ((a_tlbr[:, 2] - a_tlbr[:, 0]) * (a_tlbr[:, 3] - a_tlbr[:, 1]))[:, None]
    area_b = ((b_tlbr[:, 2] - b_tlbr[:, 0]) * (b_tlbr[:, 3] - b_tlbr[:, 1]))[None, :]
    return inter / (area_a + area_b - inter)
