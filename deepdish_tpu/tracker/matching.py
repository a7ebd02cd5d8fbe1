"""Masked matching stages: appearance cascade + IoU association, in-jit.

Re-design of deep_sort/linear_assignment.py:11-141 and tracker.py:95-133 for
fixed-capacity tables. The reference builds Python index lists per cascade
level and calls scipy per level; here each level gathers a submatrix of a
precomputed (T, D) cost matrix into a square capacity-K problem (ordered the
way the reference orders its lists, so LSAP tie-breaking matches), solves it
with the in-jit JV solver, and scatters accepted matches back to slot space.
Empty levels are skipped with `lax.cond`, so the fori_loop over `max_age`
levels costs nothing when no track is that stale.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.assignment import solve_lsap
from ..ops.onehot import (gather_1d, gather_rows, scatter_rows_unique,
                          sort_values, stable_argsort)
from .types import TrackerConfig, CONFIRMED, TENTATIVE


def _solve(cost, n_rows, n_cols, impl: str):
    """Dispatch between the XLA while_loop solver and the Pallas kernel
    (3x faster on v5e; see ops/assignment_pallas.py). "pallas_interpret"
    runs the kernel through the Pallas interpreter — CPU tests of the
    kernel code path (e.g. multi-device shard_map on a host mesh)."""
    if impl == "pallas" or (impl == "auto" and
                            jax.default_backend() == "tpu"):
        from ..ops.assignment_pallas import solve_lsap_pallas
        return solve_lsap_pallas(cost, n_rows, n_cols)
    if impl == "pallas_interpret":
        from ..ops.assignment_pallas import solve_lsap_pallas
        return solve_lsap_pallas(cost, n_rows, n_cols, interpret=True)
    return solve_lsap(cost, n_rows, n_cols)

# np scalar, NOT a jnp array: a module-level jnp constant would
# initialize the jax backend at import time, before the CLI's
# --device/--disable-edgetpu platform override can run (and on a
# wedged accelerator tunnel that init blocks forever)
_BIGKEY = np.int32(2 ** 30)
_PAD_COST = 7e7


def masked_min_cost_matching(cost_full: jnp.ndarray,
                             row_mask: jnp.ndarray,
                             row_key: jnp.ndarray,
                             col_mask: jnp.ndarray,
                             max_distance: float,
                             K: int,
                             lsap_impl: str = "auto"):
    """One min_cost_matching call (linear_assignment.py:11-75) on masked
    rows/cols of a precomputed (T, D) cost matrix.

    row_key orders the eligible rows the way the reference orders its track
    index list (creation order / grouped), col order is ascending detection
    index. Returns (matched_col per row slot (T,), matched per col (D,) bool).
    """
    T, D = cost_full.shape
    n_rows = jnp.sum(row_mask).astype(jnp.int32)
    n_cols = jnp.sum(col_mask).astype(jnp.int32)

    # All gathers/scatters/sorts below are one-hot contractions
    # (ops/onehot.py): XLA's native gather/scatter/sort lower to serialized
    # loops on TPU (~30-50 us each), which dominated the tracker step.
    rkey = jnp.where(row_mask, row_key, _BIGKEY)
    row_perm = stable_argsort(rkey)                      # (T,)
    ckey = jnp.where(col_mask, jnp.arange(D, dtype=jnp.int32), _BIGKEY)
    col_perm = stable_argsort(ckey)                      # (D,)

    # Gather into the square capacity-K problem.
    rp = jnp.concatenate([row_perm, jnp.zeros((K - T,), row_perm.dtype)]) \
        if K > T else row_perm[:K]
    cp = jnp.concatenate([col_perm, jnp.zeros((K - D,), col_perm.dtype)]) \
        if K > D else col_perm[:K]
    sub = gather_rows(gather_rows(cost_full, rp).T, cp).T   # (K, K)
    # Reference clamp before solving (linear_assignment.py:57).
    sub = jnp.where(sub > max_distance, max_distance + 1e-5, sub)
    ri = jnp.arange(K, dtype=jnp.int32)
    sub = jnp.where((ri[:, None] < n_rows) & (ri[None, :] < n_cols),
                    sub, _PAD_COST)

    col4row = _solve(sub, n_rows, n_cols, lsap_impl)     # (K,)

    # Accept matches with cost <= max_distance (linear_assignment.py:70-74).
    got_col = col4row >= 0
    c4r = jnp.clip(col4row, 0, K - 1)
    sub_cost = jnp.sum(
        sub * (c4r[:, None] == ri[None, :]).astype(sub.dtype), axis=1)
    accept = got_col & (ri < n_rows) & (sub_cost <= max_distance)

    det_idx = gather_1d(cp, c4r)

    scatter_slot = jnp.where(accept, rp, jnp.int32(T))  # T = OOB -> dropped
    matched_col = scatter_rows_unique(
        jnp.full((T,), -1, jnp.int32), scatter_slot, det_idx)

    col_scatter = jnp.where(accept, det_idx, jnp.int32(D))
    col_matched = (col_scatter[:, None] ==
                   jnp.arange(D, dtype=jnp.int32)[None, :]).any(0)
    return matched_col, col_matched


def matching_cascade(cfg: TrackerConfig,
                     app_cost: jnp.ndarray,
                     state: jnp.ndarray,
                     track_id: jnp.ndarray,
                     time_since_update: jnp.ndarray,
                     det_valid: jnp.ndarray):
    """Age-levelled appearance cascade (linear_assignment.py:78-141).

    The reference loops over all `max_age` (=60) levels and skips empty
    ones; here the DISTINCT time_since_update values present among
    confirmed tracks (ascending, capped at max_age like the reference's
    level range) are compacted first, and a while_loop visits only those —
    in steady state one or two assignment solves per frame instead of 60
    guarded branches. Early-exits when no unmatched detections remain
    (linear_assignment.py:125-126).

    Returns (matched_det (T,), det_taken (D,)).
    """
    T, D = app_cost.shape
    K = max(T, D)
    confirmed = state == CONFIRMED
    BIG = jnp.int32(1 << 30)

    # distinct levels (tsu values), ascending; tsu > max_age is outside the
    # cascade's level range and correctly never matches appearance-wise
    eligible_tsu = jnp.where(
        confirmed & (time_since_update <= cfg.max_age),
        time_since_update, BIG)
    sorted_tsu = sort_values(eligible_tsu)
    prev = jnp.concatenate(
        [jnp.full((1,), -1, sorted_tsu.dtype), sorted_tsu[:-1]])
    distinct = jnp.where((sorted_tsu != prev) & (sorted_tsu < BIG),
                         sorted_tsu, BIG)
    levels = sort_values(distinct)
    n_levels = jnp.sum(levels < BIG)

    def cond(carry):
        i, _, det_taken = carry
        return (i < n_levels) & jnp.any(det_valid & ~det_taken)

    def body(carry):
        i, matched_det, det_taken = carry
        lv = levels[jnp.minimum(i, T - 1)]
        row_mask = confirmed & (time_since_update == lv)
        col_mask = det_valid & ~det_taken
        mc, cm = masked_min_cost_matching(
            app_cost, row_mask, track_id, col_mask,
            cfg.max_cosine_distance, K, cfg.lsap_impl)
        return (i + 1, jnp.where(mc >= 0, mc, matched_det),
                det_taken | cm)

    matched0 = jnp.full((T,), -1, jnp.int32)
    taken0 = jnp.zeros((D,), bool)
    _, matched, taken = jax.lax.while_loop(
        cond, body, (jnp.int32(0), matched0, taken0))
    return matched, taken


def iou_stage(cfg: TrackerConfig,
              iou_cost: jnp.ndarray,
              state: jnp.ndarray,
              track_id: jnp.ndarray,
              time_since_update: jnp.ndarray,
              cascade_matched: jnp.ndarray,
              det_valid: jnp.ndarray,
              det_taken: jnp.ndarray):
    """IoU association of unconfirmed + just-missed confirmed tracks
    (tracker.py:119-129). Returns (matched_det (T,), det_taken (D,))."""
    T, D = iou_cost.shape
    K = max(T, D)
    confirmed = state == CONFIRMED
    tentative = state == TENTATIVE
    unmatched_conf = confirmed & (cascade_matched < 0)
    row_mask = tentative | (unmatched_conf & (time_since_update == 1))
    # Reference order: unconfirmed first (creation order), then unmatched
    # confirmed tsu==1 (ascending index, as CPython int-set iteration yields).
    row_key = jnp.where(tentative, track_id, track_id + (_BIGKEY // 2))
    col_mask = det_valid & ~det_taken

    def run(_):
        mc, cm = masked_min_cost_matching(
            iou_cost, row_mask, row_key, col_mask, cfg.max_iou_distance, K,
            cfg.lsap_impl)
        return (jnp.where(mc >= 0, mc, cascade_matched), det_taken | cm)

    return jax.lax.cond(
        jnp.any(row_mask) & jnp.any(col_mask), run,
        lambda _: (cascade_matched, det_taken), None)
