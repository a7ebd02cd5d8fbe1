"""Rectangular linear sum assignment, in-jit, scipy-compatible.

The reference delegates data association to
`scipy.optimize.linear_sum_assignment` (deep_sort/linear_assignment.py:4,58),
a C++ implementation of the shortest-augmenting-path (Jonker-Volgenant style)
algorithm of Crouse, "On implementing 2D rectangular assignment algorithms"
(IEEE TAES 2016). Crossing-count parity requires byte-identical assignments,
so this module re-implements the *same algorithm with the same tie-breaking
rules* as a fixed-capacity JAX program that runs inside `jit` on TPU — no
host callback in the hot loop:

  * rows are augmented in ascending order;
  * the Dijkstra frontier scans the `remaining` column list, which starts in
    descending column order and is compacted by swap-with-last removal;
  * among tied minimum reduced costs, the first scan position wins unless a
    later tied column is unmatched, in which case the last such unmatched
    column wins (this mirrors the `<` / `== && unmatched` update rule);
  * when n_rows > n_cols the problem is solved transposed (as scipy does).

Capacities are static; actual sizes `n_rows`/`n_cols` are traced scalars, so
one compiled program serves every frame. The sequential structure is a
`lax.while_loop` whose per-iteration work is O(C)-wide vector ops — small,
VPU-friendly, and independent of padding.

Precision: the solver runs in float32 (TPU has no fast f64). This matches
scipy's f64 results on the matrices the tracker actually produces, because
`min_cost_matching` clamps every entry to `max_distance + 1e-5` (<= ~1.0,
linear_assignment.py:57) *before* solving — so reduced costs stay O(1) where
f32 resolves ~1e-7. Do not feed raw INFTY_COST=1e5 entries directly: at 1e5
magnitude f32 cannot distinguish the clamped tie patterns scipy sees in f64.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_INF = jnp.inf


def _solve_ascending(cost: jnp.ndarray, n_rows, n_cols, active=True):
    """Core solver; correct when n_rows <= n_cols (the `active` flag must be
    False otherwise).

    cost: (R, C) float matrix (padded entries beyond n_rows/n_cols ignored).
    Returns col4row: (R,) int32, assigned column per row (-1 beyond n_rows).

    `active` exists for vmap safety: under vmap, `lax.cond` lowers to a
    select that executes BOTH branches for every lane, so this function can
    be invoked with an invalid orientation (n_rows > n_cols) or empty
    problem on lanes that logically skip it. Inactive lanes initialize each
    augmenting search with sink=0, so the batched while_loops never iterate
    for them and always terminate.
    """
    R, C = cost.shape
    dtype = cost.dtype
    col_ids = jnp.asarray(np.arange(C, dtype=np.int32))
    pos_ids = col_ids
    enable = jnp.asarray(active) & (n_rows <= n_cols) & (n_cols > 0)

    def augment_row(cur_row, state):
        u, v, row2col, col2row = state
        en = enable & (cur_row < n_rows)

        # --- Dijkstra for the shortest augmenting path from cur_row ---
        remaining0 = (n_cols - 1 - col_ids).astype(jnp.int32)  # descending
        init = (
            jnp.int32(cur_row),                 # i: current row
            jnp.asarray(0.0, dtype),            # minVal
            jnp.full((C,), _INF, dtype),        # shortestPathCosts
            jnp.full((C,), -1, jnp.int32),      # path (predecessor row per col)
            jnp.zeros((R,), bool),              # SR
            jnp.zeros((C,), bool),              # SC
            remaining0,                         # remaining columns (ordered)
            jnp.int32(n_cols),                  # numRemaining
            jnp.where(en, jnp.int32(-1), jnp.int32(0)),  # sink (0 = skip)
            jnp.asarray(0.0, dtype),            # lowest at termination
        )

        def dj_cond(s):
            return s[8] < 0

        def dj_body(s):
            i, min_val, spc, path, sr, sc, remaining, num_rem, sink, _ = s
            sr = sr.at[i].set(True)
            # Relax all remaining columns at once.
            in_rem = (~sc) & (col_ids < n_cols)
            r = min_val + cost[i] - u[i] - v
            better = in_rem & (r < spc)
            spc = jnp.where(better, r, spc)
            path = jnp.where(better, i, path)

            # Scan `remaining[0:num_rem]` for the minimum with scipy's
            # tie-break: first occurrence, overridden by the last tied
            # unmatched column.
            it_valid = pos_ids < num_rem
            cols_at = remaining
            c_at = jnp.where(it_valid, spc[cols_at], _INF)
            lowest = jnp.min(c_at)
            tied = it_valid & (c_at == lowest)
            unmatched = tied & (col2row[cols_at] < 0)
            first_tied = jnp.min(jnp.where(tied, pos_ids, C))
            last_unm = jnp.max(jnp.where(unmatched, pos_ids, -1))
            idx = jnp.where(jnp.any(unmatched), last_unm, first_tied)
            idx = jnp.clip(idx, 0, C - 1)
            j = remaining[idx]
            # Swap-remove position idx.
            remaining = remaining.at[idx].set(remaining[num_rem - 1])
            num_rem = num_rem - 1
            sc = sc.at[j].set(True)
            min_val = lowest
            is_sink = col2row[j] < 0
            sink = jnp.where(is_sink, j, jnp.int32(-1))
            i = jnp.where(is_sink, i, col2row[j])
            return (i, min_val, spc, path, sr, sc, remaining, num_rem,
                    sink, lowest)

        (_, min_val, spc, path, sr, sc, _, _, sink, _) = jax.lax.while_loop(
            dj_cond, dj_body, init)

        # --- Dual variable updates (no-ops when this row is inactive) ---
        row_ids = jnp.asarray(np.arange(R, dtype=np.int32))
        du = jnp.where(
            sr & (row_ids != cur_row),
            min_val - spc[jnp.clip(row2col, 0, C - 1)],
            jnp.where(row_ids == cur_row, min_val, 0.0))
        u = u + jnp.where(en, du, 0.0)
        v = v - jnp.where(en & sc, min_val - spc, 0.0)

        # --- Augment along the alternating path ---
        def aug_cond(s):
            return ~s[3]

        def aug_body(s):
            row2col_, col2row_, sink_, _ = s
            i = path[sink_]
            col2row_ = col2row_.at[sink_].set(i)
            old = row2col_[i]
            row2col_ = row2col_.at[i].set(sink_)
            return row2col_, col2row_, old, i == cur_row

        row2col, col2row, _, _ = jax.lax.while_loop(
            aug_cond, aug_body, (row2col, col2row, sink, ~en))
        return u, v, row2col, col2row

    u0 = jnp.zeros((R,), dtype)
    v0 = jnp.zeros((C,), dtype)
    row2col0 = jnp.full((R,), -1, jnp.int32)
    col2row0 = jnp.full((C,), -1, jnp.int32)
    _, _, row2col, _ = jax.lax.fori_loop(
        0, R, augment_row, (u0, v0, row2col0, col2row0))
    return row2col


def solve_lsap(cost: jnp.ndarray, n_rows, n_cols) -> jnp.ndarray:
    """scipy.optimize.linear_sum_assignment equivalent on a padded matrix.

    cost must be square-capacity (K, K) so both orientations share a shape;
    rows >= n_rows and cols >= n_cols are padding and never touched.
    Returns col4row: (K,) int32 with the assigned column for each real row
    (-1 for unassigned rows, including all padding rows).
    """
    K, K2 = cost.shape
    assert K == K2, "solve_lsap requires a square capacity matrix"
    n_rows = jnp.asarray(n_rows, jnp.int32)
    n_cols = jnp.asarray(n_cols, jnp.int32)

    def normal(_):
        return _solve_ascending(cost, n_rows, n_cols,
                                active=n_rows <= n_cols)

    def transposed(_):
        # scipy transposes when n_rows > n_cols and inverts the result.
        col2row = _solve_ascending(cost.T, n_cols, n_rows,
                                   active=n_rows > n_cols)
        out = jnp.full((K,), -1, jnp.int32)
        rows = col2row  # for each col (as row of the transpose): matched row
        cols = jnp.asarray(np.arange(K, dtype=np.int32))
        idx = jnp.where(rows >= 0, rows, K)  # K = out of bounds -> dropped
        return out.at[idx].set(cols, mode="drop")

    return jax.lax.cond(n_rows <= n_cols, normal, transposed, None)
