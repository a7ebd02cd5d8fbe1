"""Pallas TPU kernel for the Jonker-Volgenant assignment solver.

The in-jit XLA solver (ops/assignment.py) expresses each Dijkstra step as
a chain of small HLO ops inside `lax.while_loop`; on TPU every iteration
pays the loop-body op overhead. This kernel runs the ENTIRE solve inside
one `pallas_call`: the cost matrix and all solver state live in VMEM for
the duration, the sequential loops are in-kernel `lax` control flow, and
only the final assignment leaves the core.

Mosaic-specific formulation: arbitrary gathers (`spc[remaining]`) are not
lowerable inside kernels, so permutation reads are expressed as one-hot
MATMULS — `selected = vec @ M` with M[j, p] = (remaining[p] == j) — which
contract on the MXU. Infinity sentinels become 1e30 (inf * 0 = NaN in a
matmul); real path costs are bounded by K * pad << 1e30 so semantics are
unchanged.

The wide-matrix orientation (n_rows > n_cols: scipy solves the transpose
and inverts the result) is handled INSIDE the kernel — cost rows/columns
are both read as one-hot matmuls against the same VMEM-resident matrix and
the final inversion is a one-hot contraction — so there is no `lax.cond`
around two pallas_calls and the kernel is safely batchable.

Batching: the kernel runs on a grid over the batch axis (each grid step
solves one matrix from its own VMEM block), and `solve_lsap_pallas` is a
`jax.custom_batching.custom_vmap` whose batch rule dispatches to that grid
— so `jax.vmap` (the multi-stream engine) uses the kernel instead of
falling back to the XLA solver (VERDICT round-1 item #7).

Same algorithm, arithmetic (f32) and tie-breaking as `_solve_ascending`
(scipy-compatible; see ops/assignment.py docstring), so results are
interchangeable — enforced by tests/test_assignment_pallas.py which runs
the kernel (interpreter mode on CPU, compiled on TPU) against both the XLA
solver and scipy.

State vectors are carried as (1, K) VMEM rows (K = capacity, padded to the
128-lane tile by Mosaic).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30  # finite "infinity": survives f32 and matmul selection


def _kernel(sizes_ref, cost_ref, out_ref,
            u_ref, v_ref, c2r_ref, r2c_ref):
    K = cost_ref.shape[0]
    b = pl.program_id(0)
    nr_orig = sizes_ref[b, 0]
    nc_orig = sizes_ref[b, 1]
    # wide matrices solve the transpose (scipy semantics); reads below pick
    # rows or columns of the same VMEM-resident cost accordingly
    transposed = nr_orig > nc_orig
    n_rows = jnp.minimum(nr_orig, nc_orig)
    n_cols = jnp.maximum(nr_orig, nc_orig)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    enable = n_cols > 0

    u_ref[:] = jnp.zeros((1, K), jnp.float32)
    v_ref[:] = jnp.zeros((1, K), jnp.float32)
    c2r_ref[:] = jnp.full((1, K), -1, jnp.int32)
    r2c_ref[:] = jnp.full((1, K), -1, jnp.int32)

    def select(vec_f32, indices):
        """vec[indices] as a one-hot matmul: (1,K) f32, (1,K) int -> (1,K)."""
        m = jnp.where(jnp.broadcast_to(indices, (K, K)) == row_iota,
                      1.0, 0.0)  # (bool -> f32 cast is unsupported)
        return jnp.dot(vec_f32, m, preferred_element_type=jnp.float32)

    def cost_line(i):
        """Row i of the effective matrix: cost[i, :] normally, cost[:, i]
        when solving the transpose — both as one-hot contractions."""
        oh = jnp.where(col_ids == i, 1.0, 0.0)                   # (1, K)
        row = jax.lax.dot_general(
            oh, cost_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                  # cost[i, :]
        col = jax.lax.dot_general(
            oh, cost_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                  # cost[:, i]
        return jnp.where(transposed, col, row)

    def augment_row(cur_row, _):
        en = enable & (cur_row < n_rows)
        u = u_ref[:]
        v = v_ref[:]
        c2r = c2r_ref[:]
        c2r_f = c2r.astype(jnp.float32)

        remaining0 = jnp.where(col_ids < n_cols, n_cols - 1 - col_ids, 0)
        init = (
            cur_row,                               # i
            jnp.float32(0.0),                      # minVal
            jnp.full((1, K), _BIG, jnp.float32),   # shortestPathCosts
            jnp.full((1, K), -1, jnp.int32),       # path
            jnp.zeros((1, K), jnp.int32),          # SR (rows in lanes)
            jnp.zeros((1, K), jnp.int32),          # SC
            # (int32 0/1 masks: Mosaic cannot select into i1 vectors)
            remaining0.astype(jnp.int32),          # remaining (ordered)
            n_cols,                                # numRemaining
            jnp.where(en, jnp.int32(-1), jnp.int32(0)),  # sink (0 = skip)
        )

        def dj_cond(s):
            return s[8] < 0

        def dj_body(s):
            i, min_val, spc, path, sr, sc, remaining, num_rem, _ = s
            sr = jnp.where(col_ids == i, 1, sr)
            in_rem = (sc == 0) & (col_ids < n_cols)
            ui = jnp.sum(jnp.where(col_ids == i, u, 0.0))
            r = min_val + cost_line(i) - ui - v
            better = in_rem & (r < spc)
            spc = jnp.where(better, r, spc)
            path = jnp.where(better, i, path)

            it_valid = col_ids < num_rem
            c_at = jnp.where(it_valid, select(spc, remaining), _BIG)
            lowest = jnp.min(c_at)
            tied = it_valid & (c_at == lowest)
            c2r_at = select(c2r_f, remaining)
            unmatched = tied & (c2r_at < 0)
            first_tied = jnp.min(jnp.where(tied, col_ids, K))
            last_unm = jnp.max(jnp.where(unmatched, col_ids, -1))
            idx = jnp.where(jnp.any(unmatched), last_unm, first_tied)
            idx = jnp.clip(idx, 0, K - 1)
            j = jnp.sum(jnp.where(col_ids == idx, remaining, 0))
            last_rem = jnp.sum(jnp.where(col_ids == num_rem - 1,
                                         remaining, 0))
            remaining = jnp.where(col_ids == idx, last_rem, remaining)
            num_rem = num_rem - 1
            sc = jnp.where(col_ids == j, 1, sc)
            min_val = lowest
            c2r_j = jnp.sum(jnp.where(col_ids == j, c2r, 0))
            is_sink = c2r_j < 0
            sink = jnp.where(is_sink, j, jnp.int32(-1))
            i = jnp.where(is_sink, i, c2r_j)
            return (i, min_val, spc, path, sr, sc, remaining, num_rem, sink)

        (_, min_val, spc, path, sr, sc, _, _, sink) = jax.lax.while_loop(
            dj_cond, dj_body, init)

        # dual updates
        r2c = r2c_ref[:]
        r2c_cols = jnp.clip(r2c, 0, K - 1)
        spc_at_r2c = select(spc, r2c_cols)
        du = jnp.where((sr == 1) & (col_ids != cur_row),
                       min_val - spc_at_r2c,
                       jnp.where(col_ids == cur_row, min_val, 0.0))
        u_ref[:] = u + jnp.where(en, du, 0.0)
        v_ref[:] = v - jnp.where(en & (sc == 1), min_val - spc, 0.0)

        # augment along the alternating path
        def aug_cond(s):
            return ~s[1]

        def aug_body(s):
            sink_, _ = s
            i = jnp.sum(jnp.where(col_ids == sink_, path, 0))
            c2r_ref[:] = jnp.where(col_ids == sink_, i, c2r_ref[:])
            old = jnp.sum(jnp.where(col_ids == i, r2c_ref[:], 0))
            r2c_ref[:] = jnp.where(col_ids == i, sink_, r2c_ref[:])
            return old, i == cur_row

        jax.lax.while_loop(aug_cond, aug_body, (sink, ~en))
        return 0

    jax.lax.fori_loop(0, K, augment_row, 0)

    # r2c is row->col of the SOLVED orientation. When transposed, solved
    # rows are the original columns; invert with a one-hot contraction:
    # orig[r] = c where r2c[c] == r.
    r2c = r2c_ref[:]
    m = jnp.where(jnp.broadcast_to(r2c, (K, K)) == row_iota, 1.0, 0.0)
    cols_f32 = col_ids.astype(jnp.float32)
    inv_val = jax.lax.dot_general(
        cols_f32, m, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                     # (1, K)
    inv_hit = jax.lax.dot_general(
        jnp.ones((1, K), jnp.float32), m, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    inverted = jnp.where(inv_hit > 0, inv_val.astype(jnp.int32), -1)
    out_ref[:] = jnp.where(transposed, inverted, r2c)


def _solve_batched_pallas(costs, n_rows, n_cols, interpret=False):
    """(B, K, K) costs + (B,) sizes -> (B, K) row->col assignments, one
    grid step per matrix (whole solve in VMEM per step)."""
    B, K, _ = costs.shape
    sizes = jnp.stack([jnp.asarray(n_rows, jnp.int32).reshape(B),
                       jnp.asarray(n_cols, jnp.int32).reshape(B)], axis=1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec((None, K, K), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        # out is (B, 1, K) so the block's last two dims equal the array's
        # (Mosaic tiling requirement for non-multiple-of-(8,128) blocks)
        out_specs=pl.BlockSpec((None, 1, K), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, K), jnp.float32),   # u
            pltpu.VMEM((1, K), jnp.float32),   # v
            pltpu.VMEM((1, K), jnp.int32),     # col2row
            pltpu.VMEM((1, K), jnp.int32),     # row2col
        ])
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, K), jnp.int32),
        interpret=interpret,
    )(sizes, costs.astype(jnp.float32))
    return out[:, 0, :]


def _make_solver(interpret: bool):
    @jax.custom_batching.custom_vmap
    def solve(cost, n_rows, n_cols):
        return _solve_batched_pallas(cost[None], n_rows[None],
                                     n_cols[None], interpret)[0]

    @solve.def_vmap
    def _solve_vmap(axis_size, in_batched, cost, n_rows, n_cols):
        cb, rb, colb = in_batched
        if not cb:
            cost = jnp.broadcast_to(cost[None],
                                    (axis_size,) + cost.shape)
        if not rb:
            n_rows = jnp.broadcast_to(jnp.asarray(n_rows, jnp.int32),
                                      (axis_size,))
        if not colb:
            n_cols = jnp.broadcast_to(jnp.asarray(n_cols, jnp.int32),
                                      (axis_size,))
        return _solve_batched_pallas(cost, n_rows, n_cols, interpret), True

    return solve


_SOLVER = _make_solver(False)
_SOLVER_INTERPRET = _make_solver(True)


def solve_lsap_pallas(cost, n_rows, n_cols, interpret=False):
    """Drop-in for ops.assignment.solve_lsap, solved inside one Pallas
    kernel. cost: (K, K) square capacity matrix. Safe under jax.vmap (the
    batch rule dispatches to a grid-batched kernel)."""
    n_rows = jnp.asarray(n_rows, jnp.int32)
    n_cols = jnp.asarray(n_cols, jnp.int32)
    solver = _SOLVER_INTERPRET if interpret else _SOLVER
    return solver(cost, n_rows, n_cols)


def solve_lsap_pallas_batched(costs, n_rows, n_cols, interpret=False):
    """Explicit batched entry: (B, K, K) -> (B, K)."""
    return _solve_batched_pallas(costs, n_rows, n_cols, interpret)
