"""Parity tests: in-jit LSAP vs scipy.optimize.linear_sum_assignment.

Crossing-count parity with the reference hinges on identical assignments
(deep_sort/linear_assignment.py:58), including tie-breaking on the clamped
cost matrices min_cost_matching produces, so these tests sweep random,
rectangular, tied, and gated matrices.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from deepdish_tpu.ops.assignment import solve_lsap

K = 16


def _pad_square(cost):
    r, c = cost.shape
    out = np.full((K, K), 7e7, np.float32)  # padding value; never read
    out[:r, :c] = cost
    return out


@jax.jit
def _solve(cost, nr, nc):
    return solve_lsap(cost, nr, nc)


def _check(cost):
    cost = cost.astype(np.float32)
    r, c = cost.shape
    got = np.asarray(_solve(jnp.asarray(_pad_square(cost)), r, c))
    rows, cols = linear_sum_assignment(cost.astype(np.float64))
    want = np.full((K,), -1, np.int32)
    want[rows] = cols
    np.testing.assert_array_equal(got, want, err_msg=f"cost=\n{cost}")


@pytest.mark.parametrize("shape", [(1, 1), (3, 3), (5, 8), (8, 5),
                                   (1, 7), (7, 1), (12, 12), (16, 16),
                                   (16, 3), (3, 16)])
def test_random_matrices(shape, rng):
    for _ in range(20):
        _check(rng.uniform(0, 1, size=shape))


def test_tied_costs_dyadic(rng):
    # Heavy exact ties with dyadic (f32-exact) values: every sum/difference
    # in the dual updates is exact in BOTH f32 and f64, so the tie structure
    # is identical and the solver must reproduce scipy's tie-breaking
    # bit-for-bit. (Non-dyadic tied values can round differently in f32 vs
    # f64 and legitimately select a different equally-optimal assignment —
    # covered by test_equally_optimal_under_ties below.)
    vals = [0.125, 0.25, 0.25 + 2.0 ** -12, 0.75]
    for _ in range(50):
        shape = (rng.randint(1, 9), rng.randint(1, 9))
        cost = rng.choice(vals, size=shape)
        _check(cost)


def test_clamped_gated_pattern(rng):
    # Full reference preprocessing: cosine costs, INFTY gating
    # (linear_assignment.py:189), then the max_distance clamp (:57).
    # f32 may pick a different-but-equally-optimal assignment on rare exact
    # ties; what must be preserved is the post-threshold match set, which is
    # what determines tracking behavior (min_cost_matching:70-74 discards
    # matches with cost > max_distance).
    maxd = 0.2
    for _ in range(60):
        n, m = rng.randint(1, 10), rng.randint(1, 10)
        cost = rng.uniform(0, 0.4, size=(n, m)).astype(np.float32)
        gate = rng.uniform(size=(n, m)) < 0.5
        cost[gate] = 1e5
        cost[cost > maxd] = np.float32(maxd + 1e-5)
        got = np.asarray(_solve(jnp.asarray(_pad_square(cost)), n, m))
        rows, cols = linear_sum_assignment(cost.astype(np.float64))
        want = np.full((K,), -1, np.int32)
        want[rows] = cols
        got_set = {(i, int(got[i])) for i in range(n)
                   if got[i] >= 0 and cost[i, got[i]] <= maxd}
        want_set = {(i, int(want[i])) for i in range(n)
                    if want[i] >= 0 and cost[i, want[i]] <= maxd}
        assert got_set == want_set, f"cost=\n{cost}"
        tg = sum(np.float64(cost[i, got[i]]) for i in range(n) if got[i] >= 0)
        tw = sum(np.float64(cost[i, want[i]]) for i in range(n) if want[i] >= 0)
        assert abs(tg - tw) < 1e-6


def test_capacity_independence(rng):
    # Same problem, different padding contents -> same answer.
    cost = rng.uniform(0, 1, size=(4, 6)).astype(np.float32)
    a = _pad_square(cost)
    b = _pad_square(cost)
    b[5:, :] = 123.0
    b[:, 7:] = -9.0
    ra = np.asarray(_solve(jnp.asarray(a), 4, 6))
    rb = np.asarray(_solve(jnp.asarray(b), 4, 6))
    np.testing.assert_array_equal(ra, rb)


def test_empty_rows():
    cost = np.zeros((K, K), np.float32)
    got = np.asarray(_solve(jnp.asarray(cost), 0, 5))
    np.testing.assert_array_equal(got, np.full((K,), -1, np.int32))
