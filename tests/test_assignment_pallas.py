"""Pallas JV solver parity (interpreter mode) vs scipy and the XLA solver."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from deepdish_tpu.ops.assignment import solve_lsap
from deepdish_tpu.ops.assignment_pallas import solve_lsap_pallas

K = 16


def _pad(cost):
    r, c = cost.shape
    out = np.full((K, K), 7e7, np.float32)
    out[:r, :c] = cost
    return out


def _check(cost):
    r, c = cost.shape
    padded = jnp.asarray(_pad(cost))
    got = np.asarray(solve_lsap_pallas(padded, r, c, interpret=True))
    rows, cols = linear_sum_assignment(cost.astype(np.float64))
    want = np.full((K,), -1, np.int32)
    want[rows] = cols
    np.testing.assert_array_equal(got, want, err_msg=f"cost=\n{cost}")
    xla = np.asarray(jax.jit(solve_lsap)(padded, r, c))
    np.testing.assert_array_equal(got, xla)


@pytest.mark.parametrize("shape", [(1, 1), (3, 3), (5, 8), (8, 5),
                                   (12, 12), (16, 3), (3, 16), (16, 16)])
def test_pallas_random(shape, rng):
    for _ in range(8):
        _check(rng.uniform(0, 1, size=shape).astype(np.float32))


def test_pallas_ties_dyadic(rng):
    vals = [0.125, 0.25, 0.25 + 2.0 ** -12, 0.75]
    for _ in range(25):
        shape = (rng.randint(1, 9), rng.randint(1, 9))
        _check(rng.choice(vals, size=shape).astype(np.float32))


def test_pallas_empty():
    cost = np.zeros((K, K), np.float32)
    got = np.asarray(solve_lsap_pallas(jnp.asarray(cost), 0, 5,
                                       interpret=True))
    np.testing.assert_array_equal(got, np.full((K,), -1, np.int32))


def test_pallas_vmap(rng):
    """The custom_vmap batch rule dispatches to the grid-batched kernel —
    the multi-stream engine's path (VERDICT round-1 item #7). Mixed
    orientations (tall + wide + empty) in one batch."""
    B = 6
    shapes = [(3, 3), (5, 8), (8, 5), (16, 16), (0, 4), (16, 3)]
    costs = np.zeros((B, K, K), np.float32)
    nr = np.zeros((B,), np.int32)
    nc = np.zeros((B,), np.int32)
    wants = []
    for i, (r, c) in enumerate(shapes):
        cost = rng.uniform(0, 1, size=(r, c)).astype(np.float32)
        costs[i] = _pad(cost)
        nr[i], nc[i] = r, c
        want = np.full((K,), -1, np.int32)
        if r and c:
            rows, cols = linear_sum_assignment(cost.astype(np.float64))
            want[rows] = cols
        wants.append(want)

    batched = jax.vmap(
        lambda co, r, c: solve_lsap_pallas(co, r, c, interpret=True))
    got = np.asarray(batched(jnp.asarray(costs), jnp.asarray(nr),
                             jnp.asarray(nc)))
    np.testing.assert_array_equal(got, np.stack(wants))


def test_pallas_vmap_broadcast_sizes(rng):
    """Unbatched sizes with batched costs (common in the stream vmap)."""
    B = 3
    costs = rng.uniform(0, 1, size=(B, K, K)).astype(np.float32)
    batched = jax.vmap(
        lambda co: solve_lsap_pallas(co, 8, 8, interpret=True))
    got = np.asarray(batched(jnp.asarray(costs)))
    for i in range(B):
        rows, cols = linear_sum_assignment(costs[i, :8, :8].astype(
            np.float64))
        want = np.full((K,), -1, np.int32)
        want[rows] = cols
        np.testing.assert_array_equal(got[i], want)
