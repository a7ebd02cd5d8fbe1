"""Golden tests for the vmapped Kalman filter vs a scipy/numpy oracle
implementing the formulas of deep_sort/kalman_filter.py:23-229."""
import numpy as np
import scipy.linalg
import jax.numpy as jnp

from deepdish_tpu.ops import kalman

WP, WV = 1.0 / 20, 1.0 / 160


class _Oracle:
    """Numpy/scipy oracle for the reference Kalman formulas."""

    def __init__(self):
        self.F = np.eye(8)
        for i in range(4):
            self.F[i, 4 + i] = 1.0
        self.H = np.eye(4, 8)

    def initiate(self, m):
        mean = np.r_[m, np.zeros_like(m)]
        h = m[3]
        std = [2 * WP * h, 2 * WP * h, 1e-2, 2 * WP * h,
               10 * WV * h, 10 * WV * h, 1e-5, 10 * WV * h]
        return mean, np.diag(np.square(std))

    def predict(self, mean, cov):
        h = mean[3]
        std = [WP * h, WP * h, 1e-2, WP * h, WV * h, WV * h, 1e-5, WV * h]
        q = np.diag(np.square(std))
        return self.F @ mean, self.F @ cov @ self.F.T + q

    def project(self, mean, cov):
        h = mean[3]
        std = [WP * h, WP * h, 1e-1, WP * h]
        r = np.diag(np.square(std))
        return self.H @ mean, self.H @ cov @ self.H.T + r

    def update(self, mean, cov, z):
        pm, pc = self.project(mean, cov)
        chol, lower = scipy.linalg.cho_factor(pc, lower=True)
        gain = scipy.linalg.cho_solve((chol, lower), (cov @ self.H.T).T).T
        innov = z - pm
        return mean + innov @ gain.T, cov - gain @ pc @ gain.T

    def gating(self, mean, cov, measurements):
        pm, pc = self.project(mean, cov)
        chol = np.linalg.cholesky(pc)
        d = measurements - pm
        z = scipy.linalg.solve_triangular(chol, d.T, lower=True)
        return np.sum(z * z, axis=0)


def _random_state(rng):
    oracle = _Oracle()
    m = rng.uniform(10, 200, size=4)
    m[2] = rng.uniform(0.3, 1.0)  # aspect
    mean, cov = oracle.initiate(m)
    # run a couple of steps to decorrelate
    for _ in range(3):
        mean, cov = oracle.predict(mean, cov)
        z = mean[:4] + rng.normal(0, 1, size=4) * [2, 2, 0.01, 2]
        mean, cov = oracle.update(mean, cov, z)
    return oracle, mean, cov


def test_initiate(rng):
    oracle = _Oracle()
    m = np.array([100.0, 50.0, 0.5, 80.0])
    got_m, got_c = kalman.initiate(jnp.asarray(m, jnp.float32))
    want_m, want_c = oracle.initiate(m)
    np.testing.assert_allclose(got_m, want_m, rtol=1e-6)
    np.testing.assert_allclose(got_c, want_c, rtol=1e-6)


def test_predict_update_gating(rng):
    oracle, mean, cov = _random_state(rng)
    gm, gc = kalman.predict(jnp.asarray(mean, jnp.float32),
                            jnp.asarray(cov, jnp.float32))
    wm, wc = oracle.predict(mean, cov)
    np.testing.assert_allclose(gm, wm, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gc, wc, rtol=1e-3, atol=1e-3)

    z = wm[:4] + np.array([1.0, -2.0, 0.01, 3.0])
    gm2, gc2 = kalman.update(jnp.asarray(wm, jnp.float32),
                             jnp.asarray(wc, jnp.float32),
                             jnp.asarray(z, jnp.float32))
    wm2, wc2 = oracle.update(wm, wc, z)
    np.testing.assert_allclose(gm2, wm2, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(gc2, wc2, rtol=1e-2, atol=1e-3)

    meas = np.stack([z + d for d in
                     rng.normal(0, 5, size=(6, 4))]).astype(np.float64)
    got = kalman.gating_distance(jnp.asarray(wm, jnp.float32),
                                 jnp.asarray(wc, jnp.float32),
                                 jnp.asarray(meas, jnp.float32))
    want = oracle.gating(wm, wc, meas)
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)


def test_vmapped_table(rng):
    oracle = _Oracle()
    T = 8
    ms = rng.uniform(20, 200, size=(T, 4))
    ms[:, 2] = rng.uniform(0.3, 1.0, size=T)
    means, covs = kalman.initiate_v(jnp.asarray(ms, jnp.float32))
    pm, pc = kalman.predict_v(means, covs)
    for i in range(T):
        wm, wc = oracle.initiate(ms[i])
        wm, wc = oracle.predict(wm, wc)
        np.testing.assert_allclose(pm[i], wm, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(pc[i], wc, rtol=1e-3, atol=1e-4)
    # table-level gating: (T, N)
    meas = rng.uniform(20, 200, size=(5, 4))
    meas[:, 2] = 0.5
    got = kalman.gating_distance_v(pm, pc, jnp.asarray(meas, jnp.float32))
    assert got.shape == (T, 5)
