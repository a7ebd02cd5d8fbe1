"""2-D segment intersection, vectorized for countline crossing detection.

TPU-native equivalent of tools/intersection.py:4-30 in the reference: the
reference tests one segment pair at a time in Python; here a whole polyline
(track path history, fixed-length ring buffer) is tested against a countline
in one vector op, and the functions are jit/vmap-friendly (pure, no branches).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_EPS = float(np.finfo(np.float64).eps)


def _cross2(a, b):
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def segments_intersect(p, pr, q, qs, eps: float = _EPS):
    """Whether segment p->pr intersects q->qs. All inputs (..., 2).

    Mirrors the parametric cross-product test of tools/intersection.py:4-24,
    including the colinear-overlap case, but fully branch-free so it can be
    vmapped over many segment pairs.
    """
    p = jnp.asarray(p)
    pr = jnp.asarray(pr)
    q = jnp.asarray(q)
    qs = jnp.asarray(qs)
    r = pr - p
    s = qs - q
    rxs = _cross2(r, s)
    qmp = q - p
    qpxr = _cross2(qmp, r)

    # General (non-parallel) case.
    t = _cross2(qmp, s) / jnp.where(jnp.abs(rxs) < eps, 1.0, rxs)
    u = qpxr / jnp.where(jnp.abs(rxs) < eps, 1.0, rxs)
    general_hit = (0.0 <= t) & (t <= 1.0) & (0.0 <= u) & (u <= 1.0)

    # Colinear case: project q and qs onto r, test interval overlap.
    rdrr_den = jnp.sum(r * r, axis=-1)
    rdrr = r / jnp.where(rdrr_den == 0.0, 1.0, rdrr_den)[..., None]
    t0 = jnp.sum(qmp * rdrr, axis=-1)
    t1 = t0 + jnp.sum(s * rdrr, axis=-1)
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    colinear_hit = ~((hi < 0.0) | (lo > 1.0))

    parallel = jnp.abs(rxs) < eps
    colinear = parallel & (jnp.abs(qpxr) < eps)
    return jnp.where(parallel, colinear & colinear_hit, general_hit)


def crossing_direction(p, pr, q):
    """Sign of the cross product (pr-p) x (q-p): which side of segment p->pr
    the point q lies on. Used for pos/neg countline direction as in
    deepdish.py:1071-1078 (reference computes np.cross of the countline vector
    with the path step)."""
    return jnp.sign(_cross2(pr - p, q - p))


def any_intersection(p1, q1, pts, valid=None):
    """Whether segment p1->q1 intersects any consecutive segment of polyline
    `pts` (K, 2). `valid` (K,) bool marks real points in a fixed-size ring
    buffer; a polyline segment counts only when both endpoints are valid.

    Equivalent of tools/intersection.py:26-30 over a fixed-capacity path.
    """
    a = pts[:-1]
    b = pts[1:]
    hits = segments_intersect(
        jnp.broadcast_to(p1, a.shape), jnp.broadcast_to(q1, a.shape), a, b
    )
    if valid is not None:
        seg_valid = valid[:-1] & valid[1:]
        hits = hits & seg_valid
    return jnp.any(hits)
