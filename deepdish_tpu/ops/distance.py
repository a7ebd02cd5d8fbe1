"""Appearance-distance ops: pairwise cosine/Euclidean and gallery min-dist.

TPU-native equivalent of deep_sort/nn_matching.py:5-177. The reference keeps
a Python dict of per-target feature lists and loops over targets to build the
cost matrix; here the whole gallery is one `(T, G, F)` tensor with a validity
mask, and the cost matrix is a single batched matmul on the MXU followed by a
masked min over the gallery axis.
"""
from __future__ import annotations

import jax.numpy as jnp

_BIG = jnp.inf


def _normalize(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.where(n == 0.0, 1.0, n)


def cosine_distance_matrix(a: jnp.ndarray, b: jnp.ndarray,
                           data_is_normalized: bool = False) -> jnp.ndarray:
    """1 - cos similarity, (N, F) x (M, F) -> (N, M).

    Ref nn_matching.py:31-54.
    """
    if not data_is_normalized:
        a = _normalize(a)
        b = _normalize(b)
    return 1.0 - a @ b.T


def squared_euclidean_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared distances, clipped at 0. Ref nn_matching.py:5-28."""
    a2 = jnp.sum(jnp.square(a), axis=1)
    b2 = jnp.sum(jnp.square(b), axis=1)
    r2 = -2.0 * (a @ b.T) + a2[:, None] + b2[None, :]
    return jnp.maximum(r2, 0.0)


def gallery_min_cosine(gallery: jnp.ndarray, gallery_valid: jnp.ndarray,
                       features: jnp.ndarray,
                       feat_valid: jnp.ndarray | None = None,
                       data_is_normalized: bool = False) -> jnp.ndarray:
    """Nearest-neighbor cosine distance from each track gallery to each
    detection feature.

    gallery:       (T, G, F) stored features per track slot.
    gallery_valid: (T, G) bool.
    features:      (D, F) detection features.
    Returns (T, D): min over valid gallery entries of cosine distance;
    tracks with an empty gallery get +inf. Equivalent to
    nn_matching.py:78-96 + 156-177 but as one MXU batched matmul.

    data_is_normalized=True skips the row normalizations. The tracker
    stores gallery rows pre-normalized (features are unit-normalized once
    at insert), because re-normalizing the whole (T, G, F) gallery every
    frame was the single largest HBM fusion in the device profile (~9% of
    the fused step).
    """
    g = gallery if data_is_normalized else _normalize(gallery)
    f = features if data_is_normalized else _normalize(features)
    # (T, G, D)
    sims = jnp.einsum("tgf,df->tgd", g, f,
                      preferred_element_type=jnp.float32)
    dists = 1.0 - sims
    dists = jnp.where(gallery_valid[:, :, None], dists, _BIG)
    out = jnp.min(dists, axis=1)
    if feat_valid is not None:
        out = jnp.where(feat_valid[None, :], out, _BIG)
    return out
