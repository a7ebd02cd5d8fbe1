"""One-hot / rank-matrix formulations of gather, scatter and argsort.

TPU rationale: XLA lowers `gather`, `scatter` and `sort` on small arrays to
serialized scalar-ish loops — profiled at ~30-50 us per op on v5e, which
made the in-jit DeepSORT step (~15 such ops) cost ~1 ms/frame. For the
tracker's tiny fixed capacities (T, D, K <= 128) the same results are exact
as dense comparison matrices reduced on the VPU in ~1 us:

  * gather:  out[k] = v[idx[k]]   ==  sum_n where(idx[k]==n, v[n], 0)
  * scatter: out[idx[k]] = u[k]   ==  where(hit, sum_k select, base)
    (requires unique idx, which all tracker scatters guarantee)
  * argsort: stable rank via pairwise comparisons, then invert the
    permutation with one more comparison contraction.

The select-and-reduce form (NOT a float matmul against a one-hot matrix) is
deliberate: 0 * NaN = NaN would let one NaN payload row poison every
output; `where` keeps NaN rows routed only to their own destinations,
matching XLA gather/scatter semantics bit-for-bit.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _hits(idx, n: int):
    """(K,) int -> (K, n) bool one-hot; out-of-range rows are all-zero."""
    return idx[:, None] == jnp.asarray(
        np.arange(n, dtype=np.int32))[None, :]


def stable_ranks(keys):
    """Stable ascending ranks of (N,) keys: rank[i] = |{j: keys[j] <
    keys[i]}| + |{j < i: keys[j] == keys[i]}| — what a stable sort assigns."""
    n = keys.shape[0]
    lt = (keys[None, :] < keys[:, None])
    eq = (keys[None, :] == keys[:, None])
    pos = jnp.asarray(np.arange(n, dtype=np.int32))
    earlier = pos[None, :] < pos[:, None]
    return (lt.astype(jnp.int32) + (eq & earlier).astype(jnp.int32)).sum(1)


def stable_argsort(keys):
    """Stable ascending argsort of (N,) integer/float keys via rank
    inversion (perm[rank[i]] = i), no XLA sort."""
    n = keys.shape[0]
    rank = stable_ranks(keys)
    pos = jnp.asarray(np.arange(n, dtype=np.int32))
    # perm[r] = the unique i with rank[i] == r
    return ((rank[None, :] == pos[:, None]) * pos[None, :]).sum(1)


def sort_values(keys):
    """Ascending sorted copy of (N,) keys via the same rank machinery."""
    return gather_1d(keys, stable_argsort(keys))


def gather_1d(values, idx):
    """out[k] = values[idx[k]] for 1-D values; any dtype."""
    oh = _hits(idx, values.shape[0])
    return jnp.where(oh, values[None, :], jnp.zeros_like(values[:1])
                     ).sum(1).astype(values.dtype)


def gather_rows(values, idx):
    """out[k] = values[idx[k]] for (N, ...) values; any dtype."""
    n = values.shape[0]
    flat = values.reshape(n, -1)
    oh = _hits(idx, n)
    out = jnp.where(oh[:, :, None], flat[None, :, :], 0).sum(1)
    return out.reshape((idx.shape[0],) + values.shape[1:]).astype(
        values.dtype)


def topk_desc(scores, k: int):
    """(values, indices) of the k largest entries of (N,) scores, sorted
    descending with ties broken by LOWER index — the same order
    jax.lax.top_k returns — via an (N, N) rank matrix instead of the XLA
    sort/top-k lowering (which serializes badly on TPU for N ~ 2k)."""
    n = scores.shape[0]
    pos = jnp.asarray(np.arange(n, dtype=np.int32))
    gt = scores[None, :] > scores[:, None]
    eq = scores[None, :] == scores[:, None]
    earlier = pos[None, :] < pos[:, None]
    rank = (gt.astype(jnp.int32) + (eq & earlier).astype(jnp.int32)).sum(1)
    rk = jnp.asarray(np.arange(k, dtype=np.int32))
    sel = ((rank[None, :] == rk[:, None]) * pos[None, :]).sum(1)   # (k,)
    return gather_1d(scores, sel), sel


def argsort_desc_tie_high(scores):
    """Descending argsort of (N,) scores with ties broken by HIGHER index
    first — the reference NMS pick order (pick-from-end-of-argsort,
    deep_sort/preprocessing.py:40-41)."""
    n = scores.shape[0]
    pos = jnp.asarray(np.arange(n, dtype=np.int32))
    gt = scores[None, :] > scores[:, None]
    eq = scores[None, :] == scores[:, None]
    later = pos[None, :] > pos[:, None]
    rank = (gt.astype(jnp.int32) + (eq & later).astype(jnp.int32)).sum(1)
    return ((rank[None, :] == pos[:, None]) * pos[None, :]).sum(1)


def argsort_desc_tie_low(scores):
    """Descending argsort with ties broken by LOWER index first — the
    tf.image.non_max_suppression pick order (TF sorts by score and keeps
    input order among equals), used by the Faster-RCNN stages so tie
    resolution matches the TF-OD meta-architecture exactly."""
    n = scores.shape[0]
    pos = jnp.asarray(np.arange(n, dtype=np.int32))
    gt = scores[None, :] > scores[:, None]
    eq = scores[None, :] == scores[:, None]
    earlier = pos[None, :] < pos[:, None]
    rank = (gt.astype(jnp.int32) + (eq & earlier).astype(jnp.int32)).sum(1)
    return ((rank[None, :] == pos[:, None]) * pos[None, :]).sum(1)


def scatter_rows_unique(base, idx, upd):
    """out = base with out[idx[k]] = upd[k]; idx entries must be unique,
    idx >= base.shape[0] rows are dropped. Works for int and float."""
    t = base.shape[0]
    oh = _hits(idx, t)                             # (K, T)
    wrote = oh.any(0)                              # (T,)
    flat = upd.reshape(upd.shape[0], -1)
    val = jnp.where(oh[:, :, None], flat[:, None, :], 0).sum(0)
    shape = (t,) + (1,) * (base.ndim - 1)
    return jnp.where(wrote.reshape(shape),
                     val.reshape(base.shape).astype(base.dtype), base)
