"""MOG2 background subtraction as a vectorized per-pixel GMM, in-jit.

TPU-native equivalent of cv2.createBackgroundSubtractorMOG2 consumed at
deepdish.py:889,921-924: Zivkovic's adaptive Gaussian-mixture model (up to
K components per pixel, weight pruning with complexity-reduction prior,
shadow detection) re-expressed as fixed-shape (H, W, K) tensor updates so
the whole subtractor runs on device and can fuse with the frame step.

Semantics follow OpenCV's defaults: history=500 (alpha = 1/min(2t, history)),
varThreshold Tb=16, Tg=9 for component generation, backgroundRatio TB=0.9,
varInit=15, varMin=4, varMax=75, CT=0.05, shadow value 127 with tau=0.5.
The mask contract matches OpenCV: 255 foreground, 127 shadow, 0 background.

The foreground decision replicates cv2's in-loop rule: the pixel is tested
against the PRE-update component means/variances, in the PRE-update sort
order, gated by the cumulative post-update weights (bgfg_gaussmix2.cpp's
`totalWeight < backgroundRatio` accumulation) — so e.g. the very first
frame is all-foreground exactly like cv2 (no components existed yet), and
a newly inserted component never votes for background on its own frame.
(OpenCV's per-pixel loop still has order-dependent tie behavior a
vectorized version cannot reproduce bit-for-bit; see tests for the
measured agreement.)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

K = 5            # nmixtures
TB = 16.0        # varThreshold (squared distance, 3 channels)
TG = 9.0         # varThresholdGen
BG_RATIO = 0.9   # backgroundRatio
VAR_INIT = 15.0
VAR_MIN = 4.0
VAR_MAX = 75.0
CT = 0.05
HISTORY = 500
SHADOW_TAU = 0.5
SHADOW_VAL = 127


class MOG2State(NamedTuple):
    weight: jnp.ndarray   # (H, W, K), sorted descending per pixel
    mean: jnp.ndarray     # (H, W, K, 3)
    var: jnp.ndarray      # (H, W, K)
    frames: jnp.ndarray   # () int32, frames seen


def init_state(h: int, w: int) -> MOG2State:
    return MOG2State(
        weight=jnp.zeros((h, w, K), jnp.float32),
        mean=jnp.zeros((h, w, K, 3), jnp.float32),
        var=jnp.full((h, w, K), VAR_INIT, jnp.float32),
        frames=jnp.asarray(0, jnp.int32))


def update(state: MOG2State, frame, detect_shadows: bool = True):
    """One frame (H, W, 3) uint8/float -> (new_state, mask (H, W) uint8)."""
    x = frame.astype(jnp.float32)
    w_, mu, var = state.weight, state.mean, state.var
    frames = state.frames + 1
    # cv2's auto learning rate is 1/min(2*nframes, history)
    # (BackgroundSubtractorMOG2Impl::apply) — the factor 2 matters for
    # how long a newly appeared object stays foreground
    alpha = 1.0 / jnp.minimum(2 * frames, HISTORY).astype(jnp.float32)

    diff = x[:, :, None, :] - mu                    # (H, W, K, 3)
    dist2 = jnp.sum(diff * diff, axis=-1)           # (H, W, K)
    valid = w_ > 0.0

    # first (highest-weight) component that fits within Tg*var
    fits = valid & (dist2 < TG * var)
    kidx = jnp.arange(K)
    first_fit = jnp.min(jnp.where(fits, kidx, K), axis=-1)  # (H, W)
    any_fit = first_fit < K
    matched = kidx[None, None, :] == first_fit[..., None]   # (H, W, K)

    # weight update with pruning prior
    w_new = (1.0 - alpha) * w_ - alpha * CT
    w_new = jnp.where(matched, w_new + alpha, w_new)
    dropped = w_new <= 0.0
    w_new = jnp.where(dropped, 0.0, w_new)

    # matched component mean/variance update
    kfac = jnp.where(matched & ~dropped,
                     alpha / jnp.maximum(w_new, 1e-8), 0.0)
    mu_new = mu + kfac[..., None] * diff
    var_new = jnp.clip(var + kfac * (dist2 - var), VAR_MIN, VAR_MAX)

    # ---- foreground decision: cv2's in-loop rule ----
    # Components are tested in the OLD (pre-update) sort order against
    # their OLD means/variances; a component may vote for background only
    # while the cumulative UPDATED weight of the components before it is
    # still below backgroundRatio. Newly inserted components are excluded
    # (cv2 appends them after the decision), so frame 1 is all-foreground.
    cum_before_old = jnp.cumsum(w_new, axis=-1) - w_new
    may_vote = valid & (cum_before_old < BG_RATIO)
    bg_fit = may_vote & (dist2 < TB * var)
    background = jnp.any(bg_fit, axis=-1)

    mask = jnp.where(background, 0, 255).astype(jnp.uint8)

    if detect_shadows:
        # chromatic shadow test against the pre-update background
        # components (Prati/Zivkovic): brightness ratio in [tau, 1] and
        # low color distortion.
        mm = jnp.sum(mu * mu, axis=-1)                         # (H,W,K)
        xm = jnp.sum(x[:, :, None, :] * mu, axis=-1)
        ratio = xm / jnp.maximum(mm, 1e-8)
        scaled = ratio[..., None] * mu
        cdiff = x[:, :, None, :] - scaled
        cdist2 = jnp.sum(cdiff * cdiff, axis=-1)
        shadow_fit = (may_vote & (ratio >= SHADOW_TAU) & (ratio <= 1.0)
                      & (cdist2 < TB * var))
        is_shadow = (~background) & jnp.any(shadow_fit, axis=-1)
        # cv2 quirk: on the very first frame (no components yet) the
        # shadow test runs against the component just created from the
        # pixel itself (ratio exactly 1 -> shadow), so nearly every pixel
        # comes back 127 — EXCEPT pure-black pixels, where cv2's
        # detectShadowGMM divides by mean.mean == 0, hits its "no division
        # by zero allowed" guard and returns foreground (255).
        first_frame_shadow = (state.frames == 0) & \
            (jnp.sum(x * x, axis=-1) > 0.0)
        is_shadow = is_shadow | first_frame_shadow
        mask = jnp.where(is_shadow, SHADOW_VAL, mask).astype(jnp.uint8)

    # no fit -> new component in the weakest slot (K-1; list is sorted)
    new_here = ~any_fit
    slot = kidx[None, None, :] == (K - 1)
    w_new = jnp.where(new_here[..., None] & slot, alpha, w_new)
    mu_new = jnp.where((new_here[..., None] & slot)[..., None],
                       x[:, :, None, :], mu_new)
    var_new = jnp.where(new_here[..., None] & slot, VAR_INIT, var_new)

    # normalize and re-sort by weight descending
    total = jnp.sum(w_new, axis=-1, keepdims=True)
    w_new = w_new / jnp.maximum(total, 1e-8)
    order = jnp.argsort(-w_new, axis=-1, stable=True)
    w_new = jnp.take_along_axis(w_new, order, axis=-1)
    mu_new = jnp.take_along_axis(mu_new, order[..., None], axis=-2)
    var_new = jnp.take_along_axis(var_new, order, axis=-1)

    new_state = MOG2State(weight=w_new, mean=mu_new, var=var_new,
                          frames=frames)
    return new_state, mask


update_jit = jax.jit(update, static_argnums=2)
