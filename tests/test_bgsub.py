"""MOG2 background subtraction tests vs cv2's native implementation."""
import cv2
import numpy as np
import jax
import jax.numpy as jnp

from deepdish_tpu.ops import bgsub


def _scene(rng, n_frames=40, h=48, w=64):
    base = rng.randint(40, 80, size=(h, w, 3)).astype(np.uint8)
    frames = []
    for i in range(n_frames):
        f = base + rng.randint(-3, 4, size=base.shape).astype(np.int16)
        f = np.clip(f, 0, 255).astype(np.uint8)
        if i >= 20:  # moving bright object enters
            x = 4 + (i - 20) * 2
            f[10:30, x:x + 12] = 220
        frames.append(f)
    return frames


def test_moving_object_detected(rng):
    frames = _scene(rng)
    state = bgsub.init_state(48, 64)
    for f in frames[:20]:
        state, mask = bgsub.update_jit(state, jnp.asarray(f))
    # after learning, static scene is almost all background
    assert np.asarray(mask).mean() < 20

    state, mask = bgsub.update_jit(state, jnp.asarray(frames[25]))
    m = np.asarray(mask)
    x = 4 + 5 * 2
    obj = m[10:30, x:x + 12]
    bg = m[35:, :]
    assert (obj == 255).mean() > 0.7, "object area should be foreground"
    assert (bg == 0).mean() > 0.9, "static area should stay background"


def test_agrees_with_cv2(rng):
    """Masks should agree with cv2's MOG2 on the clear-cut pixels."""
    frames = _scene(rng)
    ours = bgsub.init_state(48, 64)
    theirs = cv2.createBackgroundSubtractorMOG2()
    for f in frames:
        ours, m1 = bgsub.update_jit(ours, jnp.asarray(f))
        m2 = theirs.apply(f)
    m1 = np.asarray(m1)
    # compare binarized foreground (shadow values differ in detail)
    f1 = m1 == 255
    f2 = m2 == 255
    inter = (f1 & f2).sum()
    union = (f1 | f2).sum()
    assert union > 0
    assert inter / union > 0.5, f"mask IoU too low: {inter / union}"


def test_shadow_value(rng):
    """Darkened background pixels are labeled 127 like cv2."""
    base = np.full((32, 32, 3), 120, np.uint8)
    state = bgsub.init_state(32, 32)
    for _ in range(30):
        state, _ = bgsub.update_jit(state, jnp.asarray(base))
    shadowed = base.copy()
    shadowed[8:16, 8:16] = 72  # 60% brightness, same chroma
    state, mask = bgsub.update_jit(state, jnp.asarray(shadowed))
    m = np.asarray(mask)
    assert (m[8:16, 8:16] == bgsub.SHADOW_VAL).mean() > 0.8
    assert (m[20:, 20:] == 0).all()
