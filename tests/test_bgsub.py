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
    """Masks are byte-exact with cv2 frame by frame on this scene (round 3:
    the update replicates cv2's in-loop background decision and the
    1/min(2t, history) auto learning rate; a tiny per-frame budget is left
    for the vectorized version's tie-order differences)."""
    frames = _scene(rng)
    ours = bgsub.init_state(48, 64)
    theirs = cv2.createBackgroundSubtractorMOG2()
    for i, f in enumerate(frames):
        ours, m1 = bgsub.update_jit(ours, jnp.asarray(f))
        m2 = theirs.apply(f)
        exact = (np.asarray(m1) == m2).mean()
        assert exact > 0.999, f"frame {i}: exact agreement {exact}"


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


def test_motion_ratio_decisions_match_cv2(rng):
    """Count-parity surface with bgsub ENABLED (deepdish.py:956-961): the
    motion-ratio accept/reject decision per candidate box must agree with
    the decision computed from cv2's MOG2 mask. Masks may differ per pixel;
    the gate (foreground fraction >= ratio) is what reaches the tracker."""
    frames = _scene(rng, n_frames=44)
    ours = bgsub.init_state(48, 64)
    theirs = cv2.createBackgroundSubtractorMOG2()
    ratio = 0.25

    def decisions(mask, boxes):
        fg = (np.asarray(mask) != 0).astype(np.int64)   # fg + shadow, like
        # the pipeline's (mask != 0) integral (framestep.py:121-136)
        integral = np.pad(fg.cumsum(0).cumsum(1), ((1, 0), (1, 0)))
        out = []
        for (x, y, w, h) in boxes:
            s = (integral[y + h, x + w] - integral[y, x + w]
                 - integral[y + h, x] + integral[y, x])
            out.append(bool(s >= ratio * w * h))
        return out

    mismatches = 0
    checks = 0
    for i, f in enumerate(frames):
        ours, m1 = bgsub.update_jit(ours, jnp.asarray(f))
        m2 = theirs.apply(f)
        if i < 24:        # learning phase
            continue
        x = 4 + (i - 20) * 2
        boxes = [(x, 10, 12, 20),      # on the moving object -> accept
                 (2, 34, 20, 12),      # static background -> reject
                 (44, 34, 16, 12)]     # static background -> reject
        d1 = decisions(m1, boxes)
        d2 = decisions(m2, boxes)
        checks += len(boxes)
        mismatches += sum(a != b for a, b in zip(d1, d2))
        # the object box must be accepted by BOTH in steady state
        assert d1[0] and d2[0], f"frame {i}: object box rejected {d1} {d2}"
    assert mismatches == 0, f"{mismatches}/{checks} gate decisions diverge"


def test_first_frame_black_pixels_match_cv2(rng):
    """cv2's frame-1 mask is 127 everywhere EXCEPT pure-black pixels,
    where detectShadowGMM's division-by-zero guard returns 255."""
    f = rng.randint(30, 200, size=(32, 32, 3)).astype(np.uint8)
    f[4:12, 4:12] = 0                     # pure-black region
    theirs = cv2.createBackgroundSubtractorMOG2()
    m2 = theirs.apply(f)
    state = bgsub.init_state(32, 32)
    _, m1 = bgsub.update_jit(state, jnp.asarray(f))
    m1 = np.asarray(m1)
    assert (m2[4:12, 4:12] == 255).all(), "cv2 contract changed?"
    np.testing.assert_array_equal(m1, m2)
