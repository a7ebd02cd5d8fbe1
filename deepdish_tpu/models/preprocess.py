"""Image preprocessing for TPU: batched crop-resize and frame resize.

Replaces the reference's per-box Python+OpenCV loop
(tools/generate_detections.py:40-84 `extract_image_patch`: aspect-correct,
clip, integer crop, cv2 INTER_LINEAR resize) and the host-side cv2/PIL frame
resizes (deepdish.py:867, tools/ssd_mobilenet.py:55) with in-jit gather
programs: all boxes are cropped+resampled in one vmapped bilinear gather, so
the whole patch batch is produced on-device with no host round trip.

Bilinear sampling uses half-pixel centers (src = (dst+0.5)*scale - 0.5,
clamped), matching cv2.resize INTER_LINEAR up to its fixed-point rounding.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def default_compute_dtype():
    """bf16 on TPU; f32 elsewhere (the CPU sharded executor has no
    bf16 x bf16 -> f32 dot kernel)."""
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def _bilinear_gather(image, ys, xs):
    """Sample image (H, W, C) at float coords ys (A,), xs (B,) -> (A, B, C)."""
    H, W = image.shape[0], image.shape[1]
    y0 = jnp.clip(jnp.floor(ys), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, W - 1)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    img = image.astype(jnp.float32)
    tl = img[y0i[:, None], x0i[None, :]]
    tr = img[y0i[:, None], x1i[None, :]]
    bl = img[y1i[:, None], x0i[None, :]]
    br = img[y1i[:, None], x1i[None, :]]
    top = tl * (1 - fx) + tr * fx
    bot = bl * (1 - fx) + br * fx
    return top * (1 - fy) + bot * fy


@functools.partial(jax.jit, static_argnums=(1, 2))
def resize_bilinear(image, out_h: int, out_w: int):
    """Whole-image bilinear resize with half-pixel centers (cv2 semantics)."""
    H, W = image.shape[0], image.shape[1]
    sy, sx = H / out_h, W / out_w
    ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * sy - 0.5
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * sx - 0.5
    return _bilinear_gather(image, jnp.clip(ys, 0, H - 1),
                            jnp.clip(xs, 0, W - 1))


def resize_bilinear_mxu(image, out_h: int, out_w: int,
                        compute_dtype=None):
    """Frame resize as two sampling-matrix contractions (MXU path).

    Same half-pixel bilinear semantics as `resize_bilinear`, expressed as
    patch = Wy @ image @ Wx with the 2-tap weight rows
    w = max(0, 1 - |src - coord|); since the sampling matrices are
    constants for a static shape pair, XLA folds them and the whole resize
    rides the MXU instead of HBM gathers (bf16 rounding differences only).
    """
    if compute_dtype is None:
        compute_dtype = default_compute_dtype()
    H, W = image.shape[0], image.shape[1]
    ys = jnp.clip((jnp.arange(out_h, dtype=jnp.float32) + 0.5)
                  * (H / out_h) - 0.5, 0, H - 1)
    xs = jnp.clip((jnp.arange(out_w, dtype=jnp.float32) + 0.5)
                  * (W / out_w) - 0.5, 0, W - 1)
    rows = jnp.arange(H, dtype=jnp.float32)
    cols = jnp.arange(W, dtype=jnp.float32)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(rows[None, :] - ys[:, None]))
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(cols[:, None] - xs[None, :]))
    mid = jnp.einsum("hwc,wo->hoc", image.astype(compute_dtype),
                     wx.astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    return jnp.einsum("yh,hoc->yoc", wy, mid,
                      preferred_element_type=jnp.float32)


def crop_resize_patches(image, boxes_tlwh, valid, patch_h: int, patch_w: int):
    """Aspect-corrected crop + resize for all boxes at once.

    Mirrors extract_image_patch (generate_detections.py:64-84):
      * widen/narrow the box to the patch aspect ratio about its center;
      * truncate to ints, clip tl at 0 and br at (W-1, H-1);
      * empty/out-of-image boxes yield a zero patch and invalid flag
        (the reference substitutes a random-noise patch; deterministic
        zeros are used here so results are reproducible);
      * bilinear resample the crop to (patch_h, patch_w).

    image: (H, W, 3) uint8/float. boxes_tlwh: (D, 4). valid: (D,) bool.
    Returns (patches (D, patch_h, patch_w, 3) float32, ok (D,) bool).
    """
    H, W = image.shape[0], image.shape[1]
    target_aspect = float(patch_w) / float(patch_h)

    def one(box, is_valid):
        x, y, w, h = box[0], box[1], box[2], box[3]
        new_w = target_aspect * h
        x = x - (new_w - w) / 2.0
        w = new_w
        # to tlbr, truncate toward zero like np .astype(int)
        sx = jnp.trunc(x).astype(jnp.int32)
        sy = jnp.trunc(y).astype(jnp.int32)
        ex = jnp.trunc(x + w).astype(jnp.int32)
        ey = jnp.trunc(y + h).astype(jnp.int32)
        sx = jnp.maximum(sx, 0)
        sy = jnp.maximum(sy, 0)
        ex = jnp.minimum(ex, W - 1)
        ey = jnp.minimum(ey, H - 1)
        ok = is_valid & (sx < ex) & (sy < ey)
        ch = jnp.maximum(ey - sy, 1).astype(jnp.float32)
        cw = jnp.maximum(ex - sx, 1).astype(jnp.float32)
        ys = sy + (jnp.arange(patch_h, dtype=jnp.float32) + 0.5) \
            * ch / patch_h - 0.5
        xs = sx + (jnp.arange(patch_w, dtype=jnp.float32) + 0.5) \
            * cw / patch_w - 0.5
        ys = jnp.clip(ys, sy, jnp.maximum(ey - 1, sy).astype(jnp.float32))
        xs = jnp.clip(xs, sx, jnp.maximum(ex - 1, sx).astype(jnp.float32))
        patch = _bilinear_gather(image, ys, xs)
        return jnp.where(ok, patch, 0.0), ok

    return jax.vmap(one)(boxes_tlwh, valid)


def crop_resize_patches_mxu(image, boxes_tlwh, valid, patch_h: int,
                            patch_w: int, compute_dtype=None,
                            column_window: bool = False):
    """MXU formulation of `crop_resize_patches`: bilinear resampling as two
    per-box sampling-matrix contractions instead of scattered gathers.

    2-tap bilinear interpolation along an axis is a sparse linear map; on
    TPU a dense matmul with that map beats HBM gathers by a wide margin
    (profiled ~30x on v5e for 32 boxes on a 720p frame). For each box we
    build Wx (W, patch_w) and Wy (patch_h, H) with
    w = max(0, 1 - |src - coord|) (exactly the 2-tap weights incl. edge
    clamping) and compute  patch = Wy @ image @ Wx.

    Same crop semantics as crop_resize_patches (aspect correction, int
    truncation, clipping, zero/invalid handling); small bf16 rounding
    differences in the interpolation.
    """
    if compute_dtype is None:
        compute_dtype = default_compute_dtype()
    H, W = image.shape[0], image.shape[1]
    target_aspect = float(patch_w) / float(patch_h)
    img = image.astype(compute_dtype)
    # column_window: the aspect correction bounds every frame-clipped
    # crop's WIDTH at ceil(aspect * H) + 1, so a per-box dynamic-slice
    # window of that width carries Wx's entire non-zero support —
    # bit-identical patches at ~W/win_w fewer MACs (3.3x for 720p MARS
    # crops). MEASURED NEGATIVE on v5e (docs/BENCH_NOTES.md round 3): the
    # full-frame einsum lets XLA share one frame read across all box
    # contractions, and the per-box dynamic slices defeat that sharing
    # (16-stream step 32.6 -> 37.6 ms). Default OFF; kept for
    # bandwidth-poor backends and as the recorded experiment.
    win_w = min(W, int(np.ceil(target_aspect * H)) + 2) \
        if column_window else W

    def one(box, is_valid):
        x, y, w, h = box[0], box[1], box[2], box[3]
        new_w = target_aspect * h
        x = x - (new_w - w) / 2.0
        w = new_w
        sx = jnp.maximum(jnp.trunc(x).astype(jnp.int32), 0)
        sy = jnp.maximum(jnp.trunc(y).astype(jnp.int32), 0)
        ex = jnp.minimum(jnp.trunc(x + w).astype(jnp.int32), W - 1)
        ey = jnp.minimum(jnp.trunc(y + h).astype(jnp.int32), H - 1)
        ok = is_valid & (sx < ex) & (sy < ey)
        ch = jnp.maximum(ey - sy, 1).astype(jnp.float32)
        cw = jnp.maximum(ex - sx, 1).astype(jnp.float32)
        ys = sy + (jnp.arange(patch_h, dtype=jnp.float32) + 0.5) \
            * ch / patch_h - 0.5
        xs = sx + (jnp.arange(patch_w, dtype=jnp.float32) + 0.5) \
            * cw / patch_w - 0.5
        ys = jnp.clip(ys, sy, jnp.maximum(ey - 1, sy).astype(jnp.float32))
        xs = jnp.clip(xs, sx, jnp.maximum(ex - 1, sx).astype(jnp.float32))
        rows = jnp.asarray(np.arange(H, dtype=np.float32))
        if column_window:
            x0 = jnp.clip(sx, 0, W - win_w)    # window start; [sx, ex] is
            imgw = jax.lax.dynamic_slice(       # inside the window for any
                img, (0, x0, 0), (H, win_w, img.shape[2]))  # clipped box
            # a box whose RAW height exceeded the frame can overflow the
            # window (cw > aspect*H); clamp those samples to the window
            # edge instead of silently losing their 2-tap support
            xs = jnp.clip(xs, x0.astype(jnp.float32),
                          (x0 + win_w - 1).astype(jnp.float32))
            cols = x0.astype(jnp.float32) + \
                jnp.asarray(np.arange(win_w, dtype=np.float32))
        else:
            imgw = img
            cols = jnp.asarray(np.arange(W, dtype=np.float32))
        # 2-tap weights built directly in the compute dtype (f32 abs/sub,
        # one cast); exact for the 0/fractional values involved
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(
            rows[None, :] - ys[:, None])).astype(compute_dtype)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(
            cols[:, None] - xs[None, :])).astype(compute_dtype)
        # contract columns first: patch_w (64) < patch_h (128), so
        # img @ Wx costs H*win_w*patch_w*C MACs vs patch_h*H*win_w*C for
        # the row-first order — half the FLOPs for the MARS patch shape,
        # and the (H, patch_w, 3) bf16 intermediate is small
        mid = jnp.einsum("hwc,wo->hoc", imgw, wx,
                         preferred_element_type=compute_dtype)
        patch = jnp.einsum("yh,hoc->yoc", wy, mid,
                           preferred_element_type=jnp.float32)
        return jnp.where(ok, patch, 0.0), ok

    return jax.vmap(one)(boxes_tlwh, valid)


def normalize_uint8(x, mean=0.0, std=1.0):
    """uint8 -> float32 with optional mean/std (EfficientDet metadata path,
    tools/tflite_object_detector.py:117-131)."""
    return (x.astype(jnp.float32) - mean) / std
