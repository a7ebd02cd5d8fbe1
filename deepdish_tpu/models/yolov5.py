"""YOLOv5s detector, TPU-native.

JAX re-implementation of the capability behind the reference's
yolov5s fp16/int8 TFLite models (tools/yolov5.py:37-146): CSP backbone +
SPPF + PANet neck + 3-scale detect head, with the standard v5s
depth/width multiples (0.33 / 0.50) and the COCO anchors from
detectors/yolov5/yolov5s.yaml:6-10. The fused program reproduces the
TFLite export's output contract — (N, 25200, 85) rows of
[x, y, w, h, obj, 80 class probs] with xywh normalized to [0, 1] — and the
reference's decode: xywh->xyxy, obj*cls confidence, argmax class, score
threshold, scale to image size (yolov5.py:120-131). NMS is left to the
pipeline stage, exactly as in the reference (deepdish.py:995 covers it).
"""
from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

INPUT_SIZE = 320  # reference yolov5s tflite exports are 320x320
NUM_CLASSES = 80
# detectors/yolov5/yolov5s.yaml:6-10
ANCHORS = np.array([
    [[10, 13], [16, 30], [33, 23]],       # P3/8
    [[30, 61], [62, 45], [59, 119]],      # P4/16
    [[116, 90], [156, 198], [373, 326]],  # P5/32
], np.float32)
STRIDES = (8, 16, 32)


class ConvBlock(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    padding: int = -1  # -1 = autopad (k//2); stem uses explicit 2
    dtype: Any = None   # compute dtype; None promotes back to f32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2 if self.padding < 0 else self.padding
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)), use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         momentum=0.97, dtype=self.dtype)(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = ConvBlock(self.features, 1, dtype=self.dtype)(x)
        y = ConvBlock(self.features, 3, dtype=self.dtype)(y)
        return x + y if self.shortcut and x.shape[-1] == self.features else y


class C3(nn.Module):
    features: int
    n: int = 1
    shortcut: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c_ = self.features // 2
        a = ConvBlock(c_, 1, dtype=self.dtype)(x)
        for _ in range(self.n):
            a = Bottleneck(c_, self.shortcut, dtype=self.dtype)(a)
        b = ConvBlock(c_, 1, dtype=self.dtype)(x)
        return ConvBlock(self.features, 1, dtype=self.dtype)(
            jnp.concatenate([a, b], axis=-1))


class SPPF(nn.Module):
    features: int
    pool: int = 5
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c_ = x.shape[-1] // 2
        x = ConvBlock(c_, 1, dtype=self.dtype)(x)
        p = self.pool // 2
        m1 = nn.max_pool(x, (self.pool, self.pool), strides=(1, 1),
                         padding=((p, p), (p, p)))
        m2 = nn.max_pool(m1, (self.pool, self.pool), strides=(1, 1),
                         padding=((p, p), (p, p)))
        m3 = nn.max_pool(m2, (self.pool, self.pool), strides=(1, 1),
                         padding=((p, p), (p, p)))
        return ConvBlock(self.features, 1, dtype=self.dtype)(
            jnp.concatenate([x, m1, m2, m3], axis=-1))


def _upsample2(x):
    B = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=0), 2, axis=1) \
        if x.ndim == 3 else jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return x


class YOLOv5s(nn.Module):
    """Returns raw head outputs [(H/8, W/8, 3*(5+nc)), ...] for one image."""
    num_classes: int = NUM_CLASSES
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, image):
        dt = self.compute_dtype
        x = image.astype(dt) / 255.0
        x = x[None]  # NHWC with N=1 internally
        # backbone (v5s: width 0.5, depth 0.33)
        x = ConvBlock(32, 6, 2, padding=2, dtype=dt, name="stem")(x)  # P1/2
        x = ConvBlock(64, 3, 2, dtype=dt, name="down1")(x)      # P2/4
        x = C3(64, 1, dtype=dt, name="c3_1")(x)
        x = ConvBlock(128, 3, 2, dtype=dt, name="down2")(x)     # P3/8
        p3 = C3(128, 2, dtype=dt, name="c3_2")(x)
        x = ConvBlock(256, 3, 2, dtype=dt, name="down3")(p3)    # P4/16
        p4 = C3(256, 3, dtype=dt, name="c3_3")(x)
        x = ConvBlock(512, 3, 2, dtype=dt, name="down4")(p4)    # P5/32
        x = C3(512, 1, dtype=dt, name="c3_4")(x)
        p5 = SPPF(512, dtype=dt, name="sppf")(x)
        # neck (PANet)
        u5 = ConvBlock(256, 1, dtype=dt, name="neck_cv1")(p5)
        x = jnp.concatenate([_upsample2(u5), p4], axis=-1)
        n4 = C3(256, 1, shortcut=False, dtype=dt, name="neck_c3_1")(x)
        u4 = ConvBlock(128, 1, dtype=dt, name="neck_cv2")(n4)
        x = jnp.concatenate([_upsample2(u4), p3], axis=-1)
        o3 = C3(128, 1, shortcut=False, dtype=dt, name="neck_c3_2")(x)   # P3 out
        x = ConvBlock(128, 3, 2, dtype=dt, name="neck_down1")(o3)
        x = jnp.concatenate([x, u4], axis=-1)
        o4 = C3(256, 1, shortcut=False, dtype=dt, name="neck_c3_3")(x)   # P4 out
        x = ConvBlock(256, 3, 2, dtype=dt, name="neck_down2")(o4)
        x = jnp.concatenate([x, u5], axis=-1)
        o5 = C3(512, 1, shortcut=False, dtype=dt, name="neck_c3_4")(x)   # P5 out
        no = 3 * (5 + self.num_classes)
        h3 = nn.Conv(no, (1, 1), dtype=dt, name="head_p3")(o3)
        h4 = nn.Conv(no, (1, 1), dtype=dt, name="head_p4")(o4)
        h5 = nn.Conv(no, (1, 1), dtype=dt, name="head_p5")(o5)
        return [h.astype(jnp.float32)[0] for h in (h3, h4, h5)]


def decode_head(head: jnp.ndarray, anchors: jnp.ndarray, stride: int,
                input_size: int, num_classes: int = NUM_CLASSES):
    """One scale -> (cells*3, 5+nc) rows [x, y, w, h, obj, cls...] with xywh
    normalized to [0, 1] like the TFLite export."""
    H, W = head.shape[0], head.shape[1]
    x = head.reshape(H, W, 3, 5 + num_classes)
    x = jax.nn.sigmoid(x)
    gy = jax.lax.broadcasted_iota(jnp.float32, (H, W, 3), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (H, W, 3), 1)
    xy = (x[..., 0:2] * 2.0 - 0.5 +
          jnp.stack([gx, gy], axis=-1)) * stride / input_size
    wh = jnp.square(x[..., 2:4] * 2.0) * anchors / input_size
    rest = x[..., 4:]
    return jnp.concatenate([xy, wh, rest], axis=-1).reshape(
        -1, 5 + num_classes)


def postprocess_heads(heads, input_size, orig_w, orig_h, *,
                      score_threshold, max_outputs):
    """The reference decode (yolov5.py:120-131) on raw head tensors:
    xywh->xyxy, conf = obj * cls, argmax class, threshold, scale to image.
    Shared by the float detector and the integer-exact quantized one
    (models/qgraph.py). heads: per-level (H, W, A*(5+nc)) arrays ordered
    stride-8/16/32 (largest spatial first)."""
    rows = jnp.concatenate([
        decode_head(h, jnp.asarray(ANCHORS[i]), STRIDES[i], input_size)
        for i, h in enumerate(heads)], axis=0)
    xy, wh = rows[:, 0:2], rows[:, 2:4]
    x1y1 = xy - wh / 2
    x2y2 = xy + wh / 2
    conf = rows[:, 5:] * rows[:, 4:5]
    classes = jnp.argmax(conf, axis=1).astype(jnp.int32)
    scores = jnp.max(conf, axis=1)
    ok = scores >= score_threshold
    K = max_outputs
    top_scores, idx = jax.lax.top_k(jnp.where(ok, scores, -1.0), K)
    scale = jnp.stack([orig_w, orig_h, orig_w, orig_h]).astype(jnp.float32)
    xyxy = jnp.concatenate([x1y1, x2y2], axis=1)[idx] * scale
    return (xyxy, classes[idx], top_scores,
            top_scores >= score_threshold)


class YOLOv5Detector:
    """Fused detect program with the reference decode (yolov5.py:120-131):
    xywh->xyxy, conf = obj * cls, argmax class, threshold, scale to image."""

    def __init__(self, params=None, seed: int = 0, max_outputs: int = 64,
                 score_threshold: float = 0.25,
                 input_size: int = INPUT_SIZE,
                 compute_dtype=jnp.bfloat16):
        self.width = self.height = input_size
        self.net = YOLOv5s(compute_dtype=compute_dtype)
        if params is None:
            params = self.net.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((input_size, input_size, 3), jnp.float32))
        self.params = params
        self.max_outputs = max_outputs
        self.score_threshold = score_threshold
        self.input_size = input_size

    def detect(self, params, image_resized, orig_w, orig_h):
        """Returns fixed-capacity (boxes_xyxy (K, 4) pixels, classes (K,)
        int32, scores (K,), valid (K,))."""
        heads = self.net.apply(params, image_resized)
        return postprocess_heads(heads, self.input_size, orig_w, orig_h,
                                 score_threshold=self.score_threshold,
                                 max_outputs=self.max_outputs)

    @functools.partial(jax.jit, static_argnums=0)
    def detect_jit(self, image_resized, orig_w, orig_h):
        return self.detect(self.params, image_resized, orig_w, orig_h)
