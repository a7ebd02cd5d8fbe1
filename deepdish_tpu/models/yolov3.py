"""YOLOv3 detector, TPU-native.

JAX re-implementation of the capability behind the reference's Keras YOLOv3
path (tools/yolo.py:153-240 with the network of yolo3/model.py:70-116):
Darknet-53 backbone (conv-BN-LeakyReLU 0.1, residual stages 1/2/8/8/4),
3-scale FPN head, and the sigmoid/exp anchor decode of `yolo_head` /
`decode_netout` with the standard COCO anchors (tools/yolo.py:160). Score =
obj * class prob, per-class greedy NMS at IoU 0.45 (tools/yolo.py:111-124).

Letterboxing: like the reference (tools/yolo.py:141-151) the frame is
scaled preserving aspect ratio onto a gray-128 canvas; the pipeline calls
`configure_letterbox(frame_w, frame_h)` once (static shapes) and the decode
maps boxes back to frame coordinates (the `correct_yolo_boxes` math at
tools/yolo.py:78-86).
"""
from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nms as nmsops

INPUT_SIZE = 416
NUM_CLASSES = 80
# tools/yolo.py:160; masks: scale0 (stride 32) -> anchors 6-8, etc.
ANCHORS = np.array([[10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
                    [59, 119], [116, 90], [156, 198], [373, 326]],
                   np.float32)
MASKS = ((6, 7, 8), (3, 4, 5), (0, 1, 2))
STRIDES = (32, 16, 8)


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = None   # compute dtype; None promotes back to f32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        if self.stride == 2:  # darknet uses top-left padding for stride 2
            x = jnp.pad(x, ((1, 0), (1, 0), (0, 0)))
            padding = "VALID"
        else:
            padding = ((pad, pad), (pad, pad))
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=padding,
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=self.dtype)(x)
        return nn.leaky_relu(x, 0.1)


class Residual(nn.Module):
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = ConvBN(self.features // 2, 1, dtype=self.dtype)(x)
        y = ConvBN(self.features, 3, dtype=self.dtype)(y)
        return x + y


class Darknet53(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = ConvBN(32, 3, dtype=self.dtype, name="stem")(x)
        feats = []
        for ci, (c, n) in enumerate([(64, 1), (128, 2), (256, 8),
                                     (512, 8), (1024, 4)]):
            x = ConvBN(c, 3, 2, dtype=self.dtype, name=f"down{ci}")(x)
            for ri in range(n):
                x = Residual(c, dtype=self.dtype, name=f"res{ci}_{ri}")(x)
            if ci >= 2:
                feats.append(x)   # strides 8, 16, 32
        return feats  # [s8, s16, s32]


class _HeadBlock(nn.Module):
    """5 alternating convs + output conv (yolo3/model.py make_last_layers)."""
    features: int
    out_ch: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        x = ConvBN(self.features, 1, dtype=dt)(x)
        x = ConvBN(self.features * 2, 3, dtype=dt)(x)
        x = ConvBN(self.features, 1, dtype=dt)(x)
        x = ConvBN(self.features * 2, 3, dtype=dt)(x)
        branch = ConvBN(self.features, 1, dtype=dt)(x)
        y = ConvBN(self.features * 2, 3, dtype=dt)(branch)
        y = nn.Conv(self.out_ch, (1, 1), dtype=dt)(y)
        return branch, y


def _up2(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=0), 2, axis=1)


class YOLOv3(nn.Module):
    num_classes: int = NUM_CLASSES
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, image):
        dt = self.compute_dtype
        x = image.astype(dt) / 255.0
        s8, s16, s32 = Darknet53(dtype=dt, name="backbone")(x)
        no = 3 * (5 + self.num_classes)
        b5, y0 = _HeadBlock(512, no, dtype=dt, name="head0")(s32)  # s32
        x = ConvBN(256, 1, dtype=dt, name="up0_conv")(b5)
        x = jnp.concatenate([_up2(x), s16], axis=-1)
        b4, y1 = _HeadBlock(256, no, dtype=dt, name="head1")(x)    # s16
        x = ConvBN(128, 1, dtype=dt, name="up1_conv")(b4)
        x = jnp.concatenate([_up2(x), s8], axis=-1)
        _, y2 = _HeadBlock(128, no, dtype=dt, name="head2")(x)     # s8
        return [y.astype(jnp.float32) for y in (y0, y1, y2)]


def decode_head(head, anchors, input_size, num_classes=NUM_CLASSES):
    """yolo_head decode (yolo3/model.py:90-116 / tools/yolo.py:48-76):
    xy = (sigmoid(t_xy) + grid) / grid_size; wh = exp(t_wh) * anchor /
    input_size; obj/cls sigmoid. Returns (cells*3, 5+nc) normalized rows."""
    H, W = head.shape[0], head.shape[1]
    x = head.reshape(H, W, 3, 5 + num_classes)
    gy = jax.lax.broadcasted_iota(jnp.float32, (H, W, 3), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (H, W, 3), 1)
    xy = (jax.nn.sigmoid(x[..., 0:2]) +
          jnp.stack([gx, gy], axis=-1)) / jnp.asarray([W, H], jnp.float32)
    wh = jnp.exp(jnp.clip(x[..., 2:4], -10, 10)) * anchors / input_size
    obj = jax.nn.sigmoid(x[..., 4:5])
    cls = jax.nn.sigmoid(x[..., 5:])
    return jnp.concatenate([xy, wh, obj, cls], axis=-1).reshape(
        -1, 5 + num_classes)


class YOLOv3Detector:
    """Fused detect with the reference's postprocess: score = obj*cls,
    threshold, per-class NMS at 0.45 (tools/yolo.py:107-124)."""

    def __init__(self, params=None, seed: int = 0, max_outputs: int = 32,
                 score_threshold: float = 0.5, nms_threshold: float = 0.45,
                 top_k: int = 100, input_size: int = INPUT_SIZE,
                 compute_dtype=jnp.bfloat16):
        self.width = self.height = input_size
        self.net = YOLOv3(compute_dtype=compute_dtype)
        if params is None:
            params = self.net.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((input_size, input_size, 3), jnp.float32))
        self.params = params
        self.max_outputs = max_outputs
        self.score_threshold = score_threshold
        self.nms_threshold = nms_threshold
        self.top_k = top_k
        self.input_size = input_size
        self.letterbox = True
        self._lb = None  # (left, top, new_w, new_h) in input pixels

    def configure_letterbox(self, frame_w: int, frame_h: int):
        """Static letterbox geometry for a given frame size
        (tools/yolo.py:141-151: aspect-preserving scale onto gray 128)."""
        scale = min(self.input_size / frame_w, self.input_size / frame_h)
        nw = int(round(frame_w * scale))
        nh = int(round(frame_h * scale))
        self._lb = ((self.input_size - nw) // 2,
                    (self.input_size - nh) // 2, nw, nh)
        return self._lb

    def detect(self, params, image_resized, orig_w, orig_h):
        heads = self.net.apply(params, image_resized)
        rows = jnp.concatenate([
            decode_head(h, jnp.asarray(ANCHORS[list(MASKS[i])]),
                        self.input_size)
            for i, h in enumerate(heads)], axis=0)
        conf = rows[:, 5:] * rows[:, 4:5]
        scores = jnp.max(conf, axis=1)
        classes = jnp.argmax(conf, axis=1).astype(jnp.int32)
        top_scores, idx = jax.lax.top_k(scores, self.top_k)
        scale = jnp.stack([orig_w, orig_h, orig_w, orig_h]).astype(
            jnp.float32)
        xy, wh = rows[:, 0:2], rows[:, 2:4]
        if self._lb is not None:
            # undo the letterbox (tools/yolo.py:78-86): boxes are normalized
            # to the padded input; map back to frame-relative coordinates
            left, top, nw, nh = self._lb
            IN = float(self.input_size)
            off = jnp.asarray(np.array([left / IN, top / IN], np.float32))
            sc = jnp.asarray(np.array([IN / nw, IN / nh], np.float32))
            xy = (xy - off) * sc
            wh = wh * sc
        xyxy = jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=1)[idx] \
            * scale
        top_classes = classes[idx]
        ok = top_scores >= self.score_threshold
        _, keep = nmsops.nms_xyxy_per_class(
            xyxy, top_scores, top_classes, ok, self.nms_threshold)
        K = self.max_outputs
        key = jnp.where(keep, jnp.arange(self.top_k, dtype=jnp.int32),
                        jnp.int32(self.top_k))
        order = jnp.argsort(key, stable=True)[:K]
        return (xyxy[order], top_classes[order], top_scores[order],
                keep[order])

    @functools.partial(jax.jit, static_argnums=0)
    def detect_jit(self, image_resized, orig_w, orig_h):
        return self.detect(self.params, image_resized, orig_w, orig_h)
