"""SSD-MobileNet v1 detector, TPU-native.

JAX re-implementation of the capability behind the reference's uint8 TFLite
`detect.tflite` (tools/ssd_mobilenet.py:30-167): MobileNetV1 backbone + SSD
heads + anchor decode + per-class NMS, producing the same output contract as
the TFLITE_DETECTION_POST_PROCESS fused op — normalized (ymin, xmin, ymax,
xmax) boxes, 0-based class ids (background stripped, hence the +1 labelmap
offset at ssd_mobilenet.py:143-145), sigmoid scores — but as one fused XLA
program with fixed-capacity outputs instead of an external C++ runtime.

Anchor generation follows the TF Object Detection API ssd_anchor_generator
defaults (min_scale 0.2, max_scale 0.95, 6 layers, reduced boxes in the
lowest layer), and box decode uses the standard (10, 10, 5, 5) scale
factors, so converted real weights reproduce the reference model.
"""
from __future__ import annotations

import functools
import math
from typing import Any, List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nms as nmsops
from ..ops.onehot import (gather_1d, gather_rows, stable_argsort, topk_desc)

INPUT_SIZE = 300
NUM_CLASSES = 90  # COCO (without background)
BOX_SCALE = (10.0, 10.0, 5.0, 5.0)


class _ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = None   # compute dtype; None would promote back to f32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=self.dtype)(x)
        return nn.relu6(x)


class _DepthwiseSeparable(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        x = nn.Conv(c_in, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", feature_group_count=c_in,
                    use_bias=False, dtype=self.dtype, name="dw")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=self.dtype, name="dw_bn")(x)
        x = nn.relu6(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="pw")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=self.dtype, name="pw_bn")(x)
        return nn.relu6(x)


class SSDMobileNetV1(nn.Module):
    """Returns (box_encodings (A, 4), class_logits (A, NUM_CLASSES + 1))."""
    num_classes: int = NUM_CLASSES
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, image):
        # TFLite uint8 model consumes raw 0..255; float graphs use
        # (2/255)x - 1. We normalize here so BN stats stay conventional.
        x = (image.astype(self.compute_dtype) * (2.0 / 255.0)) - 1.0

        cfg = [(64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
               (512, 1), (512, 1), (512, 1), (512, 1), (512, 1),
               (1024, 2), (1024, 1)]
        dt = self.compute_dtype
        x = _ConvBN(32, 3, 2, dtype=dt, name="conv0")(x)
        feats: List[jnp.ndarray] = []
        for i, (c, s) in enumerate(cfg):
            x = _DepthwiseSeparable(c, s, dtype=dt, name=f"ds{i + 1}")(x)
            if i == 10:               # conv11 output, 19x19x512
                feats.append(x)
        feats.append(x)               # conv13 output, 10x10x1024

        extras = [(256, 512), (128, 256), (128, 256), (64, 128)]
        for i, (c1, c2) in enumerate(extras):
            x = _ConvBN(c1, 1, 1, dtype=dt, name=f"extra{i}_1x1")(x)
            x = _ConvBN(c2, 3, 2, dtype=dt, name=f"extra{i}_3x3")(x)
            feats.append(x)

        boxes_per_loc = [3, 6, 6, 6, 6, 6]
        box_out, cls_out = [], []
        for i, (f, a) in enumerate(zip(feats, boxes_per_loc)):
            b = nn.Conv(a * 4, (1, 1), dtype=dt, name=f"box_head{i}")(f)
            c = nn.Conv(a * (self.num_classes + 1), (1, 1),
                        dtype=dt, name=f"cls_head{i}")(f)
            box_out.append(b.reshape(-1, 4))
            cls_out.append(c.reshape(-1, self.num_classes + 1))
        return (jnp.concatenate(box_out, 0).astype(jnp.float32),
                jnp.concatenate(cls_out, 0).astype(jnp.float32))


def generate_anchors(input_size: int = INPUT_SIZE) -> np.ndarray:
    """TF-OD ssd_anchor_generator anchors as (A, 4) [ycenter, xcenter, h, w]
    in normalized coords."""
    feat_sizes = []
    s = input_size
    # backbone strides 16 (conv11) and 32 (conv13), then /2 each extra
    for stride in (16, 32, 64, 128, 256, 512):
        feat_sizes.append(max(1, math.ceil(input_size / stride)))
    min_scale, max_scale, n = 0.2, 0.95, 6
    scales = [min_scale + (max_scale - min_scale) * i / (n - 1)
              for i in range(n)] + [1.0]
    aspect = [1.0, 2.0, 0.5, 3.0, 1.0 / 3.0]
    anchors = []
    for layer, fs in enumerate(feat_sizes):
        sk = scales[layer]
        sk1 = scales[layer + 1]
        if layer == 0:  # reduce_boxes_in_lowest_layer
            layer_boxes = [(0.1, 1.0), (sk, 2.0), (sk, 0.5)]
        else:
            layer_boxes = [(sk, a) for a in aspect]
            layer_boxes.append((math.sqrt(sk * sk1), 1.0))
        for y in range(fs):
            for x in range(fs):
                cy = (y + 0.5) / fs
                cx = (x + 0.5) / fs
                for scale, ar in layer_boxes:
                    anchors.append((cy, cx, scale / math.sqrt(ar),
                                    scale * math.sqrt(ar)))
    return np.asarray(anchors, np.float32)


def decode_boxes(box_encodings: jnp.ndarray, anchors: jnp.ndarray,
                 box_scale=BOX_SCALE):
    """(ty, tx, th, tw) -> normalized (ymin, xmin, ymax, xmax). box_scale
    defaults to the TF-OD standard (10, 10, 5, 5); real flatbuffers carry
    their own in the fused postprocess op's options."""
    ya, xa, ha, wa = anchors[:, 0], anchors[:, 1], anchors[:, 2], anchors[:, 3]
    ty = box_encodings[:, 0] / box_scale[0]
    tx = box_encodings[:, 1] / box_scale[1]
    th = box_encodings[:, 2] / box_scale[2]
    tw = box_encodings[:, 3] / box_scale[3]
    ycenter = ty * ha + ya
    xcenter = tx * wa + xa
    h = jnp.exp(th) * ha
    w = jnp.exp(tw) * wa
    return jnp.stack([ycenter - h / 2, xcenter - w / 2,
                      ycenter + h / 2, xcenter + w / 2], axis=1)


def postprocess_detections(boxes, probs, orig_w, orig_h, *, top_k,
                           score_threshold, iou_threshold, max_outputs,
                           detections_cap=None):
    """The reference SSD postprocess (tools/ssd_mobilenet.py:100-150) on
    decoded boxes: NaN scrub -> top-K -> confidence filter -> reorder to
    xyxy scaled to the original image -> per-class NMS -> fixed-capacity
    compaction. boxes (N, 4) normalized yxyx; probs (N, C) with the
    background column already stripped. Shared by the float detector and
    the integer-exact quantized one (models/qgraph.py)."""
    scores = jnp.max(probs, axis=1)
    classes = jnp.argmax(probs, axis=1).astype(jnp.int32)

    # NaN scrub (ssd_mobilenet.py:111-116): NaN boxes/scores -> score 0
    bad = jnp.any(jnp.isnan(boxes), axis=1) | jnp.isnan(scores)
    scores = jnp.where(bad, 0.0, scores)

    # top-k + gathers as one-hot rank contractions: XLA's top_k/gather
    # lowerings over the 1917-anchor axis serialize on TPU and cost
    # ~0.9 ms/frame; the rank-matrix form is ~us (ops/onehot.py).
    top_scores, idx = topk_desc(scores, top_k)
    top_boxes = gather_rows(boxes, idx)
    top_classes = gather_1d(classes, idx)
    conf_ok = top_scores >= score_threshold

    # reorder (ymin,xmin,ymax,xmax) -> (x1,y1,x2,y2) * original size
    scale = jnp.stack([orig_w, orig_h, orig_w, orig_h]).astype(jnp.float32)
    xyxy = top_boxes[:, np.array([1, 0, 3, 2])] * scale

    _, keep = nmsops.nms_xyxy_per_class(
        xyxy, top_scores, top_classes, conf_ok, iou_threshold)

    # compact to max_outputs in descending-score order (top_k is sorted)
    K = max_outputs
    keep_key = jnp.where(keep, jnp.arange(top_k, dtype=jnp.int32),
                         jnp.int32(top_k))
    order = stable_argsort(keep_key)[:K]
    valid = gather_1d(keep, order)
    if detections_cap is not None and detections_cap < K:
        # slots are in descending-score order, so this keeps exactly
        # the boxes the fused op would have emitted
        valid = valid & (np.arange(K) < detections_cap)
    return (gather_rows(xyxy, order), gather_1d(top_classes, order),
            gather_1d(top_scores, order), valid)


class SSDMobileNetDetector:
    """Fused detect program with the reference's postprocessing:
    top-K -> NaN scrub -> confidence filter -> reorder to xyxy scaled to the
    original image -> per-class NMS (ssd_mobilenet.py:100-150)."""

    def __init__(self, params=None, seed: int = 0, max_outputs: int = 32,
                 top_k: int = 100, score_threshold: float = 0.5,
                 iou_threshold: float = 0.5,
                 compute_dtype=jnp.bfloat16,
                 anchors=None, box_scale=None, detections_cap=None):
        self.width = self.height = INPUT_SIZE
        self.net = SSDMobileNetV1(compute_dtype=compute_dtype)
        if params is None:
            params = self.net.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((INPUT_SIZE, INPUT_SIZE, 3), jnp.float32))
        self.params = params
        # a real flatbuffer's embedded anchor table / decode scales (from
        # its TFLite_Detection_PostProcess op) override the generated ones
        self.anchors = jnp.asarray(anchors if anchors is not None
                                   else generate_anchors())
        self.box_scale = tuple(box_scale) if box_scale else BOX_SCALE
        self.max_outputs = max_outputs
        self.top_k = top_k
        self.score_threshold = score_threshold
        self.iou_threshold = iou_threshold
        # a fused postprocess op's max_detections: the interpreter emits at
        # most this many boxes from such a file, so slots past it are
        # invalidated (shape stays max_outputs for the pipeline programs)
        self.detections_cap = detections_cap

    def _apply_net(self, params, image_resized):
        """Backbone+heads hook; the int8 throughput mode (models/ssd_q.py)
        overrides this and reuses the decode/NMS below unchanged."""
        return self.net.apply(params, image_resized)

    def detect(self, params, image_resized, orig_w, orig_h):
        """image_resized: (300, 300, 3) float/uint8. Returns fixed-capacity
        (boxes_xyxy (K, 4) in original-image pixels, classes (K,) int32
        0-based, scores (K,), valid (K,) bool), K = max_outputs."""
        box_enc, logits = self._apply_net(params, image_resized)
        boxes = decode_boxes(box_enc, self.anchors, self.box_scale)
        probs = jax.nn.sigmoid(logits)[:, 1:]  # strip background
        return postprocess_detections(
            boxes, probs, orig_w, orig_h, top_k=self.top_k,
            score_threshold=self.score_threshold,
            iou_threshold=self.iou_threshold,
            max_outputs=self.max_outputs,
            detections_cap=self.detections_cap)

    @functools.partial(jax.jit, static_argnums=0)
    def detect_jit(self, image_resized, orig_w, orig_h):
        return self.detect(self.params, image_resized, orig_w, orig_h)
