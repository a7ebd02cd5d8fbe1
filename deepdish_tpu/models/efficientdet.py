"""EfficientDet-Lite0 detector, TPU-native.

JAX re-implementation of the capability behind the reference's
metadata-driven generic TFLite detector (tools/tflite_object_detector.py:
41-295, exercised with EfficientDet-Lite0 per tflite-demo.sh:7):
EfficientNet-Lite0 backbone (no squeeze-excite, ReLU6), BiFPN neck (64 ch,
3 repeats, P3-P7), shared box/class heads, SSD-style anchor decode
(scale factors 1) and per-class NMS. Input normalization follows the
model's embedded metadata defaults (mean 127, std 128,
tflite_object_detector.py:117-131).
"""
from __future__ import annotations

import functools
import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nms as nmsops

INPUT_SIZE = 320
NUM_CLASSES = 90
FPN_CH = 64
FPN_REPEATS = 3
HEAD_REPEATS = 3
ANCHOR_SCALE = 3.0
NUM_SCALES = 3
ASPECTS = (1.0, 2.0, 0.5)
LEVELS = (3, 4, 5, 6, 7)


class _ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    act: bool = True
    dtype: Any = None   # compute dtype; None promotes back to f32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=self.dtype)(x)
        return nn.relu6(x) if self.act else x


class _MBConvLite(nn.Module):
    """MBConv without squeeze-excite, ReLU6 (EfficientNet-Lite)."""
    features: int
    expand: int
    kernel: int
    stride: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        y = x
        if self.expand != 1:
            y = _ConvBN(c_in * self.expand, 1, dtype=self.dtype,
                        name="expand")(y)
        c_mid = y.shape[-1]
        y = nn.Conv(c_mid, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    feature_group_count=c_mid, use_bias=False,
                    dtype=self.dtype, name="dw")(y)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=self.dtype, name="dw_bn")(y)
        y = nn.relu6(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="project")(y)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=self.dtype, name="project_bn")(y)
        if self.stride == 1 and c_in == self.features:
            y = x + y
        return y


_BLOCKS = [  # (expand, channels, repeats, stride, kernel)
    (1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3), (6, 112, 3, 1, 5), (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3)]


class EfficientNetLite0(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        feats = {}
        x = _ConvBN(32, 3, 2, dtype=self.dtype, name="stem")(x)
        for bi, (e, c, r, s, k) in enumerate(_BLOCKS):
            for ri in range(r):
                x = _MBConvLite(c, e, k, s if ri == 0 else 1,
                                dtype=self.dtype, name=f"b{bi}_{ri}")(x)
            if bi == 2:
                feats[3] = x   # stride 8
            elif bi == 4:
                feats[4] = x   # stride 16
            elif bi == 6:
                feats[5] = x   # stride 32
        return feats


class _SepConvBN(nn.Module):
    features: int
    act: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = nn.Conv(c, (3, 3), padding="SAME", feature_group_count=c,
                    use_bias=False, dtype=self.dtype, name="dw")(x)
        x = nn.Conv(self.features, (1, 1), use_bias=True,
                    dtype=self.dtype, name="pw")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu6(x) if self.act else x


def _down2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")


def _up_to(x, like):
    """Nearest-neighbor upsample x to the spatial size of `like` (EfficientDet
    resizes to the exact target grid; odd sizes crop the 2x repeat)."""
    y = jnp.repeat(jnp.repeat(x, 2, axis=0), 2, axis=1)
    return y[:like.shape[0], :like.shape[1]]


class BiFPNLayer(nn.Module):
    """Sum-fusion BiFPN layer over P3..P7 (lite keeps fast-attention; sum
    fusion is weight-compatible after folding, and identical with converted
    fusion weights absorbed — documented deviation)."""
    dtype: Any = None

    @nn.compact
    def __call__(self, p):
        p3, p4, p5, p6, p7 = p
        # top-down
        td6 = _SepConvBN(FPN_CH, dtype=self.dtype, name="td6")(nn.relu6(p6 + _up_to(p7, p6)))
        td5 = _SepConvBN(FPN_CH, dtype=self.dtype, name="td5")(nn.relu6(p5 + _up_to(td6, p5)))
        td4 = _SepConvBN(FPN_CH, dtype=self.dtype, name="td4")(nn.relu6(p4 + _up_to(td5, p4)))
        o3 = _SepConvBN(FPN_CH, dtype=self.dtype, name="out3")(nn.relu6(p3 + _up_to(td4, p3)))
        # bottom-up
        o4 = _SepConvBN(FPN_CH, dtype=self.dtype, name="out4")(
            nn.relu6(p4 + td4 + _down2(o3)))
        o5 = _SepConvBN(FPN_CH, dtype=self.dtype, name="out5")(
            nn.relu6(p5 + td5 + _down2(o4)))
        o6 = _SepConvBN(FPN_CH, dtype=self.dtype, name="out6")(
            nn.relu6(p6 + td6 + _down2(o5)))
        o7 = _SepConvBN(FPN_CH, dtype=self.dtype, name="out7")(nn.relu6(p7 + _down2(o6)))
        return [o3, o4, o5, o6, o7]


class EfficientDetLite0(nn.Module):
    num_classes: int = NUM_CLASSES
    compute_dtype: Any = jnp.bfloat16
    # normalization per the model's embedded metadata; defaults are the
    # EfficientDet-Lite export values (tflite_object_detector.py:117-131)
    norm_mean: tuple = (127.0,)
    norm_std: tuple = (128.0,)

    @nn.compact
    def __call__(self, image):
        mean = jnp.asarray(self.norm_mean, self.compute_dtype)
        std = jnp.asarray(self.norm_std, self.compute_dtype)
        dt = self.compute_dtype
        x = (image.astype(dt) - mean) / std
        feats = EfficientNetLite0(dtype=dt, name="backbone")(x)
        p3 = _ConvBN(FPN_CH, 1, act=False, dtype=dt, name="lat3")(feats[3])
        p4 = _ConvBN(FPN_CH, 1, act=False, dtype=dt, name="lat4")(feats[4])
        p5 = _ConvBN(FPN_CH, 1, act=False, dtype=dt, name="lat5")(feats[5])
        p6 = _down2(_ConvBN(FPN_CH, 1, act=False, dtype=dt,
                            name="lat6")(feats[5]))
        p7 = _down2(p6)
        p = [p3, p4, p5, p6, p7]
        for i in range(FPN_REPEATS):
            p = BiFPNLayer(dtype=dt, name=f"bifpn{i}")(p)
        na = NUM_SCALES * len(ASPECTS)
        box_out, cls_out = [], []
        for li, f in enumerate(p):
            b, c = f, f
            for hi in range(HEAD_REPEATS):
                b = _SepConvBN(FPN_CH, act=True, dtype=dt,
                               name=f"boxh{hi}_l{li}")(b)
                c = _SepConvBN(FPN_CH, act=True, dtype=dt,
                               name=f"clsh{hi}_l{li}")(c)
            b = nn.Conv(na * 4, (3, 3), padding="SAME", dtype=dt,
                        name=f"box_pred_l{li}")(b)
            c = nn.Conv(na * self.num_classes, (3, 3), padding="SAME",
                        dtype=dt, name=f"cls_pred_l{li}")(c)
            box_out.append(b.reshape(-1, 4))
            cls_out.append(c.reshape(-1, self.num_classes))
        return (jnp.concatenate(box_out, 0).astype(jnp.float32),
                jnp.concatenate(cls_out, 0).astype(jnp.float32))


def generate_anchors(input_size: int = INPUT_SIZE) -> np.ndarray:
    """(A, 4) [ycenter, xcenter, h, w] in pixels (EfficientDet convention)."""
    anchors = []
    for level in LEVELS:
        stride = 2 ** level
        fs = math.ceil(input_size / stride)
        for y in range(fs):
            for x in range(fs):
                cy = (y + 0.5) * stride
                cx = (x + 0.5) * stride
                for si in range(NUM_SCALES):
                    scale = ANCHOR_SCALE * stride * 2 ** (si / NUM_SCALES)
                    for ar in ASPECTS:
                        anchors.append((cy, cx, scale / math.sqrt(ar),
                                        scale * math.sqrt(ar)))
    return np.asarray(anchors, np.float32)


def build_label_filter_lut(labels, label_allow, label_deny):
    """Class-id -> keep? LUT for the reference's allow/deny-list options
    (tools/tflite_object_detector.py:47-53, 275-289: deny filter first,
    then allow filter). Returns None when both lists are unset. The LUT
    carries one extra trailing slot for class ids with no label-map entry:
    such names cannot appear in either list, so they are kept under a
    deny-only filter and dropped when an allow list is set — the exact
    membership semantics the reference's name-based filters produce."""
    if not label_allow and not label_deny:
        return None
    n = max(labels) + 1 if labels else 0
    lut = np.full((n + 1,), label_allow is None, bool)
    for idx, name in labels.items():
        keep = True
        if label_deny and name in label_deny:
            keep = False
        if label_allow is not None and name not in label_allow:
            keep = False
        lut[idx] = keep
    return jnp.asarray(lut)


def apply_result_filter(classes, valid, lut, max_results):
    """In-jit analog of the reference's result filtering
    (tools/tflite_object_detector.py:270-295): detections arrive in
    descending-score slot order, allow/deny masks apply per class, and at
    most `max_results` top-scored survivors stay valid."""
    if lut is not None:
        n = lut.shape[0] - 1          # trailing slot = unknown-class ids
        valid = valid & lut[jnp.minimum(classes, n)]
    if max_results and max_results > 0:
        valid = valid & (jnp.cumsum(valid.astype(jnp.int32)) <= max_results)
    return valid


class EfficientDetLite0Detector:
    """Fused detect with the metadata-driven postprocess semantics of
    tools/tflite_object_detector.py:234-295 (score threshold, max_results,
    per-class NMS, allow/deny label lists)."""

    def __init__(self, params=None, seed: int = 0, max_outputs: int = 32,
                 top_k: int = 100, score_threshold: float = 0.5,
                 iou_threshold: float = 0.5, compute_dtype=jnp.bfloat16,
                 norm_mean=(127.0,), norm_std=(128.0,),
                 anchors=None, box_scale=None, detections_cap=None,
                 label_allow=None, label_deny=None, max_results: int = -1):
        self.width = self.height = INPUT_SIZE
        self.net = EfficientDetLite0(compute_dtype=compute_dtype,
                                     norm_mean=tuple(norm_mean),
                                     norm_std=tuple(norm_std))
        if params is None:
            params = self.net.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((INPUT_SIZE, INPUT_SIZE, 3), jnp.float32))
        self.params = params
        # pixel-unit anchors; a real flatbuffer's embedded (normalized)
        # anchor table is scaled by INPUT_SIZE at the registry
        self.anchors = jnp.asarray(anchors if anchors is not None
                                   else generate_anchors())
        # EfficientDet exports use decode scales (1, 1, 1, 1)
        self.box_scale = tuple(box_scale) if box_scale else (1.0,) * 4
        self.max_outputs = max_outputs
        self.top_k = top_k
        self.score_threshold = score_threshold
        self.iou_threshold = iou_threshold
        # a fused postprocess op's max_detections: slots past it are
        # invalidated (shape stays max_outputs for the pipeline programs)
        self.detections_cap = detections_cap
        # reference option surface (ObjectDetectorOptions): allow/deny
        # lists resolve to a class-id LUT once labels are known
        # (finalize_label_filter, called by the registry after it attaches
        # det.labels); max_results truncates to the top-scored survivors.
        self.label_allow = list(label_allow) if label_allow else None
        self.label_deny = list(label_deny) if label_deny else None
        self.max_results = max_results
        self._filter_lut = None

    def finalize_label_filter(self):
        self._filter_lut = build_label_filter_lut(
            getattr(self, "labels", {}), self.label_allow, self.label_deny)

    def detect(self, params, image_resized, orig_w, orig_h):
        box_enc, logits = self.net.apply(params, image_resized)
        ya, xa = self.anchors[:, 0], self.anchors[:, 1]
        ha, wa = self.anchors[:, 2], self.anchors[:, 3]
        sy, sx, sh, sw_ = self.box_scale
        ycenter = box_enc[:, 0] / sy * ha + ya
        xcenter = box_enc[:, 1] / sx * wa + xa
        h = jnp.exp(box_enc[:, 2] / sh) * ha
        w = jnp.exp(box_enc[:, 3] / sw_) * wa
        probs = jax.nn.sigmoid(logits)
        scores = jnp.max(probs, axis=1)
        classes = jnp.argmax(probs, axis=1).astype(jnp.int32)
        top_scores, idx = jax.lax.top_k(scores, self.top_k)
        sw = orig_w / self.width
        sh = orig_h / self.height
        xyxy = jnp.stack([(xcenter - w / 2) * sw, (ycenter - h / 2) * sh,
                          (xcenter + w / 2) * sw, (ycenter + h / 2) * sh],
                         axis=1)[idx]
        top_classes = classes[idx]
        conf_ok = top_scores >= self.score_threshold
        _, keep = nmsops.nms_xyxy_per_class(
            xyxy, top_scores, top_classes, conf_ok, self.iou_threshold)
        K = self.max_outputs
        keep_key = jnp.where(keep, jnp.arange(self.top_k, dtype=jnp.int32),
                             jnp.int32(self.top_k))
        order = jnp.argsort(keep_key, stable=True)[:K]
        valid = keep[order]
        if self.detections_cap is not None and self.detections_cap < K:
            # descending-score slots: keep exactly what the fused op emits
            valid = valid & (np.arange(K) < self.detections_cap)
        out_classes = top_classes[order]
        valid = apply_result_filter(out_classes, valid, self._filter_lut,
                                    self.max_results)
        return (xyxy[order], out_classes, top_scores[order], valid)

    @functools.partial(jax.jit, static_argnums=0)
    def detect_jit(self, image_resized, orig_w, orig_h):
        return self.detect(self.params, image_resized, orig_w, orig_h)
