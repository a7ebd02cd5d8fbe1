"""Faster R-CNN (ResNet-v1 C4) detector, TPU-native.

JAX re-implementation of the capability behind the reference's SAVED_MODEL
path (tools/saved_model.py:9-103), whose default artifact is the TF-OD
`faster_rcnn_resnet101_v1_640x640_coco17_tpu-8` SavedModel: a two-stage
detector the reference executes through the TF runtime. Here the whole
meta-architecture is ONE fused XLA program — ResNet-v1 trunk (conv1 +
blocks 1-3, output stride 16) -> RPN head -> proposal decode + in-jit NMS
-> MXU crop-and-resize (separable bilinear interpolation as two einsum
contractions, tf.image.crop_and_resize semantics) -> block4 box head ->
per-class decode + NMS -> fixed-capacity detections. No TF execution, no
host callbacks, static shapes throughout.

Conventions follow the TF1 object-detection faster_rcnn_resnet_v1 family
(the export whose variable names `convert.convert_faster_rcnn_tfod`
ingests): slim resnet_v1 bottlenecks with the stride on the 3x3 conv and
block downsampling on the LAST unit, grid anchors with base size 256 /
scales (0.25, 0.5, 1, 2) / aspects (0.5, 1, 2) on a stride-16 grid with
zero offset, faster_rcnn_box_coder scales (10, 10, 5, 5), channel-mean
input normalization, 14x14 ROI crops max-pooled to 7x7 before block4.

Documented deviations from the TF-OD meta-arch (both shrink the candidate
set before O(K^2) in-jit NMS; neither changes what the downstream pipeline
consumes in practice):
  * the RPN applies NMS to the top `pre_nms_topk` proposals by objectness
    rather than all ~19k anchors;
  * the second stage, in its default "argmax" mode, scores each proposal
    with its argmax class instead of emitting one candidate per
    (proposal, class) pair, so a proposal yields at most one detection
    (the reference adaptor also consumes one (box, label, score) triple
    per detection, tools/saved_model.py:55-67). Setting
    FasterRCNNConfig(second_stage_mode="per_class") removes this
    deviation: it implements TF-OD's _postprocess_box_classifier exactly
    (per-(proposal, class) candidates, per-class NMS, per-class caps) and
    is equality-tested against a raw-TF mirror of that postprocess.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nms import _greedy
from ..ops.onehot import gather_1d, gather_rows, stable_argsort, topk_desc

# resnet_v1 channel-mean preprocessing (RGB), the TF-OD
# faster_rcnn_resnet_v1 feature extractor's `preprocess`.
CHANNEL_MEANS = (123.68, 116.779, 103.939)
BOX_SCALE = (10.0, 10.0, 5.0, 5.0)


@dataclass(frozen=True)
class FasterRCNNConfig:
    """Architecture + meta-arch hyperparameters. Defaults match the
    faster_rcnn_resnet101_v1_640x640 zoo configuration; tests shrink the
    net through these fields without touching the wiring."""
    input_size: int = 640
    stem_features: int = 64
    block_units: Tuple[int, ...] = (3, 4, 23, 3)       # resnet101
    block_features: Tuple[int, ...] = (256, 512, 1024, 2048)
    block_strides: Tuple[int, ...] = (2, 2, 1, 1)      # C4: stride-16 trunk
    num_classes: int = 90
    # first stage
    anchor_base: float = 256.0
    anchor_scales: Tuple[float, ...] = (0.25, 0.5, 1.0, 2.0)
    anchor_aspects: Tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_stride: int = 16
    rpn_features: int = 512
    pre_nms_topk: int = 1024
    max_proposals: int = 300          # first_stage_max_proposals
    rpn_iou_threshold: float = 0.7
    crop_size: int = 14
    # second stage
    nms_iou_threshold: float = 0.6
    # "argmax": one candidate per proposal (its argmax class) — the lean
    # default (a proposal yields at most one detection, which is also all
    # the reference adaptor consumes, tools/saved_model.py:55-67).
    # "per_class": the EXACT TF-OD _postprocess_box_classifier shape — one
    # candidate per (proposal, class) pair with that class's refined box,
    # per-class NMS, max_detections_per_class cap, top max_total overall.
    second_stage_mode: str = "argmax"
    max_detections_per_class: int = 100

    @property
    def anchors_per_cell(self) -> int:
        return len(self.anchor_scales) * len(self.anchor_aspects)


def generate_rpn_anchors(cfg: FasterRCNNConfig) -> np.ndarray:
    """TF-OD GridAnchorGenerator anchors as (N, 4) [ycenter, xcenter, h, w]
    in absolute input pixels: centers at (row * stride, col * stride)
    (zero offset), h = base * scale / sqrt(aspect), w = base * scale *
    sqrt(aspect). Per-cell order is ASPECT-major, scale-minor — TF-OD's
    GridAnchorGenerator flattens `ops.meshgrid(scales, aspect_ratios)`
    (shape (n_aspects, n_scales)) row-major, and the RPN head's channel
    layout is trained against that order, so a real zoo checkpoint's
    rpn_box/rpn_cls channels bind to these anchors only in this order."""
    fs = cfg.input_size // cfg.anchor_stride
    per_cell = [(cfg.anchor_base * s / np.sqrt(a),
                 cfg.anchor_base * s * np.sqrt(a))
                for a in cfg.anchor_aspects for s in cfg.anchor_scales]
    anchors = []
    for y in range(fs):
        for x in range(fs):
            cy = y * cfg.anchor_stride
            cx = x * cfg.anchor_stride
            for h, w in per_cell:
                anchors.append((cy, cx, h, w))
    return np.asarray(anchors, np.float32)


def decode_rcnn_boxes(encodings, anchors_ychw, box_scale=BOX_SCALE):
    """faster_rcnn_box_coder decode: (ty, tx, th, tw) vs anchors given as
    (ycenter, xcenter, h, w) -> (ymin, xmin, ymax, xmax), same units as the
    anchors (absolute px for the RPN, normalized for the second stage)."""
    ya, xa = anchors_ychw[:, 0], anchors_ychw[:, 1]
    ha, wa = anchors_ychw[:, 2], anchors_ychw[:, 3]
    ty = encodings[:, 0] / box_scale[0]
    tx = encodings[:, 1] / box_scale[1]
    th = encodings[:, 2] / box_scale[2]
    tw = encodings[:, 3] / box_scale[3]
    ycenter = ty * ha + ya
    xcenter = tx * wa + xa
    h = jnp.exp(th) * ha
    w = jnp.exp(tw) * wa
    return jnp.stack([ycenter - h / 2, xcenter - w / 2,
                      ycenter + h / 2, xcenter + w / 2], axis=1)


def crop_and_resize(fmap, boxes_yxyx, crop_h: int, crop_w: int):
    """tf.image.crop_and_resize (bilinear, extrapolation 0) as two MXU
    einsum contractions: separable interpolation weights W_y (P, ch, Hf)
    and W_x (P, cw, Wf) contract the feature map once per axis instead of
    gathering P*ch*cw*C scattered elements.

    fmap (Hf, Wf, C); boxes_yxyx (P, 4) normalized to the feature map
    extent (TF convention: position = y1 * (Hf - 1) + i * (y2 - y1) *
    (Hf - 1) / (crop_h - 1)). Returns (P, crop_h, crop_w, C) in fmap dtype.
    """
    Hf, Wf = fmap.shape[0], fmap.shape[1]
    y1, x1, y2, x2 = (boxes_yxyx[:, i] for i in range(4))

    def positions(lo, hi, n, extent):
        steps = jnp.arange(n, dtype=jnp.float32)
        return (lo[:, None] * (extent - 1)
                + steps[None, :] * ((hi - lo) * (extent - 1))[:, None]
                / (n - 1))

    ys = positions(y1, y2, crop_h, Hf)          # (P, crop_h)
    xs = positions(x1, x2, crop_w, Wf)          # (P, crop_w)

    def weights(pos, extent):
        grid = jnp.arange(extent, dtype=jnp.float32)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - grid))
        # TF extrapolates out-of-range sample points with 0
        in_range = (pos >= 0.0) & (pos <= extent - 1)
        return w * in_range[..., None]          # (P, n, extent)

    wy = weights(ys, Hf).astype(fmap.dtype)
    wx = weights(xs, Wf).astype(fmap.dtype)
    rows = jnp.einsum("pih,hwc->piwc", wy, fmap)
    return jnp.einsum("piwc,pjw->pijc", rows, wx)


def _iou_yxyx(boxes):
    """Plain pairwise IoU on (ymin, xmin, ymax, xmax) boxes — the
    tf.image.non_max_suppression criterion (no +1px convention)."""
    tl = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    br = jnp.minimum(boxes[:, None, 2:4], boxes[None, :, 2:4])
    wh = jnp.maximum(0.0, br - tl)
    inter = wh[..., 0] * wh[..., 1]
    area = jnp.maximum(0.0, boxes[:, 2] - boxes[:, 0]) * \
        jnp.maximum(0.0, boxes[:, 3] - boxes[:, 1])
    denom = area[:, None] + area[None, :] - inter
    return inter / jnp.where(denom == 0.0, 1.0, denom)


class _BottleneckV1(nn.Module):
    """slim resnet_v1 bottleneck: 1x1 reduce -> 3x3 (stride here) -> 1x1
    expand, projection shortcut when width or stride changes, relu(sum)."""
    features: int
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        depth_in = x.shape[-1]
        mid = self.features // 4

        def conv_bn(h, f, k, s, name, relu=True):
            h = nn.Conv(f, (k, k), strides=(s, s), padding="SAME",
                        use_bias=False, dtype=self.dtype, name=name)(h)
            h = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                             dtype=self.dtype, name=f"{name}_bn")(h)
            return nn.relu(h) if relu else h

        if depth_in != self.features or self.stride != 1:
            shortcut = conv_bn(x, self.features, 1, self.stride,
                               "shortcut", relu=False)
        else:
            shortcut = x
        h = conv_bn(x, mid, 1, 1, "conv1")
        h = conv_bn(h, mid, 3, self.stride, "conv2")
        h = conv_bn(h, self.features, 1, 1, "conv3", relu=False)
        return nn.relu(shortcut + h)


class _ResNetBlock(nn.Module):
    """slim resnet_v1_block: `units` bottlenecks, stride on the LAST."""
    units: int
    features: int
    stride: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.units):
            s = self.stride if i == self.units - 1 else 1
            x = _BottleneckV1(self.features, s, dtype=self.dtype,
                              name=f"unit_{i + 1}")(x)
        return x


class FasterRCNNNet(nn.Module):
    """The full two-stage program. __call__(image) runs trunk + RPN +
    proposal selection + ROI heads + postprocess and returns fixed-capacity
    (boxes_yxyx normalized, classes int32 0-based background-stripped,
    scores, valid), K = max_outputs."""
    cfg: FasterRCNNConfig = field(default_factory=FasterRCNNConfig)
    max_outputs: int = 32
    score_threshold: float = 0.5
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, image, with_intermediates: bool = False):
        cfg = self.cfg
        dt = self.compute_dtype
        inter = {}

        # ---- trunk (first-stage feature extractor, output stride 16) ----
        x = (image.astype(jnp.float32)
             - jnp.asarray(CHANNEL_MEANS, jnp.float32)).astype(dt)
        x = nn.Conv(cfg.stem_features, (7, 7), strides=(2, 2),
                    padding="SAME", use_bias=False, dtype=dt,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=dt, name="conv1_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x[None], (3, 3), strides=(2, 2), padding="SAME")[0]
        for b in range(3):
            x = _ResNetBlock(cfg.block_units[b], cfg.block_features[b],
                             cfg.block_strides[b], dtype=dt,
                             name=f"block{b + 1}")(x)
        fmap = x                                       # (Hf, Wf, C4)
        inter["fmap"] = fmap

        # ---- RPN head ----
        a = cfg.anchors_per_cell
        rpn = nn.relu(nn.Conv(cfg.rpn_features, (3, 3), padding="SAME",
                              dtype=dt, name="rpn_conv")(fmap))
        rpn_box = nn.Conv(a * 4, (1, 1), dtype=dt, name="rpn_box")(rpn)
        rpn_cls = nn.Conv(a * 2, (1, 1), dtype=dt, name="rpn_cls")(rpn)
        box_enc = rpn_box.reshape(-1, 4).astype(jnp.float32)
        cls_logits = rpn_cls.reshape(-1, 2).astype(jnp.float32)
        inter["rpn_box"] = box_enc
        inter["rpn_cls"] = cls_logits

        # ---- proposal selection (absolute px, f32) ----
        anchors = jnp.asarray(generate_rpn_anchors(cfg))
        objness = jax.nn.softmax(cls_logits, axis=-1)[:, 1]
        boxes = decode_rcnn_boxes(box_enc, anchors)
        size = jnp.float32(cfg.input_size)
        boxes = jnp.stack([jnp.clip(boxes[:, 0], 0.0, size),
                           jnp.clip(boxes[:, 1], 0.0, size),
                           jnp.clip(boxes[:, 2], 0.0, size),
                           jnp.clip(boxes[:, 3], 0.0, size)], axis=1)
        k = min(cfg.pre_nms_topk, boxes.shape[0])
        top_scores, top_idx = jax.lax.top_k(objness, k)
        top_boxes = boxes[top_idx]
        _, keep = _greedy(_iou_yxyx(top_boxes), top_scores,
                          jnp.ones((k,), bool), cfg.rpn_iou_threshold,
                          tie_high=False)
        # compact kept proposals in descending-score order (top_k sorted)
        P = min(cfg.max_proposals, k)
        keep_key = jnp.where(keep, jnp.arange(k, dtype=jnp.int32),
                             jnp.int32(k))
        order = stable_argsort(keep_key)[:P]
        proposals = gather_rows(top_boxes, order) / size   # normalized
        prop_valid = gather_1d(keep, order)
        inter["proposals"] = proposals
        inter["prop_valid"] = prop_valid

        # ---- ROI feature extraction (second-stage feature extractor) ----
        crops = crop_and_resize(fmap, proposals.astype(jnp.float32),
                                cfg.crop_size, cfg.crop_size)
        crops = nn.max_pool(crops, (2, 2), strides=(2, 2), padding="SAME")
        roi = _ResNetBlock(cfg.block_units[3], cfg.block_features[3],
                           cfg.block_strides[3], dtype=dt,
                           name="block4")(crops)
        pooled = jnp.mean(roi, axis=(1, 2))            # (P, C5)

        # ---- second-stage predictors ----
        nc = cfg.num_classes
        cls = nn.Dense(nc + 1, dtype=dt, name="cls_head")(pooled)
        box = nn.Dense(nc * 4, dtype=dt, name="box_head")(pooled)
        cls = cls.astype(jnp.float32)
        box = box.reshape(P, nc, 4).astype(jnp.float32)

        # ---- postprocess ----
        probs = jax.nn.softmax(cls, axis=-1)[:, 1:]    # strip background
        py = (proposals[:, 0] + proposals[:, 2]) / 2
        px = (proposals[:, 1] + proposals[:, 3]) / 2
        ph = proposals[:, 2] - proposals[:, 0]
        pw = proposals[:, 3] - proposals[:, 1]
        prop_ychw = jnp.stack([py, px, ph, pw], 1)
        inter["probs2"] = probs
        inter["box2"] = box
        inter["prop_ychw"] = prop_ychw

        if cfg.second_stage_mode == "per_class":
            out = self._postprocess_per_class(probs, box, prop_ychw,
                                              prop_valid)
        else:
            out = self._postprocess_argmax(probs, box, prop_ychw,
                                           prop_valid)
        if with_intermediates:
            return out, inter
        return out

    def _postprocess_argmax(self, probs, box, prop_ychw, prop_valid):
        """One candidate per proposal: its argmax class + that class's
        refined box (documented deviation from TF-OD, module docstring)."""
        cfg = self.cfg
        nc = cfg.num_classes
        scores = jnp.max(probs, axis=1)
        classes = jnp.argmax(probs, axis=1).astype(jnp.int32)
        deltas = jnp.einsum("pc,pcd->pd",
                            jax.nn.one_hot(classes, nc, dtype=jnp.float32),
                            box)
        final = decode_rcnn_boxes(deltas, prop_ychw)
        final = jnp.clip(final, 0.0, 1.0)

        bad = jnp.any(jnp.isnan(final), axis=1) | jnp.isnan(scores)
        scores = jnp.where(bad | ~prop_valid, 0.0, scores)
        conf_ok = scores >= self.score_threshold

        # per-class plain-IoU NMS via the class-offset trick
        shifted = final + classes.astype(jnp.float32)[:, None] * 4.0
        iou = jnp.where(classes[:, None] == classes[None, :],
                        _iou_yxyx(shifted), 0.0)
        _, keep2 = _greedy(iou, scores, conf_ok, cfg.nms_iou_threshold,
                           tie_high=False)

        K = self.max_outputs
        masked = jnp.where(keep2, scores, -1.0)
        _, order2 = topk_desc(masked, K)
        return (gather_rows(final, order2), gather_1d(classes, order2),
                gather_1d(scores, order2), gather_1d(keep2, order2))

    def _postprocess_per_class(self, probs, box, prop_ychw, prop_valid):
        """TF-OD _postprocess_box_classifier exactly: every (proposal,
        class) pair is a candidate with that class's refined box; NMS runs
        independently per class (vmapped greedy over the class axis), each
        class keeps at most max_detections_per_class top-scored survivors,
        and the top max_outputs across classes are emitted."""
        cfg = self.cfg
        P, nc = probs.shape
        # decode every class's box against its proposal: (P*nc, 4)
        anchors_rep = jnp.repeat(prop_ychw, nc, axis=0)
        final = decode_rcnn_boxes(box.reshape(P * nc, 4), anchors_rep)
        final = jnp.clip(final, 0.0, 1.0).reshape(P, nc, 4)

        scores = probs
        bad = jnp.any(jnp.isnan(final), axis=2) | jnp.isnan(scores)
        scores = jnp.where(bad | ~prop_valid[:, None], 0.0, scores)
        conf_ok = scores >= self.score_threshold

        # per-class NMS: (nc, P, 4) boxes, (nc, P) scores
        boxes_c = jnp.transpose(final, (1, 0, 2))
        scores_c = scores.T
        keep_c = jax.vmap(
            lambda b, s, m: _greedy(_iou_yxyx(b), s, m,
                                    cfg.nms_iou_threshold,
                                    tie_high=False)[1])(
            boxes_c, scores_c, conf_ok.T)
        # max_detections_per_class: survivors are ranked per class
        if cfg.max_detections_per_class and cfg.max_detections_per_class < P:
            def cap(s, k):
                ord_ = stable_argsort(jnp.where(k, -s, jnp.inf))
                rank = jnp.zeros((P,), jnp.int32).at[ord_].set(
                    jnp.arange(P, dtype=jnp.int32))
                return k & (rank < cfg.max_detections_per_class)
            keep_c = jax.vmap(cap)(scores_c, keep_c)

        flat_scores = scores_c.reshape(-1)
        flat_keep = keep_c.reshape(-1)
        flat_boxes = boxes_c.reshape(-1, 4)
        flat_classes = jnp.repeat(jnp.arange(nc, dtype=jnp.int32), P)

        K = self.max_outputs
        masked = jnp.where(flat_keep, flat_scores, -1.0)
        _, order2 = topk_desc(masked, K)
        return (gather_rows(flat_boxes, order2),
                gather_1d(flat_classes, order2),
                gather_1d(flat_scores, order2),
                gather_1d(flat_keep, order2))


class FasterRCNNDetector:
    """Pipeline-facing wrapper with the uniform detector contract
    (registry.py docstring): width/height, params, detect(params, resized,
    orig_w, orig_h) -> fixed-capacity (xyxy px, classes, scores, valid)."""

    def __init__(self, params=None, seed: int = 0, max_outputs: int = 32,
                 score_threshold: float = 0.5,
                 config: FasterRCNNConfig = None,
                 compute_dtype=jnp.bfloat16):
        cfg = config or FasterRCNNConfig()
        self.cfg = cfg
        self.width = self.height = cfg.input_size
        self.net = FasterRCNNNet(cfg=cfg, max_outputs=max_outputs,
                                 score_threshold=score_threshold,
                                 compute_dtype=compute_dtype)
        if params is None:
            params = self.net.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((cfg.input_size, cfg.input_size, 3), jnp.float32))
        self.params = params
        self.max_outputs = max_outputs
        self.score_threshold = score_threshold

    def detect(self, params, image_resized, orig_w, orig_h):
        boxes_n, classes, scores, valid = self.net.apply(params,
                                                         image_resized)
        scale = jnp.stack([orig_w, orig_h, orig_w, orig_h]) \
            .astype(jnp.float32)
        xyxy = boxes_n[:, np.array([1, 0, 3, 2])] * scale
        return xyxy, classes, scores, valid

    @functools.partial(jax.jit, static_argnums=0)
    def detect_jit(self, image_resized, orig_w, orig_h):
        return self.detect(self.params, image_resized, orig_w, orig_h)
