"""Appearance encoders: MARS wrapper plus dummy/constant fakes, in-jit.

The reference selects its encoder backend by filename substring
(tools/generate_detections.py:180-189): 'dummy' and 'constant' are weightless
fakes used to run the whole pipeline without model files
(generate_detections.py:86-116); they are reproduced here exactly so
pipeline-level tests and count-parity runs work without any weights.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .mars import FEATURE_DIM, INPUT_SHAPE, MarsNet
from .preprocess import crop_resize_patches_mxu


class EncoderSpec:
    """Uniform encoder interface: image_shape (H, W, C), feature_dim, and
    `apply(patches, params=None) -> (N, feature_dim)` plus a fused
    `encode_boxes(image, boxes_tlwh, valid, params=None)` that does
    crop-resize + forward in one traceable program. `params` is the weight
    pytree for learned encoders (None for the weightless fakes)."""

    def __init__(self, image_shape, feature_dim, apply_fn):
        self.image_shape = image_shape
        self.height, self.width = image_shape[0], image_shape[1]
        self.feature_dim = feature_dim
        self._apply_fn = apply_fn
        self.params = None

    def apply(self, patches, params=None):
        return self._apply_fn(params if params is not None else self.params,
                              patches)

    def encode_boxes(self, image, boxes_tlwh, valid, params=None):
        patches, ok = crop_resize_patches_mxu(
            image, boxes_tlwh, valid, self.height, self.width)
        feats = self.apply(patches, params)
        return jnp.where(ok[:, None], feats, 0.0), ok


def _dummy_apply(params, patches):
    """generate_detections.py:86-105: mean over channels, center at 128,
    L2 normalize; zero-norm rows become e0."""
    del params
    mat = jnp.mean(patches.astype(jnp.float32), axis=3)
    mat = mat.reshape((mat.shape[0], -1)) - 128.0
    norm = jnp.linalg.norm(mat, axis=1, keepdims=True)
    e0 = jnp.zeros_like(mat).at[:, 0].set(1.0)
    return jnp.where(norm == 0.0, e0, mat / jnp.where(norm == 0.0, 1.0, norm))


def _constant_apply(params, patches):
    """generate_detections.py:107-116: constant e0 feature."""
    del params
    out = jnp.zeros((patches.shape[0], FEATURE_DIM), jnp.float32)
    return out.at[:, 0].set(1.0)


def make_dummy_encoder() -> EncoderSpec:
    return EncoderSpec((16, 8, 3), FEATURE_DIM, _dummy_apply)


def make_constant_encoder() -> EncoderSpec:
    return EncoderSpec((16, 8, 3), FEATURE_DIM, _constant_apply)


def make_mars_encoder(params=None, seed: int = 0,
                      compute_dtype=jnp.bfloat16) -> EncoderSpec:
    """MARS CNN encoder. With no weights file available, params are randomly
    initialized (deterministic seed) — embeddings are still discriminative
    enough for smoke runs; real weights can be loaded via
    models.weights.load_npz."""
    net = MarsNet(compute_dtype=compute_dtype)
    if params is None:
        params = net.init(jax.random.PRNGKey(seed),
                          jnp.zeros((1,) + INPUT_SHAPE, jnp.float32))

    def apply_fn(p, patches):
        # BGR->RGB flip is identity for our RGB host pipeline; the reference
        # flips because its cv2 frames are BGR (freeze_model.py:175-177).
        return net.apply(p, patches)

    spec = EncoderSpec(INPUT_SHAPE, FEATURE_DIM, apply_fn)
    spec.params = params
    return spec


def create_box_encoder(model_name: str, params=None) -> EncoderSpec:
    """Filename-substring dispatch, mirroring generate_detections.py:180-189.
    Real MARS weights load from a frozen .pb (name-map), a .tflite
    (structural, models/convert.py) or a native .npz."""
    name = model_name or ""
    if "dummy" in name:
        return make_dummy_encoder()
    if "constant" in name:
        return make_constant_encoder()
    if params is None and name:
        import os
        if os.path.exists(name):
            if name.endswith(".npz"):
                from .weights import load_npz
                params = load_npz(name)
            elif name.endswith(".tflite"):
                # full-integer encoder artifacts (the reference's actual
                # quantized mars-little*.tflite format,
                # generate_detections.py:151-177) run on the integer
                # datapath — the interpreter's own arithmetic
                # (models/qgraph.py) — rather than a dequantized float
                # approximation; float artifacts convert structurally.
                from .qgraph import make_quantized_mars_encoder
                try:
                    return make_quantized_mars_encoder(name)
                except (NotImplementedError, ValueError):
                    from .convert import load_mars
                    params = load_mars(name)[0]
            elif name.endswith(".pb"):
                from .convert import load_mars
                params = load_mars(name)[0]
    if "int8" in name or "quant" in name:
        # int8 MXU serving mode (models/mars_q.py) — the analog of the
        # reference's quantized TFLite encoder artifacts
        # (tools/generate_detections.py:151-177).
        from .mars_q import make_mars_int8_encoder
        return make_mars_int8_encoder(params=params)
    return make_mars_encoder(params=params)
