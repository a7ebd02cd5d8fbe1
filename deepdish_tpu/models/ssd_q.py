"""Fast w8a8 int8 SSD-MobileNetV1 — a THROUGHPUT mode for the MXU int8 path.

Two integer stories coexist in this repo, matching the reference's two uses
of quantized artifacts:

  * models/qgraph.py — byte-exact replication of the TFLite interpreter's
    integer arithmetic (the *fidelity* mode; measured ~4.4x slower than
    bf16 on the v5e because exact gemmlowp requantization is VPU work);
  * this module — the *fast* mode: the same post-training w8a8 recipe as
    the int8 MARS encoder (models/mars_q.py, a measured 15% fused-step win
    at enc_cap 32): weights symmetric per-output-channel int8, activations
    int8, contractions on the MXU's 2x-rate int8 path via XLA's direct
    int8 conv lowering, all glue (BN, relu6, decode) in float.

Every quantized layer's input is a relu6 output — non-negative and hard-
bounded to [0, 6] — which shapes the activation quantization twice over:
the per-layer scale comes from a cheap calibration pass (absmax of the
layer's real input range, capped by the relu6 bound; trained MobileNets
saturate relu6 so this lands at the TFLite-standard [0, 6] grid, while
random-init or unusual trees keep full resolution), and the non-negativity
enables two schemes:

  * 1x1 layers (the pointwise convs, the extras' 1x1s, the box/class
    heads — the bulk of the detector's MXU FLOPs) have no spatial padding,
    so the affine trick recovers full 8-bit resolution inside int8:
    q = round(x * 254/a) - 127 in [-127, 127], x_hat = (q + 127) * a/254,
    and conv(x_hat) = s_a * (conv_i8(q, w8) + 127 * sum(w8)) where the
    per-output-channel correction sum(w8) is precomputed at quantize time.
    Zero padding would break the shift (a padded 0 must mean x=0, not
    x=a/2), which is why this scheme is only used where there is none.
  * 3x3 layers (the extras' 3x3s, and the depthwise convs when
    quantize_dw=True) use plain symmetric q = round(x * 127/a): zero
    padding then maps to q=0 = x=0 exactly, at the cost of one activation
    bit (values land in [0, 127]).

The stem conv (3 input channels, input in [-1, 1]) stays float: negligible
FLOPs and a different input range. Depthwise convs default to float/bf16 —
they are VPU-bound, and tools/probe_int8.py measured small-channel int8
convs at x0.85 of bf16; `quantize_dw=True` exists for the hardware A/B.

This mode is selectable with `--detector-int8` (or a non-file model name
containing "int8", e.g. `--model ssd_mobilenet_int8`), mirroring the
`--encoder-model mars_int8` convention. It quantizes whatever float tree
the registry produced — including trees converted from the reference's
real `detect.tflite` artifacts (tools/ssd_mobilenet.py:100-127).

Fidelity is quantified, not assumed: tests/test_ssd_int8.py bounds the
head-output drift vs the float net and checks postprocessed-detection
agreement; docs/BENCH_NOTES.md records the TPU wall-clock A/B.
"""
from __future__ import annotations

import copy
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .ssd_mobilenet import INPUT_SIZE, NUM_CLASSES, SSDMobileNetDetector

_EPS = 1e-3          # flax BatchNorm epsilon used by models/ssd_mobilenet.py
_RELU6_MAX = 6.0

# backbone (features, stride) per depthwise-separable block — mirrors
# SSDMobileNetV1.__call__ (models/ssd_mobilenet.py).
_CFG = ((64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
        (512, 1), (512, 1), (512, 1), (512, 1), (512, 1), (1024, 2),
        (1024, 1))
_EXTRAS = ((256, 512), (128, 256), (128, 256), (64, 128))
_BOXES_PER_LOC = (3, 6, 6, 6, 6, 6)

#: path -> (kernel size, stride). 1x1 entries run the shifted 8-bit
#: scheme; 3x3 entries the symmetric one. Depthwise paths are added
#: dynamically when quantize_dw is set.
def _quantized_layers(quantize_dw: bool = False) -> Dict[str, Any]:
    layers: Dict[str, Any] = {}
    for i in range(len(_CFG)):
        layers[f"ds{i + 1}/pw"] = (1, 1, False)
        if quantize_dw:
            layers[f"ds{i + 1}/dw"] = (3, _CFG[i][1], True)
    for i in range(len(_EXTRAS)):
        layers[f"extra{i}_1x1/Conv_0"] = (1, 1, False)
        layers[f"extra{i}_3x3/Conv_0"] = (3, 2, False)
    for i in range(len(_BOXES_PER_LOC)):
        layers[f"box_head{i}"] = (1, 1, False)
        layers[f"cls_head{i}"] = (1, 1, False)
    return layers


def _get(tree, path: str):
    for part in path.split("/"):
        tree = tree[part]
    return tree


def _bn_ab(params, path: str):
    """Inference BatchNorm folded to y = x*a + b (f32 a, b)."""
    p = _get(params["params"], path)
    s = _get(params["batch_stats"], path)
    a = p["scale"].astype(jnp.float32) * lax.rsqrt(
        s["var"].astype(jnp.float32) + _EPS)
    b = p["bias"].astype(jnp.float32) - s["mean"].astype(jnp.float32) * a
    return a, b


def _conv(x, kern, stride, groups=1):
    dn = lax.conv_dimension_numbers(x.shape, kern.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(x, kern, (stride, stride), "SAME",
                                    dimension_numbers=dn,
                                    feature_group_count=groups)


def _conv_i8(x8, k8, stride, groups=1):
    """XLA's direct int8 convolution lowering -> int32 accumulator
    (the measured-fastest int8 contraction, models/mars_q.py)."""
    dn = lax.conv_dimension_numbers(x8.shape, k8.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(x8, k8, (stride, stride), "SAME",
                                    dimension_numbers=dn,
                                    feature_group_count=groups,
                                    preferred_element_type=jnp.int32)


def _q_shift(x, a):
    """8-bit shifted quantization of a [0, a] activation (1x1 layers)."""
    q = jnp.round(x.astype(jnp.float32) * (254.0 / a)) - 127.0
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def _q_sym(x, a):
    """Symmetric quantization of a [0, a] activation (padded 3x3/dw)."""
    q = jnp.round(x.astype(jnp.float32) * (127.0 / a))
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def ssd_forward(params, image, *, compute_dtype=jnp.bfloat16,
                qparams: Optional[Dict[str, Any]] = None,
                num_classes: int = NUM_CLASSES,
                sink: Optional[dict] = None):
    """SSDMobileNetV1 forward shared by three modes.

    * float mirror (qparams=None, sink=None): same math as
      SSDMobileNetV1.apply — tested equal in tests/test_ssd_int8.py;
    * calibration (sink={}): float forward recording the absmax input of
      every quantizable conv into `sink`;
    * quantized (qparams from quantize_ssd): int8 MXU convs, float glue.

    image: (300, 300, 3) or (N, 300, 300, 3), raw 0..255.
    Returns (box_encodings (..., A, 4), class_logits (..., A, C+1)) in f32,
    matching SSDMobileNetV1.__call__'s output contract.
    """
    dt = compute_dtype
    P = params["params"]
    squeeze = image.ndim == 3
    if squeeze:
        image = image[None]

    qlayers = qparams["layers"] if qparams is not None else {}

    def conv_layer(path, v, k, stride, groups=1, shifted=False):
        """One convolution in the current mode. Returns f32-ish pre-BN."""
        if sink is not None:
            sink[path] = jnp.max(jnp.abs(v.astype(jnp.float32)))
        if qparams is not None and path in qlayers:
            k8 = qparams["wq"][path]
            s_w = qparams["wscale"][path]
            a = qparams["ascale"][path]
            if shifted:
                v8 = _q_shift(v, a)
                acc = _conv_i8(v8, k8, stride, groups)
                acc = acc + qparams["corr"][path].astype(jnp.int32)
                s_a = a / 254.0
            else:
                v8 = _q_sym(v, a)
                acc = _conv_i8(v8, k8, stride, groups)
                s_a = a / 127.0
            return (acc.astype(jnp.float32) * (s_a * s_w)).astype(dt)
        kern = _get(P, path)["kernel"].astype(dt)
        return _conv(v, kern, stride, groups)

    def bn_relu6(path, v):
        a, b = _bn_ab(params, path)
        return jnp.clip(v * a.astype(dt) + b.astype(dt), 0.0, 6.0)

    x = (image.astype(dt) * (2.0 / 255.0)) - 1.0
    # stem: always float (3 input channels, [-1, 1] range)
    x = bn_relu6("conv0/BatchNorm_0",
                 _conv(x, _get(P, "conv0/Conv_0")["kernel"].astype(dt), 2))

    feats = []
    for i, (c, s) in enumerate(_CFG):
        name = f"ds{i + 1}"
        cin = x.shape[-1]
        x = conv_layer(f"{name}/dw", x, 3, s, groups=cin)
        x = bn_relu6(f"{name}/dw_bn", x)
        x = conv_layer(f"{name}/pw", x, 1, 1, shifted=True)
        x = bn_relu6(f"{name}/pw_bn", x)
        if i == 10:                  # conv11 output, 19x19x512
            feats.append(x)
    feats.append(x)                  # conv13 output, 10x10x1024

    for i in range(len(_EXTRAS)):
        x = conv_layer(f"extra{i}_1x1/Conv_0", x, 1, 1, shifted=True)
        x = bn_relu6(f"extra{i}_1x1/BatchNorm_0", x)
        x = conv_layer(f"extra{i}_3x3/Conv_0", x, 3, 2)
        x = bn_relu6(f"extra{i}_3x3/BatchNorm_0", x)
        feats.append(x)

    n = image.shape[0]
    box_out, cls_out = [], []
    for i, (f, a) in enumerate(zip(feats, _BOXES_PER_LOC)):
        b = conv_layer(f"box_head{i}", f, 1, 1, shifted=True)
        b = b + _get(P, f"box_head{i}")["bias"].astype(dt)
        c = conv_layer(f"cls_head{i}", f, 1, 1, shifted=True)
        c = c + _get(P, f"cls_head{i}")["bias"].astype(dt)
        box_out.append(b.reshape(n, -1, 4))
        cls_out.append(c.reshape(n, -1, num_classes + 1))
    boxes = jnp.concatenate(box_out, 1).astype(jnp.float32)
    logits = jnp.concatenate(cls_out, 1).astype(jnp.float32)
    if squeeze:
        boxes, logits = boxes[0], logits[0]
    return boxes, logits


def default_calibration_images(n: int = 8, seed: int = 0) -> np.ndarray:
    """Deterministic synthetic calibration set spanning the pixel range
    (noise / gradients / flat tones), like mars_q's. Pass real frames for
    production calibration; on trained MobileNets the recorded absmax hits
    the relu6 saturation bound either way."""
    rng = np.random.RandomState(seed)
    s = INPUT_SIZE
    noise = rng.randint(0, 256, size=(n // 2, s, s, 3))
    ramp = np.linspace(0, 255, s)[None, None, :, None]
    grads = np.broadcast_to(ramp, (n // 4, s, s, 3)).copy()
    tones = rng.randint(0, 256, size=(n - n // 2 - n // 4, 1, 1, 3))
    tones = np.broadcast_to(tones, (tones.shape[0], s, s, 3)).copy()
    return np.concatenate([noise, grads, tones]).astype(np.float32)


def calibrate_ssd(params, images=None,
                  compute_dtype=jnp.float32) -> Dict[str, float]:
    """Absmax input of every quantizable conv over the calibration set,
    capped by the relu6 bound (the hard upper limit of every such input)."""
    if images is None:
        images = default_calibration_images()

    @jax.jit
    def one(batch):
        s: Dict[str, Any] = {}
        ssd_forward(params, batch, compute_dtype=compute_dtype, sink=s)
        return s

    sink = jax.device_get(one(jnp.asarray(images)))
    return {k: min(float(v), _RELU6_MAX) for k, v in sink.items()}


def quantize_ssd(params, quantize_dw: bool = False,
                 calib_images=None) -> Dict[str, Any]:
    """Post-training w8a8 quantization -> qparams pytree for ssd_forward.

    qparams = {"base": float tree with quantized kernels pruned,
               "layers": {path: (k, stride, is_dw)},
               "wq": int8 kernels, "wscale": per-out-channel f32,
               "ascale": per-layer activation absmax f32 (relu6-capped),
               "corr": 127*sum(w8) int32 per-channel (shifted 1x1s only)}.
    """
    absmax = calibrate_ssd(params, calib_images)
    layers = _quantized_layers(quantize_dw)
    base = copy.deepcopy(jax.device_get(params))
    wq, wscale, corr, ascale = {}, {}, {}, {}
    for path, (k, _stride, _is_dw) in layers.items():
        leaf = _get(base["params"], path)
        w = np.asarray(leaf["kernel"], np.float32)
        s = np.abs(w).reshape(-1, w.shape[-1]).max(axis=0) / 127.0
        s = np.where(s == 0.0, 1.0, s).astype(np.float32)
        w8 = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        wq[path] = w8
        wscale[path] = s
        if k == 1:                   # shifted scheme: per-channel shift sum
            corr[path] = (127 * w8.astype(np.int64).sum(axis=(0, 1, 2))
                          ).astype(np.int32)
        a = absmax.get(path, 0.0)
        ascale[path] = np.float32(a if a > 0 else _RELU6_MAX)
        # keep the leaf so _get paths stay valid, drop the float kernel
        leaf["kernel"] = np.zeros((0,), np.float32)
    return {"base": base, "layers": layers, "wq": wq, "wscale": wscale,
            "ascale": ascale, "corr": corr}


class SSDMobileNetInt8Detector(SSDMobileNetDetector):
    """SSDMobileNetDetector with the backbone/head convs on the int8 MXU
    path; decode + per-class NMS (models/ssd_mobilenet.py) unchanged.
    `params` may be a float tree (quantized here) or a ready qparams dict
    from quantize_ssd."""

    def __init__(self, params=None, quantize_dw: bool = False,
                 calib_images=None, **kw):
        super().__init__(params=params, **kw)
        self.quantize_dw = quantize_dw
        if not (isinstance(self.params, dict) and "wq" in self.params):
            self.params = quantize_ssd(self.params, quantize_dw,
                                       calib_images)
        self._compute_dtype = getattr(self.net, "compute_dtype",
                                      jnp.bfloat16)

    def _apply_net(self, qparams, image_resized):
        return ssd_forward(qparams["base"], image_resized,
                           compute_dtype=self._compute_dtype,
                           qparams=qparams,
                           num_classes=self.net.num_classes)
