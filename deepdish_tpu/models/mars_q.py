"""Post-training int8 (w8a8) MARS encoder for the MXU's 2x-rate int8 path.

The reference serves its appearance encoder as a *quantized* TFLite
artifact (tools/generate_detections.py:151-177 wraps `mars-little*.tflite`
through the TFLite interpreter). This module is the TPU-native analog: the
same MARS network (models/mars.py, from tools/freeze_model.py:88-157) with
every hot matmul — all 3x3/1x1 convolutions after the 3-channel stem and
the 16384x128 dense — executed as an int8 x int8 -> int32 MXU contraction.

Scheme (post-training, no fine-tuning):
  * weights: symmetric per-output-channel int8, s_w[c] = absmax(W[..,c])/127;
  * activations: symmetric per-tensor int8 from a calibration pass that
    records the absmax input of every quantized layer (zero point 0, so
    SAME zero padding stays exact in the quantized domain);
  * everything else (stem conv on 3 channels, BN, ELU, max-pool, residual
    adds, final L2 norm) stays in the float compute dtype — the dequant
    multiply is a per-channel scalar that XLA fuses into the following BN.

Fidelity is quantified, not assumed: tests/test_mars_int8.py measures the
cosine drift of int8 features against the float net and runs the
crossing-count parity video with the int8 encoder (docs/BENCH_NOTES.md
records the TPU wall-clock A/B).

Two exact int8 contraction implementations (same accumulator):
  * "conv": `lax.conv_general_dilated` with int8 operands and an int32
    accumulator — XLA's own int8 convolution lowering. MEASURED FASTEST
    on the v5e: batch-1024 MARS forward 8.26 ms int8/conv vs 14.42 ms
    bf16 vs 27.74 ms int8/dot (docs/BENCH_NOTES.md round 4) — the 2x MXU
    int8 rate is real through XLA's conv path;
  * "dot": zero-pad + im2col + `lax.dot_general` int8 — kept as the
    cross-check oracle (identical accumulators, tested); materializing
    the 9x im2col patches costs more than the MXU rate win buys.
`impl="auto"` resolves to "conv" everywhere.
"""
from __future__ import annotations

import copy
from typing import Any, Dict, Optional

import flax.linen as nn
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .mars import FEATURE_DIM, INPUT_SHAPE

_EPS = 1e-3  # slim batch_norm epsilon (freeze_model.py via models/mars.py)

# (name, increase_dim, is_first) for the six residual blocks, in order.
_BLOCKS = (("conv2_1", False, True), ("conv2_3", False, False),
           ("conv3_1", True, False), ("conv3_3", False, False),
           ("conv4_1", True, False), ("conv4_3", False, False))

#: layers whose matmul runs int8 (path -> kernel tree path); the stem
#: conv1_1 stays float (3 input channels — negligible FLOPs, and pixel
#: inputs need no calibration pass of their own).
QUANTIZED_LAYERS = ("conv1_2",) + tuple(
    f"{n}/inner/conv{i}" for n, _, _ in _BLOCKS for i in (1, 2)) + tuple(
    f"{n}/projection" for n, inc, _ in _BLOCKS if inc) + ("fc1",)


def _get(tree, path: str):
    for part in path.split("/"):
        tree = tree[part]
    return tree


def _bn_ab(params, path: str):
    """Inference BN as y = x*a + b (use_scale=False, so a is rsqrt only)."""
    bias = _get(params["params"], path)["BatchNorm_0"]["bias"]
    stats = _get(params["batch_stats"], path)["BatchNorm_0"]
    a = lax.rsqrt(stats["var"].astype(jnp.float32) + _EPS)
    b = bias.astype(jnp.float32) - stats["mean"].astype(jnp.float32) * a
    return a, b


def _same_pads(size, k, stride):
    """XLA/TF SAME padding (low = total//2, extra after)."""
    out = -(-size // stride)
    total = max(0, (out - 1) * stride + k - size)
    lo = total // 2
    return out, lo, total - lo


def _conv_i8_dot(x8, k8, stride):
    """Batched zero-pad + im2col + int8 dot_general -> int32 accumulator."""
    n, h, w, ci = x8.shape
    kh, kw, _, co = k8.shape
    ho, pt, pb = _same_pads(h, kh, stride)
    wo, pl, pr = _same_pads(w, kw, stride)
    xp = jnp.pad(x8, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    taps = []
    for dy in range(kh):
        for dx in range(kw):
            taps.append(xp[:, dy: dy + (ho - 1) * stride + 1: stride,
                           dx: dx + (wo - 1) * stride + 1: stride, :])
    p = jnp.concatenate(taps, axis=-1).reshape(n * ho * wo, kh * kw * ci)
    acc = lax.dot_general(p, k8.reshape(kh * kw * ci, co),
                          (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    return acc.reshape(n, ho, wo, co)


def _conv_i8_xla(x8, k8, stride):
    """Direct int8 convolution; XLA chooses the lowering."""
    dn = lax.conv_dimension_numbers(x8.shape, k8.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(x8, k8, (stride, stride), "SAME",
                                    dimension_numbers=dn,
                                    preferred_element_type=jnp.int32)


def _quantize_act(x, s_in):
    q = jnp.round(x.astype(jnp.float32) * (1.0 / s_in))
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def mars_forward(params, images, *, compute_dtype=jnp.bfloat16,
                 qparams: Optional[Dict[str, Any]] = None,
                 impl: str = "auto", sink: Optional[dict] = None):
    """One forward shared by three modes.

    * float mirror (qparams=None, sink=None): same math as
      models.mars.MarsNet.apply (tested equal in tests/test_mars_int8.py);
    * calibration (sink={}): float forward that also records the absmax
      input of every QUANTIZED_LAYERS entry into `sink`;
    * quantized (qparams from quantize_mars): int8 matmuls, float glue.
    """
    dt = compute_dtype
    if impl == "auto":
        impl = "conv"
    conv_i8 = _conv_i8_dot if impl == "dot" else _conv_i8_xla
    P = params["params"]

    def bn(path, v):
        a, b = _bn_ab(params, path)
        return v * a.astype(dt) + b.astype(dt)

    def matmul(path, v, stride=1):
        """Conv (4-D v) or dense (2-D v) for the current mode."""
        if sink is not None and path in QUANTIZED_LAYERS:
            sink[path] = jnp.max(jnp.abs(v.astype(jnp.float32)))
        kern = _get(P, path)["kernel"]
        if qparams is not None and path in QUANTIZED_LAYERS:
            s_in = qparams["ascale"][path]
            k8 = qparams["wq"][path]
            s_w = qparams["wscale"][path]
            v8 = _quantize_act(v, s_in)
            if v.ndim == 4:
                acc = conv_i8(v8, k8, stride)
            else:
                acc = lax.dot_general(v8, k8, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * (s_in * s_w)).astype(dt)
        if v.ndim == 4:
            dn = lax.conv_dimension_numbers(v.shape, kern.shape,
                                            ("NHWC", "HWIO", "NHWC"))
            return lax.conv_general_dilated(v, kern.astype(dt),
                                            (stride, stride), "SAME",
                                            dimension_numbers=dn)
        return v @ kern.astype(dt)

    def residual(name, v, increase, is_first):
        pre = v if is_first else jax.nn.elu(bn(f"{name}/pre_bn", v))
        stride = 2 if increase else 1
        y = matmul(f"{name}/inner/conv1", pre, stride)
        y = jax.nn.elu(bn(f"{name}/inner/bn1", y))
        y = matmul(f"{name}/inner/conv2", y)
        y = y + _get(P, f"{name}/inner/conv2")["bias"].astype(dt)
        if increase:
            return matmul(f"{name}/projection", v, 2) + y
        return v + y

    x = images.astype(dt)
    x = jax.nn.elu(bn("conv1_1_bn", matmul("conv1_1", x)))
    x = jax.nn.elu(bn("conv1_2_bn", matmul("conv1_2", x)))
    x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
    for name, inc, first in _BLOCKS:
        x = residual(name, x, inc, first)
    x = x.reshape((x.shape[0], -1))
    x = jax.nn.elu(bn("fc1_bn", matmul("fc1", x)))
    x = bn("ball", x)
    x = x.astype(jnp.float32)
    norm = jnp.sqrt(1e-8 + jnp.sum(jnp.square(x), axis=1, keepdims=True))
    return x / norm


def default_calibration_patches(n: int = 64, seed: int = 0) -> np.ndarray:
    """Deterministic synthetic calibration set: noise, flat tones and
    gradients spanning the pixel range. BN keeps MARS's activation ranges
    largely input-independent, so absmax over this set lands close to the
    real-image range; pass real crops for production calibration."""
    rng = np.random.RandomState(seed)
    h, w, c = INPUT_SHAPE
    noise = rng.randint(0, 256, size=(n // 2, h, w, c))
    ramp = np.linspace(0, 255, w)[None, None, :, None]
    grads = np.broadcast_to(ramp, (n // 4, h, w, c)).copy()
    tones = rng.randint(0, 256, size=(n - n // 2 - n // 4, 1, 1, c))
    tones = np.broadcast_to(tones, (tones.shape[0], h, w, c)).copy()
    return np.concatenate([noise, grads, tones]).astype(np.float32)


def calibrate_mars(params, patches, compute_dtype=jnp.bfloat16,
                   batch: int = 64) -> Dict[str, float]:
    """Absmax of every quantized layer's input over the calibration set."""
    @jax.jit
    def one(batch_imgs):
        sink: Dict[str, Any] = {}
        mars_forward(params, batch_imgs, compute_dtype=compute_dtype,
                     sink=sink)
        return sink

    out: Dict[str, float] = {}
    for i in range(0, len(patches), batch):
        sink = jax.device_get(one(jnp.asarray(patches[i:i + batch])))
        for k, v in sink.items():
            out[k] = max(out.get(k, 0.0), float(v))
    return out


def quantize_mars(params, calib_patches: Optional[np.ndarray] = None,
                  compute_dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Post-training quantization -> qparams pytree for mars_forward.

    qparams = {"base": float tree with quantized kernels pruned,
               "wq": int8 kernels, "wscale": per-out-channel f32,
               "ascale": per-layer input absmax/127 f32 scalars}.
    """
    if calib_patches is None:
        calib_patches = default_calibration_patches()
    absmax = calibrate_mars(params, calib_patches, compute_dtype)

    wq, wscale, ascale = {}, {}, {}
    base = copy.deepcopy(jax.device_get(params))
    for path in QUANTIZED_LAYERS:
        leaf = _get(base["params"], path)
        w = np.asarray(leaf["kernel"], np.float32)
        s = np.abs(w).reshape(-1, w.shape[-1]).max(axis=0) / 127.0
        s = np.where(s == 0.0, 1.0, s).astype(np.float32)
        wq[path] = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        wscale[path] = s
        a = absmax.get(path, 0.0)
        ascale[path] = np.float32((a if a > 0 else 1.0) / 127.0)
        # keep a placeholder so _get paths stay valid, but drop the big
        # float kernel from the device-resident tree
        leaf["kernel"] = np.zeros((0,), np.float32)
    return {"base": base, "wq": wq, "wscale": wscale, "ascale": ascale}


def mars_int8_apply(qparams, patches, compute_dtype=jnp.bfloat16,
                    impl: str = "auto"):
    return mars_forward(qparams["base"], patches,
                        compute_dtype=compute_dtype, qparams=qparams,
                        impl=impl)


def make_mars_int8_encoder(params=None, calib_patches=None, seed: int = 0,
                           compute_dtype=jnp.bfloat16, impl: str = "auto"):
    """EncoderSpec running MARS with int8 matmuls; drop-in for FrameStep."""
    from .encoders import EncoderSpec
    from .mars import MarsNet
    if params is None:
        net = MarsNet(compute_dtype=compute_dtype)
        params = net.init(jax.random.PRNGKey(seed),
                          jnp.zeros((1,) + INPUT_SHAPE, jnp.float32))
    qparams = quantize_mars(params, calib_patches, compute_dtype)

    def apply_fn(qp, patches):
        return mars_int8_apply(qp, patches, compute_dtype, impl)

    spec = EncoderSpec(INPUT_SHAPE, FEATURE_DIM, apply_fn)
    spec.params = qparams
    return spec
