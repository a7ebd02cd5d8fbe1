"""Quantized-graph executor: run full-integer TFLite artifacts with TFLite's
own integer arithmetic, byte-exact, as one jittable XLA program.

The reference's real detector artifacts are full-integer quantized — uint8
input, int8 activations/weights, int32 biases (tools/ssd_mobilenet.py:100-103,
tools/yolov5.py:102-118) — and run on the EdgeTPU's integer datapath. The
float converters in models/convert.py dequantize those weights and run bf16
(tolerance-tested); this module is the integer datapath itself: it replays
the flatbuffer's op stream with gemmlowp fixed-point requantization
(ops/intmath.py), so every intermediate tensor is bit-equal to the TFLite
reference kernels, and the hot matmuls run as int8 MXU contractions.

Both quantization schemes run: the modern per-channel int8 exports AND
the legacy per-tensor full-uint8 scheme of the original zoo files
(detect.tflite — per-TENSOR uint8 weights WITH weight zero points).
uint8 codes and zero points are normalized into the int8 domain at load
(a -128 shift, bijective in q - zp), so one arithmetic serves both.

Execution model: static shapes throughout (they are static in the
flatbuffer), one Python loop over ops at trace time, everything under one
jit. Convolutions have two exact implementations:

  * portable: subtract input/weight zero points (int32), zero-pad,
    im2col, int32 dot — correct on any backend, the cross-check oracle;
  * mxu: int8 activations, zero-pad, im2col, int8 x int8 -> int32
    dot_general (the TPU's 2x-rate MXU path); zero-point terms restored
    exactly as one int32 rowsum (weight zp, legacy only) plus a
    PRECOMPUTED static map (input zp x in-bounds kernel-tap sums —
    constant because padding geometry is static).

Both produce identical accumulators (tests/test_qgraph.py asserts it);
`conv_impl="auto"` picks mxu on TPU backends.

Supported ops: CONV_2D, DEPTHWISE_CONV_2D, FULLY_CONNECTED, ADD, SUB, MUL,
QUANTIZE (requantize), DEQUANTIZE, RESHAPE, CONCATENATION, LOGISTIC
(int8/uint8 LUT), MAX_POOL_2D, AVERAGE_POOL_2D, PAD, TILE, STRIDED_SLICE
(stride 1), RESIZE_NEAREST_NEIGHBOR, SOFTMAX(float), and the
TFLite_Detection_PostProcess custom op as a STOP point (its float inputs
become the executor's outputs; the native decode consumes them, matching
tools/ssd_mobilenet.py:104-127). Anything else raises with the op name;
16x8-quantized artifacts (int16 activations) are rejected at parse.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import intmath

# builtin opcodes (lite/schema/schema.fbs)
ADD, AVG_POOL, CONCAT, CONV, DW_CONV = 0, 1, 2, 3, 4
DEQUANTIZE, FC, LOGISTIC, MAX_POOL, MUL = 6, 9, 14, 17, 18
RESHAPE, SOFTMAX, CUSTOM, PAD_OP, SUB, QUANTIZE = 22, 25, 32, 34, 41, 114
STRIDED_SLICE, TILE, RESIZE_NN = 45, 69, 97
L2_NORM, ELU = 11, 111

_OP_NAMES = {0: "ADD", 1: "AVERAGE_POOL_2D", 2: "CONCATENATION",
             3: "CONV_2D", 4: "DEPTHWISE_CONV_2D", 6: "DEQUANTIZE",
             9: "FULLY_CONNECTED", 11: "L2_NORMALIZATION", 14: "LOGISTIC",
             17: "MAX_POOL_2D",
             18: "MUL", 22: "RESHAPE", 25: "SOFTMAX", 34: "PAD",
             41: "SUB", 45: "STRIDED_SLICE", 69: "TILE",
             97: "RESIZE_NEAREST_NEIGHBOR", 111: "ELU", 114: "QUANTIZE"}

_NP_DT = {0: np.float32, 2: np.int32, 3: np.uint8, 4: np.int64,
          7: np.int16, 9: np.int8}


def _round_half_away(x):
    return np.floor(np.abs(x) + 0.5) * np.sign(x)


@dataclass
class _TMeta:
    name: str
    dtype: Any
    shape: Tuple[int, ...]
    scale: Optional[np.ndarray]     # per-tensor (1,) or per-channel (C,)
    zp: Optional[np.ndarray]
    qdim: int


@dataclass
class _QOp:
    code: int
    name: str                       # output tensor name (diagnostics)
    inputs: List[int]
    outputs: List[int]
    attrs: Dict[str, Any] = field(default_factory=dict)


_JDT = {np.dtype(np.int8): jnp.int8, np.dtype(np.uint8): jnp.uint8}


def _act_range(fused: int, scale: float, zp: int, dtype) -> Tuple[int, int]:
    """CalculateActivationRangeQuantized: clamp bounds in the quantized
    domain for the fused activation (kernel_util.cc)."""
    qmin = int(np.iinfo(dtype).min)
    qmax = int(np.iinfo(dtype).max)

    def q(f):
        return int(zp + _round_half_away(np.float64(f) / scale))

    if fused == 1:                                     # RELU
        return max(qmin, q(0.0)), qmax
    if fused == 2:                                     # RELU_N1_TO_1
        return max(qmin, q(-1.0)), min(qmax, q(1.0))
    if fused == 3:                                     # RELU6
        return max(qmin, q(0.0)), min(qmax, q(6.0))
    if fused == 0:
        return qmin, qmax
    raise NotImplementedError(f"fused activation {fused}")


def _padding_amounts(in_size, k_eff, stride, padding):
    """TFLite ComputePaddingWithOffset: SAME puts the extra pixel after."""
    if padding == 1:                                   # VALID
        out = (in_size - k_eff) // stride + 1
        return out, 0, 0
    out = -(-in_size // stride)                        # SAME: ceil
    total = max(0, (out - 1) * stride + k_eff - in_size)
    before = total // 2
    return out, before, total - before


def _per_channel_requant(in_scale: float, w_scales: np.ndarray,
                         out_scale: float):
    m0, sh = [], []
    for ws in np.atleast_1d(w_scales).astype(np.float64):
        a, b = intmath.quantize_multiplier(float(in_scale) * float(ws)
                                           / float(out_scale))
        m0.append(a)
        sh.append(b)
    return np.asarray(m0, np.int32), np.asarray(sh, np.int32)


class QGraphExecutor:
    """Parse a full-integer .tflite and execute it exactly under jit.

    apply(consts, x) -> list of output arrays (graph output order, or the
    custom postprocess op's inputs when the graph ends in one). `consts`
    is `self.consts` (a dict pytree of weights/LUTs/requant tables) so the
    weights live as device arrays, not XLA literals."""

    def __init__(self, model_path: str, conv_impl: str = "auto",
                 stop_at_custom: bool = True):
        from tensorflow.lite.python import schema_py_generated as fb
        with open(model_path, "rb") as f:
            buf = bytearray(f.read())
        model = fb.Model.GetRootAsModel(buf, 0)
        sg = model.Subgraphs(0)
        self.conv_impl = conv_impl
        self.consts: Dict[str, np.ndarray] = {}
        self.meta: List[_TMeta] = []
        self._const_idx: Dict[int, np.ndarray] = {}

        for ti in range(sg.TensorsLength()):
            t = sg.Tensors(ti)
            q = t.Quantization()
            scale = zp = None
            qdim = 0
            if q is not None and q.ScaleLength():
                scale = q.ScaleAsNumpy().astype(np.float64)
                zp = (q.ZeroPointAsNumpy().astype(np.int64)
                      if q.ZeroPointLength() else np.zeros_like(scale))
                qdim = q.QuantizedDimension()
            shape = tuple(int(s) for s in (t.ShapeAsNumpy()
                                           if t.ShapeLength() else ()))
            self.meta.append(_TMeta(t.Name().decode(),
                                    _NP_DT.get(t.Type(), None), shape,
                                    scale, zp, qdim))
            b = model.Buffers(t.Buffer())
            if b.DataLength():
                dt = _NP_DT.get(t.Type())
                if dt is not None:
                    arr = np.frombuffer(b.DataAsNumpy().tobytes(), dt)
                    if shape:
                        arr = arr.reshape(shape)
                    self._const_idx[ti] = arr

        self.input_idx = int(sg.Inputs(0))
        self.output_idxs = [int(sg.Outputs(j))
                            for j in range(sg.OutputsLength())]
        self.ops: List[_QOp] = []
        self.stopped_at_custom = False
        for oi in range(sg.OperatorsLength()):
            op = sg.Operators(oi)
            oc = model.OperatorCodes(op.OpcodeIndex())
            code = int(max(oc.BuiltinCode(), oc.DeprecatedBuiltinCode()))
            ins = [int(op.Inputs(j)) for j in range(op.InputsLength())]
            outs = [int(op.Outputs(j)) for j in range(op.OutputsLength())]
            if code == CUSTOM:
                cc = oc.CustomCode()
                cname = cc.decode() if cc else "?"
                if stop_at_custom and cname == "TFLite_Detection_PostProcess":
                    # detections come from the native decode on the op's
                    # (float, already-dequantized) inputs, which the op
                    # declares in a fixed order: box encodings, class
                    # predictions, anchors (const)
                    self.output_idxs = [t for t in ins
                                        if t not in self._const_idx]
                    self.stopped_at_custom = True
                    break
                raise NotImplementedError(
                    f"custom op {cname!r}"
                    + (" — an edgetpu-compiled artifact wraps the whole "
                       "network in one opaque op; use the uncompiled "
                       "CPU .tflite export of the same model"
                       if "edgetpu" in cname.lower() else ""))
            qop = _QOp(code, self.meta[outs[0]].name, ins, outs)
            self._prepare(qop, op, fb)
            self.ops.append(qop)

    # ---- per-op host-side preparation (requant tables, layouts) ----

    def _q(self, ti):
        m = self.meta[ti]
        if m.scale is None:
            raise ValueError(f"tensor {m.name} has no quantization")
        return float(m.scale[0]), int(m.zp[0])

    def _prepare(self, qop: _QOp, op, fb):
        code = qop.code
        key = f"op{len(self.ops)}"
        meta_out = self.meta[qop.outputs[0]]
        if meta_out.dtype in (np.int8, np.uint8):
            qop.attrs["out_dtype"] = _JDT[np.dtype(meta_out.dtype)]
        elif meta_out.dtype == np.int16:
            raise NotImplementedError(
                f"16x8 quantization (int16 activations) in op "
                f"{_OP_NAMES.get(code, code)} ({meta_out.name})")

        if code in (CONV, DW_CONV, FC):
            kt = qop.inputs[1]
            kern = self._const_idx[kt]
            km = self.meta[kt]
            if kern.dtype not in (np.int8, np.uint8):
                raise NotImplementedError(
                    f"{_OP_NAMES[code]} with {kern.dtype} weights (only "
                    "int8/uint8 full-integer graphs are supported)")
            # legacy (pre-TF2) full-uint8 artifacts — the zoo
            # detect.tflite format — carry per-TENSOR uint8 weights with a
            # weight zero point; the int8 scheme is symmetric (w_zp = 0).
            # Both schemes are normalized into the int8 domain here
            # (subtract 128 from uint8 codes AND their zero points — a
            # bijection that leaves (q - zp) unchanged), so the MXU path
            # serves legacy artifacts too.
            w_zp = int(km.zp[0]) if km.zp is not None else 0
            if kern.dtype == np.uint8:
                kern = (kern.astype(np.int16) - 128).astype(np.int8)
                w_zp -= 128
            in_u8 = self.meta[qop.inputs[0]].dtype == np.uint8
            in_scale, in_zp = self._q(qop.inputs[0])
            if in_u8:
                in_zp -= 128
            out_scale, out_zp = self._q(qop.outputs[0])
            bias = None
            if len(qop.inputs) >= 3 and qop.inputs[2] >= 0:
                bias = self._const_idx[qop.inputs[2]].astype(np.int32)
            if code == CONV:
                o = fb.Conv2DOptions()
                o.Init(op.BuiltinOptions().Bytes, op.BuiltinOptions().Pos)
                stride = (o.StrideH(), o.StrideW())
                dil = (o.DilationHFactor(), o.DilationWFactor())
                fused, padding = o.FusedActivationFunction(), o.Padding()
                k = np.transpose(kern, (1, 2, 3, 0))    # OHWI -> HWIO
            elif code == DW_CONV:
                o = fb.DepthwiseConv2DOptions()
                o.Init(op.BuiltinOptions().Bytes, op.BuiltinOptions().Pos)
                if o.DepthMultiplier() != 1:
                    raise NotImplementedError("depth_multiplier != 1")
                stride = (o.StrideH(), o.StrideW())
                dil = (o.DilationHFactor(), o.DilationWFactor())
                fused, padding = o.FusedActivationFunction(), o.Padding()
                k = np.transpose(kern, (1, 2, 0, 3))    # 1HWC -> HW1C
            else:
                o = fb.FullyConnectedOptions()
                o.Init(op.BuiltinOptions().Bytes, op.BuiltinOptions().Pos)
                stride = dil = (1, 1)
                fused, padding = o.FusedActivationFunction(), 1
                k = np.transpose(kern, (1, 0))          # OI -> IO
            w_scales = np.asarray(km.scale, np.float64)
            m0, sh = _per_channel_requant(in_scale, w_scales, out_scale)
            act_min, act_max = _act_range(fused, out_scale, out_zp,
                                          meta_out.dtype)
            qop.attrs.update(stride=stride, dilation=dil, padding=padding,
                             in_zp=in_zp, out_zp=out_zp, w_zp=w_zp,
                             in_u8=in_u8, act=(act_min, act_max), kkey=key)
            self.consts[f"{key}/kernel"] = k
            self.consts[f"{key}/m0"] = m0
            self.consts[f"{key}/shift"] = sh
            if bias is not None:
                self.consts[f"{key}/bias"] = bias
            if code in (CONV, FC):
                self._prep_offset_map(qop, k)

        elif code in (ADD, SUB):
            s1, z1 = self._q(qop.inputs[0])
            s2, z2 = self._q(qop.inputs[1])
            so, zo = self._q(qop.outputs[0])
            o = fb.AddOptions() if code == ADD else fb.SubOptions()
            o.Init(op.BuiltinOptions().Bytes, op.BuiltinOptions().Pos)
            fused = o.FusedActivationFunction()
            left_shift = 20
            twice_max = 2.0 * max(s1, s2)
            m1 = intmath.quantize_multiplier(s1 / twice_max)
            m2 = intmath.quantize_multiplier(s2 / twice_max)
            mo = intmath.quantize_multiplier(
                twice_max / ((1 << left_shift) * so))
            qop.attrs.update(z1=z1, z2=z2, zo=zo, m1=m1, m2=m2, mo=mo,
                             left_shift=left_shift,
                             act=_act_range(fused, so, zo, meta_out.dtype))

        elif code == MUL:
            s1, z1 = self._q(qop.inputs[0])
            s2, z2 = self._q(qop.inputs[1])
            so, zo = self._q(qop.outputs[0])
            o = fb.MulOptions()
            o.Init(op.BuiltinOptions().Bytes, op.BuiltinOptions().Pos)
            qop.attrs.update(z1=z1, z2=z2, zo=zo,
                             mo=intmath.quantize_multiplier(s1 * s2 / so),
                             act=_act_range(o.FusedActivationFunction(),
                                            so, zo, meta_out.dtype))

        elif code == QUANTIZE:
            si, zi = self._q(qop.inputs[0]) \
                if self.meta[qop.inputs[0]].scale is not None else (None, 0)
            so, zo = self._q(qop.outputs[0])
            qop.attrs.update(zo=zo,
                             qmin=int(np.iinfo(meta_out.dtype).min),
                             qmax=int(np.iinfo(meta_out.dtype).max))
            if si is None:
                # float -> int: AffineQuantize (reference_ops):
                # TfLiteRound(v / scale) + zp, clamped. The converter emits
                # this around ops it keeps in float (e.g. ELU).
                qop.attrs.update(from_float=True, scale=so)
            else:
                qop.attrs.update(from_float=False, zi=zi,
                                 mo=intmath.quantize_multiplier(si / so))

        elif code == DEQUANTIZE:
            si, zi = self._q(qop.inputs[0])
            qop.attrs.update(scale=si, zp=zi)

        elif code == LOGISTIC:
            si, zi = self._q(qop.inputs[0])
            so, zo = self._q(qop.outputs[0])
            dt = self.meta[qop.inputs[0]].dtype
            if dt not in (np.int8, np.uint8):
                raise NotImplementedError(f"LOGISTIC on {dt}")
            # LUTPopulate: float sigmoid sampled at each of the 256 input
            # codes, rounded half-away, clamped (lite/kernels/internal/
            # common.h; also XNNPACK's table)
            qmin = int(np.iinfo(dt).min)
            q = np.arange(qmin, qmin + 256, dtype=np.float64)
            # exp(709+) overflows float64 and warned; the sigmoid saturates
            # identically with the argument clipped far inside the range
            x = np.clip(si * (q - zi), -500.0, 500.0)
            y = 1.0 / (1.0 + np.exp(-x))
            omin = int(np.iinfo(self.meta[qop.outputs[0]].dtype).min)
            lut = np.clip(_round_half_away(y / so) + zo, omin, omin + 255)
            self.consts[f"{key}/lut"] = lut.astype(
                self.meta[qop.outputs[0]].dtype)
            qop.attrs.update(kkey=key, in_min=qmin)

        elif code in (MAX_POOL, AVG_POOL):
            o = fb.Pool2DOptions()
            o.Init(op.BuiltinOptions().Bytes, op.BuiltinOptions().Pos)
            so, zo = self._q(qop.outputs[0])
            qop.attrs.update(stride=(o.StrideH(), o.StrideW()),
                             ksize=(o.FilterHeight(), o.FilterWidth()),
                             padding=o.Padding(),
                             act=_act_range(o.FusedActivationFunction(),
                                            so, zo, meta_out.dtype))

        elif code == CONCAT:
            o = fb.ConcatenationOptions()
            o.Init(op.BuiltinOptions().Bytes, op.BuiltinOptions().Pos)
            so, zo = self._q(qop.outputs[0])
            for ti in qop.inputs:
                si, zi = self._q(ti)
                if abs(si - so) > 1e-12 * so or zi != zo:
                    raise NotImplementedError(
                        "CONCATENATION with per-input requantization "
                        f"(input {self.meta[ti].name} scale {si} vs output "
                        f"{so}) — the int8 converter unifies these")
            qop.attrs.update(axis=o.Axis())

        elif code == RESHAPE:
            qop.attrs.update(shape=meta_out.shape)

        elif code == TILE:
            # pure data movement: quant params pass through unchanged
            qop.attrs.update(
                multiples=tuple(int(v) for v in
                                self._const_idx[qop.inputs[1]].ravel()))

        elif code == STRIDED_SLICE:
            o = fb.StridedSliceOptions()
            o.Init(op.BuiltinOptions().Bytes, op.BuiltinOptions().Pos)
            if o.EllipsisMask() or o.NewAxisMask() or o.ShrinkAxisMask():
                raise NotImplementedError(
                    "STRIDED_SLICE with ellipsis/new-axis/shrink masks")
            begin = self._const_idx[qop.inputs[1]].astype(int).ravel()
            end = self._const_idx[qop.inputs[2]].astype(int).ravel()
            strides = self._const_idx[qop.inputs[3]].astype(int).ravel()
            if not np.all(strides == 1):
                raise NotImplementedError("STRIDED_SLICE with stride != 1")
            in_shape = self.meta[qop.inputs[0]].shape
            slices = []
            for d in range(len(begin)):
                b = 0 if (o.BeginMask() >> d) & 1 else int(begin[d])
                e = in_shape[d] if (o.EndMask() >> d) & 1 else int(end[d])
                if b < 0:
                    b += in_shape[d]
                if e < 0:
                    e += in_shape[d]
                slices.append(slice(b, e))
            qop.attrs.update(slices=tuple(slices))

        elif code == RESIZE_NN:
            o = fb.ResizeNearestNeighborOptions()
            o.Init(op.BuiltinOptions().Bytes, op.BuiltinOptions().Pos)
            size = self._const_idx[qop.inputs[1]].astype(int).ravel()
            in_shape = self.meta[qop.inputs[0]].shape
            # TFLite reference nearest-neighbor index math
            # (reference_ops::ResizeNearestNeighbor): scale = in/out;
            # align_corners and half_pixel_centers change the offset
            def idx(n_in, n_out):
                i = np.arange(n_out, dtype=np.float64)
                if o.HalfPixelCenters():
                    src = (i + 0.5) * (n_in / n_out)
                    return np.clip(np.floor(src).astype(int), 0, n_in - 1)
                if o.AlignCorners() and n_out > 1:
                    src = np.round(i * (n_in - 1) / (n_out - 1))
                    return np.clip(src.astype(int), 0, n_in - 1)
                src = np.floor(i * (n_in / n_out))
                return np.clip(src.astype(int), 0, n_in - 1)
            qop.attrs.update(rows=idx(in_shape[1], int(size[0])),
                             cols=idx(in_shape[2], int(size[1])))

        elif code == PAD_OP:
            pads = self._const_idx[qop.inputs[1]].astype(int)
            _, zi = self._q(qop.inputs[0])
            qop.attrs.update(pads=pads, value=zi)

        elif code == SOFTMAX:
            if self.meta[qop.inputs[0]].dtype != np.float32:
                raise NotImplementedError("quantized SOFTMAX")

        elif code == ELU:
            dt = self.meta[qop.inputs[0]].dtype
            if dt == np.float32:
                # the int8 converter keeps ELU in float behind a
                # DEQUANTIZE/QUANTIZE pair; reference kernel:
                # val < 0 ? expm1(val) : val (elu.cc)
                qop.attrs.update(is_float=True)
            elif dt == np.int8:
                # LUT path (elu.cc int8: LUTPopulate over the 256 codes)
                si, zi = self._q(qop.inputs[0])
                so, zo = self._q(qop.outputs[0])
                q = np.arange(-128, 128, dtype=np.float64)
                v = si * (q - zi)
                y = np.where(v < 0.0, np.expm1(np.clip(v, -500.0, 0.0)), v)
                lut = np.clip(_round_half_away(y / so) + zo, -128, 127)
                self.consts[f"{key}/lut"] = lut.astype(np.int8)
                qop.attrs.update(is_float=False, kkey=key, in_min=-128)
            else:
                raise NotImplementedError(f"ELU on {dt}")

        elif code == L2_NORM:
            dt = self.meta[qop.inputs[0]].dtype
            if dt == np.float32:
                qop.attrs.update(is_float=True)
            elif dt == np.int8:
                # reference_integer_ops::L2Normalization: int32 sum of
                # squared zp-less codes per row, GetInvSqrtQuantized-
                # MultiplierExp, MBQM with kOutputScale=7; output is the
                # fixed 1/128 scale, zp 0 (Prepare() enforces it)
                _, zi = self._q(qop.inputs[0])
                qop.attrs.update(is_float=False, zi=zi)
            else:
                raise NotImplementedError(f"L2_NORMALIZATION on {dt}")

        else:
            raise NotImplementedError(
                f"TFLite op {code} ({_OP_NAMES.get(code, '?')}) in an "
                "integer graph")

    def _prep_offset_map(self, qop: _QOp, k_hwio: np.ndarray):
        """MXU-path static correction. With activations/weights normalized
        to the int8 domain and patches zero-padded, the exact accumulator
        decomposes as

            acc = dot(x', w') - w_zp * rowsum(x')
                  - [ in_zp * W_inb - in_zp * w_zp * CNT ]

        where W_inb[y, x, co] sums the kernel taps whose input sample is
        in-bounds and CNT[y, x] counts those taps (times C_in) — both
        constant because padding geometry is static. The bracket is
        precomputed here; the rowsum is one cheap int32 reduction at run
        time, needed only for legacy artifacts (w_zp != 0)."""
        in_zp = qop.attrs["in_zp"]
        w_zp = qop.attrs["w_zp"]
        if in_zp == 0:
            qop.attrs["offkey"] = None
            return
        key = qop.attrs["kkey"]
        in_shape = self.meta[qop.inputs[0]].shape
        if len(k_hwio.shape) == 2:                     # FC: no padding
            wsum = k_hwio.sum(axis=0, dtype=np.int64)
            cnt = k_hwio.shape[0]
            off = in_zp * wsum - in_zp * w_zp * cnt
            self.consts[f"{key}/off"] = off.astype(np.int32)
            qop.attrs["offkey"] = key
            return
        kh, kw, ci, co = k_hwio.shape
        sh, sw = qop.attrs["stride"]
        dh, dw = qop.attrs["dilation"]
        h, w = in_shape[1], in_shape[2]
        ho, pt, pb = _padding_amounts(h, (kh - 1) * dh + 1, sh,
                                      qop.attrs["padding"])
        wo, pl, pr = _padding_amounts(w, (kw - 1) * dw + 1, sw,
                                      qop.attrs["padding"])
        mask = np.zeros((h + pt + pb, w + pl + pr), np.int64)
        mask[pt:pt + h, pl:pl + w] = 1
        ksum = k_hwio.sum(axis=2, dtype=np.int64)      # (kh, kw, co)
        w_inb = np.zeros((ho, wo, co), np.int64)
        cnt = np.zeros((ho, wo, 1), np.int64)
        for dy in range(kh):
            for dx in range(kw):
                sub = mask[dy * dh: dy * dh + (ho - 1) * sh + 1: sh,
                           dx * dw: dx * dw + (wo - 1) * sw + 1: sw]
                w_inb += sub[:, :, None] * ksum[dy, dx][None, None, :]
                cnt += sub[:, :, None] * ci
        off = in_zp * w_inb - in_zp * w_zp * cnt
        self.consts[f"{key}/off"] = off.astype(np.int32)
        qop.attrs["offkey"] = key

    # ---- trace-time execution ----

    def _xs32(self, qop, x):
        """Activation codes in the int8 domain as int32 (uint8 tensors are
        shifted by -128, matching the prepare-time zp/kernel shift)."""
        v = x.astype(jnp.int32)
        return v - 128 if qop.attrs["in_u8"] else v

    def _impl(self) -> str:
        """Three exact conv implementations: "portable" (int32 im2col dot,
        any backend), "mxu" (int8 im2col dot + static offset maps), and
        "xconv" (direct lax.conv int8 -> int32 — XLA's own int8
        convolution lowering, measured 1.75x faster than bf16 for the
        MARS stack on v5e where the im2col form LOST to bf16;
        docs/BENCH_NOTES.md round 4). "auto" resolves to mxu off-CPU."""
        if self.conv_impl == "auto":
            return "mxu" if jax.default_backend() not in ("cpu",) \
                else "portable"
        return self.conv_impl

    def _patches(self, x, kh, kw, stride, dil, padding, pad_value=0):
        """im2col: x (1, H, W, C) -> (Ho, Wo, kh*kw*C), zero-padded."""
        h, w = x.shape[1], x.shape[2]
        sh, sw = stride
        dh, dw = dil
        ho, pt, pb = _padding_amounts(h, (kh - 1) * dh + 1, sh, padding)
        wo, pl, pr = _padding_amounts(w, (kw - 1) * dw + 1, sw, padding)
        xp = jnp.pad(x[0], ((pt, pb), (pl, pr), (0, 0)),
                     constant_values=pad_value)
        taps = []
        for dy in range(kh):
            for dx in range(kw):
                taps.append(xp[dy * dh: dy * dh + (ho - 1) * sh + 1: sh,
                               dx * dw: dx * dw + (wo - 1) * sw + 1: sw, :])
        return jnp.stack(taps, axis=2).reshape(ho, wo, -1), ho, wo

    def _conv(self, qop, consts, x):
        key = qop.attrs["kkey"]
        k = consts[f"{key}/kernel"]
        kh, kw, ci, co = k.shape
        impl = self._impl()
        if impl == "xconv":
            # direct int8 convolution through XLA's conv lowering; the
            # same exact decomposition as the mxu path (zero padding in
            # the int8-normalized domain + static offset map + optional
            # w_zp rowsum), with the rowsum as a ones-kernel conv
            sh, sw = qop.attrs["stride"]
            dh, dw = qop.attrs["dilation"]
            h, w = x.shape[1], x.shape[2]
            _, pt, pb = _padding_amounts(h, (kh - 1) * dh + 1, sh,
                                         qop.attrs["padding"])
            _, pl, pr = _padding_amounts(w, (kw - 1) * dw + 1, sw,
                                         qop.attrs["padding"])
            x8 = self._xs32(qop, x).astype(jnp.int8)
            dn = jax.lax.conv_dimension_numbers(
                x8.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
            acc = jax.lax.conv_general_dilated(
                x8, k, (sh, sw), [(pt, pb), (pl, pr)],
                rhs_dilation=(dh, dw), dimension_numbers=dn,
                preferred_element_type=jnp.int32)[0]
            if qop.attrs["w_zp"]:
                ones = jnp.ones((kh, kw, ci, 1), jnp.int8)
                rowsum = jax.lax.conv_general_dilated(
                    x8, ones, (sh, sw), [(pt, pb), (pl, pr)],
                    rhs_dilation=(dh, dw), dimension_numbers=dn,
                    preferred_element_type=jnp.int32)[0]
                acc = acc - qop.attrs["w_zp"] * rowsum
            if qop.attrs["offkey"] is not None:
                acc = acc - consts[f"{key}/off"]
            return self._epilogue(qop, consts, acc)[None]
        if impl == "mxu":
            x8 = self._xs32(qop, x).astype(jnp.int8)
            p, ho, wo = self._patches(x8, kh, kw, qop.attrs["stride"],
                                      qop.attrs["dilation"],
                                      qop.attrs["padding"])
            flat = p.reshape(ho * wo, kh * kw * ci)
            acc = jax.lax.dot_general(
                flat, k.reshape(kh * kw * ci, co),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).reshape(ho, wo, co)
            if qop.attrs["w_zp"]:
                rowsum = jnp.sum(flat.astype(jnp.int32), axis=1) \
                    .reshape(ho, wo, 1)
                acc = acc - qop.attrs["w_zp"] * rowsum
            if qop.attrs["offkey"] is not None:
                acc = acc - consts[f"{key}/off"]
        else:
            # portable int32 path (the cross-check oracle on any backend)
            xs = self._xs32(qop, x) - qop.attrs["in_zp"]
            p, ho, wo = self._patches(xs, kh, kw, qop.attrs["stride"],
                                      qop.attrs["dilation"],
                                      qop.attrs["padding"])
            ks = k.reshape(kh * kw * ci, co).astype(jnp.int32) \
                - qop.attrs["w_zp"]
            acc = jax.lax.dot_general(
                p.reshape(ho * wo, kh * kw * ci), ks,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).reshape(ho, wo, co)
        return self._epilogue(qop, consts, acc)[None]

    def _dw_conv(self, qop, consts, x):
        key = qop.attrs["kkey"]
        k = consts[f"{key}/kernel"]                    # (kh, kw, 1, C)
        kh, kw, _, c = k.shape
        xs = self._xs32(qop, x) - qop.attrs["in_zp"]
        p, ho, wo = self._patches(xs, kh, kw, qop.attrs["stride"],
                                  qop.attrs["dilation"],
                                  qop.attrs["padding"])
        p = p.reshape(ho, wo, kh * kw, c)
        ks = k.reshape(kh * kw, c).astype(jnp.int32) - qop.attrs["w_zp"]
        acc = (p * ks).sum(axis=2)
        return self._epilogue(qop, consts, acc)[None]

    def _fc(self, qop, consts, x):
        key = qop.attrs["kkey"]
        k = consts[f"{key}/kernel"]                    # (I, O)
        x2 = x.reshape(-1, k.shape[0])
        if self._impl() in ("mxu", "xconv"):           # int8 MXU dot
            x8 = self._xs32(qop, x2).astype(jnp.int8)
            acc = jax.lax.dot_general(x8, k, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            if qop.attrs["w_zp"]:
                acc = acc - qop.attrs["w_zp"] * jnp.sum(
                    x8.astype(jnp.int32), axis=1, keepdims=True)
            if qop.attrs["offkey"] is not None:
                acc = acc - consts[f"{key}/off"]
        else:
            xs = self._xs32(qop, x2) - qop.attrs["in_zp"]
            acc = jax.lax.dot_general(
                xs, k.astype(jnp.int32) - qop.attrs["w_zp"],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        return self._epilogue(qop, consts, acc)

    def _epilogue(self, qop, consts, acc):
        key = qop.attrs["kkey"]
        if f"{key}/bias" in consts:
            acc = acc + consts[f"{key}/bias"]
        out = intmath.multiply_by_quantized_multiplier(
            acc, consts[f"{key}/m0"], consts[f"{key}/shift"])
        out = out + qop.attrs["out_zp"]
        lo, hi = qop.attrs["act"]
        return jnp.clip(out, lo, hi).astype(qop.attrs["out_dtype"])

    def _add_sub(self, qop, a, b):
        at = qop.attrs
        sh = at["left_shift"]
        v1 = (a.astype(jnp.int32) - at["z1"]) << sh
        v2 = (b.astype(jnp.int32) - at["z2"]) << sh
        s1 = intmath.multiply_by_quantized_multiplier(v1, *at["m1"])
        s2 = intmath.multiply_by_quantized_multiplier(v2, *at["m2"])
        raw = s1 + s2 if qop.code == ADD else s1 - s2
        out = intmath.multiply_by_quantized_multiplier(raw, *at["mo"]) \
            + at["zo"]
        lo, hi = at["act"]
        return jnp.clip(out, lo, hi).astype(at["out_dtype"])

    def apply(self, consts, x, return_env: bool = False):
        env: Dict[int, Any] = {self.input_idx: x}

        def get(ti):
            if ti in env:
                return env[ti]
            return jnp.asarray(self._const_idx[ti])

        for qop in self.ops:
            env[qop.outputs[0]] = self.run_op(qop, consts, get)
        if return_env:
            return env
        return [env[t] for t in self.output_idxs]

    def run_op(self, qop, consts, get):
        """Execute one parsed op given a resolver for its input tensors
        (trace-time; also the seam the per-op exactness tests drive)."""
        i = qop.inputs
        if qop.code == CONV:
            out = self._conv(qop, consts, get(i[0]))
        elif qop.code == DW_CONV:
            out = self._dw_conv(qop, consts, get(i[0]))
        elif qop.code == FC:
            out = self._fc(qop, consts, get(i[0]))
        elif qop.code in (ADD, SUB):
            out = self._add_sub(qop, get(i[0]), get(i[1]))
        elif qop.code == MUL:
            at = qop.attrs
            prod = (get(i[0]).astype(jnp.int32) - at["z1"]) \
                * (get(i[1]).astype(jnp.int32) - at["z2"])
            out = intmath.multiply_by_quantized_multiplier(
                prod, *at["mo"]) + at["zo"]
            lo, hi = at["act"]
            out = jnp.clip(out, lo, hi).astype(at["out_dtype"])
        elif qop.code == QUANTIZE:
            at = qop.attrs
            if at["from_float"]:
                v = get(i[0]).astype(jnp.float32) / np.float32(at["scale"])
                out = jnp.sign(v) * jnp.floor(jnp.abs(v) + 0.5) + at["zo"]
            else:
                v = get(i[0]).astype(jnp.int32) - at["zi"]
                out = intmath.multiply_by_quantized_multiplier(
                    v, *at["mo"]) + at["zo"]
            out = jnp.clip(out, at["qmin"],
                           at["qmax"]).astype(at["out_dtype"])
        elif qop.code == DEQUANTIZE:
            at = qop.attrs
            out = (get(i[0]).astype(jnp.float32) - at["zp"]) \
                * np.float32(at["scale"])
        elif qop.code == LOGISTIC:
            lut = consts[f"{qop.attrs['kkey']}/lut"]
            out = jnp.take(lut, get(i[0]).astype(jnp.int32)
                           - qop.attrs["in_min"])
        elif qop.code == MAX_POOL:
            out = self._pool(qop, get(i[0]), reduce_max=True)
        elif qop.code == AVG_POOL:
            out = self._pool(qop, get(i[0]), reduce_max=False)
        elif qop.code == CONCAT:
            out = jnp.concatenate([get(t) for t in i],
                                  axis=qop.attrs["axis"])
        elif qop.code == RESHAPE:
            out = get(i[0]).reshape(qop.attrs["shape"])
        elif qop.code == TILE:
            out = jnp.tile(get(i[0]), qop.attrs["multiples"])
        elif qop.code == STRIDED_SLICE:
            out = get(i[0])[qop.attrs["slices"]]
        elif qop.code == RESIZE_NN:
            x0 = get(i[0])
            out = x0[:, qop.attrs["rows"]][:, :, qop.attrs["cols"]]
        elif qop.code == PAD_OP:
            pads = [tuple(r) for r in qop.attrs["pads"]]
            out = jnp.pad(get(i[0]), pads,
                          constant_values=qop.attrs["value"])
        elif qop.code == SOFTMAX:
            out = jax.nn.softmax(get(i[0]), axis=-1)
        elif qop.code == ELU:
            if qop.attrs["is_float"]:
                v = get(i[0])
                out = jnp.where(v < 0.0, jnp.expm1(v), v)
            else:
                lut = consts[f"{qop.attrs['kkey']}/lut"]
                out = jnp.take(lut, get(i[0]).astype(jnp.int32)
                               - qop.attrs["in_min"])
        elif qop.code == L2_NORM:
            v = get(i[0])
            if qop.attrs["is_float"]:
                norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=-1,
                                        keepdims=True))
                out = v / norm
            else:
                diff = v.astype(jnp.int32) - qop.attrs["zi"]
                acc = jnp.sum(diff * diff, axis=-1, keepdims=True)
                mult, shift = \
                    intmath.get_inv_sqrt_quantized_multiplier_exp(acc)
                out24 = intmath.multiply_by_quantized_multiplier(
                    diff, mult, shift + 7)         # kOutputScale = 7
                out = jnp.clip(out24, -128, 127).astype(jnp.int8)
        else:                                      # pragma: no cover
            raise NotImplementedError(qop.code)
        return out

    def _pool(self, qop, x, reduce_max: bool):
        kh, kw = qop.attrs["ksize"]
        sh, sw = qop.attrs["stride"]
        h, w = x.shape[1], x.shape[2]
        ho, pt, pb = _padding_amounts(h, kh, sh, qop.attrs["padding"])
        wo, pl, pr = _padding_amounts(w, kw, sw, qop.attrs["padding"])
        if reduce_max:
            qmin = int(np.iinfo(np.int8 if x.dtype == jnp.int8
                                else np.uint8).min)
            xp = jnp.pad(x[0].astype(jnp.int32), ((pt, pb), (pl, pr),
                                                  (0, 0)),
                         constant_values=qmin)
            acc = None
            for dy in range(kh):
                for dx in range(kw):
                    tap = xp[dy: dy + (ho - 1) * sh + 1: sh,
                             dx: dx + (wo - 1) * sw + 1: sw, :]
                    acc = tap if acc is None else jnp.maximum(acc, tap)
            lo, hi = qop.attrs["act"]
            return jnp.clip(acc, lo, hi).astype(
                qop.attrs["out_dtype"])[None]
        # AVERAGE_POOL int8: sum over the IN-BOUNDS window, rounded divide
        # by the in-bounds count (reference pooling.h)
        xp = jnp.pad(x[0].astype(jnp.int32), ((pt, pb), (pl, pr), (0, 0)))
        mask = jnp.pad(jnp.ones((h, w, 1), jnp.int32),
                       ((pt, pb), (pl, pr), (0, 0)))
        acc = jnp.zeros((ho, wo, x.shape[3]), jnp.int32)
        cnt = jnp.zeros((ho, wo, 1), jnp.int32)
        for dy in range(kh):
            for dx in range(kw):
                acc = acc + xp[dy: dy + (ho - 1) * sh + 1: sh,
                               dx: dx + (wo - 1) * sw + 1: sw, :]
                cnt = cnt + mask[dy: dy + (ho - 1) * sh + 1: sh,
                                 dx: dx + (wo - 1) * sw + 1: sw, :]
        # round(acc / cnt) half away from zero in integers
        out = jnp.where(acc >= 0, (acc + cnt // 2) // cnt,
                        -((-acc + cnt // 2) // cnt))
        lo, hi = qop.attrs["act"]
        return jnp.clip(out, lo, hi).astype(qop.attrs["out_dtype"])[None]

    # ---- convenience ----

    def jitted(self):
        return jax.jit(self.apply)

    def output_meta(self):
        return [self.meta[t] for t in self.output_idxs]

    def dequantize_outputs(self, outs):
        """Exact dequantization of integer outputs (float outputs pass
        through): what the interpreter's output_details scale/zp do."""
        res = []
        for arr, m in zip(outs, self.output_meta()):
            if m.scale is not None and arr.dtype != jnp.float32:
                res.append((arr.astype(jnp.float32) - float(m.zp[0]))
                           * np.float32(m.scale[0]))
            else:
                res.append(arr)
        return res


class QuantizedSSDDetector:
    """SSD detector on the INTEGER datapath — the serving mode that runs
    the reference's full-integer artifacts with the interpreter's own
    arithmetic (tools/ssd_mobilenet.py:100-127): uint8 frame in, int8 MXU
    convolutions, byte-exact head tensors, then the shared native decode +
    NMS (ssd_mobilenet.postprocess_detections). Uniform detector contract
    (registry.py): width/height, params (the executor's const pytree),
    detect(params, resized, orig_w, orig_h) -> fixed-capacity detections.

    The head tensors are bit-equal to the TFLite reference kernels'
    (tests/test_qgraph.py); detections can still differ from the reference
    app at the pipeline level exactly as the float path's do (PIL vs MXU
    resize)."""

    def __init__(self, model_path: str, max_outputs: int = 32,
                 top_k: int = 100, score_threshold: float = 0.5,
                 iou_threshold: float = 0.5, conv_impl: str = "auto",
                 anchors=None, box_scale=None, detections_cap=None,
                 family: str = "ssd", pp_num_classes=None,
                 label_allow=None, label_deny=None, max_results: int = -1):
        from .ssd_mobilenet import BOX_SCALE, generate_anchors
        from .convert import read_tflite_io_quant
        io = read_tflite_io_quant(model_path)
        in_dt = next(iter(io.values()))[0] if io else None
        if in_dt not in (np.uint8, np.int8):
            raise ValueError(
                f"{model_path} is not a full-integer artifact (input tensor "
                f"is {in_dt}); the quantized path needs a full-integer "
                "export — use the float converter otherwise")
        ex = QGraphExecutor(model_path, conv_impl=conv_impl)
        in_meta = ex.meta[ex.input_idx]
        self.executor = ex
        self.height, self.width = int(in_meta.shape[1]), int(in_meta.shape[2])
        self.params = ex.consts
        if anchors is None:
            # both families share the faster_rcnn box-coder decode; the
            # anchor grid and decode scales are family defaults (a fused
            # postprocess op's embedded table overrides both upstream)
            if family == "efficientdet":
                from .efficientdet import generate_anchors as eff_anchors
                anchors = eff_anchors(self.width) / float(self.width)
                box_scale = box_scale or (1.0, 1.0, 1.0, 1.0)
            else:
                anchors = generate_anchors()
        self.anchors = jnp.asarray(anchors)
        self.box_scale = tuple(box_scale) if box_scale else BOX_SCALE
        self.max_outputs = max_outputs
        self.top_k = top_k
        self.score_threshold = score_threshold
        self.iou_threshold = iou_threshold
        self.detections_cap = detections_cap
        # zoo-layout exports run sigmoid in-graph before the fused
        # postprocess op; raw-heads exports end at the (dequantized) logits
        self._heads_are_probs = ex.stopped_at_custom
        self._in_int8 = in_meta.dtype == np.int8
        self._in_scale = float(in_meta.scale[0]) if in_meta.scale is not None \
            else 1.0
        self._in_zp = int(in_meta.zp[0]) if in_meta.zp is not None else 0
        # Background column: the fused op's rule is authoritative when
        # present (detection_postprocess.cc treats the score tensor as
        # having a background column iff its width is num_classes + 1);
        # raw-heads artifacts fall back to the family label contract
        # (TF-OD SSD: background at column 0; EfficientDet: none)
        self._pp_num_classes = pp_num_classes
        self._strip_background = family != "efficientdet"
        # reference allow/deny/max_results options (ObjectDetectorOptions,
        # tools/tflite_object_detector.py:47-53) — same plumbing as the
        # float EfficientDet wrapper
        self.label_allow = list(label_allow) if label_allow else None
        self.label_deny = list(label_deny) if label_deny else None
        self.max_results = max_results
        self._filter_lut = None

    def finalize_label_filter(self):
        from .efficientdet import build_label_filter_lut
        self._filter_lut = build_label_filter_lut(
            getattr(self, "labels", {}), self.label_allow, self.label_deny)

    def detect(self, params, image_resized, orig_w, orig_h):
        from .ssd_mobilenet import decode_boxes, postprocess_detections
        x = image_resized
        if self._in_int8:
            # int8-input exports: AffineQuantize of the raw pixel value
            # with the artifact's input scale/zero-point — TfLiteRound
            # (half away from zero) of value/scale FIRST, zero point added
            # AFTER (the order flips tie directions). For the raw-pixel
            # lattice (scale 1, zp -128) this reduces to the x - 128 shift.
            xf = x.astype(jnp.float32) / np.float32(self._in_scale)
            q = jnp.sign(xf) * jnp.floor(jnp.abs(xf) + 0.5) + self._in_zp
            x = jnp.clip(q, -128, 127).astype(jnp.int8)
        elif x.dtype != jnp.uint8:
            # the pipeline's MXU resize produces float; uint8-input graphs
            # consume the raw pixel lattice, so nearest-uint8 (half away
            # from zero, TfLiteRound) IS the exact quantization step
            x = jnp.clip(jnp.floor(x + 0.5), 0, 255).astype(jnp.uint8)
        outs = self.executor.dequantize_outputs(
            self.executor.apply(params, x[None]))
        if self.executor.stopped_at_custom:
            # the fused op declares (box encodings, class predictions)
            # in fixed input order
            box_enc, scores = outs[0], outs[1]
            box_enc = box_enc.reshape(-1, 4)
            scores = scores.reshape(-1, scores.shape[-1])
        else:
            four = [o for o in outs if o.shape[-1] == 4]
            rest = [o for o in outs if o.shape[-1] != 4]
            if len(four) != 1 or len(rest) != 1:
                raise ValueError(
                    "could not identify box/score head tensors in "
                    f"{[tuple(o.shape) for o in outs]} — a score head with "
                    "exactly 4 class columns needs the fused postprocess "
                    "op's explicit ordering")
            box_enc = four[0].reshape(-1, 4)
            scores = rest[0].reshape(-1, rest[0].shape[-1])
        probs = scores if self._heads_are_probs else jax.nn.sigmoid(scores)
        strip = (scores.shape[-1] == self._pp_num_classes + 1
                 if self._pp_num_classes is not None
                 else self._strip_background)
        if strip:
            probs = probs[:, 1:]
        boxes = decode_boxes(box_enc.astype(jnp.float32), self.anchors,
                             self.box_scale)
        xyxy, classes, out_scores, valid = postprocess_detections(
            boxes, probs.astype(jnp.float32), orig_w, orig_h,
            top_k=self.top_k, score_threshold=self.score_threshold,
            iou_threshold=self.iou_threshold, max_outputs=self.max_outputs,
            detections_cap=self.detections_cap)
        from .efficientdet import apply_result_filter
        valid = apply_result_filter(classes, valid, self._filter_lut,
                                    self.max_results)
        return xyxy, classes, out_scores, valid

    def detect_jit(self, image_resized, orig_w, orig_h):
        if not hasattr(self, "_djit"):
            self._djit = jax.jit(self.detect)
        return self._djit(self.params, image_resized, orig_w, orig_h)


class QuantizedYOLOv5Detector:
    """YOLOv5 on the integer datapath. The reference's int8 yolov5 TFLite
    contract (tools/yolov5.py:102-118): normalize the frame to [0,1],
    quantize with the input tensor's scale/zero-point (`(img / scale +
    zero_point).astype(np.int8)` — TRUNCATING cast, mirrored here), run
    the integer graph, dequantize the outputs `(x - zp) * scale`, then
    the standard decode (yolov5.postprocess_heads)."""

    def __init__(self, model_path: str, max_outputs: int = 64,
                 score_threshold: float = 0.25, conv_impl: str = "auto"):
        from .convert import read_tflite_io_quant
        io = read_tflite_io_quant(model_path)
        in_dt = next(iter(io.values()))[0] if io else None
        if in_dt not in (np.uint8, np.int8):
            raise ValueError(
                f"{model_path} is not a full-integer artifact (input tensor "
                f"is {in_dt}); use the float converter for fp16/fp32 "
                "yolov5 exports")
        ex = QGraphExecutor(model_path, conv_impl=conv_impl)
        in_meta = ex.meta[ex.input_idx]
        self.executor = ex
        self.height, self.width = int(in_meta.shape[1]), int(in_meta.shape[2])
        self.params = ex.consts
        self.max_outputs = max_outputs
        self.score_threshold = score_threshold
        self._in_dtype = in_meta.dtype
        self._in_scale = float(in_meta.scale[0])
        self._in_zp = int(in_meta.zp[0])

    def detect(self, params, image_resized, orig_w, orig_h):
        from .yolov5 import postprocess_heads
        x01 = image_resized.astype(jnp.float32) / 255.0
        q = x01 / np.float32(self._in_scale) + self._in_zp
        lo, hi = (np.iinfo(self._in_dtype).min, np.iinfo(self._in_dtype).max)
        # truncating cast, exactly the reference's .astype(np.int8)
        q = jnp.clip(q, lo, hi).astype(jnp.int8 if self._in_dtype == np.int8
                                       else jnp.uint8)
        outs = self.executor.dequantize_outputs(
            self.executor.apply(params, q[None]))
        # per-level heads ordered largest-spatial (stride 8) first
        heads = sorted((o[0] for o in outs),
                       key=lambda h: -int(h.shape[0]))
        return postprocess_heads(heads, self.width, orig_w, orig_h,
                                 score_threshold=self.score_threshold,
                                 max_outputs=self.max_outputs)

    def detect_jit(self, image_resized, orig_w, orig_h):
        if not hasattr(self, "_djit"):
            self._djit = jax.jit(self.detect)
        return self._djit(self.params, image_resized, orig_w, orig_h)


def make_quantized_mars_encoder(model_path: str, conv_impl: str = "auto"):
    """Appearance encoder on the INTEGER datapath: runs a full-integer
    MARS TFLite artifact (the reference's actual encoder format —
    tools/generate_detections.py:151-177 wraps `mars-little*.tflite`
    through the interpreter) with the interpreter's own arithmetic as one
    jittable program, vmapped over the crop batch. Float-in/float-out
    artifacts run the converter's exact op stream (QUANTIZE from float,
    int8 convs/dense, float ELU islands, int8 L2_NORMALIZATION,
    DEQUANTIZE); integer-in artifacts get the AffineQuantize input step.

    Returns an EncoderSpec (drop-in for FrameStep). Features are the
    artifact's own outputs re-normalized in f32 (the int8 L2 norm is
    1/128-scale with +-1 LSB rounding; downstream cosine math expects
    unit vectors like the float MARS path)."""
    from .encoders import EncoderSpec
    ex = QGraphExecutor(model_path, conv_impl=conv_impl)
    in_meta = ex.meta[ex.input_idx]
    h, w = int(in_meta.shape[1]), int(in_meta.shape[2])
    out_dim = int(np.prod(ex.meta[ex.output_idxs[0]].shape[1:]))

    in_dtype = in_meta.dtype
    in_scale = float(in_meta.scale[0]) if in_meta.scale is not None else 1.0
    in_zp = int(in_meta.zp[0]) if in_meta.zp is not None else 0

    def one(consts, patch):
        x = patch
        if in_dtype == np.float32:
            x = x.astype(jnp.float32)
        else:
            # AffineQuantize of the raw pixel values with the artifact's
            # input scale/zp (TfLiteRound half away, zp added after)
            xf = x.astype(jnp.float32) / np.float32(in_scale)
            q = jnp.sign(xf) * jnp.floor(jnp.abs(xf) + 0.5) + in_zp
            lo = int(np.iinfo(in_dtype).min)
            x = jnp.clip(q, lo, lo + 255).astype(_JDT[np.dtype(in_dtype)])
        outs = ex.dequantize_outputs(ex.apply(consts, x[None]))
        return outs[0].reshape(out_dim)

    def apply_fn(consts, patches):
        feats = jax.vmap(lambda p: one(consts, p))(patches)
        feats = feats.astype(jnp.float32)
        norm = jnp.sqrt(1e-8 + jnp.sum(jnp.square(feats), axis=1,
                                       keepdims=True))
        return feats / norm

    spec = EncoderSpec((h, w, 3), out_dim, apply_fn)
    spec.params = ex.consts
    return spec
