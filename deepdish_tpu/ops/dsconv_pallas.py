"""Fused depthwise-separable conv block as one Pallas TPU kernel.

MobileNetV1's hot stages are depthwise-separable blocks
(models/ssd_mobilenet.py `_DepthwiseSeparable`, the reference's TFLite
graph equivalent): depthwise 3x3 + BN + ReLU6, then pointwise 1x1 + BN +
ReLU6. Under XLA these lower as two convolutions with the (H, W, C)
intermediate round-tripping through HBM, and the depthwise stencil runs
on the VPU — the round-3 trace and round-4 grouped-conv probe located the
detector's MFU plateau in exactly these VPU-bound stages (README
"Performance", docs/BENCH_NOTES.md).

This kernel fuses the whole block with the intermediate VMEM-resident:

  * grid over the batch; each program holds one image's full layer
    (every MobileNet ds-layer activation is <= 1.5 MB bf16, so whole
    layers fit VMEM with room for weights and the f32 accumulator)
  * depthwise 3x3 = 9 shifted multiply-adds on the VPU, channels on the
    lane axis (the stencil is elementwise over C, so lanes stay dense)
  * folded-BN scale/bias + ReLU6 applied in-register
  * pointwise 1x1 = one (H*W, Cin) @ (Cin, Cout) MXU matmul with f32
    accumulation, folded-BN + ReLU6, cast back to the compute dtype

Strides 1 and 2 with TF SAME padding semantics (the asymmetric stride-2
pad of the TFLite graphs).

STATUS: measured NEGATIVE — kept as the record that closes the MFU
question. At every MobileNet-300 stage shape the XLA 2-conv lowering
beats this kernel (x0.70-x0.90; only the lowest-intensity 32-channel
stage reaches parity at x1.07), because XLA already fuses the BN/ReLU6
epilogues into its conv pipeline while the hand kernel pays Mosaic
relayouts for the shifted stencil reads. The model therefore does NOT
use this path. A/B methodology + full table: tools/probe_dsconv.py,
docs/BENCH_NOTES.md round-5 entry.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _same_pad(size: int, stride: int, k: int = 3) -> Tuple[int, int]:
    """TF SAME padding (pad_top, pad_bottom) for kernel k."""
    out = -(-size // stride)
    total = max((out - 1) * stride + k - size, 0)
    return total // 2, total - total // 2


def _row_chunk(ho: int, wo: int, cin: int, cout: int,
               budget_bytes: int = 1 << 20) -> int:
    """Rows per fori_loop chunk. The kernel's live f32 temporaries are
    ~10x one (rh, wo, C) slab (9 stencil slabs + casts + the accumulator
    stay live inside one loop body), and the pipeline's double-buffered
    in/out blocks also come out of scoped VMEM — so the budget per slab is
    small. ho is padded to a multiple of the chunk by the caller, so any
    rh works; divisibility is not required."""
    return max(1, min(ho, budget_bytes // (wo * max(cin, cout) * 4)))


def _chunk_tail(acc, dw_s_ref, dw_b_ref, pw_k_ref, pw_s_ref, pw_b_ref,
                out_ref, r0, rh, wo, wop, cin, dtype):
    """Rows [r0, r0+rh): folded dw-BN + ReLU6, pointwise 1x1 on the MXU
    (f32 accumulation like XLA's conv), folded pw-BN + ReLU6, write.
    acc is (rh, wop, cin) with wop 8-aligned — Mosaic's (rh, w, c) ->
    (rh*w, c) vector shape cast is only legal for aligned sublane extents
    (odd widths like 75 fail to infer a layout); the wop - wo overhang
    columns are dropped at the store."""
    mid = jnp.clip(acc * dw_s_ref[0].astype(acc.dtype)
                   + dw_b_ref[0].astype(acc.dtype), 0.0, 6.0)
    mid = mid.astype(dtype).reshape(rh * wop, cin)
    y = jnp.dot(mid, pw_k_ref[:], preferred_element_type=jnp.float32)
    y = jnp.clip(y * pw_s_ref[0].astype(jnp.float32)
                 + pw_b_ref[0].astype(jnp.float32), 0.0, 6.0)
    y = y.astype(out_ref.dtype).reshape(rh, wop, -1)
    out_ref[0, pl.ds(r0, rh)] = y if wop == wo else y[:, :wo]


def _dsconv_s1_kernel(xp_ref, dw_k_ref, dw_s_ref, dw_b_ref, pw_k_ref,
                      pw_s_ref, pw_b_ref, out_ref, *, h, w, wp, cin, rh,
                      acc_dtype):
    """One image, stride 1: dw3x3+BN+ReLU6 -> pw1x1+BN+ReLU6, all VMEM.
    The input arrives SAME-padded to (H+2, W+2) (one cheap XLA pad) so
    every stencil tap is a ref slice. Row chunks of rh run under a
    fori_loop (NOT a Python unroll: Mosaic's scoped-VMEM stack allocator
    sums unrolled iterations' temporaries, which OOMs the 150^2 stages; a
    loop body is allocated once) with pl.ds dynamic ref reads (Mosaic has
    no dynamic_slice on values)."""
    def body(c, _):
        r0 = c * rh
        # depthwise 3x3 for output rows [r0, r0+rh): 9 shifted slabs of
        # xp rows [r0, r0+rh+2), each elementwise over the lane axis
        acc = jnp.zeros((rh, wp, cin), acc_dtype)
        for i in range(3):
            for j in range(3):
                slab = xp_ref[0, pl.ds(r0 + i, rh), j:j + wp]
                acc = acc + slab.astype(acc_dtype) * \
                    dw_k_ref[i, j].astype(acc_dtype)
        _chunk_tail(acc, dw_s_ref, dw_b_ref, pw_k_ref, pw_s_ref, pw_b_ref,
                    out_ref, r0, rh, w, wp, cin, out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, h // rh, body, 0)


def _dsconv_s2_kernel(x00_ref, x01_ref, x10_ref, x11_ref, dw_k_ref,
                      dw_s_ref, dw_b_ref, pw_k_ref, pw_s_ref, pw_b_ref,
                      out_ref, *, ho, wo, wop, cin, rh, acc_dtype):
    """One image, stride 2 on pre-split phase planes (Mosaic has no
    strided vector slices): x[p::2, q::2] of the SAME-padded input arrives
    as 4 planes of (ho+1, wo+1, Cin); tap (i, j) of the 3x3 stencil reads
    plane (i%2, j%2) at stride-1 offset (i//2, j//2)."""
    planes = [[x00_ref, x01_ref], [x10_ref, x11_ref]]

    def body(c, _):
        r0 = c * rh
        acc = jnp.zeros((rh, wop, cin), acc_dtype)
        for i in range(3):
            for j in range(3):
                pr = planes[i % 2][j % 2]
                slab = pr[0, pl.ds(r0 + i // 2, rh),
                          j // 2:j // 2 + wop]
                acc = acc + slab.astype(acc_dtype) * \
                    dw_k_ref[i, j].astype(acc_dtype)
        _chunk_tail(acc, dw_s_ref, dw_b_ref, pw_k_ref, pw_s_ref, pw_b_ref,
                    out_ref, r0, rh, wo, wop, cin, out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, ho // rh, body, 0)


@functools.partial(jax.jit, static_argnames=("stride", "interpret"))
def fused_dsconv(x, dw_k, dw_scale, dw_bias, pw_k, pw_scale, pw_bias,
                 stride: int = 1, interpret: bool = False):
    """Fused depthwise-separable block.

    Args:
      x: (B, H, W, Cin) activations (any float dtype; bf16 on TPU).
      dw_k: (3, 3, Cin) depthwise kernel.
      dw_scale, dw_bias: (Cin,) folded dw-BN scale/bias.
      pw_k: (Cin, Cout) pointwise kernel.
      pw_scale, pw_bias: (Cout,) folded pw-BN scale/bias.
      stride: 1 or 2 (TF SAME semantics).
      interpret: run the Pallas kernel in interpreter mode (CPU tests).

    Returns (B, ceil(H/s), ceil(W/s), Cout) in x.dtype.
    """
    b, h, w, cin = x.shape
    cout = pw_k.shape[1]
    # flax-module semantics: kernels are cast to the compute dtype (the
    # MXU dot then accumulates in f32 via preferred_element_type)
    dw_k = dw_k.astype(x.dtype)
    pw_k = pw_k.astype(x.dtype)
    ho, wo = -(-h // stride), -(-w // stride)
    rh = _row_chunk(ho, wo, cin, cout)
    trip = -(-ho // rh)
    hp = trip * rh               # output rows padded to a chunk multiple
    wop = -(-wo // 8) * 8        # 8-aligned working width (see _chunk_tail)
    vec = lambda v: v.reshape(1, -1)          # lane-aligned (1, C) rows
    wspecs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),   # dw_k (3,3,Cin)
        pl.BlockSpec(memory_space=pltpu.VMEM),   # dw_scale (1,Cin)
        pl.BlockSpec(memory_space=pltpu.VMEM),   # dw_bias (1,Cin)
        pl.BlockSpec(memory_space=pltpu.VMEM),   # pw_k (Cin,Cout)
        pl.BlockSpec(memory_space=pltpu.VMEM),   # pw_scale (1,Cout)
        pl.BlockSpec(memory_space=pltpu.VMEM),   # pw_bias (1,Cout)
    ]
    wargs = (dw_k, vec(dw_scale), vec(dw_bias), pw_k, vec(pw_scale),
             vec(pw_bias))
    out_spec = pl.BlockSpec((1, hp, wo, cout), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, hp, wo, cout), x.dtype)

    # the default 16 MB *scoped* VMEM limit undercounts what the big
    # spatial stages need (pipeline double-buffers + stencil temporaries);
    # v5e VMEM is far larger — raise the kernel's limit explicitly
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 << 20)

    if stride == 1:
        # rows padded to hp + 2 so the last (possibly overhanging) chunk's
        # stencil reads stay in bounds; cols to wop + 2 for the aligned
        # working width; overhang rows/cols are dropped at the stores
        xp = jnp.pad(x, ((0, 0), (1, hp - h + 1),
                         (1, wop - w + 1), (0, 0)))
        kern = functools.partial(_dsconv_s1_kernel, h=hp, w=w, wp=wop,
                                 cin=cin, rh=rh, acc_dtype=jnp.float32)
        out = pl.pallas_call(
            kern, grid=(b,),
            in_specs=[pl.BlockSpec((1, hp + 2, wop + 2, cin),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)] + wspecs,
            out_specs=out_spec, out_shape=out_shape, interpret=interpret,
            compiler_params=cparams,
        )(xp, *wargs)
        return out if hp == ho else out[:, :ho]

    if stride != 2:
        raise ValueError(f"stride must be 1 or 2, got {stride}")
    # stride 2: SAME-pad then split into the 4 (row, col) phase planes in
    # XLA (one strided relayout of the INPUT — the fused intermediate
    # still never leaves VMEM); each plane padded to (hp+1, wo+1) so every
    # stencil tap is a stride-1 slice in-kernel.
    pt, _ = _same_pad(h, 2)
    plft, _ = _same_pad(w, 2)
    xp = jnp.pad(x, ((0, 0), (pt, 2 * hp + 2 - h - pt),
                     (plft, 2 * wop + 2 - w - plft), (0, 0)))
    planes = [xp[:, p::2, q::2, :] for p in (0, 1) for q in (0, 1)]
    kern = functools.partial(_dsconv_s2_kernel, ho=hp, wo=wo, wop=wop,
                             cin=cin, rh=rh, acc_dtype=jnp.float32)
    pspec = pl.BlockSpec((1, hp + 1, wop + 1, cin),
                         lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern, grid=(b,),
        in_specs=[pspec] * 4 + wspecs,
        out_specs=out_spec, out_shape=out_shape, interpret=interpret,
        compiler_params=cparams,
    )(*planes, *wargs)
    return out if hp == ho else out[:, :ho]


def fold_bn(gamma, beta, mean, var, eps: float = 1e-3):
    """Inference BN -> (scale, bias): y = x*scale + bias."""
    scale = gamma / np.sqrt(np.asarray(var) + eps)
    return scale, beta - mean * scale


def dsconv_reference(x, dw_k, dw_scale, dw_bias, pw_k, pw_scale, pw_bias,
                     stride: int = 1):
    """XLA composition of the same block (the model's current lowering):
    grouped conv -> BN -> relu6 -> 1x1 conv -> BN -> relu6."""
    cin = x.shape[-1]
    # flax-module semantics: kernels are cast to the compute dtype
    dw_k = dw_k.astype(x.dtype)
    pw_k = pw_k.astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, dw_k[:, :, None, :],                 # (3,3,1,Cin) HWIO depthwise
        window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=cin)
    y = jnp.clip(y * dw_scale + dw_bias, 0.0, 6.0).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        y, pw_k[None, None], window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jnp.clip(y * pw_scale + pw_bias, 0.0, 6.0).astype(x.dtype)
    return y
