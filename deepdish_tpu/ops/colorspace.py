"""On-device YUV420 (I420) -> RGB conversion, including a Pallas kernel.

Sending planar YUV420 instead of RGB halves the host->device transfer
(1.5 vs 3 bytes/pixel) — the dominant cost of offline 720p throughput over
a bandwidth-limited link — and the colorspace conversion moves onto the
TPU. The native loader emits I420 (fl_open_yuv); these ops convert on
device with ITU-R BT.601 video-range coefficients (matching
cv2.COLOR_YUV2RGB_I420 up to its fixed-point rounding and chroma
replication).

Layout (OpenCV I420): buffer (H*3/2, W) uint8 = Y plane (H, W), then the
U plane packed into H/4 rows, then V likewise; chroma is (H/2, W/2).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# BT.601 video-range (cv2 YUV2RGB_I420)
_YC, _VR, _UG, _VG, _UB = 1.1644, 1.5960, 0.3918, 0.8130, 2.0172


def _planes(yuv, h: int, w: int):
    y = yuv[:h].astype(jnp.float32)
    u = yuv[h:h + h // 4].reshape(h // 2, w // 2).astype(jnp.float32)
    v = yuv[h + h // 4:].reshape(h // 2, w // 2).astype(jnp.float32)
    return y, u, v


@functools.partial(jax.jit, static_argnums=(1, 2))
def yuv420_to_rgb(yuv, h: int, w: int):
    """(H*3/2, W) uint8 I420 -> (H, W, 3) float32 RGB in [0, 255]."""
    y, u, v = _planes(yuv, h, w)
    u = jnp.repeat(jnp.repeat(u, 2, axis=0), 2, axis=1) - 128.0
    v = jnp.repeat(jnp.repeat(v, 2, axis=0), 2, axis=1) - 128.0
    c = _YC * (y - 16.0)
    r = c + _VR * v
    g = c - _UG * u - _VG * v
    b = c + _UB * u
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)


@functools.partial(jax.jit, static_argnums=(1, 2))
def yuv420_to_rgb_u8(yuv, h: int, w: int):
    """(H*3/2, W) uint8 I420 -> (H, W, 3) uint8 RGB, rounded to nearest.

    This is what the HOST RGB transport delivers (cv2's converters emit
    uint8 frames), so feeding the fused programs uint8 makes the YUV and
    RGB transports processing-identical downstream. It also quarters the
    converted-frames intermediate inside big fused chunk programs
    (float32 RGB at chunk=32/720p is ~440 MB) — composing the float
    conversion with the integer-datapath detector at chunk 32 crashed the
    TPU worker (round-4 bisect, docs/BENCH_NOTES.md); the uint8 form is
    both the fix and the more faithful transport."""
    rgb = yuv420_to_rgb(yuv, h, w)
    return jnp.floor(rgb + 0.5).astype(jnp.uint8)


def yuv420_to_rgb_pallas(yuv, h: int, w: int, tile_h: int = 16):
    """Alias of the XLA path.

    A hand-written Pallas row-tile kernel was prototyped and benchmarked on
    v5e: XLA's fusion of this elementwise conversion is already
    HBM-bandwidth-bound (~1.5 ms for 720p, identical to the kernel), and
    Mosaic lacks an in-VMEM element-repetition primitive for the chroma
    upsample (pltpu.repeat tiles rather than repeats). Kept as an alias so
    call sites express intent; Pallas effort is better spent on the
    assignment solver (see ops/assignment.py).
    """
    del tile_h
    return yuv420_to_rgb(yuv, h, w)
