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


def _yuv_kernel(y_ref, u_ref, v_ref, r_ref, g_ref, b_ref):
    from jax.experimental.pallas import tpu as pltpu

    y = y_ref[:].astype(jnp.float32)
    u = u_ref[:].astype(jnp.float32) - 128.0
    v = v_ref[:].astype(jnp.float32) - 128.0
    # chroma replication to full resolution inside VMEM
    u = pltpu.repeat(pltpu.repeat(u, 2, 0), 2, 1)
    v = pltpu.repeat(pltpu.repeat(v, 2, 0), 2, 1)
    c = _YC * (y - 16.0)
    r_ref[:] = jnp.clip(c + _VR * v, 0.0, 255.0)
    g_ref[:] = jnp.clip(c - _UG * u - _VG * v, 0.0, 255.0)
    b_ref[:] = jnp.clip(c + _UB * u, 0.0, 255.0)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def yuv420_to_rgb_pallas(yuv, h: int, w: int, tile_h: int = 8):
    """Pallas version: one fused VMEM pass per row-tile, three output
    planes stacked afterwards (cheap fusion). Requires w % 128 == 0 and
    h % (2*tile_h) == 0; falls back to the XLA path otherwise."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if w % 128 != 0 or h % (2 * tile_h) != 0:
        return yuv420_to_rgb(yuv, h, w)

    y = yuv[:h]
    u = yuv[h:h + h // 4].reshape(h // 2, w // 2)
    v = yuv[h + h // 4:].reshape(h // 2, w // 2)
    grid = (h // tile_h,)
    out_shape = [jax.ShapeDtypeStruct((h, w), jnp.float32)] * 3
    r, g, b = pl.pallas_call(
        _yuv_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_h, w), lambda i: (i, 0)),
            pl.BlockSpec((tile_h // 2, w // 2), lambda i: (i, 0)),
            pl.BlockSpec((tile_h // 2, w // 2), lambda i: (i, 0)),
        ],
        out_specs=[pl.BlockSpec((tile_h, w), lambda i: (i, 0))] * 3,
        out_shape=out_shape,
    )(y, u, v)
    return jnp.stack([r, g, b], axis=-1)
