#!/usr/bin/env python3
"""Probe: does native int8 execution beat bf16 on this TPU through XLA?

The reference's EdgeTPU artifacts are full-integer quantized
(tools/ssd_mobilenet.py:100-103, tools/yolov5.py:102-118); our converter
currently dequantizes them to float and runs bf16. v5e's MXU advertises
2x int8 throughput over bf16 — this probe measures whether XLA actually
reaches it on the shapes this framework runs (big square matmul for the
ceiling; MARS-like small-channel convs; SSD-like depthwise/pointwise),
deciding whether a quantized serving path is worth building.

Timing follows docs/BENCH_NOTES.md "relay timing pitfall": >=32 chained
dispatches per round ended by a forced host fetch.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, x, reps=32, rounds=3):
    y = fn(x)
    jax.block_until_ready(y)
    np.asarray(jax.tree.leaves(y)[0]).ravel()[:1]
    best = float("inf")
    for _ in range(rounds):
        t0 = time.time()
        z = x
        for _ in range(reps):
            z = fn(z)
        np.asarray(jax.tree.leaves(z)[0]).ravel()[:1]  # forced fetch
        best = min(best, (time.time() - t0) / reps)
    return best


def probe_matmul(n=4096):
    print(f"-- square matmul {n}x{n} --")
    kb = jax.random.normal(jax.random.PRNGKey(0), (n, n)).astype(jnp.bfloat16)
    ki = (np.random.RandomState(0).randint(-127, 127, (n, n))
          .astype(np.int8))
    ki = jnp.asarray(ki)

    @jax.jit
    def f_bf16(x):
        return (x @ kb).astype(jnp.bfloat16)

    @jax.jit
    def f_int8(x):
        y = lax.dot_general(x, ki, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        # requantize back to int8 (the real serving step's epilogue)
        return (y >> 7).astype(jnp.int8)

    xb = jnp.ones((n, n), jnp.bfloat16)
    xi = jnp.ones((n, n), jnp.int8)
    tb = timed(f_bf16, xb)
    ti = timed(f_int8, xi)
    fl = 2 * n ** 3
    print(f"bf16: {tb*1e3:.2f} ms  {fl/tb/1e12:.1f} TFLOPS")
    print(f"int8: {ti*1e3:.2f} ms  {fl/ti/1e12:.1f} TOPS  "
          f"speedup x{tb/ti:.2f}")


def probe_conv(batch, hw, cin, cout, k=3, tag=""):
    print(f"-- conv {tag} B{batch} {hw}x{hw}x{cin}->{cout} k{k} --")
    dn = lax.conv_dimension_numbers((batch, hw, hw, cin),
                                    (k, k, cin, cout),
                                    ("NHWC", "HWIO", "NHWC"))
    kb = jax.random.normal(jax.random.PRNGKey(1),
                           (k, k, cin, cout)).astype(jnp.bfloat16)
    ki = jnp.asarray(np.random.RandomState(1)
                     .randint(-127, 127, (k, k, cin, cout)).astype(np.int8))

    @jax.jit
    def f_bf16(x):
        return lax.conv_general_dilated(x, kb, (1, 1), "SAME",
                                        dimension_numbers=dn)

    @jax.jit
    def f_int8(x):
        y = lax.conv_general_dilated(x, ki, (1, 1), "SAME",
                                     dimension_numbers=dn,
                                     preferred_element_type=jnp.int32)
        return (y >> 7).astype(jnp.int8)

    xb = jnp.ones((batch, hw, hw, cin), jnp.bfloat16)
    xi = jnp.ones((batch, hw, hw, cin), jnp.int8)
    tb = timed(f_bf16, xb, reps=32)
    try:
        ti = timed(f_int8, xi, reps=32)
    except Exception as e:
        print(f"int8 conv unsupported: {type(e).__name__}: {e}")
        return
    fl = 2 * batch * hw * hw * cin * cout * k * k
    print(f"bf16: {tb*1e3:.3f} ms  {fl/tb/1e12:.1f} TFLOPS")
    print(f"int8: {ti*1e3:.3f} ms  {fl/ti/1e12:.1f} TOPS  "
          f"speedup x{tb/ti:.2f}")


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    probe_matmul()
    # MARS-like: small channels, many patches
    probe_conv(256, 32, 32, 32, tag="mars-ish")
    # SSD pointwise at the 19x19x512 trunk
    probe_conv(32, 19, 512, 512, k=1, tag="ssd-pointwise")
    # a fat conv where the MXU is already saturated
    probe_conv(32, 40, 256, 256, tag="fat")
