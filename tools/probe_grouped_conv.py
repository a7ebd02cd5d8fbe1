"""Probe: grouped-conv channel packing for 32-wide MARS convs on the MXU.

MARS's 32-output-channel convs cap MXU lane utilization at 25% (32 of the
128-wide tile); channel padding was measured NEGATIVE (it buys lanes with
4x the FLOPs — docs/BENCH_NOTES.md "padding probes"). This probes the
zero-extra-FLOPs alternative: pack G=4 crops along the channel axis and
run ONE conv with feature_group_count=4 whose kernel is the shared 32->32
kernel tiled 4x along the output-channel axis — mathematically identical
per crop, but the conv op sees 128 output channels.

Outcome decides whether to build a packed MARS apply path. Three legs per
shape, interleaved per timing round (same discipline as
tools/round4_ab_interleaved.py): baseline (B, h, w, 32)->32, packed
(B/4, h, w, 128)->128 fgc=4, and dense (B/4, h, w, 128)->128 fgc=1 as the
"what if XLA expands the group to block-diagonal" upper-FLOPs reference.

Run: python tools/probe_grouped_conv.py [--rounds 4] [--reps 32]
"""
from __future__ import annotations

import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def conv(x, k, fgc):
    return lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=fgc)


def timed(fn, args, reps, rounds):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--reps", type=int, default=32)
    ap.add_argument("--layers", type=int, default=6,
                    help="chain length (amortizes dispatch; MARS has ~6 "
                         "convs per channel stage)")
    args = ap.parse_args()

    print(jax.devices())
    key = jax.random.PRNGKey(0)

    # (label, B, h, w, c) — MARS stages at enc_cap 32 x chunk 32 = 1024
    # crops/dispatch: post-pool 63x31@32, mid 32x16@64, late 16x8@128.
    shapes = [
        ("mars 63x31 c32 B1024", 1024, 63, 31, 32),
        ("mars 32x16 c64 B1024", 1024, 32, 16, 64),
        ("mars 63x31 c32 B256", 256, 63, 31, 32),
    ]
    G = 4

    @functools.partial(jax.jit, static_argnums=(2, 3))
    def chain(x, k, fgc, n):
        for _ in range(n):
            x = conv(x, k, fgc)
        return x

    for label, B, h, w, c in shapes:
        kb = jax.random.normal(key, (3, 3, c, c), jnp.bfloat16)
        xb = jax.random.normal(key, (B, h, w, c), jnp.bfloat16)
        # packed: same kernel tiled G-wide on the output axis
        kp = jnp.concatenate([kb] * G, axis=-1)           # (3,3,c, G*c)
        xp = jax.random.normal(key, (B // G, h, w, G * c), jnp.bfloat16)
        kd = jax.random.normal(key, (3, 3, G * c, G * c), jnp.bfloat16)

        legs = {
            "base  c%d fgc1" % c: (chain, (xb, kb, 1, args.layers)),
            "pack c%d fgc%d" % (G * c, G): (chain, (xp, kp, G, args.layers)),
            "dense c%d fgc1" % (G * c): (chain, (xp, kd, 1, args.layers)),
        }
        # warm all legs first, then interleave timing rounds
        res = {}
        for name, (fn, a) in legs.items():
            res[name] = timed(fn, a, args.reps, args.rounds)
        flops = 2 * B * h * w * c * c * 9 * args.layers
        print(f"\n{label}  ({flops/1e9:.2f} GFLOP/chain)")
        base = res["base  c%d fgc1" % c]
        for name, t in res.items():
            eff = flops / t / 1e12
            print(f"  {name:18s} {t*1e3:7.3f} ms  {eff:6.1f} TFLOPS"
                  f"  x{base/t:.2f} vs base")


if __name__ == "__main__":
    main()
