"""Probe: fused Pallas depthwise-separable block vs XLA's 2-conv lowering.

The round-3 trace and the round-4 grouped-conv probe both located the
detector's MFU plateau in the VPU-bound depthwise stages of MobileNetV1
(docs/BENCH_NOTES.md). ops/dsconv_pallas.py fuses depthwise-3x3 + BN +
ReLU6 + pointwise-1x1 + BN + ReLU6 into one Pallas kernel with the
intermediate VMEM-resident. This probes that kernel against the model's
current lowering (lax grouped conv -> BN -> relu6 -> 1x1 conv -> BN ->
relu6) at the real MobileNet-300 stage shapes, interleaved per timing
round with forced fetches (same discipline as tools/probe_grouped_conv.py
and tools/round4_ab_interleaved.py).

Also times the full 13-layer backbone body both ways (--body) since
per-layer wins can be eaten by XLA fusing the composition differently.

Run: python tools/probe_dsconv.py [--rounds 4] [--reps 16] [--batch 32]
"""
from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, ".")
from deepdish_tpu.ops.dsconv_pallas import dsconv_reference, fused_dsconv  # noqa: E402

# MobileNetV1-300 depthwise-separable stages: (label, H, W, Cin, Cout, s)
STAGES = [
    ("ds1  150^2  32-> 64 s1", 150, 150, 32, 64, 1),
    ("ds2  150^2  64->128 s2", 150, 150, 64, 128, 2),
    ("ds3   75^2 128->128 s1", 75, 75, 128, 128, 1),
    ("ds4   75^2 128->256 s2", 75, 75, 128, 256, 2),
    ("ds5   38^2 256->256 s1", 38, 38, 256, 256, 1),
    ("ds6   38^2 256->512 s2", 38, 38, 256, 512, 2),
    ("ds7   19^2 512->512 s1", 19, 19, 512, 512, 1),
    ("ds12  19^2 512->1024 s2", 19, 19, 512, 1024, 2),
    ("ds13  10^2 1024->1024 s1", 10, 10, 1024, 1024, 1),
]


def block_weights(rng, cin, cout, dtype=jnp.bfloat16):
    f = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, dtype)
    return (f(3, 3, cin),
            jnp.asarray(rng.random(cin) + 0.5, jnp.float32),
            jnp.asarray(rng.standard_normal(cin) * 0.1, jnp.float32),
            f(cin, cout),
            jnp.asarray(rng.random(cout) + 0.5, jnp.float32),
            jnp.asarray(rng.standard_normal(cout) * 0.1, jnp.float32))


def make_chain(block, stride, n, chainable):
    """n applications of `block` per dispatch (distinct weights each, so
    XLA cannot CSE them): sequential chaining when Cin == Cout and
    stride 1, else n independent applications summed."""
    def chain(x, ws):
        if chainable:
            for w in ws:
                x = block(x, *w, stride)
            return x
        acc = None
        for w in ws:
            y = block(x, *w, stride)
            acc = y if acc is None else acc + y
        return acc
    return jax.jit(chain)


def timed_interleaved(legs, reps, rounds):
    """legs: {name: (fn, args)}. Warm all, then interleave rounds; min."""
    for fn, a in legs.values():
        jax.block_until_ready(fn(*a))
    best = {k: float("inf") for k in legs}
    for _ in range(rounds):
        for name, (fn, a) in legs.items():
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(*a)
            np.asarray(out.ravel()[0])          # forced fetch
            best[name] = min(best[name],
                             (time.perf_counter() - t0) / reps)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--layers", type=int, default=6,
                    help="blocks per dispatch (amortizes tunnel dispatch "
                         "overhead, like tools/probe_grouped_conv.py)")
    ap.add_argument("--stages", type=str, default="",
                    help="comma-separated stage prefixes to run (default all)")
    args = ap.parse_args()
    print(jax.devices())
    rng = np.random.default_rng(0)
    want = [s for s in args.stages.split(",") if s]

    tot_ref = tot_fused = 0.0
    for label, h, w, cin, cout, s in STAGES:
        if want and not any(label.startswith(p) for p in want):
            continue
        chainable = (s == 1 and cin == cout)
        x = jnp.asarray(rng.standard_normal((args.batch, h, w, cin)) * 0.1,
                        jnp.bfloat16)
        ws = [block_weights(rng, cin, cout) for _ in range(args.layers)]
        ref_fn = make_chain(dsconv_reference, s, args.layers, chainable)
        fus_fn = make_chain(fused_dsconv, s, args.layers, chainable)
        # numeric sanity on the whole chain before timing (bf16 chain drift)
        d = float(jnp.max(jnp.abs(ref_fn(x, ws).astype(jnp.float32)
                                  - fus_fn(x, ws).astype(jnp.float32))))
        legs = {"xla 2-conv": (ref_fn, (x, ws)),
                "pallas fused": (fus_fn, (x, ws))}
        best = timed_interleaved(legs, args.reps, args.rounds)
        ho, wo = -(-h // s), -(-w // s)
        gflop = 2 * args.batch * args.layers * (
            ho * wo * cin * 9 + ho * wo * cin * cout) / 1e9
        r, f = best["xla 2-conv"], best["pallas fused"]
        tot_ref += r
        tot_fused += f
        kind = "chain" if chainable else "sum"
        print(f"{label}  ({gflop:.2f} GFLOP/{kind}-{args.layers})"
              f"  maxdiff {d:.4f}")
        for name, t in best.items():
            print(f"  {name:13s} {t*1e3:8.3f} ms  "
                  f"{gflop/t/1e3:6.1f} TFLOPS  x{r/t:.2f} vs xla")
    if tot_ref:
        print(f"\nsum over stages: xla {tot_ref*1e3:.3f} ms, "
              f"pallas {tot_fused*1e3:.3f} ms, x{tot_ref/tot_fused:.2f}")


if __name__ == "__main__":
    main()
