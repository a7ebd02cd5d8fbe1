"""Minimal in-tree repro for the int8 x YUV x chunk-32 TPU worker crash.

Round-4 bisect (docs/BENCH_NOTES.md "Quantized fused path on real TPU"):
composing the INTEGER datapath detector (models/qgraph.py QGraphExecutor)
with the on-device I420->RGB conversion (ops/colorspace.py) in ONE XLA
program at chunk 32 deterministically crashes the TPU worker
("UNAVAILABLE: TPU device error / worker process crashed — kernel fault").
Every smaller or split composition passes: float+yuv32, int8+rgb32,
int8+yuv16, conversion-alone-32, and the shipped two-dispatch workaround
(pipeline/framestep.py run_chunk_yuv, `_yuv_split`) which is bit-identical
(tests/test_yuv_split_regression.py).

This script is the standalone repro for filing upstream and for re-testing
the fused path on every jax/libtpu bump so the workaround does not
silently ossify:

    # safe control legs only (should all PASS on any backend):
    python tools/repro_int8_yuv_crash.py --artifact ssd_int8.tflite

    # additionally run the faulting composition (EXPECTED TO KILL THE TPU
    # WORKER — opt-in; if it passes, the backend bug is fixed and
    # FrameStep._yuv_split can be retired):
    python tools/repro_int8_yuv_crash.py --artifact ssd_int8.tflite --fault

Without --artifact it synthesizes a full-integer SSD export via the test
builder (tests/test_pipeline_real_tflite.py, needs tensorflow).

Opt-in and loud by design: the faulting leg is never run unless --fault is
given, and each leg prints before dispatch so a worker kill is attributable.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


H, W = 720, 1280        # the bisect's frame shape


def _make_artifact(tmpdir: str) -> str:
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    import pathlib

    from test_pipeline_real_tflite import _make_full_ssd_tflite
    print("building full-integer SSD export (tensorflow) ...", flush=True)
    return str(_make_full_ssd_tflite(pathlib.Path(tmpdir), full_int8=True))


def _legs(artifact: str, chunk_big: int):
    import jax
    import jax.numpy as jnp

    from deepdish_tpu import tracker as tt
    from deepdish_tpu.models import create_box_encoder, create_detector
    from deepdish_tpu.ops import colorspace
    from deepdish_tpu.pipeline import FrameStep, FrameStepConfig

    det = create_detector(artifact, quantized=True)
    enc = create_box_encoder("mars")
    cfg = tt.TrackerConfig(max_tracks=64, max_detections=32,
                           gallery_size=64, num_labels=4)
    fs = FrameStep(det, enc, cfg, ["person", "car"], (H, W),
                   FrameStepConfig(encode_capacity=8,
                                   background_subtraction=False))
    assert fs._yuv_split, "quantized detector should select the split path"

    rng = np.random.RandomState(0)
    yuv_big = rng.randint(0, 256, (chunk_big, H * 3 // 2, W), np.uint8)
    yuv_small = yuv_big[:chunk_big // 2]
    rgb_big = rng.randint(0, 256, (chunk_big, H, W, 3), np.uint8)

    convert = jax.jit(jax.vmap(
        lambda f: colorspace.yuv420_to_rgb_u8(f, H, W)))

    def leg_convert_only():
        jax.block_until_ready(convert(yuv_big))

    def leg_rgb_fused():
        st, outs, _ = fs.run_chunk(fs.init_state(), rgb_big)
        jax.block_until_ready((st.table, outs))

    def leg_yuv_small_fused():
        st = fs.init_state()
        out = fs._chunk_yuv_jit(fs._params, st, jnp.asarray(yuv_small))
        jax.block_until_ready(out)

    def leg_yuv_split():
        st, outs, _ = fs.run_chunk_yuv(fs.init_state(), yuv_big)
        jax.block_until_ready((st.table, outs))

    def leg_min_detect_yuv():
        # minimal candidate: conversion + int8 detector heads in ONE
        # program, no encoder/tracker — run this before the full step to
        # see whether the fault needs the whole fused step or just
        # conversion+executor
        from deepdish_tpu.models.preprocess import resize_bilinear_mxu

        def prog(params, yuv):
            frames = jax.vmap(
                lambda f: colorspace.yuv420_to_rgb_u8(f, H, W))(yuv)

            def one(frame):
                resized = resize_bilinear_mxu(frame, det.height, det.width)
                return det.detect(params, resized, jnp.float32(W),
                                  jnp.float32(H))

            return jax.vmap(one)(frames)

        out = jax.jit(prog)(jax.device_put(det.params), jnp.asarray(yuv_big))
        jax.block_until_ready(out)

    def leg_yuv_fused():
        # THE FAULTING COMPOSITION (round-4 bisect): one XLA program,
        # int8 executor + YUV conversion, chunk 32
        st = fs.init_state()
        out = fs._chunk_yuv_jit(fs._params, st, jnp.asarray(yuv_big))
        jax.block_until_ready(out)

    controls = [
        (f"conversion alone, chunk {chunk_big}", leg_convert_only),
        (f"fused step, RGB, chunk {chunk_big}", leg_rgb_fused),
        (f"fused step, YUV, chunk {chunk_big // 2}", leg_yuv_small_fused),
        (f"SPLIT workaround, YUV, chunk {chunk_big}", leg_yuv_split),
    ]
    faulting = [
        (f"ONE-PROGRAM conversion+int8-detector, YUV, chunk {chunk_big}",
         leg_min_detect_yuv),
        (f"ONE-PROGRAM fused step, YUV, chunk {chunk_big}  <- bisected fault",
         leg_yuv_fused),
    ]
    return controls, faulting


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--artifact", default=None,
                    help="full-integer SSD .tflite (default: synthesize)")
    ap.add_argument("--fault", action="store_true",
                    help="ALSO run the faulting one-program legs "
                         "(expected to kill the TPU worker)")
    ap.add_argument("--chunk", type=int, default=32,
                    help="the faulting chunk size (bisect: 32)")
    ap.add_argument("--device", default=None,
                    help="jax platform override (e.g. cpu)")
    args = ap.parse_args(argv)

    if args.device:
        import jax
        jax.config.update("jax_platforms", args.device)

    artifact = args.artifact
    if artifact is None:
        import tempfile
        artifact = _make_artifact(tempfile.mkdtemp(prefix="repro_int8_"))

    import jax
    print(f"backend: {jax.devices()[0].platform}, jax {jax.__version__}",
          flush=True)
    controls, faulting = _legs(artifact, args.chunk)

    for name, fn in controls:
        print(f"[control] {name} ... ", end="", flush=True)
        fn()
        print("PASS", flush=True)

    if not args.fault:
        print("controls all PASS; rerun with --fault to attempt the "
              "faulting one-program composition (may kill the TPU worker)")
        return 0

    for name, fn in faulting:
        print(f"[fault?] {name} ... ", end="", flush=True)
        fn()
        print("PASS", flush=True)
    print("faulting composition now PASSES — the backend bug is fixed on "
          "this jax/libtpu; consider retiring FrameStep._yuv_split "
          "(pipeline/framestep.py) after a full bench A/B")
    return 0


if __name__ == "__main__":
    sys.exit(main())
