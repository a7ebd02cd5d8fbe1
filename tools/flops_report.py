"""XLA-counted FLOPs of the fused chunk program -> honest MFU arithmetic.

Compiles the exact program bench.py measures (chunk frames, YUV path) on
the CPU backend (same HLO, no TPU/pool time) and prints XLA's own
cost-analysis FLOP count per frame, then the implied TFLOPS / MFU at a
given FPS. Keeps the MFU claims in docs/BENCH_NOTES.md reproducible.

Usage: python tools/flops_report.py [--chunk 32] [--enc-cap 8] [--fps 3181]
                                    [--model ssd_mobilenet] [--quantized]

--quantized composes the integer-datapath detector (models/qgraph.py)
into the same fused program; note XLA's "flops" counter also tallies the
integer multiply-adds, so bf16-vs-int8 numbers compare op counts, not
achievable rates (the int8 MXU runs them at 2x the bf16 rate).
"""
import sys

import numpy as np

V5E_BF16_PEAK_TFLOPS = 197.0


def _arg(flag, default, cast=int):
    return cast(sys.argv[sys.argv.index(flag) + 1]) \
        if flag in sys.argv else default


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from deepdish_tpu import tracker as tt
    from deepdish_tpu.models import create_box_encoder, create_detector
    from deepdish_tpu.pipeline import FrameStep, FrameStepConfig

    chunk = _arg("--chunk", 32)
    enc_cap = _arg("--enc-cap", 8)
    fps = _arg("--fps", None, float) if "--fps" in sys.argv else None

    H, W = 720, 1280
    model = _arg("--model", "ssd_mobilenet", str)
    det = create_detector(model, max_outputs=32,
                          quantized="--quantized" in sys.argv)
    enc = create_box_encoder("mars")
    cfg = tt.TrackerConfig(max_tracks=64, max_detections=32,
                           gallery_size=64, num_labels=4)
    fs = FrameStep(det, enc, cfg, ["person", "car"], (H, W),
                   FrameStepConfig(encode_capacity=enc_cap))
    state = fs.init_state()
    yuv = np.zeros((chunk, H * 3 // 2, W), np.uint8)

    compiled = fs._chunk_yuv_jit.lower(fs._params, state, yuv).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):          # older jax returns one dict per device
        ca = ca[0]
    flops = float(ca.get("flops", float("nan")))
    per_frame = flops / chunk
    print(f"chunk={chunk} enc_cap={enc_cap}: XLA-counted "
          f"{flops/1e9:.2f} GFLOP/dispatch = {per_frame/1e9:.3f} GFLOP/frame")
    if fps:
        tflops = per_frame * fps / 1e12
        print(f"at {fps:.0f} FPS: {tflops:.1f} TFLOPS = "
              f"{100 * tflops / V5E_BF16_PEAK_TFLOPS:.1f}% of v5e bf16 peak "
              f"({V5E_BF16_PEAK_TFLOPS:.0f} TFLOPS)")


if __name__ == "__main__":
    main()
