#!/bin/bash
# Quantized serving demo: run a full-integer artifact on the INTEGER
# datapath (the EdgeTPU execution model — the format of the reference's
# detect.tflite / ssd_mobilenet_v*_coco_quant_postprocess files,
# mobilenet1-demo.sh), with TFLite-interpreter-exact head tensors.
#
# Usage: quantized-demo.sh MODEL.tflite [INPUT.mp4 [OUTPUT.mp4]]
# The model must be a full-integer export (uint8/int8 input tensor);
# without one handy, build the in-test artifact:
#   python3 -c "import pathlib, sys; sys.path.insert(0, 'tests'); \
#     from test_pipeline_real_tflite import _make_full_ssd_tflite; \
#     print(_make_full_ssd_tflite(pathlib.Path('/tmp'), full_int8=True))"
set -e
cd "$(dirname "$0")/.."
MODEL="${1:?usage: quantized-demo.sh MODEL.tflite [INPUT [OUTPUT]]}"
INP="${2:-/tmp/deepdish_demo.mp4}"
OUT="${3:-/tmp/out_demo_q.mp4}"
[ -f "$INP" ] || python3 demos/make_demo_video.py "$INP"
PYTHONPATH=".:$PYTHONPATH" python3 -m deepdish_tpu.pipeline.main \
    --model "$MODEL" --quantized-inference \
    --encoder-model mars-64x32x3 \
    --input "$INP" --output "$OUT" --log /tmp/deepdish_demo_q.log \
    "${@:4}"
