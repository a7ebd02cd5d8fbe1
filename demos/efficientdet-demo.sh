#!/bin/bash
# EfficientDet-Lite0 demo (equivalent of the reference's tflite-demo.sh).
set -e
cd "$(dirname "$0")/.."
INP="${1:-/tmp/deepdish_demo.mp4}"
OUT="${2:-/tmp/out_demo.mp4}"
[ -f "$INP" ] || python3 demos/make_demo_video.py "$INP"
PYTHONPATH=".:$PYTHONPATH" python3 -m deepdish_tpu.pipeline.main \
    --model efficientdet-lite0 --encoder-model mars-64x32x3 \
    --input "$INP" --output "$OUT" \
    --wanted-labels 'person,bicycle,car,motorbike' \
    --disable-background-subtraction "${@:3}"
