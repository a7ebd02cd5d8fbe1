#!/bin/bash
# YOLOv5s demo with MQTT crossing events (BASELINE.json config 2).
set -e
cd "$(dirname "$0")/.."
INP="${1:-/tmp/deepdish_demo.mp4}"
OUT="${2:-/tmp/out_demo.mp4}"
[ -f "$INP" ] || python3 demos/make_demo_video.py "$INP"
PYTHONPATH=".:$PYTHONPATH" python3 -m deepdish_tpu.pipeline.main \
    --model yolov5s --encoder-model mars-64x32x3 \
    --input "$INP" --output "$OUT" --log /tmp/deepdish_yolo.log \
    --score-threshold 0.25 "${@:3}"
