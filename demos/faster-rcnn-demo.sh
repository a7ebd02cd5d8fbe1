#!/bin/bash
# Faster-RCNN demo (equivalent of the reference's SAVED_MODEL default,
# tools/saved_model.py:13: faster_rcnn_resnet101_v1_640x640). Pass a TF-OD
# SavedModel directory as $3 to run converted real weights natively; with
# no directory the native resnet101 architecture runs random-init.
set -e
cd "$(dirname "$0")/.."
INP="${1:-/tmp/deepdish_demo.mp4}"
OUT="${2:-/tmp/out_demo.mp4}"
MODEL="${3:-faster_rcnn}"
[ -f "$INP" ] || python3 demos/make_demo_video.py "$INP"
PYTHONPATH=".:$PYTHONPATH" python3 -m deepdish_tpu.pipeline.main \
    --model "$MODEL" --encoder-model mars-64x32x3 \
    --input "$INP" --output "$OUT" \
    --wanted-labels person \
    --disable-background-subtraction "${@:4}"
