#!/bin/bash
# SSD-MobileNet v1 + MARS demo (equivalent of the reference's
# mobilenet1-demo.sh, incl. the 3-D top-down projection flags).
set -e
cd "$(dirname "$0")/.."
INP="${1:-/tmp/deepdish_demo.mp4}"
OUT="${2:-/tmp/out_demo.mp4}"
[ -f "$INP" ] || python3 demos/make_demo_video.py "$INP"
PYTHONPATH=".:$PYTHONPATH" python3 -m deepdish_tpu.pipeline.main \
    --model ssd_mobilenet --encoder-model mars-64x32x3 \
    --input "$INP" --output "$OUT" --log /tmp/deepdish_demo.log \
    --3d --sensor-width-mm 6.69 --sensor-height-mm 5.55 \
    --focallength-mm 3.2 --elevation-m 1 --tilt-deg 80 --roll-deg 0 \
    --topdownview-size-m "5,5" "${@:3}"
