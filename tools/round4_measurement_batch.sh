#!/bin/bash
# Round-4 TPU measurement batch (run AFTER tools/tpu_measurement_batch.sh):
# per-family bench lines (VERDICT r3 next #4), the int8 MARS A/B (#2),
# cold-start mitigation probe (#8), and the 3-D-mode host-overhead line.
# Logs under /tmp/tpu_runs/. Every step timeout-bounded; steps run
# SEQUENTIALLY (one TPU, shared pool).
set -x
mkdir -p /tmp/tpu_runs
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"

# 0. contention-controlled quantized-vs-float A/B on the SAME artifact,
#    back to back (absolute numbers are pool-load-dependent; the ratio
#    under equal load is the result)
ART=/tmp/qdrive/ssd_mobilenet_int8.tflite
if [ -f "$ART" ]; then
  timeout 3000 python bench.py --model "$ART" --quantized --frames 320 \
    2>&1 | tail -3 | tee /tmp/tpu_runs/ab_quant.log
  timeout 3000 python bench.py --model "$ART" --frames 320 \
    2>&1 | tail -3 | tee /tmp/tpu_runs/ab_float.log
fi

# 1. per-family throughput lines (random-init weights; the program, not
#    the weights, sets the speed)
for fam in yolov5 efficientdet faster_rcnn; do
  timeout 3000 python bench.py --model $fam --frames 320 \
    2>&1 | tail -3 | tee /tmp/tpu_runs/bench_$fam.log
done

# 2. int8 MARS A/B: standalone batch + fused step at enc_cap 32 and 8
timeout 3600 python tools/profile_mars_int8.py \
  2>&1 | grep -v WARNING | tee /tmp/tpu_runs/mars_int8.log

# 3. cold-start: AOT-serialize once, then fresh-process load vs fresh jit
timeout 3000 python tools/coldstart_probe.py --save \
  2>&1 | tail -4 | tee /tmp/tpu_runs/cold_save.log
timeout 3000 python tools/coldstart_probe.py --load \
  2>&1 | tail -4 | tee /tmp/tpu_runs/cold_load.log
timeout 3000 python tools/coldstart_probe.py --fresh \
  2>&1 | tail -3 | tee /tmp/tpu_runs/cold_fresh.log

# 4. 3-D mode host overhead: e2e CLI with and without --3d on the same
#    video (the projection runs host-side per frame)
python - <<'PYEOF'
import numpy as np, cv2
vw = cv2.VideoWriter("/tmp/dd3d.mp4", cv2.VideoWriter_fourcc(*"mp4v"), 30,
                     (1280, 720))
rng = np.random.RandomState(0)
base = rng.randint(0, 80, (720, 1280, 3)).astype(np.uint8)
for i in range(200):
    f = base.copy()
    f[200:500, (40 + i * 9) % 1080:(40 + i * 9) % 1080 + 160] = 230
    vw.write(f)
vw.release()
PYEOF
for td in "" "--3d --focallength-mm 4.0 --elevation-m 10 --tilt-deg 45"; do
  tag=$([ -z "$td" ] && echo no3d || echo 3d)
  t0=$SECONDS
  timeout 2400 python -m deepdish_tpu.pipeline.main \
    --input /tmp/dd3d.mp4 --model ssd_mobilenet --encoder-model mars \
    --wanted-labels person --disable-graphics --chunk-size 32 \
    --encode-capacity 8 --allow-random-weights $td \
    > /tmp/tpu_runs/e2e_$tag.log 2>&1
  echo "wall_s=$((SECONDS - t0))" >> /tmp/tpu_runs/e2e_$tag.log
  tail -3 /tmp/tpu_runs/e2e_$tag.log
done
echo ROUND4 BATCH DONE
