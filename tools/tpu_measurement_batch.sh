#!/bin/bash
# One-shot TPU measurement batch — run FIRST when the axon pool is healthy
# (it wedged for the entire 2026-08-18 session; docs/BENCH_NOTES.md).
# Covers everything the CPU suite cannot: TPU wall-clock for the fused
# step, the integer datapath on real hardware, and the bench records.
# Logs under /tmp/tpu_runs/. Every step timeout-bounded.
set -x
mkdir -p /tmp/tpu_runs
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"

# 0. health gate (fail fast if the pool is still wedged)
timeout 300 python -c "
import time, jax, numpy as np, jax.numpy as jnp
t0=time.time(); print('devices', jax.devices(), time.time()-t0)
x=jnp.ones((1024,1024), jnp.bfloat16); z=x
for _ in range(32): z=z@x
t0=time.time(); np.asarray(z)[:1,:1]; print('32 chained:', time.time()-t0)
" 2>&1 | tail -3 | tee /tmp/tpu_runs/health.log || exit 1

# artifacts (built with the real tf.lite converter; reused if present)
[ -f /tmp/qdrive/ssd_mobilenet_int8.tflite ] || \
  timeout 1200 python -c "
import sys, pathlib; sys.path.insert(0, 'tests')
import jax; jax.config.update('jax_platforms', 'cpu')
from test_pipeline_real_tflite import _make_full_ssd_tflite
pathlib.Path('/tmp/qdrive').mkdir(exist_ok=True)
print(_make_full_ssd_tflite(pathlib.Path('/tmp/qdrive'), full_int8=True))"
[ -f /tmp/tiny_int8.tflite ] || \
  timeout 900 python -m pytest tests/test_qgraph.py::test_tiny_int8_jitted_outputs_exact -q \
  >/dev/null 2>&1 || true  # (the fixture also lands in pytest tmp; fall through)

# 1. verify TPU leg: fused FrameStep single step on-device
timeout 1800 python - <<'PYEOF' 2>&1 | tail -3 | tee /tmp/tpu_runs/verify.log
import numpy as np, jax, jax.numpy as jnp, time
from deepdish_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from deepdish_tpu import tracker as tt
from deepdish_tpu.models import create_box_encoder, create_detector
from deepdish_tpu.pipeline import FrameStep, FrameStepConfig
det = create_detector("ssd_mobilenet", max_outputs=32)
enc = create_box_encoder("mars")
cfg = tt.TrackerConfig(max_tracks=64, max_detections=32, gallery_size=64, num_labels=4)
fs = FrameStep(det, enc, cfg, ["person", "car"], (720, 1280),
               FrameStepConfig(encode_capacity=8))
state = fs.init_state()
frame = np.random.RandomState(0).randint(0, 255, (720, 1280, 3)).astype(np.uint8)
t0 = time.time()
state, out, snap, raw = fs.step(state, jnp.asarray(frame))
np.asarray(out.track_id)
print("verify TPU leg OK, first step (incl compile):", time.time() - t0)
PYEOF

# 1b. integer datapath on REAL TPU: both conv impls byte-equal
ART=/tmp/qdrive/ssd_mobilenet_int8.tflite
timeout 2400 python - <<PYEOF 2>&1 | tail -3 | tee /tmp/tpu_runs/qgraph_tpu.log
import numpy as np, jax, jax.numpy as jnp
from deepdish_tpu.models.qgraph import QGraphExecutor
x = np.random.RandomState(0).randint(0, 256, (1, 300, 300, 3)).astype(np.uint8)
outs = {}
for impl in ("portable", "mxu"):
    ex = QGraphExecutor("$ART", conv_impl=impl)
    outs[impl] = [np.asarray(o) for o in ex.jitted()(ex.consts, jnp.asarray(x))]
for a, b in zip(outs["portable"], outs["mxu"]):
    assert np.array_equal(a, b), "impl mismatch on TPU"
print("TPU integer datapath OK: portable == mxu byte-equal on real SSD")
PYEOF

# 2. int8 vs bf16 probe at framework shapes
timeout 1800 python tools/probe_int8.py 2>&1 | tee /tmp/tpu_runs/probe_int8.log

# 3. quantized vs float bench on the same artifact
timeout 2400 python bench.py --model "$ART" --quantized --frames 320 \
    2>&1 | tail -3 | tee /tmp/tpu_runs/bench_quant.log
timeout 2400 python bench.py --model "$ART" --frames 320 \
    2>&1 | tail -3 | tee /tmp/tpu_runs/bench_float_realw.log

# 4. stock bench sanity (the driver's command) + multistream point
timeout 2400 python bench.py 2>&1 | tail -3 | tee /tmp/tpu_runs/bench_stock.log
timeout 2400 python bench.py --streams 16 2>&1 | tail -3 | tee /tmp/tpu_runs/bench_ms16.log
echo ALL DONE — record results in docs/BENCH_NOTES.md
