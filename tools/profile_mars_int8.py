#!/usr/bin/env python3
"""TPU A/B: bf16 MARS vs int8 (w8a8) MARS, standalone and in the fused step.

VERDICT r3 next #2 — MARS is ~60% of the fused step at enc_cap 32 and its
32-wide convs cap MXU lanes at 25%; the int8 MXU runs at 2x bf16 rate.
This measures whether the quantized encoder (models/mars_q.py) buys
wall-clock, honestly (docs/BENCH_NOTES.md relay rules: >=32 dependent
dispatches per round, forced fetch, sanity vs the ~394 TOPS int8 peak).

Usage: PYTHONPATH=.:/root/.axon_site python tools/profile_mars_int8.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from tools._timing import med_time  # noqa: E402

from deepdish_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

from deepdish_tpu import tracker as tt  # noqa: E402
from deepdish_tpu.models import (create_box_encoder,  # noqa: E402
                                 create_detector)
from deepdish_tpu.models.mars import INPUT_SHAPE, MarsNet  # noqa: E402
from deepdish_tpu.models import mars_q  # noqa: E402
from deepdish_tpu.pipeline import FrameStep, FrameStepConfig  # noqa: E402


def standalone(batch=1024):
    print(f"-- standalone MARS, batch {batch} --", flush=True)
    net = MarsNet(compute_dtype=jnp.bfloat16)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1,) + INPUT_SHAPE, jnp.float32))
    x = jax.device_put(np.random.RandomState(0).randint(
        0, 256, (batch,) + INPUT_SHAPE).astype(np.float32))
    jax.block_until_ready(x)

    f_bf16 = jax.jit(lambda v: net.apply(params, v))
    t, _ = med_time(f_bf16, x)
    print(f"bf16 : {t*1e3:8.3f} ms/batch  ({batch/t:8.0f} crops/s)",
          flush=True)

    qp = mars_q.quantize_mars(params)
    for impl in ("dot", "conv"):
        f_q = jax.jit(lambda v, i=impl: mars_q.mars_int8_apply(
            qp, v, jnp.bfloat16, impl=i))
        t, _ = med_time(f_q, x)
        print(f"int8/{impl:4s}: {t*1e3:8.3f} ms/batch  "
              f"({batch/t:8.0f} crops/s)", flush=True)


def fused(enc_cap=32, chunk=32):
    print(f"-- fused step, chunk {chunk}, enc_cap {enc_cap} --", flush=True)
    H, W = 720, 1280
    det = create_detector("ssd_mobilenet", max_outputs=32)
    cfg = tt.TrackerConfig(max_tracks=64, max_detections=32,
                           gallery_size=64, num_labels=4)
    frames = np.random.RandomState(0).randint(
        0, 80, (chunk, H, W, 3)).astype(np.uint8)
    frames[:, 200:500, 300:460] = 230
    frames_dev = jax.device_put(frames)
    jax.block_until_ready(frames_dev)

    for name in ("mars", "mars-int8"):
        enc = create_box_encoder(name)
        fs = FrameStep(det, enc, cfg, ["person", "car"], (H, W),
                       FrameStepConfig(encode_capacity=enc_cap))
        state = fs.init_state()
        t0 = time.time()
        state, outs, _ = fs.run_chunk(state, frames_dev)
        np.asarray(outs.track_id)
        compile_s = time.time() - t0

        def step(s):
            s2, o, _ = fs.run_chunk(s, frames_dev)
            return s2, o

        # sequentially dependent through the tracker state
        reps = 16
        meds = []
        for _ in range(3):
            t0 = time.time()
            s = state
            for _ in range(reps):
                s, o = step(s)
            _ = np.asarray(o.track_id.ravel()[:1])
            meds.append((time.time() - t0) / reps)
        t = float(np.median(meds))
        print(f"{name:10s}: {t/chunk*1e3:7.3f} ms/frame  "
              f"({chunk/t:7.0f} FPS)  compile {compile_s:.0f}s", flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    standalone()
    fused(enc_cap=32)
    fused(enc_cap=8)
