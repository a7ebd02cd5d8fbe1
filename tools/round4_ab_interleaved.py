#!/usr/bin/env python3
"""Single-process, interleaved TPU A/Bs for the round-4 open questions.

The axon pool's load oscillates faster than separate bench processes can
be launched (docs/BENCH_NOTES.md; identical programs measured 2260 vs 11
FPS in windows an hour apart), so every comparison here runs all its legs
INTERLEAVED in one process: round-robin A,B,C per timing round, several
rounds, median per leg. Ratios are then window-controlled even when the
absolute numbers are junk.

Modes (combine freely):
  --weights ART   rand-float vs real-float vs real-int8 fused step
                  (answers: do real weights change the program's speed?
                   what does the integer datapath cost/buy, honestly?)
  --mars-bisect   where the fused int8-MARS slowdown lives:
                  standalone batch 256/1024 (H1: small-batch int8 conv),
                  crop->mars composition (H2: fused-producer layout),
                  fused step cap8 mars vs mars-int8 interleaved (H3:
                  contention artifact in the earlier non-interleaved run).

Timing: 16 sequentially-dependent dispatches per round (tracker-state
carry) + forced host fetch; the TPU stream executes in order so the fetch
waits for the full round (relay rules, docs/BENCH_NOTES.md).

Usage: PYTHONPATH=.:/root/.axon_site python tools/round4_ab_interleaved.py \
           --weights /tmp/qdrive/ssd_mobilenet_int8.tflite --mars-bisect
"""
import argparse
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
from deepdish_tpu.pipeline import FrameStep, FrameStepConfig  # noqa: E402

H, W = 720, 1280
CHUNK = 32
REPS = 16
ROUNDS = 4


def _frames(chunk=CHUNK):
    f = np.random.RandomState(0).randint(0, 80, (chunk, H, W, 3))
    f = f.astype(np.uint8)
    f[:, 200:500, 300:460] = 230
    return f


def _probe_ms():
    """One 1024^3 bf16 matmul chain — a per-round pool-load marker."""
    x = jnp.ones((1024, 1024), jnp.bfloat16)
    z = x
    for _ in range(8):
        z = z @ x
    t0 = time.time()
    np.asarray(z)[:1, :1]
    return (time.time() - t0) * 1e3


def _fused_legs(legs):
    """legs: list of (name, FrameStep). Interleaved resident timing."""
    frames_dev = jax.device_put(_frames())
    jax.block_until_ready(frames_dev)
    states, times = {}, {n: [] for n, _ in legs}
    for name, fs in legs:               # compile pass, one leg at a time
        t0 = time.time()
        s, o, _ = fs.run_chunk(states.setdefault(name, fs.init_state()),
                               frames_dev)
        np.asarray(o.track_id)
        states[name] = s
        print(f"  compile {name}: {time.time()-t0:.0f}s", flush=True)
    for rnd in range(ROUNDS):
        load = _probe_ms()
        for name, fs in legs:
            s = states[name]
            t0 = time.time()
            for _ in range(REPS):
                s, o, _ = fs.run_chunk(s, frames_dev)
            _ = np.asarray(o.track_id.ravel()[:1])
            times[name].append((time.time() - t0) / REPS)
            states[name] = s
        row = "  ".join(f"{n}={times[n][-1]/CHUNK*1e3:7.3f}ms/f"
                        for n, _ in legs)
        print(f"  round {rnd}: probe={load:6.1f}ms  {row}", flush=True)
    print("  MEDIANS:", flush=True)
    meds = {}
    for name, _ in legs:
        t = float(np.median(times[name]))
        meds[name] = t
        print(f"    {name:12s}: {t/CHUNK*1e3:7.3f} ms/frame "
              f"({CHUNK/t:7.0f} FPS)", flush=True)
    return meds


def ab_weights(artifact):
    print(f"== fused step A/B, chunk {CHUNK}, enc_cap 8, RGB transport ==",
          flush=True)
    cfg = tt.TrackerConfig(max_tracks=64, max_detections=32,
                           gallery_size=64, num_labels=4)

    def make(det_name, quantized=False):
        det = create_detector(det_name, max_outputs=32, quantized=quantized)
        enc = create_box_encoder("mars")
        return FrameStep(det, enc, cfg, ["person", "car"], (H, W),
                         FrameStepConfig(encode_capacity=8))

    legs = [("rand-float", make("ssd_mobilenet")),
            ("real-float", make(artifact)),
            ("real-int8", make(artifact, quantized=True))]
    meds = _fused_legs(legs)
    r = meds["real-float"] / meds["rand-float"]
    q = meds["real-int8"] / meds["real-float"]
    print(f"  RATIOS: real/rand-float={r:.2f}  int8/float={q:.2f}",
          flush=True)


def mars_cap32():
    """Fused step at enc_cap 32 — the configuration where MARS is ~60% of
    the step (docs/BENCH_NOTES.md r3) and the int8 standalone win (x1.3-1.5)
    should surface if it survives fusion."""
    print("== fused step cap32: mars vs mars-int8 (interleaved) ==",
          flush=True)
    cfg = tt.TrackerConfig(max_tracks=64, max_detections=32,
                           gallery_size=64, num_labels=4)
    det = create_detector("ssd_mobilenet", max_outputs=32)
    legs = []
    for name in ("mars", "mars-int8"):
        enc = create_box_encoder(name)
        legs.append((name, FrameStep(det, enc, cfg, ["person", "car"],
                                     (H, W),
                                     FrameStepConfig(encode_capacity=32))))
    meds = _fused_legs(legs)
    print(f"  RATIO cap32 int8/bf16: "
          f"{meds['mars-int8']/meds['mars']:.2f}", flush=True)


def det_int8():
    """Fused step: float vs fast-int8 SSD detector (models/ssd_q.py), and
    the all-int8 combination (int8 detector + int8 MARS), at the headline
    enc_cap 8 and at enc_cap 32. The detector's pointwise/extras/head
    convs move to the MXU int8 path; dw stays bf16 (probe: x0.85 at 32
    lanes). A fourth leg A/Bs quantize_dw."""
    print("== fused step: detector float vs fast-int8 (interleaved) ==",
          flush=True)
    from deepdish_tpu.models.ssd_q import SSDMobileNetInt8Detector
    cfg = tt.TrackerConfig(max_tracks=64, max_detections=32,
                           gallery_size=64, num_labels=4)
    for cap in (8, 32):
        legs = []
        for name, det_name, enc_name, qdw in (
                ("float", "ssd_mobilenet", "mars", False),
                ("det-i8", "ssd_mobilenet_int8", "mars", False),
                ("det-i8dw", None, "mars", True),
                ("all-i8", "ssd_mobilenet_int8", "mars-int8", False)):
            if det_name is None:
                det = SSDMobileNetInt8Detector(max_outputs=32,
                                               quantize_dw=True)
                # mirror the registry's post-construction label assignment
                # (models/registry.py:394-396) — FrameStep reads
                # max(detector.labels)+1 at __init__
                from deepdish_tpu.models.registry import load_labels
                det.labels = dict(enumerate(load_labels(None)))
                det.label_offset = 0
            else:
                det = create_detector(det_name, max_outputs=32)
            enc = create_box_encoder(enc_name)
            legs.append((f"{name}/c{cap}",
                         FrameStep(det, enc, cfg, ["person", "car"],
                                   (H, W),
                                   FrameStepConfig(encode_capacity=cap))))
        meds = _fused_legs(legs)
        f = meds[f"float/c{cap}"]
        for n in (f"det-i8/c{cap}", f"det-i8dw/c{cap}", f"all-i8/c{cap}"):
            print(f"  RATIO {n}/float: {meds[n]/f:.3f}", flush=True)


def mars_bisect():
    from deepdish_tpu.models import mars_q
    from deepdish_tpu.models.mars import INPUT_SHAPE, MarsNet
    from deepdish_tpu.models.preprocess import crop_resize_patches_mxu

    net = MarsNet(compute_dtype=jnp.bfloat16)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1,) + INPUT_SHAPE, jnp.float32))
    qp = mars_q.quantize_mars(params)

    print("== standalone MARS: batch x impl (interleaved per batch) ==",
          flush=True)
    for batch in (256, 1024):
        x = jax.device_put(np.random.RandomState(0).randint(
            0, 256, (batch,) + INPUT_SHAPE).astype(np.float32))
        jax.block_until_ready(x)
        f_b = jax.jit(lambda v: net.apply(params, v))
        f_q = jax.jit(lambda v: mars_q.mars_int8_apply(qp, v, jnp.bfloat16,
                                                       impl="conv"))
        tb, _ = med_time(f_b, x)
        tq, _ = med_time(f_q, x)
        print(f"  batch {batch:5d}: bf16 {tb*1e3:8.3f} ms  "
              f"int8/conv {tq*1e3:8.3f} ms  ratio x{tb/tq:.2f}", flush=True)

    print("== crop->MARS composition (fused producer), 32f x 8 boxes ==",
          flush=True)
    frames = jax.device_put(_frames())
    tl = np.tile(np.array([[300.0, 200.0, 160.0, 300.0]], np.float32),
                 (32, 8, 1))
    tlwh = jax.device_put(tl)
    ok = jax.device_put(np.ones((32, 8), bool))

    def crop_then(apply_fn):
        def f(fr, t, v):
            patches, okk = jax.vmap(
                lambda a, b, c: crop_resize_patches_mxu(
                    a, b, c, INPUT_SHAPE[0], INPUT_SHAPE[1]))(fr, t, v)
            flat = patches.reshape((32 * 8,) + patches.shape[2:])
            return apply_fn(flat)
        return jax.jit(f)

    g_b = crop_then(lambda p: net.apply(params, p))
    g_q = crop_then(lambda p: mars_q.mars_int8_apply(qp, p, jnp.bfloat16,
                                                     impl="conv"))
    tb, _ = med_time(g_b, frames, tlwh, ok)
    tq, _ = med_time(g_q, frames, tlwh, ok)
    print(f"  crop+bf16 {tb*1e3:8.3f} ms  crop+int8 {tq*1e3:8.3f} ms  "
          f"ratio x{tb/tq:.2f}", flush=True)

    print("== fused step cap8: mars vs mars-int8 (interleaved) ==",
          flush=True)
    cfg = tt.TrackerConfig(max_tracks=64, max_detections=32,
                           gallery_size=64, num_labels=4)
    det = create_detector("ssd_mobilenet", max_outputs=32)
    legs = []
    for name in ("mars", "mars-int8"):
        enc = create_box_encoder(name)
        legs.append((name, FrameStep(det, enc, cfg, ["person", "car"],
                                     (H, W),
                                     FrameStepConfig(encode_capacity=8))))
    _fused_legs(legs)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights")
    ap.add_argument("--mars-bisect", action="store_true")
    ap.add_argument("--mars-cap32", action="store_true")
    ap.add_argument("--det-int8", action="store_true")
    a = ap.parse_args()
    print("device:", jax.devices()[0], flush=True)
    print(f"pool probe: {_probe_ms():.1f} ms (8-chain 1024^3 bf16)",
          flush=True)
    if a.weights:
        ab_weights(a.weights)
    if a.mars_bisect:
        mars_bisect()
    if a.mars_cap32:
        mars_cap32()
    if a.det_int8:
        det_int8()
