"""Benchmark: offline 720p decode->count throughput on one TPU chip.

End-to-end path measured (same code the CLI pipeline runs): mp4 decode via
the native C++ loader (native/frameloader.cpp, planar I420 out) -> I420
chunk to device -> fused XLA program (on-device YUV->RGB, resize,
SSD-MobileNetV1, decode/NMS, crop+MARS embed, full Deep SORT tracker scan)
-> host reads the per-frame track/count snapshots.

Options:
  --chunk N     frames per dispatch (default 32)
  --frames N    total frames to process (default 640)
  --enc-cap E   appearance-encode capacity per frame (default 8; 0 = every
                detection slot). Reported overflow is the number of
                detections past the capacity (0 on this scene).
  --depth D     host->device transfer depth: keep D chunks in flight
                (default 2) so the tunnel transfer overlaps device compute
  --model X     a real .tflite flatbuffer to convert and run (same program
                as random-init; proves converter + perf compose), or a bare
                family name (yolov5 / yolov3 / efficientdet) to bench that
                detector family random-init
  --synthetic   skip the mp4/loader and feed in-memory frames (old mode)
  --rgb         RGB transport instead of I420
  --encoder X   appearance encoder (default mars; mars_int8 = the int8 MXU
                serving encoder, models/mars_q.py)
  --latency     serving-latency mode: single-frame dispatch + forced fetch
                per step, p50/p90/p99 ms (device-resident and e2e);
                --steps N samples (default 200)
  --streams N   multi-stream aggregate mode (BASELINE.json config 5);
                add --e2e to run it decode->count over N real mp4 files
                through the native loader, publishing the same
                decode/transfer/device three-term model as single-stream

The JSON line also reports `transfer_ceiling_fps` (measured raw
device_put+consume throughput of one chunk THIS run — on the shared axon
tunnel this is the e2e wall, docs/BENCH_NOTES.md) and `compile_s`/
`cache_hit` so pool flakiness is distinguishable from trace-time
regressions.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline is measured FPS / 1000 (the driver's north-star target; the
reference publishes no numbers — BASELINE.md).
"""
import json
import os
import sys
import time

import numpy as np


def _arg(flag, default, cast=int):
    return cast(sys.argv[sys.argv.index(flag) + 1]) \
        if flag in sys.argv else default


def _pool_probe_ms():
    """Pool-load marker: 8 chained 1024^3 bf16 matmuls + fetch (sub-ms on a
    quiet chip, seconds-to-minutes under relay contention). Reported in the
    JSON so a contended capture is self-documenting."""
    import jax
    import jax.numpy as jnp
    x = jnp.ones((1024, 1024), jnp.bfloat16)
    z = x
    for _ in range(8):
        z = z @ x
    t0 = time.time()
    np.asarray(z)[:1, :1]
    return (time.time() - t0) * 1e3


def _resident_rounds(round_fn, rounds=5, spacing_s=3.0):
    """Run `round_fn() -> per-dispatch seconds` several times, spaced out,
    and return (best, all). Contention on the shared pool only ever ADDS
    time — every round ends with a forced host fetch of a result that
    depends on each prior dispatch, so a round cannot finish early — which
    makes MIN the estimator of true device time, with the spread kept for
    the record (memory: best-window value, variance noted)."""
    times = []
    for i in range(rounds):
        times.append(round_fn())
        if i + 1 < rounds:
            time.sleep(spacing_s)
    return float(np.min(times)), times


def make_video(path, n_frames, h, w, phase=0):
    """Synthetic 720p scene with two moving rectangles (keeps the detector
    + tracker busy deterministically). `phase` offsets the motion so the
    multi-stream e2e bench's 16 files hold distinct content."""
    import cv2
    four = cv2.VideoWriter_fourcc(*"mp4v")
    wr = cv2.VideoWriter(path, four, 30, (w, h))
    rng = np.random.RandomState(phase)
    base = rng.randint(0, 80, size=(h, w, 3)).astype(np.uint8)
    for i in range(n_frames):
        f = base.copy()
        x = (40 + phase * 60 + i * 9) % (w - 200)
        y = (30 + phase * 40 + i * 5) % (h - 400)
        f[200:500, x:x + 160] = 230
        f[y:y + 220, 900:1020] = 180
        wr.write(f)
    wr.release()


def _multistream_e2e(eng, fs, n_streams, chunk, enc_cap, depth,
                     total_frames, use_yuv, H, W):
    """Decode->count end-to-end over N REAL mp4 streams (VERDICT r4 #6):
    the native C++ loader decodes one file per stream on its own thread,
    chunks of F frames/stream ship to the device (planar I420 by default),
    and one shard_map dispatch advances all trackers. Publishes the same
    three-term model as the single-stream bench — measured decode ceiling
    (no device work), measured transfer ceiling (put+consume), measured
    device-resident aggregate — so the gap between the e2e value and
    min(decode, transfer, device) is self-documenting. On the shared axon
    pool the tunnel transfer is the wall (aggregate bytes are ~16x the
    single-stream bench's); publish anyway — this row closes BASELINE.json
    config 5 end-to-end. Invoke: bench.py --streams 16 --e2e."""
    import jax
    from deepdish_tpu.utils.native import NativeFrameLoader

    here = os.path.dirname(os.path.abspath(__file__))
    n_video = total_frames + (depth + 1) * chunk
    paths = []
    for s in range(n_streams):
        p = os.path.join(here, f".bench_ms_{s}_{n_video}.mp4")
        if not os.path.exists(p):
            make_video(p, n_video, H, W, phase=s)
        paths.append(p)

    # ---- decode ceiling: drain the loader, no device work ----
    n_probe_chunks = max(2, min(total_frames, 4 * chunk) // chunk)
    t0 = time.time()
    ld = NativeFrameLoader(paths, W, H, yuv420=use_yuv)
    got = 0
    for _ in range(n_probe_chunks):
        _, counts, total = ld.next_chunk(chunk)
        if total == 0:
            break
        got += total
    ld.close()
    decode_only_fps = got / (time.time() - t0)

    loader = NativeFrameLoader(paths, W, H, yuv420=use_yuv)
    step = eng.step_chunk_yuv if use_yuv else eng.step_chunk

    def next_chunk():
        frames, counts, total = loader.next_chunk(chunk)
        if int(counts.min()) < chunk:
            return None         # partial tail: stop (same as 1-stream bench)
        return frames

    # warm-up compile through the persistent-cache jit path
    states = eng.init_states()
    first = next_chunk()
    first_dev = jax.device_put(first, eng._shard)
    t0 = time.time()
    states, outs, snaps = step(states, first_dev)
    jax.block_until_ready(outs.track_id)
    compile_s = time.time() - t0

    # ---- transfer ceiling: raw put+consume of one (S, F, ...) chunk ----
    _consume = jax.jit(lambda x: x.ravel()[::4096].astype(np.float32).sum())
    float(_consume(jax.device_put(first)))
    ttimes = []
    for _ in range(3):
        t0 = time.time()
        float(_consume(jax.device_put(first)))
        ttimes.append(time.time() - t0)
    transfer_ceiling_fps = n_streams * chunk / float(np.median(ttimes))

    # ---- decode -> count loop, depth chunks in flight ----
    states = eng.init_states()
    from collections import deque
    q = deque()
    while len(q) < depth:
        host = next_chunk()
        if host is None:
            break
        q.append(jax.device_put(host, eng._shard))
    times = []
    n_done = 0
    while n_done < total_frames and q:
        t0 = time.time()
        cur = q.popleft()
        host = next_chunk()
        if host is not None:
            q.append(jax.device_put(host, eng._shard))
        states, outs, snaps = step(states, cur)
        _ = np.asarray(outs.track_id)       # forced fetch (relay pitfall)
        times.append(time.time() - t0)
        n_done += chunk
    loader.close()
    med = float(np.median(times))
    fps = n_streams * chunk / med

    # ---- device-resident aggregate on the staged first chunk ----
    reps = 8

    def _round():
        nonlocal states, outs, snaps
        t0 = time.time()
        for _ in range(reps):
            states, outs, snaps = step(states, first_dev)
        _ = np.asarray(outs.track_id)
        return (time.time() - t0) / reps

    best, rtimes = _resident_rounds(_round, rounds=3)
    probe_ms = _pool_probe_ms()
    resident_fps = n_streams * chunk / best

    print(json.dumps({
        "metric": f"multi-stream e2e decode->count aggregate 720p FPS "
                  f"({n_streams} streams, chunk={chunk}/stream"
                  f"{', yuv' if use_yuv else ''}, enc_cap={enc_cap}, "
                  f"depth={depth}, SSD-MobileNet+MARS+DeepSORT, "
                  "native mp4 decode, 1 chip)",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / 1000.0, 3),
        "per_stream_fps": round(chunk / med, 1),
        "decode_only_fps": round(decode_only_fps, 1),
        "transfer_ceiling_fps": round(transfer_ceiling_fps, 1),
        "device_resident_fps": round(resident_fps, 1),
        "e2e_model_fps": round(min(decode_only_fps, transfer_ceiling_fps,
                                   resident_fps), 1),
        "transport": "yuv" if use_yuv else "rgb",
        "compile_s": round(compile_s, 1),
        "cache_hit": compile_s < 30.0,
        "pool_probe_ms": round(probe_ms, 1),
    }))
    print(f"# compile={compile_s:.1f}s frames/stream={n_done} "
          f"chunk_times_s={[round(t, 3) for t in times[:10]]} "
          f"resident_rounds_ms={[round(t * 1e3, 1) for t in rtimes]} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)


def bench_multistream(n_streams: int, chunk: int = 8, enc_cap: int = 8,
                      model=None, quantized=False, encoder="mars",
                      e2e=False, depth=2, total_frames=256, use_yuv=True):
    """BASELINE.json config 5: N concurrent 720p streams on one chip, one
    SPMD dispatch per step (vmapped fused program; the Pallas JV kernel
    batches over streams via its custom_vmap grid rule). Each dispatch
    scans `chunk` frames per stream (--stream-chunk, default 8), so the
    tracker scan's small ops process all streams at once. Reports
    aggregate device-resident FPS. Invoked with --streams N (not the
    driver's default single-stream metric)."""
    import jax
    from deepdish_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from deepdish_tpu import tracker as tt
    from deepdish_tpu.models import create_box_encoder, create_detector
    from deepdish_tpu.parallel import MultiStreamEngine, make_mesh
    from deepdish_tpu.pipeline import FrameStep, FrameStepConfig

    H, W = 720, 1280
    det = create_detector(model or "ssd_mobilenet", max_outputs=32,
                          quantized=quantized)
    enc = create_box_encoder(encoder)
    cfg = tt.TrackerConfig(max_tracks=64, max_detections=32,
                           gallery_size=64, num_labels=4)
    fs = FrameStep(det, enc, cfg, ["person", "car"], (H, W),
                   FrameStepConfig(encode_capacity=enc_cap))
    eng = MultiStreamEngine(fs, n_streams=n_streams, mesh=make_mesh(1))
    states = eng.init_states()

    if e2e:
        return _multistream_e2e(eng, fs, n_streams, chunk, enc_cap, depth,
                                total_frames, use_yuv, H, W)

    rng = np.random.RandomState(0)
    frames = np.zeros((n_streams, chunk, H, W, 3), np.uint8)
    base = rng.randint(0, 80, size=(H, W, 3)).astype(np.uint8)
    for s in range(n_streams):
        for k in range(chunk):
            f = base.copy()
            x = (40 + s * 60 + k * 9) % (W - 200)
            f[200:500, x:x + 160] = 230
            frames[s, k] = f

    # device-resident: stage the frames once (the e2e transfer story is the
    # single-stream bench's job; here we measure aggregate compute)
    frames_dev = jax.device_put(frames, eng._shard)
    jax.block_until_ready(frames_dev)

    t0 = time.time()
    states, outs, snaps = eng.step_chunk(states, frames_dev)
    jax.block_until_ready(outs.track_id)
    compile_s = time.time() - t0

    # Timing: each round issues `reps` dispatches (sequentially dependent
    # through the carried tracker states) and ends with a FORCED HOST FETCH
    # of the last output. On the axon relay, block_until_ready alone can
    # return before remote completion when the dispatch queue absorbs the
    # whole round (docs/BENCH_NOTES.md "relay timing pitfall"); the fetch
    # of a result that depends on every prior dispatch cannot.
    reps = 16

    def _round():
        nonlocal states, outs, snaps
        t0 = time.time()
        for _ in range(reps):
            states, outs, snaps = eng.step_chunk(states, frames_dev)
        _ = np.asarray(outs.track_id)
        return (time.time() - t0) / reps

    med, rtimes = _resident_rounds(_round)
    probe_ms = _pool_probe_ms()
    agg = n_streams * chunk / med
    print(json.dumps({
        "metric": f"multi-stream aggregate 720p FPS ({n_streams} streams, "
                  f"chunk={chunk}/stream, SSD-MobileNet+MARS+DeepSORT, "
                  "device-resident, 1 chip)",
        "value": round(agg, 1),
        "unit": "frames/s",
        "vs_baseline": round(agg / 1000.0, 3),
        "per_stream_fps": round(chunk / med, 1),
        "enc_cap": enc_cap,
        "compile_s": round(compile_s, 1),
        "cache_hit": compile_s < 5.0,
        "lsap_impl": fs.tracker_cfg.lsap_impl,
        "pool_probe_ms": round(probe_ms, 1),
    }))
    print(f"# compile={compile_s:.1f}s step_times_s="
          f"{[round(t, 3) for t in rtimes]} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)


def bench_latency(steps: int = 200, enc_cap: int = 8, model=None,
                  quantized=False, encoder="mars"):
    """Serving-latency mode (--latency): ONE 720p frame per dispatch — the
    live-camera CLI path (pipeline/runtime.py live mode) — with a forced
    host fetch of the track ids every step, so each sample is the full
    frame-in -> counts-out turnaround a real-time caller observes. Reports
    p50/p90/p99 in ms, both device-resident (frame already on device;
    isolates program latency) and e2e (per-step device_put of a fresh
    host frame; on this shared pool the tunnel dominates). The reference
    serves live cameras at 30 FPS/stream (BASELINE.md), i.e. a 33 ms
    budget; p99 <= 33 ms device-resident is the serving bar."""
    import jax
    from deepdish_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from deepdish_tpu import tracker as tt
    from deepdish_tpu.models import create_box_encoder, create_detector
    from deepdish_tpu.pipeline import FrameStep, FrameStepConfig

    H, W = 720, 1280
    det = create_detector(model or "ssd_mobilenet", max_outputs=32,
                          quantized=quantized)
    enc = create_box_encoder(encoder)
    cfg = tt.TrackerConfig(max_tracks=64, max_detections=32,
                           gallery_size=64, num_labels=4)
    fs = FrameStep(det, enc, cfg, ["person", "car"], (H, W),
                   FrameStepConfig(encode_capacity=enc_cap))

    rng = np.random.RandomState(0)
    base = rng.randint(0, 80, size=(H, W, 3)).astype(np.uint8)

    def host_frame(i):
        f = base.copy()
        x = (40 + i * 9) % (W - 200)
        f[200:500, x:x + 160] = 230
        return f

    state = fs.init_state()
    t0 = time.time()
    state, out, snap, raw = fs.step(state, jax.device_put(host_frame(0)))
    _ = np.asarray(out.track_id)
    compile_s = time.time() - t0

    def pcts(ms):
        return {k: round(float(np.percentile(ms, p)), 3)
                for k, p in (("p50", 50), ("p90", 90), ("p99", 99))}

    # device-resident: a small ring of pre-staged frames (distinct content,
    # so the program never sees a constant), per-step forced fetch
    ring = [jax.device_put(host_frame(i)) for i in range(8)]
    jax.block_until_ready(ring[-1])
    res_ms = []
    for i in range(steps):
        t0 = time.time()
        state, out, snap, raw = fs.step(state, ring[i % 8])
        _ = np.asarray(out.track_id)
        res_ms.append((time.time() - t0) * 1e3)
    res = pcts(res_ms)

    # e2e: fresh host frame shipped every step (tunnel-bound on this pool)
    e2e_ms = []
    for i in range(steps):
        t0 = time.time()
        state, out, snap, raw = fs.step(state, jax.device_put(host_frame(i)))
        _ = np.asarray(out.track_id)
        e2e_ms.append((time.time() - t0) * 1e3)
    e2e = pcts(e2e_ms)

    # dispatch-RTT floor: a trivial program + forced fetch, same cadence.
    # On the shared-pool relay this is tens of ms and dominates the
    # single-frame numbers above (chunked dispatch amortizes it 32x);
    # on a local-PJRT production host it is microseconds, so
    # resident_ms - rtt_floor_ms is the portable program latency.
    tiny = jax.jit(lambda x: x + 1)
    small = jax.device_put(np.zeros((8,), np.int32))
    _ = np.asarray(tiny(small))
    rtt_ms = []
    for _ in range(min(steps, 50)):
        t0 = time.time()
        _ = np.asarray(tiny(small))
        rtt_ms.append((time.time() - t0) * 1e3)
    rtt_p50 = round(float(np.percentile(rtt_ms, 50)), 3)

    probe_ms = _pool_probe_ms()
    family = "SSD-MobileNet" + ("-int8" if quantized else "")
    print(json.dumps({
        "metric": f"720p serving latency p50 single-frame dispatch "
                  f"({family}+MARS+DeepSORT fused, enc_cap={enc_cap}, "
                  "device-resident, 1 chip)",
        "value": res["p50"],
        "unit": "ms",
        "vs_baseline": round((1000.0 / res["p50"]) / 1000.0, 3),
        "resident_ms": res,
        "e2e_ms": e2e,
        "rtt_floor_ms_p50": rtt_p50,
        "steps": steps,
        "compile_s": round(compile_s, 1),
        "cache_hit": compile_s < 30.0,
        "pool_probe_ms": round(probe_ms, 1),
    }))
    print(f"# compile={compile_s:.1f}s resident p50/p90/p99="
          f"{res['p50']}/{res['p90']}/{res['p99']} ms  e2e="
          f"{e2e['p50']}/{e2e['p90']}/{e2e['p99']} ms  "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)


def _device_init_watchdog(timeout_s: float = 600.0):
    """The shared-pool tunnel can wedge for hours (jax.devices() never
    returns — observed 02:10-07:00 on 2026-08-18). Normal device
    discovery takes seconds; if it hasn't completed after `timeout_s`,
    emit an explanatory JSON line instead of hanging the driver, and
    exit. Disarmed the moment discovery succeeds, so slow compiles
    (20-800 s on this pool) are unaffected."""
    import threading
    done = threading.Event()

    mode = ("multi-stream aggregate 720p FPS" if "--streams" in sys.argv
            else "720p offline FPS decode->count")

    def watch():
        if not done.wait(timeout_s):
            print(json.dumps({
                "metric": f"{mode} (UNMEASURED)",
                "value": 0.0,
                "unit": "frames/s",
                "vs_baseline": 0.0,
                "error": f"TPU device discovery did not complete in "
                         f"{timeout_s:.0f}s — shared pool wedged; see "
                         "docs/BENCH_NOTES.md for the last measured "
                         "numbers (3181 FPS single-stream, 4198 FPS "
                         "16-stream aggregate)",
            }), flush=True)
            os._exit(3)

    threading.Thread(target=watch, daemon=True).start()
    return done


def main():
    import jax
    watchdog_done = _device_init_watchdog()
    jax.devices()                      # block here, watched
    watchdog_done.set()
    from deepdish_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from deepdish_tpu import tracker as tt
    from deepdish_tpu.models import create_box_encoder, create_detector
    from deepdish_tpu.pipeline import FrameStep, FrameStepConfig

    if "--streams" in sys.argv:
        return bench_multistream(_arg("--streams", 16),
                                 chunk=_arg("--stream-chunk", 8),
                                 enc_cap=_arg("--enc-cap", 8),
                                 model=_arg("--model", None, str),
                                 quantized="--quantized" in sys.argv,
                                 encoder=_arg("--encoder", "mars", str),
                                 e2e="--e2e" in sys.argv,
                                 depth=max(1, _arg("--depth", 2)),
                                 total_frames=_arg("--frames", 256),
                                 use_yuv="--rgb" not in sys.argv)

    if "--latency" in sys.argv:
        return bench_latency(steps=_arg("--steps", 200),
                             enc_cap=_arg("--enc-cap", 8),
                             model=_arg("--model", None, str),
                             quantized="--quantized" in sys.argv,
                             encoder=_arg("--encoder", "mars", str))

    chunk = _arg("--chunk", 32)
    total_frames = _arg("--frames", 640)
    enc_cap = _arg("--enc-cap", 8)
    depth = max(1, _arg("--depth", 2))
    model = _arg("--model", None, str)
    encoder = _arg("--encoder", "mars", str)
    use_yuv = "--rgb" not in sys.argv
    synthetic = "--synthetic" in sys.argv

    H, W = 720, 1280
    # --model takes a weight file (converted through the registry) OR a
    # bare family name (yolov5 / yolov3 / efficientdet / ssd_mobilenet,
    # random-init) so every detector family's throughput is benchable.
    # --quantized runs a full-integer --model artifact on the integer
    # datapath (int8 MXU, models/qgraph.py) instead of dequantized bf16.
    quantized = "--quantized" in sys.argv
    det = create_detector(model or "ssd_mobilenet", max_outputs=32,
                          quantized=quantized)
    fam = (model or "ssd_mobilenet").lower()
    family = ("YOLOv5s" if "yolov5" in fam else
              "YOLOv3" if "yolo" in fam else
              "Faster-RCNN" if ("faster_rcnn" in fam or "frcnn" in fam) else
              "EfficientDet-Lite0" if ("efficientdet" in fam or
                                       ("tflite" in fam and "ssd" not in fam
                                        and "mobilenet" not in fam
                                        and "edgetpu" not in fam)) else
              "SSD-MobileNet")
    enc = create_box_encoder(encoder)
    cfg = tt.TrackerConfig(max_tracks=64, max_detections=32,
                           gallery_size=64, num_labels=4)
    fs = FrameStep(det, enc, cfg, ["person", "car"], (H, W),
                   FrameStepConfig(encode_capacity=enc_cap))

    run = fs.run_chunk_yuv if use_yuv else fs.run_chunk

    stripes = max(1, _arg("--stripes", 4))
    seq_decode = "--seq-decode" in sys.argv

    loader = None
    decode_only_fps = decode_striped_fps = None
    if not synthetic:
        try:
            from deepdish_tpu.utils.native import (NativeFrameLoader,
                                                   StripedFrameLoader)
            # enough frames that EOF doesn't drain the depth-queue before
            # total_frames are measured (file name carries the length so a
            # stale shorter video from an earlier config isn't reused)
            n_video = total_frames + (depth + 1) * chunk
            video = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 f".bench_video_{n_video}.mp4")
            if not os.path.exists(video):
                make_video(video, n_video, H, W)

            # ---- decode ceilings, no device work (VERDICT r4 #1a) ----
            # e2e is min(decode, transfer, device); these two publish the
            # decode term: sequential (the reference's capture-thread
            # model, 1 decoder) and keyframe-striped parallel decode of
            # the SAME single file (native StripedLoader, byte-equal —
            # tests/test_striped_decode.py). Timed from construction so
            # thread spin-up is included.
            n_probe = min(total_frames, 8 * chunk)

            def _drain(mk, get):
                t0 = time.time()
                ld = mk()
                got = 0
                while got < n_probe:
                    g = get(ld)
                    if g == 0:
                        break
                    got += g
                ld.close()
                return got / (time.time() - t0)

            decode_only_fps = _drain(
                lambda: NativeFrameLoader([video], W, H, yuv420=use_yuv),
                lambda ld: ld.next_chunk(chunk)[2])
            decode_striped_fps = _drain(
                lambda: StripedFrameLoader(video, n_workers=stripes,
                                           stripe_len=64, out_w=W, out_h=H,
                                           yuv420=use_yuv),
                lambda ld: ld.next(chunk)[0])

            # ---- the decode->count source: whichever measured faster ----
            # (striping wins on multi-core production hosts / hard codecs;
            # on a 1-core host with an easy codec the per-stripe seek
            # overhead can lose to sequential — both terms are published
            # either way)
            if seq_decode or decode_striped_fps <= decode_only_fps:
                seq_decode = True
                loader = NativeFrameLoader([video], W, H, yuv420=use_yuv)
            else:
                loader = StripedFrameLoader(
                    video, n_workers=stripes, stripe_len=64,
                    out_w=W, out_h=H, yuv420=use_yuv)
        except (RuntimeError, OSError) as e:
            print(f"# native loader unavailable ({e}); falling back to "
                  "synthetic in-memory frames", file=sys.stderr)

    def synth_chunk(i):
        rng = np.random.RandomState(0)
        frames = np.zeros((chunk, H, W, 3), np.uint8)
        base = rng.randint(0, 80, size=(H, W, 3)).astype(np.uint8)
        for j in range(chunk):
            f = base.copy()
            x = (40 + (i * chunk + j) * 24) % (W - 200)
            f[200:500, x:x + 160] = 230
            frames[j] = f
        if use_yuv:
            import cv2
            frames = np.stack([
                cv2.cvtColor(cv2.cvtColor(f, cv2.COLOR_RGB2BGR),
                             cv2.COLOR_BGR2YUV_I420) for f in frames])
        return frames

    def next_chunk(i):
        if loader is None:
            return synth_chunk(i) if i * chunk < total_frames else None
        frames, counts, total = loader.next_chunk(chunk)
        if total < chunk:
            return None          # partial tails go through the 1-frame path
        return frames[0]

    # warm-up compile through the regular jit path: on this pool the
    # compile step runs on the REMOTE compiler (minutes, queue-dependent)
    # but the persistent cache covers it, so an unchanged program's rerun
    # is a cache hit. Do NOT switch this to lower().compile() — the AOT
    # path bypasses the persistent compilation cache entirely (measured:
    # 187 s recompile of a program whose cache entry existed).
    state = fs.init_state()
    first = next_chunk(0)
    first_dev = jax.device_put(first)
    t0 = time.time()
    state, outs, snaps = run(state, first_dev)
    jax.block_until_ready(outs.track_id)
    compile_s = time.time() - t0

    # measured transfer ceiling for THIS run: raw put+consume of one chunk
    # over the tunnel (the e2e wall on this shared pool; the JSON reports
    # it so the fps-vs-ceiling gap is self-documenting)
    _consume = jax.jit(lambda x: x.ravel()[:: 4096].astype(np.float32).sum())
    float(_consume(jax.device_put(first)))          # compile the consumer
    ttimes = []
    for _ in range(5):
        t0 = time.time()
        float(_consume(jax.device_put(first)))
        ttimes.append(time.time() - t0)
    transfer_ceiling_fps = chunk / float(np.median(ttimes))

    # ---- decode -> count loop ----
    # The axon TPU tunnel is a shared pool with highly variable queueing,
    # so report the MEDIAN per-chunk time. `depth` chunks are kept in
    # flight so the next transfers overlap device compute.
    state = fs.init_state()
    times = []
    overflow = 0
    n_done = 0
    from collections import deque
    q = deque()
    i = 0
    while len(q) < depth:
        host = next_chunk(i)
        i += 1
        if host is None:
            break
        q.append(jax.device_put(host))
    while n_done < total_frames and q:
        t0 = time.time()
        cur = q.popleft()
        host = next_chunk(i)
        i += 1
        if host is not None:
            q.append(jax.device_put(host))
        state, outs, snaps = run(state, cur)
        # host reads, like the pipeline; the fetch is also what
        # synchronizes (block_until_ready alone is not trustworthy on the
        # relay — docs/BENCH_NOTES.md)
        ids = np.asarray(outs.track_id)
        valid = np.asarray(snaps.valid)
        times.append(time.time() - t0)
        if enc_cap:
            overflow += int(valid[:, enc_cap:].sum())
        n_done += chunk
    if loader is not None:
        loader.close()
    med = float(np.median(times))
    fps = chunk / med

    # device-resident compute throughput (excludes decode + the tunnel
    # transfer, which on this shared pool caps fresh-data delivery).
    # Pipelined timing: issue several dispatches back-to-back and block
    # once — per-dispatch tunnel/queue latency amortizes exactly as it does
    # in the steady-state pipeline, leaving pure device time.
    # Each round's dispatches are sequentially dependent through `state`,
    # and the round ends with a forced host fetch: block_until_ready alone
    # can return early on the axon relay when its dispatch queue absorbs a
    # short round (docs/BENCH_NOTES.md "relay timing pitfall").
    resident = jax.device_put(first)
    jax.block_until_ready(resident)
    reps = 16

    def _round():
        nonlocal state, outs, snaps
        t0 = time.time()
        for _ in range(reps):
            state, outs, snaps = run(state, resident)
        _ = np.asarray(outs.track_id)
        return (time.time() - t0) / reps

    best, rtimes = _resident_rounds(_round)
    probe_ms = _pool_probe_ms()
    resident_fps = chunk / best

    src = ("synthetic" if loader is None else
           "mp4-native-decode" if seq_decode else
           f"mp4-striped-decode-x{stripes}")
    if model:
        src += f", weights={os.path.basename(model)}"
    if quantized:
        family += "-int8"
    enc_label = "MARS" if encoder == "mars" else encoder
    print(json.dumps({
        "metric": f"720p offline FPS decode->count ({family}+{enc_label}+"
                  f"DeepSORT fused, chunk={chunk}"
                  f"{', yuv' if use_yuv else ''}, enc_cap={enc_cap}, "
                  f"depth={depth}, src={src}, 1 chip)",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / 1000.0, 3),
        # CANONICAL headline: device_resident_fps on the transport named
        # below. README/BENCH_NOTES quote this same figure; the RGB-path
        # number (--rgb) is always labeled as such where mentioned.
        "device_resident_fps": round(resident_fps, 1),
        "transport": "yuv" if use_yuv else "rgb",
        "transfer_ceiling_fps": round(transfer_ceiling_fps, 1),
        # the three-term e2e model (VERDICT r4 #1c): measured decode
        # ceiling (sequential AND keyframe-striped single-file parallel),
        # measured transfer ceiling, measured device-resident compute —
        # e2e_model_fps = min of the three terms actually in the path
        "decode_only_fps": (None if decode_only_fps is None
                            else round(decode_only_fps, 1)),
        "decode_striped_fps": (None if decode_striped_fps is None
                               else round(decode_striped_fps, 1)),
        "decode_stripes": stripes if not seq_decode else 1,
        "e2e_model_fps": (None if decode_only_fps is None else round(min(
            decode_only_fps if seq_decode else decode_striped_fps,
            transfer_ceiling_fps, resident_fps), 1)),
        "compile_s": round(compile_s, 1),
        "cache_hit": compile_s < 30.0,
        "encode_overflow_dets": overflow,
        "pool_probe_ms": round(probe_ms, 1),
    }))
    print(f"# compile={compile_s:.1f}s frames={n_done} "
          f"chunk_times_s={[round(t, 3) for t in times[:12]]} "
          f"resident_rounds_ms_per_frame="
          f"{[round(t / chunk * 1e3, 3) for t in rtimes]} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)


if __name__ == "__main__":
    main()
