#!/usr/bin/env python3
"""Cold-start mitigation probe: serialized compiled executables
(VERDICT r3 next #8).

On this pool the first execution of a program in a fresh process pays a
server-side compile (9-800 s depending on pool load,
docs/BENCH_NOTES.md), which the jax persistent cache cannot skip (it only
caches CLIENT-side XLA work). This probe measures whether
jax.experimental.serialize_executable lets a fresh process skip that tax:

  --save  : compile the fused FrameStep chunk program AOT, serialize the
            compiled executable to /tmp/dd_exec.bin, report compile time
  --load  : fresh process — deserialize + run one chunk, report
            time-to-first-result
  --fresh : fresh process — plain jit path (persistent cache active),
            report time-to-first-result (the baseline the load path must
            beat)

Run: save once, then load and fresh in fresh processes, compare.
"""
import pickle
import sys
import time

import numpy as np

MODE = sys.argv[1] if len(sys.argv) > 1 else "--fresh"
PATH = "/tmp/dd_exec.bin"
H, W, CHUNK = 720, 1280, 32


def build():
    import jax
    from deepdish_tpu import tracker as tt
    from deepdish_tpu.models import create_box_encoder, create_detector
    from deepdish_tpu.pipeline import FrameStep, FrameStepConfig
    det = create_detector("ssd_mobilenet", max_outputs=32)
    enc = create_box_encoder("mars")
    cfg = tt.TrackerConfig(max_tracks=64, max_detections=32,
                           gallery_size=64, num_labels=4)
    fs = FrameStep(det, enc, cfg, ["person", "car"], (H, W),
                   FrameStepConfig(encode_capacity=8))
    frames = np.random.RandomState(0).randint(
        0, 255, (CHUNK, H, W, 3)).astype(np.uint8)
    return fs, fs.init_state(), jax.device_put(frames)


def main():
    import jax
    t_start = time.time()
    jax.devices()
    print(f"device discovery: {time.time()-t_start:.1f}s", flush=True)

    if MODE == "--save":
        from jax.experimental.serialize_executable import serialize
        fs, state, frames = build()
        t0 = time.time()
        lowered = jax.jit(fs._run_chunk).lower(fs._params, state, frames)
        compiled = lowered.compile()
        print(f"AOT lower+compile: {time.time()-t0:.1f}s", flush=True)
        payload, in_tree, out_tree = serialize(compiled)
        with open(PATH, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        print(f"serialized {len(payload)/1e6:.1f} MB -> {PATH}", flush=True)
        t0 = time.time()
        out = compiled(fs._params, state, frames)
        np.asarray(jax.tree.leaves(out)[1].ravel()[:1])
        print(f"first run (same process): {time.time()-t0:.1f}s",
              flush=True)
        return

    if MODE == "--load":
        from jax.experimental.serialize_executable import \
            deserialize_and_load
        t_all = time.time()
        with open(PATH, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        t0 = time.time()
        compiled = deserialize_and_load(payload, in_tree, out_tree)
        print(f"deserialize_and_load: {time.time()-t0:.1f}s", flush=True)
        fs, state, frames = build()
        t0 = time.time()
        out = compiled(fs._params, state, frames)
        np.asarray(jax.tree.leaves(out)[1].ravel()[:1])
        print(f"first run: {time.time()-t0:.1f}s", flush=True)
        print(f"TOTAL time-to-first-result: {time.time()-t_all:.1f}s",
              flush=True)
        return

    # --fresh: the plain jit path with the persistent cache
    from deepdish_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    t_all = time.time()
    fs, state, frames = build()
    t0 = time.time()
    state, outs, snaps = fs.run_chunk(state, frames)
    np.asarray(outs.track_id.ravel()[:1])
    print(f"jit first run: {time.time()-t0:.1f}s", flush=True)
    print(f"TOTAL time-to-first-result: {time.time()-t_all:.1f}s",
          flush=True)


if __name__ == "__main__":
    main()
