"""Component-level device-time breakdown of the fused chunk program.

Times, on the real TPU (medians over repeats, device-resident inputs):
  resize+detect+NMS only / +crop / +crop+MARS / tracker-scan only / full.

Usage: python tools_profile_components.py [--chunk 32] [--reps 7]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import med_time


def main():
    import jax
    import jax.numpy as jnp
    from deepdish_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from deepdish_tpu import tracker as tt
    from deepdish_tpu.models import create_box_encoder, create_detector
    from deepdish_tpu.pipeline import FrameStep

    chunk = int(sys.argv[sys.argv.index("--chunk") + 1]) \
        if "--chunk" in sys.argv else 32
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) \
        if "--reps" in sys.argv else 32

    H, W = 720, 1280
    det = create_detector("ssd_mobilenet", max_outputs=32)
    enc = create_box_encoder("mars")
    cfg = tt.TrackerConfig(max_tracks=64, max_detections=32,
                           gallery_size=64, num_labels=4)
    fs = FrameStep(det, enc, cfg, ["person", "car"], (H, W))

    rng = np.random.RandomState(0)
    frames_np = np.zeros((chunk, H, W, 3), np.uint8)
    base = rng.randint(0, 80, size=(H, W, 3)).astype(np.uint8)
    for i in range(chunk):
        f = base.copy()
        x = (40 + i * 24) % (W - 200)
        f[200:500, x:x + 160] = 230
        frames_np[i] = f
    frames = jax.device_put(frames_np)
    jax.block_until_ready(frames)
    params = fs._params
    state = fs.init_state()

    # --- stage programs ---
    @jax.jit
    def detect_nms(params, frames):
        def one(frame):
            raw = fs._detect_raw(params, frame)
            return fs._filter_and_nms(None, *raw)
        return jax.vmap(one)(frames)

    @jax.jit
    def detect_raw_only(params, frames):
        return jax.vmap(lambda f: fs._detect_raw(params, f))(frames)

    @jax.jit
    def resize_only(frames):
        from deepdish_tpu.models.preprocess import resize_bilinear_mxu
        return jax.vmap(lambda f: resize_bilinear_mxu(
            f, det.height, det.width))(frames)

    @jax.jit
    def crop_only(params, frames, snaps):
        from deepdish_tpu.models.preprocess import crop_resize_patches_mxu
        def one(frame, tlwh, valid):
            return crop_resize_patches_mxu(frame, tlwh, valid,
                                           enc.height, enc.width)
        return jax.vmap(one)(frames, snaps.tlwh, snaps.valid)

    @jax.jit
    def crop_mars(params, frames, snaps):
        def one(frame, tlwh, valid):
            return enc.encode_boxes(frame, tlwh, valid, params.get("enc"))
        return jax.vmap(one)(frames, snaps.tlwh, snaps.valid)

    @jax.jit
    def mars_only(params, patches):
        # patches: (F, D, h, w, 3) -> one big batch
        F, D = patches.shape[0], patches.shape[1]
        flat = patches.reshape((F * D,) + patches.shape[2:])
        return enc.apply(flat, params.get("enc"))

    @jax.jit
    def tracker_scan(table, dets):
        def body(tbl, det):
            tbl, out = tt.step(cfg, tbl, det)
            return tbl, out
        return jax.lax.scan(body, table, dets)

    @jax.jit
    def full(params, state, frames):
        return fs._run_chunk(params, state, frames)

    t_resize, _ = med_time(resize_only, frames, reps=reps)
    t_detraw, _ = med_time(detect_raw_only, params, frames, reps=reps)
    t_det, snaps = med_time(detect_nms, params, frames, reps=reps)
    t_crop, (patches, _) = med_time(crop_only, params, frames, snaps,
                                    reps=reps)
    t_mars, _ = med_time(mars_only, params, patches, reps=reps)
    t_cm, feats = med_time(crop_mars, params, frames, snaps, reps=reps)

    D = cfg.max_detections
    dets = tt.Detections(
        tlwh=snaps.tlwh, confidence=snaps.score, label=snaps.label,
        feature=feats[0], valid=snaps.valid)
    t_trk, _ = med_time(tracker_scan, state.table, dets, reps=reps)
    t_full, _ = med_time(full, params, state, frames, reps=reps)

    ms = lambda t: round(1000 * t / chunk, 3)
    print(f"chunk={chunk} per-frame ms (median of {reps}):")
    print(f"  resize-only           {ms(t_resize)}")
    print(f"  detector raw (incl resize) {ms(t_detraw)}")
    print(f"  det+filter+NMS        {ms(t_det)}")
    print(f"  crop-only             {ms(t_crop)}")
    print(f"  MARS fwd (F*D batch)  {ms(t_mars)}")
    print(f"  crop+MARS (per-frame vmap) {ms(t_cm)}")
    print(f"  tracker scan          {ms(t_trk)}")
    print(f"  FULL fused            {ms(t_full)}  "
          f"(= {round(chunk / t_full, 1)} FPS)")


if __name__ == "__main__":
    main()
