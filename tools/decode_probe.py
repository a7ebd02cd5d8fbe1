"""Decode-ceiling probe: sequential vs keyframe-striped single-file decode.

The offline decode->count north star is e2e = min(decode, transfer,
device). This tool measures the DECODE term on the current host as a
stripe-count scaling curve: the native sequential loader (the reference's
capture-thread model, deepdish.py:79-129 — one decoder, ~1 core) against
the striped parallel decoder (native/frameloader.cpp StripedLoader, K
decoder threads over interleaved frame stripes of one file, byte-equal
output — tests/test_striped_decode.py).

On this repo's 1-core bench host the curve is flat-to-negative (striping
adds per-stripe seek work that a single core must also absorb); like
tools/coldstart_probe.py, the tool exists to characterize PRODUCTION
hosts, where K cores give ~K x single-file decode and the published
~85-300 FPS/core mp4 ceiling stops binding the north star.

    python tools/decode_probe.py [--video F] [--frames N] [--yuv]
                                 [--stripes 1,2,4,8] [--stripe-len 64]

Prints one JSON line: {"decode_only_fps": ..., "striped": {K: fps},
"host_cores": N, ...}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _make_video(path, n, h, w):
    import cv2
    rng = np.random.RandomState(0)
    base = rng.randint(0, 80, size=(h, w, 3)).astype(np.uint8)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    for i in range(n):
        f = base.copy()
        x = (40 + i * 24) % (w - 200)
        f[h // 4:3 * h // 4, x:x + 160] = 230
        vw.write(f)
    vw.release()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--video", default=None,
                    help="mp4 to probe (default: synthesize 720p)")
    ap.add_argument("--frames", type=int, default=256,
                    help="frames to drain per leg")
    ap.add_argument("--yuv", action="store_true",
                    help="planar I420 output (the bench transport)")
    ap.add_argument("--stripes", default="1,2,4,8")
    ap.add_argument("--stripe-len", type=int, default=64)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    args = ap.parse_args(argv)

    from deepdish_tpu.utils.native import (NativeFrameLoader,
                                           StripedFrameLoader)

    video = args.video
    if video is None:
        video = f".decode_probe_{args.frames}.mp4"
        if not os.path.exists(video):
            _make_video(video, args.frames + 16, args.height, args.width)

    n = args.frames
    W, H = args.width, args.height

    def drain(mk, get):
        t0 = time.time()
        ld = mk()
        got = 0
        while got < n:
            g = get(ld)
            if g == 0:
                break
            got += g
        ld.close()
        return got / (time.time() - t0)

    seq = drain(lambda: NativeFrameLoader([video], W, H, yuv420=args.yuv),
                lambda ld: ld.next_chunk(32)[2])
    curve = {}
    for k in (int(x) for x in args.stripes.split(",")):
        curve[k] = round(drain(
            lambda: StripedFrameLoader(video, n_workers=k,
                                       stripe_len=args.stripe_len,
                                       out_w=W, out_h=H, yuv420=args.yuv),
            lambda ld: ld.next(32)[0]), 1)

    print(json.dumps({
        "video": os.path.basename(video), "frames": n,
        "transport": "yuv" if args.yuv else "rgb",
        "stripe_len": args.stripe_len,
        "decode_only_fps": round(seq, 1),
        "striped_fps_by_workers": curve,
        "host_cores": os.cpu_count(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
