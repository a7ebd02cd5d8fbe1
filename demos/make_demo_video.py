#!/usr/bin/env python3
"""Synthesize a demo mp4 of moving objects crossing the countline (used by
the demo scripts since no real footage ships with this repo)."""
import sys
import cv2
import numpy as np

out = sys.argv[1] if len(sys.argv) > 1 else "demo.mp4"
W, H, N = 1280, 720, 120
vw = cv2.VideoWriter(out, cv2.VideoWriter_fourcc(*"mp4v"), 30, (W, H))
rng = np.random.RandomState(0)
bg = rng.randint(30, 70, size=(H, W, 3)).astype(np.uint8)
for i in range(N):
    f = bg.copy()
    x1 = 40 + i * 12
    cv2.rectangle(f, (x1, 200), (x1 + 70, 420), (230, 230, 230), -1)
    x2 = W - 120 - i * 9
    cv2.rectangle(f, (x2, 380), (x2 + 90, 560), (200, 180, 240), -1)
    vw.write(f)
vw.release()
print(f"wrote {out}")
