"""MOT batch feature-extraction tool test on a synthetic sequence."""
import os

import cv2
import numpy as np

from deepdish_tpu.tools.mot_features import main as mot_main


def test_mot_tool(tmp_path):
    seq = tmp_path / "mot" / "SEQ-01"
    (seq / "img1").mkdir(parents=True)
    (seq / "det").mkdir(parents=True)
    rng = np.random.RandomState(0)
    dets = []
    for f in range(1, 4):
        img = rng.randint(0, 255, size=(120, 160, 3)).astype(np.uint8)
        cv2.imwrite(str(seq / "img1" / f"{f:06d}.jpg"), img)
        # det.txt rows: frame, id, x, y, w, h, conf, -1, -1, -1
        dets.append([f, -1, 10 + f, 20, 30, 60, 0.9, -1, -1, -1])
        dets.append([f, -1, 80, 30, 25, 50, 0.8, -1, -1, -1])
    np.savetxt(str(seq / "det" / "det.txt"), np.array(dets), delimiter=",")

    out = tmp_path / "out"
    mot_main(["--mot_dir", str(tmp_path / "mot"), "--output_dir", str(out),
              "--model", "dummy", "--device", "cpu"])
    arr = np.load(str(out / "SEQ-01.npy"))
    assert arr.shape == (6, 10 + 128)
    # features are unit-norm (dummy encoder semantics)
    np.testing.assert_allclose(np.linalg.norm(arr[:, 10:], axis=1), 1.0,
                               atol=1e-4)
