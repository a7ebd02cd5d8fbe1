"""Full pipeline e2e with the REAL fused device program (no scripted
detector): random-init SSD-MobileNet + MARS through `amain`, exercising both
the per-frame `FrameStep.step` path and the chunked `FrameStep.run_chunk`
path inside the running pipeline (VERDICT round-1 item #5 — the reference's
run.sh-as-integration-test analog, SURVEY.md §4.4).

With random-init weights the detector produces no confident detections, so
the assertions target completion, log schema, tracker-table invariants and
that the genuine fused program (detector forward + NMS + crop/embed +
tracker) actually executed.
"""
import json

import cv2
import numpy as np
import pytest

from deepdish_tpu.pipeline.framestep import FrameStep
from deepdish_tpu.pipeline.main import amain

W, H, FRAMES = 160, 120, 10


def make_video(path):
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*'mp4v'), 15,
                         (W, H))
    rng = np.random.RandomState(0)
    for i in range(FRAMES):
        frame = rng.randint(0, 255, (H, W, 3), np.uint8)
        cv2.rectangle(frame, (20 + 8 * i, 40), (60 + 8 * i, 100),
                      (10, 200, 30), -1)
        vw.write(frame)
    vw.release()


COMMON = [
    "--wanted-labels", "person", "--model", "ssd_mobilenet",
    "--encoder-model", "mars",
    "--max-detections", "4", "--max-tracks", "8", "--gallery-size", "8",
    "--encode-capacity", "2", "--max-age", "5",
    "--disable-background-subtraction", "--disable-graphics",
    "--streaming-port", "0", "--control-port", "0", "--device", "cpu",
]


@pytest.mark.timeout(900)
@pytest.mark.parametrize("chunk", [1, 4])
def test_real_fused_program_e2e(tmp_path, monkeypatch, chunk):
    import asyncio

    video = tmp_path / "synth.mp4"
    log = tmp_path / "events.log"
    make_video(video)

    calls = {"step": 0, "chunk": 0}
    orig_step = FrameStep.step
    orig_chunk = FrameStep.run_chunk
    orig_chunk_yuv = FrameStep.run_chunk_yuv
    captured = {}

    def spy_step(self, state, frame):
        calls["step"] += 1
        out = orig_step(self, state, frame)
        captured["table"] = out[0].table
        captured["cfg"] = self.tracker_cfg
        return out

    def make_spy_chunk(orig):
        def spy(self, state, frames):
            calls["chunk"] += 1
            out = orig(self, state, frames)
            captured["table"] = out[0].table
            captured["cfg"] = self.tracker_cfg
            return out
        return spy

    monkeypatch.setattr(FrameStep, "step", spy_step)
    monkeypatch.setattr(FrameStep, "run_chunk", make_spy_chunk(orig_chunk))
    monkeypatch.setattr(FrameStep, "run_chunk_yuv",
                        make_spy_chunk(orig_chunk_yuv))

    asyncio.run(amain([
        "--input", str(video), "--log", str(log),
        "--chunk-size", str(chunk), *COMMON,
    ]))

    # the real fused program ran inside the pipeline
    if chunk == 1:
        assert calls["step"] >= FRAMES
    else:
        assert calls["chunk"] >= 1

    # log written with the reference payload schema (heartbeat/final line)
    lines = [json.loads(line) for line in open(log)]
    assert lines
    last = lines[-1]
    for key in ("poscount_person", "negcount_person", "intcount_person",
                "delcount_person", "diff_person"):
        assert key in last, f"missing {key} in log payload"

    # tracker-table invariants after the run
    table = captured["table"]
    cfg = captured["cfg"]
    state = np.asarray(table.state)
    assert state.shape == (cfg.max_tracks,)
    assert set(np.unique(state)).issubset({0, 1, 2, 3})
    hits = np.asarray(table.hits)
    active = state > 0
    assert np.all(hits[active] >= 1)
    assert np.all(np.isfinite(np.asarray(table.mean)[active]))
    gsz = np.asarray(table.gallery_count)
    assert np.all(gsz >= 0) and np.all(gsz <= cfg.gallery_size)
