"""Full-pipeline crossing-count parity against the ACTUAL reference app.

The BASELINE.md north star is "crossing counts identical to the CPU
reference on demo videos". This test runs /root/reference/deepdish.py's
real Pipeline — capture thread, 5-stage asyncio pipeline, deep_sort,
counting, JSON log — end to end on a synthetic demo video, and runs our
pipeline (python -m deepdish_tpu.pipeline.main path) on the same video,
with an identical scripted detector (pixel thresholding, so both sides
compute detections from the same decoded frames) and the reference's own
'constant' encoder backend on both sides. Final
poscount/negcount/intcount/delcount must agree exactly.

The reference imports quart/gmqtt/uvloop/hypercorn/cameratransform
unconditionally (deepdish.py:50,61,64,68-70); tests/refstubs provides
import-only stubs since none of that machinery runs here.
"""
import asyncio
import importlib.util
import json
import os
import sys

import cv2
import numpy as np
import pytest

REF = "/root/reference"
STUBS = os.path.join(os.path.dirname(__file__), "refstubs")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available")

W, H, FRAMES = 320, 240, 95
MAX_AGE = 12


# ---------------------------------------------------------------- scene
def _rects(i):
    """Three non-overlapping rectangles; bottom-centres cross x=160:
    A left->right (~frame 24), B right->left (~frame 30), C appears at
    frame 20, crosses (~frame 36) and vanishes at frame 60 so its track
    dies mid-run (delcount path, deepdish.py:1040-1044)."""
    out = []
    out.append((20 + 5 * i, 20, 36, 50))           # A
    out.append((290 - 5 * i, 90, 36, 60))          # B
    if 20 <= i < 60:
        out.append((60 + 5 * (i - 20), 170, 36, 50))  # C
    return out


def make_video(path):
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 15,
                         (W, H))
    for i in range(FRAMES):
        frame = np.full((H, W, 3), 30, np.uint8)
        for (x, y, w, h) in _rects(i):
            x0, x1 = max(x, 0), min(x + w, W)
            if x1 > x0:
                frame[y:y + h, x0:x1] = 255
        vw.write(frame)
    vw.release()


def script_boxes(img):
    """Shared scripted 'detector': channel-order-invariant thresholding +
    connected components. Both pipelines call this on the same decoded
    frame, so the raw detections are bit-identical on both sides."""
    arr = np.asarray(img)
    gray = arr[:, :, :3].max(axis=2) if arr.ndim == 3 else arr
    mask = (gray > 140).astype(np.uint8)
    n, _lbl, stats, _c = cv2.connectedComponentsWithStats(mask, 8)
    comps = [tuple(int(v) for v in stats[k][:4])
             for k in range(1, n) if stats[k][4] >= 60]
    comps.sort()
    boxes = [[float(x), float(y), float(w), float(h)]
             for (x, y, w, h) in comps]
    return boxes, ["person"] * len(boxes), [0.9] * len(boxes)


# ------------------------------------------------------- reference side
class _ScriptedRefDetector:
    """Duck-typed like the reference adaptors (tools/ssd_mobilenet.py:
    182-213): detect_image(PIL) -> (tlwh, names, scores) incl. the
    wanted-labels + score-threshold filter the adaptor applies."""

    def __init__(self, wanted_labels=None, model_file=None, label_file=None,
                 num_threads=None, edgetpu=False):
        self.wanted_labels = wanted_labels or ["person"]
        self.labels = {1: "person"}
        self.width, self.height = W, H
        self.use_edgetpu = False
        self.num_threads = num_threads

    def detect_image(self, img):
        boxes, names, scores = script_boxes(img)
        rb, rl, rs = [], [], []
        for b, l, s in zip(boxes, names, scores):
            if l in self.wanted_labels and s >= 0.5:
                rb.append(b)
                rl.append(l)
                rs.append(s)
        return rb, rl, rs


def _load_ref_deepdish():
    if not hasattr(np, "float"):
        np.float = float
    if not hasattr(np, "int"):
        np.int = int
    for p in (REF, STUBS):
        if p not in sys.path:
            sys.path.insert(0, p)
    if "refdeepdish" in sys.modules:
        return sys.modules["refdeepdish"]
    spec = importlib.util.spec_from_file_location(
        "refdeepdish", os.path.join(REF, "deepdish.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refdeepdish"] = mod
    spec.loader.exec_module(mod)
    return mod


def _run_reference(video, logfile, tmp_path, bgsub=False):
    mod = _load_ref_deepdish()
    mod.SSD_MOBILENET = _ScriptedRefDetector
    # the reference formats CPU temp unconditionally (deepdish.py:250,1284)
    # and this host has no /sys/class/thermal — feed it a fake sysfs file
    temp_file = tmp_path / "temp"
    temp_file.write_text("45000\n")
    argv = ["deepdish.py", "--input", str(video),
            "--model", "mobilenet-scripted",
            "--encoder-model", "constant.pb",
            "--disable-graphics",
            "--max-age", str(MAX_AGE), "--log", str(logfile),
            "--wanted-labels", "person",
            "--cpu-temp-file", str(temp_file)]
    if not bgsub:
        argv.append("--disable-background-subtraction")
    old_argv = sys.argv
    sys.argv = argv
    try:
        args = mod.get_arguments()
    finally:
        sys.argv = old_argv

    async def run():
        mod.shutdown_event = asyncio.Event()
        p = mod.Pipeline(args)
        # main() (deepdish.py:1562) starts the heartbeat alongside start();
        # it writes one log line immediately, as ours does
        hb = asyncio.ensure_future(p.periodic_heartbeat())
        try:
            await asyncio.wait_for(p.start(), timeout=420)
        finally:
            hb.cancel()
        return p

    return asyncio.run(run())


# ------------------------------------------------------------ our side
def _run_ours(video, logfile, monkeypatch, bgsub=False):
    from deepdish_tpu.models.registry import register_script
    from deepdish_tpu.pipeline import main as our_main

    register_script("parity", script_boxes)
    argv = ["--input", str(video), "--model", "scripted:parity",
            "--encoder-model", "constant.pb",
            "--disable-graphics",
            "--max-age", str(MAX_AGE), "--log", str(logfile),
            "--wanted-labels", "person", "--chunk-size", "1"]
    if not bgsub:
        argv.append("--disable-background-subtraction")

    captured = []
    # amain imports Pipeline from .runtime at call time (after the
    # platform override), so the capture seam lives on the runtime module
    from deepdish_tpu.pipeline import runtime as our_runtime
    real_pipeline = our_runtime.Pipeline

    def capture(args):
        p = real_pipeline(args)
        captured.append(p)
        return p

    monkeypatch.setattr(our_runtime, "Pipeline", capture)

    async def run():
        await asyncio.wait_for(our_main.amain(argv), timeout=420)

    asyncio.run(run())
    return captured[0]


@pytest.mark.timeout(900)
def test_crossing_counts_match_reference_pipeline(tmp_path, monkeypatch):
    video = tmp_path / "demo.mp4"
    make_video(video)

    ref_log = tmp_path / "ref.log"
    our_log = tmp_path / "ours.log"

    ref_pipeline = _run_reference(video, ref_log, tmp_path)
    our_pipeline = _run_ours(video, our_log, monkeypatch)

    # final in-memory counter state from both pipeline objects. (The JSON
    # log lags: lines are appended only on crossing events, and the
    # delcount bumps happen after the last crossing.)
    ref_counts = {
        "poscount": ref_pipeline.poscount["person"],
        "negcount": ref_pipeline.negcount["person"],
        "intcount": ref_pipeline.intcount["person"],
        "delcount": ref_pipeline.delcount["person"],
    }
    our_counts = {
        "poscount": our_pipeline.counting.poscount["person"],
        "negcount": our_pipeline.counting.negcount["person"],
        "intcount": our_pipeline.counting.intcount["person"],
        "delcount": our_pipeline.counting.delcount["person"],
    }
    # the scene produces real crossings — guard against a vacuous pass
    assert ref_counts["intcount"] >= 3, ref_counts
    assert ref_counts["delcount"] >= 1, ref_counts
    assert our_counts == ref_counts

    # Crossing-event sequences agree too: one log line per crossing with
    # the running counter state (deepdish.py:1161-1166). The exact FRAME a
    # crossing is attributed to is NOT comparable: the reference's
    # process_results iterates the live self.tracker.tracks object while
    # track_objects concurrently advances it (the pipelining race the
    # reference itself documents at deepdish.py:539-543), so its crossing
    # frames shift run-to-run (observed: 23/26/33 vs 26/31/37 on identical
    # input). Our per-frame device snapshots make the same attribution
    # deterministic. Totals and the pos/neg event order are stable in both.
    def kind_sequence(logfile):
        out, prev = [], None
        with open(logfile) as f:
            for l in f:
                if not l.strip():
                    continue
                d = json.loads(l)
                cur = (d["poscount_person"], d["negcount_person"])
                if prev is not None and cur != prev:
                    out.append("pos" if cur[0] > prev[0] else "neg")
                prev = cur
        return out

    ours_kinds = kind_sequence(our_log)
    ref_kinds = kind_sequence(ref_log)
    assert len(ours_kinds) >= 3
    assert ours_kinds == ref_kinds


# --------------------------------------- bgsub-enabled parity (round 3)
FRAMES_BG = 100


def _rects_bg(i):
    """Scene where the motion-ratio filter DECIDES the counts
    (deepdish.py:957): A and B cross fast (kept — they move over freshly
    learned background, ratio ~1). S sits static for 60 frames (learned as
    background, ratio ~0 -> dropped), then slides right at 4 px/frame: its
    bottom-centre crosses x=160 at frame ~65 while its foreground ratio is
    still ~moved/width = 4*(i-60)/120 < 0.25, so BOTH pipelines must drop
    it until after the line is passed — the filter eats S's crossing.
    Without background subtraction S would be counted (int would be 3)."""
    out = []
    out.append((20 + 6 * i, 20, 36, 50))            # A -> pos (~frame 20)
    out.append((290 - 5 * i, 90, 36, 55))           # B -> neg (~frame 30)
    s_x = 80 if i < 60 else 80 + 4 * (i - 60)
    out.append((s_x, 170, 120, 60))                 # S: crossing is eaten
    return out


def make_video_bg(path):
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 15,
                         (W, H))
    for i in range(FRAMES_BG):
        frame = np.full((H, W, 3), 30, np.uint8)
        for (x, y, w, h) in _rects_bg(i):
            x0, x1 = max(x, 0), min(x + w, W)
            if x1 > x0:
                frame[y:y + h, x0:x1] = 255
        vw.write(frame)
    vw.release()


@pytest.mark.timeout(900)
def test_counts_match_reference_with_bgsub_enabled(tmp_path, monkeypatch):
    """Crossing-count parity with background subtraction ON on both sides
    (VERDICT r2 missing #3): the reference runs cv2's MOG2, we run the
    in-jit GMM (byte-exact with cv2 since round 3 — see test_bgsub), and
    the motion-ratio filter's accept/reject decisions must produce the
    same counts on a scene where they change the outcome."""
    video = tmp_path / "bgdemo.mp4"
    make_video_bg(video)

    ref_log = tmp_path / "ref.log"
    our_log = tmp_path / "ours.log"
    ref_pipeline = _run_reference(video, ref_log, tmp_path, bgsub=True)
    our_pipeline = _run_ours(video, our_log, monkeypatch, bgsub=True)

    ref_counts = {k: getattr(ref_pipeline, k)["person"]
                  for k in ("poscount", "negcount", "intcount", "delcount")}
    our_counts = {
        "poscount": our_pipeline.counting.poscount["person"],
        "negcount": our_pipeline.counting.negcount["person"],
        "intcount": our_pipeline.counting.intcount["person"],
        "delcount": our_pipeline.counting.delcount["person"],
    }
    # decisive: S's crossing was eaten by the motion filter on both sides
    # (without bgsub the scene counts 1 pos + 1 neg + S's pos = int 3)
    assert ref_counts["intcount"] == 2, ref_counts
    assert ref_counts["poscount"] == 1 and ref_counts["negcount"] == 1
    assert our_counts == ref_counts


@pytest.mark.timeout(600)
def test_scripted_skip_frames(tmp_path, monkeypatch):
    """--object-detector-skip-frames with a scripted detector: the script
    runs on 1 of every (N+1) frames and the previous detections are reused
    in between (deepdish.py:929-938 semantics)."""
    video = tmp_path / "v.mp4"
    make_video(video)

    calls = []

    def counting_script(frame):
        calls.append(1)
        return script_boxes(frame)

    from deepdish_tpu.models.registry import register_script
    from deepdish_tpu.pipeline import main as our_main

    register_script("skipparity", counting_script)
    argv = ["--input", str(video), "--model", "scripted:skipparity",
            "--encoder-model", "constant.pb",
            "--disable-background-subtraction", "--disable-graphics",
            "--object-detector-skip-frames", "2",
            "--wanted-labels", "person"]

    async def run():
        await asyncio.wait_for(our_main.amain(argv), timeout=420)

    asyncio.run(run())
    # 95 frames at skip=2 -> one real detection per 3 frames, plus the
    # warm-up never calls the host script
    assert len(calls) == (FRAMES + 2) // 3, len(calls)
