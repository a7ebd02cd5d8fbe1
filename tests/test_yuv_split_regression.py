"""Regression guard for the int8 x YUV split-dispatch workaround.

Quantized (integer-datapath) detectors cannot share one XLA program with
the on-device I420->RGB conversion at chunk 32 on TPU — the fused program
deterministically crashes the TPU worker (round-4 bisect,
docs/BENCH_NOTES.md; minimal repro: tools/repro_int8_yuv_crash.py).
`FrameStep.run_chunk_yuv` therefore dispatches the conversion separately
for quantized detectors (`pipeline/framestep.py` `_yuv_split`).

This test pins the workaround's contract on CPU, where the fused program
does not fault: the split two-dispatch path must be BIT-IDENTICAL to the
fused one-program composition — outputs, track table, and snapshots.
Re-try fusing (tools/repro_int8_yuv_crash.py --fault on TPU) on every
jax/libtpu bump; if it passes there, the split can be retired.
"""
import numpy as np
import pytest

import jax

from deepdish_tpu import tracker as tt


@pytest.fixture(scope="module")
def ssd_int8(tmp_path_factory):
    pytest.importorskip("tensorflow")
    from test_pipeline_real_tflite import _make_full_ssd_tflite
    return _make_full_ssd_tflite(tmp_path_factory.mktemp("yuvsplit"),
                                 full_int8=True)


@pytest.mark.timeout(900)
def test_split_dispatch_bit_identical_to_fused(ssd_int8):
    from deepdish_tpu.models import create_box_encoder, create_detector
    from deepdish_tpu.pipeline import FrameStep, FrameStepConfig

    H, W = 64, 96
    det = create_detector(str(ssd_int8), quantized=True)
    enc = create_box_encoder("dummy.pb")
    cfg = tt.TrackerConfig(max_tracks=16, max_detections=8,
                           gallery_size=16, num_labels=4)
    fs = FrameStep(det, enc, cfg, ["person", "car"], (H, W),
                   FrameStepConfig(encode_capacity=4,
                                   background_subtraction=False))
    assert fs._yuv_split, \
        "quantized detector must select the split YUV dispatch"

    yuv = np.random.RandomState(0).randint(
        0, 256, (4, H * 3 // 2, W), np.uint8)

    # shipped path: two dispatches (convert, then fused RGB chunk)
    st_split, outs_split, snaps_split = fs.run_chunk_yuv(fs.init_state(),
                                                         yuv)
    # fused one-program composition (the TPU-faulting shape family; safe
    # on the CPU backend)
    st_fused, outs_fused, snaps_fused = fs._chunk_yuv_jit(
        fs._params, fs.init_state(), yuv)

    flat_s, _ = jax.tree.flatten((st_split.table, outs_split, snaps_split))
    flat_f, _ = jax.tree.flatten((st_fused.table, outs_fused, snaps_fused))
    assert len(flat_s) == len(flat_f)
    for a, b in zip(flat_s, flat_f):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.timeout(300)
def test_float_detector_keeps_single_dispatch():
    """The split is scoped to integer-datapath detectors only — the float
    path must stay one program (no silent ossification in reverse)."""
    from deepdish_tpu.models import create_box_encoder, create_detector
    from deepdish_tpu.pipeline import FrameStep, FrameStepConfig

    det = create_detector("ssd_mobilenet", max_outputs=8)
    enc = create_box_encoder("dummy.pb")
    cfg = tt.TrackerConfig(max_tracks=16, max_detections=8,
                           gallery_size=16, num_labels=4)
    fs = FrameStep(det, enc, cfg, ["person"], (64, 96),
                   FrameStepConfig(encode_capacity=4,
                                   background_subtraction=False))
    assert not fs._yuv_split
