"""int8 (w8a8) MARS encoder: exactness of the harness, bounded re-ID drift,
and crossing-count parity with the float encoder (VERDICT r3 next #2).

The reference's appearance encoder is itself a quantized TFLite artifact
(tools/generate_detections.py:151-177); models/mars_q.py is the TPU-native
analog (int8 MXU matmuls, float glue). These tests pin:
  * the float mirror in mars_q.mars_forward is EXACTLY MarsNet.apply
    (so calibration instruments the real network, not a lookalike);
  * the two int8 contraction implementations (im2col dot vs direct conv)
    produce identical features;
  * quantization's cosine drift is orders of magnitude below the matching
    threshold (--max-cosine-distance 0.2, deepdish.py:1412);
  * the full pipeline counts the scripted parity video identically with
    the float and int8 encoders.
"""
import asyncio

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepdish_tpu.models import mars_q
from deepdish_tpu.models.mars import INPUT_SHAPE, MarsNet

from test_fullpipeline_ref_parity import script_boxes


@pytest.fixture(scope="module")
def params():
    net = MarsNet(compute_dtype=jnp.float32)
    return net.init(jax.random.PRNGKey(0),
                    jnp.zeros((1,) + INPUT_SHAPE, jnp.float32))


@pytest.fixture(scope="module")
def patches():
    return np.random.RandomState(7).randint(
        0, 256, (16,) + INPUT_SHAPE).astype(np.float32)


def test_float_mirror_matches_flax(params, patches):
    net = MarsNet(compute_dtype=jnp.float32)
    ref = np.asarray(net.apply(params, jnp.asarray(patches)))
    mir = np.asarray(mars_q.mars_forward(params, jnp.asarray(patches),
                                         compute_dtype=jnp.float32))
    np.testing.assert_allclose(ref, mir, rtol=1e-5, atol=1e-6)


def test_calibration_covers_every_quantized_layer(params, patches):
    absmax = mars_q.calibrate_mars(params, patches[:8], jnp.float32)
    assert set(absmax) == set(mars_q.QUANTIZED_LAYERS)
    assert all(v > 0 for v in absmax.values())


def test_impl_equality_and_drift(params, patches):
    qp = mars_q.quantize_mars(params, compute_dtype=jnp.float32)
    f_conv = np.asarray(mars_q.mars_int8_apply(qp, jnp.asarray(patches),
                                               jnp.float32, impl="conv"))
    f_dot = np.asarray(mars_q.mars_int8_apply(qp, jnp.asarray(patches),
                                              jnp.float32, impl="dot"))
    # identical int32 accumulators -> identical features
    np.testing.assert_array_equal(f_conv, f_dot)

    net = MarsNet(compute_dtype=jnp.float32)
    ref = np.asarray(net.apply(params, jnp.asarray(patches)))
    # unit-norm features: cosine distance = 1 - dot
    drift = 1.0 - (ref * f_conv).sum(axis=1)
    assert np.all(np.abs(drift) < 5e-3), drift.max()
    # features stay unit-normalized
    np.testing.assert_allclose(np.linalg.norm(f_conv, axis=1), 1.0,
                               atol=1e-3)


def test_bf16_drift_stays_below_matching_threshold(params, patches):
    """At the serving compute dtype the combined bf16+int8 drift must stay
    far below the 0.2 appearance-matching threshold."""
    net = MarsNet(compute_dtype=jnp.float32)
    ref = np.asarray(net.apply(params, jnp.asarray(patches)))
    qp = mars_q.quantize_mars(params, compute_dtype=jnp.bfloat16)
    f_q = np.asarray(mars_q.mars_int8_apply(qp, jnp.asarray(patches),
                                            jnp.bfloat16))
    drift = 1.0 - (ref * f_q).sum(axis=1)
    assert np.all(np.abs(drift) < 0.02), drift.max()


def test_quantized_kernels_pruned_from_base(params):
    qp = mars_q.quantize_mars(params, compute_dtype=jnp.float32)
    for path in mars_q.QUANTIZED_LAYERS:
        assert mars_q._get(qp["base"]["params"], path)["kernel"].size == 0
        assert qp["wq"][path].dtype == np.int8
    # conv1_1 stem stays float
    assert qp["base"]["params"]["conv1_1"]["kernel"].size > 0


def test_encoder_dispatch_and_framestep_composition(rng):
    """'int8' in the encoder-model name selects the quantized encoder
    (filename-substring dispatch like generate_detections.py:180-189), and
    it composes into the fused FrameStep program."""
    from deepdish_tpu import tracker as tt
    from deepdish_tpu.models import create_box_encoder, create_detector
    from deepdish_tpu.pipeline import FrameStep, FrameStepConfig

    enc = create_box_encoder("mars-int8")
    assert enc.feature_dim == 128

    det = create_detector("ssd_mobilenet", max_outputs=8,
                          score_threshold=0.3)
    cfg = tt.TrackerConfig(max_tracks=8, max_detections=4, gallery_size=8,
                           pending_size=4, num_labels=2, max_age=5)
    fs = FrameStep(det, enc, cfg, ["person"], (72, 96),
                   FrameStepConfig(encode_capacity=4))
    frames = rng.randint(0, 255, size=(8, 72, 96, 3)).astype(np.uint8)
    state, outs, snaps = fs.run_chunk(fs.init_state(), frames)
    assert np.asarray(outs.track_id).shape[0] == 8


# A compact scene (the full-size parity scene needs >15 min of CPU time
# with the int8-on-CPU encoder): A crosses left->right, B right->left, C
# appears at 10, crosses and vanishes at 34 so its track dies mid-run.
_W, _H, _FRAMES = 192, 144, 52


def _make_small_video(path):
    import cv2
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 15,
                         (_W, _H))
    for i in range(_FRAMES):
        frame = np.full((_H, _W, 3), 30, np.uint8)
        rects = [(30 + 4 * i, 10, 24, 34), (160 - 4 * i, 58, 24, 34)]
        if 10 <= i < 34:
            rects.append((60 + 4 * (i - 10), 100, 24, 34))
        for (x, y, w, h) in rects:
            x0, x1 = max(x, 0), min(x + w, _W)
            if x1 > x0:
                frame[y:y + h, x0:x1] = 255
        vw.write(frame)
    vw.release()


def _run_pipeline(video, logfile, monkeypatch, encoder_model):
    from deepdish_tpu.models.registry import register_script
    from deepdish_tpu.pipeline import main as our_main
    from deepdish_tpu.pipeline import runtime as our_runtime

    register_script("parity", script_boxes)
    argv = ["--input", str(video), "--model", "scripted:parity",
            "--encoder-model", encoder_model, "--disable-graphics",
            "--max-age", "8", "--log", str(logfile),
            "--wanted-labels", "person", "--chunk-size", "1",
            "--max-detections", "8", "--encode-capacity", "4",
            "--disable-background-subtraction"]
    captured = []
    real_pipeline = our_runtime.Pipeline

    def capture(args):
        p = real_pipeline(args)
        captured.append(p)
        return p

    monkeypatch.setattr(our_runtime, "Pipeline", capture)
    asyncio.run(asyncio.wait_for(our_main.amain(argv), timeout=420))
    return captured[0]


@pytest.mark.timeout(900)
def test_counts_match_float_encoder_on_scripted_video(tmp_path, monkeypatch):
    """Same scripted demo video, same (seeded) MARS weights: the pipeline
    with the int8 encoder must produce the same crossing counts as with
    the float encoder — re-ID fidelity at the application level."""
    video = tmp_path / "demo.mp4"
    _make_small_video(video)

    counts = {}
    for enc_name in ("mars", "mars-int8"):
        log = tmp_path / f"{enc_name}.log"
        p = _run_pipeline(video, log, monkeypatch, enc_name)
        # lossless-file invariant: every frame of the input must have been
        # processed regardless of host load (everyframe / bounded-queue
        # semantics). If this trips, a count mismatch below is frame loss,
        # not encoder fidelity — see docs/ROUND5_NOTES.md "load
        # sensitivity" observation.
        assert p.frame_count == _FRAMES, (enc_name, p.frame_count)
        counts[enc_name] = {
            k: getattr(p.counting, k)["person"]
            for k in ("poscount", "negcount", "intcount", "delcount")}
    assert counts["mars"]["intcount"] >= 3, counts
    assert counts["mars-int8"] == counts["mars"]
