"""Fast w8a8 int8 SSD-MobileNet (models/ssd_q.py): mirror exactness,
bounded quantization drift, detector-contract agreement, and pipeline
composition — the detector analog of tests/test_mars_int8.py.

The quantized layers' inputs are relu6 outputs (exactly bounded [0, 6]);
activation scales come from a calibration pass capped by that bound, so
resolution holds for trained (relu6-saturating) and random-init trees
alike. These tests pin that, the scheme's layer coverage, and the drift.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepdish_tpu.models import ssd_q
from deepdish_tpu.models.ssd_mobilenet import (INPUT_SIZE, SSDMobileNetV1,
                                               SSDMobileNetDetector)


@pytest.fixture(scope="module")
def params():
    net = SSDMobileNetV1(compute_dtype=jnp.float32)
    return net.init(jax.random.PRNGKey(0),
                    jnp.zeros((INPUT_SIZE, INPUT_SIZE, 3), jnp.float32))


@pytest.fixture(scope="module")
def image():
    return np.random.RandomState(1).randint(
        0, 256, (INPUT_SIZE, INPUT_SIZE, 3)).astype(np.float32)


@pytest.fixture(scope="module")
def float_out(params, image):
    net = SSDMobileNetV1(compute_dtype=jnp.float32)
    b, l = net.apply(params, jnp.asarray(image))
    return np.asarray(b), np.asarray(l)


@pytest.mark.timeout(600)
def test_float_mirror_matches_flax(params, image, float_out):
    ref_b, ref_l = float_out
    mir_b, mir_l = ssd_q.ssd_forward(params, jnp.asarray(image),
                                     compute_dtype=jnp.float32)
    np.testing.assert_allclose(ref_b, np.asarray(mir_b), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(ref_l, np.asarray(mir_l), rtol=1e-4,
                               atol=1e-4)


@pytest.mark.timeout(600)
def test_quantized_drift_bounded(params, image, float_out):
    """w8a8 drift on the head outputs stays small RELATIVE to the outputs
    themselves (random-init outputs are tiny, so absolute bounds would be
    vacuous); correlation with the float net stays near 1."""
    ref_b, ref_l = float_out
    qp = ssd_q.quantize_ssd(params)
    qb, ql = ssd_q.ssd_forward(qp["base"], jnp.asarray(image),
                               compute_dtype=jnp.float32, qparams=qp)
    for ref, q in ((ref_b, np.asarray(qb)), (ref_l, np.asarray(ql))):
        rms = float(np.sqrt(np.mean(ref ** 2)))
        assert float(np.sqrt(np.mean((ref - q) ** 2))) < 0.15 * rms
        c = np.corrcoef(ref.ravel(), q.ravel())[0, 1]
        assert c > 0.99


@pytest.mark.timeout(600)
def test_relu6_bound_assumption(params, image):
    """Every quantized layer's input really is bounded by the relu6 max —
    the no-calibration scheme rests on this: layer coverage is exactly the
    intended set, int8 kernels are in range, and calibrated activation
    scales never exceed the relu6 hard bound."""
    qp = ssd_q.quantize_ssd(params)
    expect = set(ssd_q._quantized_layers(False))
    assert set(qp["wq"]) == expect
    assert set(qp["wscale"]) == expect
    assert set(qp["ascale"]) == expect
    assert set(qp["corr"]) == {p for p, (k, _, _) in qp["layers"].items()
                               if k == 1}
    for p, w8 in qp["wq"].items():
        assert w8.dtype == np.int8
        assert np.abs(w8).max() <= 127
    # calibrated activation scales never exceed the relu6 hard bound
    assert all(0 < a <= 6.0 for a in qp["ascale"].values())


@pytest.mark.timeout(600)
def test_quantize_dw_variant_runs(params, image, float_out):
    ref_b, ref_l = float_out
    qp = ssd_q.quantize_ssd(params, quantize_dw=True)
    qb, ql = ssd_q.ssd_forward(qp["base"], jnp.asarray(image),
                               compute_dtype=jnp.float32, qparams=qp)
    scale_l = max(1.0, float(np.abs(ref_l).max()))
    assert float(np.abs(ref_l - np.asarray(ql)).max()) / scale_l < 0.12


@pytest.mark.timeout(600)
def test_detector_contract_and_agreement(params, image):
    """The int8 detector emits the same contract as the float one, and on
    a low-threshold random-weights scene most kept boxes agree. (Random
    init puts scores right at the threshold, so some keep/drop flips are
    expected — the tight numeric bound lives in
    test_quantized_drift_bounded; this pins the contract and plumbing.)"""
    fdet = SSDMobileNetDetector(params=params, max_outputs=16,
                                score_threshold=0.3,
                                compute_dtype=jnp.float32)
    qdet = ssd_q.SSDMobileNetInt8Detector(params=params, max_outputs=16,
                                          score_threshold=0.3,
                                          compute_dtype=jnp.float32)
    img = jnp.asarray(image)
    fb, fc, fs, fv = jax.device_get(fdet.detect(fdet.params, img,
                                                1280.0, 720.0))
    qb, qc, qs, qv = jax.device_get(qdet.detect(qdet.params, img,
                                                1280.0, 720.0))
    assert fb.shape == qb.shape and fv.dtype == qv.dtype
    # match each float box to the nearest int8 box; require near-identity
    matched = 0
    for i in np.where(fv)[0]:
        best = 0.0
        for j in np.where(qv)[0]:
            x1 = max(fb[i, 0], qb[j, 0]); y1 = max(fb[i, 1], qb[j, 1])
            x2 = min(fb[i, 2], qb[j, 2]); y2 = min(fb[i, 3], qb[j, 3])
            inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
            a = ((fb[i, 2] - fb[i, 0]) * (fb[i, 3] - fb[i, 1])
                 + (qb[j, 2] - qb[j, 0]) * (qb[j, 3] - qb[j, 1]) - inter)
            best = max(best, inter / a if a > 0 else 0.0)
        if best > 0.5:
            matched += 1
    nf = int(fv.sum())
    if nf:
        assert matched >= max(1, int(0.6 * nf))


@pytest.mark.timeout(600)
def test_registry_and_framestep_composition(params):
    """`--model ssd_mobilenet_int8` routes to the int8 detector and the
    fused chunk program runs with it (CPU, small shapes)."""
    from deepdish_tpu import tracker as tt
    from deepdish_tpu.models import create_box_encoder, create_detector
    from deepdish_tpu.pipeline import FrameStep

    det = create_detector("ssd_mobilenet_int8", max_outputs=8,
                          score_threshold=0.3)
    assert isinstance(det, ssd_q.SSDMobileNetInt8Detector)
    enc = create_box_encoder("mars")
    cfg = tt.TrackerConfig(max_tracks=8, max_detections=4, gallery_size=8,
                           pending_size=4, num_labels=2, max_age=5)
    fs = FrameStep(det, enc, cfg, ["person", "car"], (72, 96))
    state = fs.init_state()
    frames = np.random.RandomState(3).randint(
        0, 256, (2, 72, 96, 3), np.uint8)
    state, out, _ = fs.run_chunk(state, frames)
    assert out.track_id.shape[0] == 2


@pytest.mark.timeout(600)
def test_calibration_frames_plumbing(params, tmp_path):
    """--detector-calibration-frames: real frames reach quantize_ssd via
    create_detector(calib_images=...) and change the activation scales
    relative to the synthetic default (ADVICE r4: calibration source must
    be overridable, not silently synthetic-only)."""
    from deepdish_tpu.models.registry import create_detector
    from deepdish_tpu.pipeline.runtime import Pipeline

    rng = np.random.RandomState(7)
    # tiny-amplitude frames -> absmax of early conv inputs differs from
    # the synthetic full-range set
    frames = (rng.rand(2, INPUT_SIZE, INPUT_SIZE, 3) * 16).astype(
        np.float32)
    det_s = create_detector("ssd_mobilenet_int8", max_outputs=8,
                            params=params)
    det_r = create_detector("ssd_mobilenet_int8", max_outputs=8,
                            params=params, calib_images=frames)
    a_s = det_s.params["ascale"]
    a_r = det_r.params["ascale"]
    assert set(a_s) == set(a_r)
    assert any(abs(float(a_s[k]) - float(a_r[k])) > 1e-6 for k in a_s)

    # the runtime loader: happy path + loud failure on a bad shape
    p = tmp_path / "calib.npy"
    np.save(p, frames)
    loaded = Pipeline._load_calibration_frames(str(p))
    assert loaded.shape == frames.shape and loaded.dtype == np.float32
    assert Pipeline._load_calibration_frames(None) is None
    bad = tmp_path / "bad.npy"
    np.save(bad, np.zeros((4, 4), np.float32))
    with pytest.raises(ValueError):
        Pipeline._load_calibration_frames(str(bad))
