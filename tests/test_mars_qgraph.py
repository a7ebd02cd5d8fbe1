"""Full-integer MARS encoder artifacts on the integer datapath (VERDICT
r3's serving-parity thread): the reference's encoder files are quantized
TFLite (tools/generate_detections.py:151-177); models/qgraph.py now runs
them with the interpreter's own arithmetic — new ops this required:
float-island ELU, float->int QUANTIZE (AffineQuantize), and the exact
int8 L2_NORMALIZATION (GetInvSqrtQuantizedMultiplierExp fixed-point
Newton-Raphson in ops/intmath.py).

The BUILTIN_REF (reference-kernel) resolver in this TF build cannot run
ELU at all (no registration — same gap as int8 TILE), so the oracle is
the per-op local comparison of test_qgraph.py: every op on the
interpreter's own inputs — data movement, DEQUANTIZE, QUANTIZE and the
int8 L2_NORMALIZATION byte-exact, arithmetic within XNNPACK's 1-LSB
fp32-requant slack, the float ELU islands within 1 ULP.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepdish_tpu.models.qgraph import (ELU, L2_NORM, QGraphExecutor,
                                        make_quantized_mars_encoder)
from deepdish_tpu.ops import intmath

from mars_builder import make_mars_int8_tflite


def _tf():
    return pytest.importorskip("tensorflow")


@pytest.fixture(scope="module")
def mars_int8(tmp_path_factory):
    _tf()
    return make_mars_int8_tflite(tmp_path_factory.mktemp("mq"))


def test_inv_sqrt_multiplier_matches_int64_oracle(rng):
    """get_inv_sqrt_quantized_multiplier_exp vs a float64 reference on the
    quantity it exists to compute: MBQM(128*x, m, s+7) must equal
    round(128 * 128 * x / sqrt(acc)) within 1 LSB across magnitudes."""
    acc = np.concatenate([
        np.array([2, 3, 5, 100, 127, 128]),
        rng.randint(2, 1 << 14, 50),
        rng.randint(1 << 14, 1 << 24, 50),
        rng.randint(1 << 24, (1 << 31) - 1, 50)]).astype(np.int32)
    mult, shift = (np.asarray(v) for v in
                   intmath.get_inv_sqrt_quantized_multiplier_exp(
                       jnp.asarray(acc)))
    x = np.int32(100)
    got = np.asarray(intmath.multiply_by_quantized_multiplier(
        jnp.full(acc.shape, x, jnp.int32), jnp.asarray(mult),
        jnp.asarray(shift) + 7))
    want = np.round(128.0 * x / np.sqrt(acc.astype(np.float64)))
    assert np.max(np.abs(got - want)) <= 1, \
        (got[np.abs(got - want) > 1], want[np.abs(got - want) > 1])


def test_inv_sqrt_trivial_inputs():
    mult, shift = (np.asarray(v) for v in
                   intmath.get_inv_sqrt_quantized_multiplier_exp(
                       jnp.asarray([0, 1], jnp.int32)))
    assert (mult == intmath.INT32_MAX).all() and (shift == 0).all()


@pytest.mark.timeout(900)
def test_mars_artifact_per_op_exact(mars_int8, rng):
    tf = _tf()
    ex = QGraphExecutor(mars_int8, conv_impl="portable")
    x = rng.uniform(0, 255, (1, 128, 64, 3)).astype(np.float32)
    ip = tf.lite.Interpreter(model_path=mars_int8,
                             experimental_preserve_all_tensors=True)
    ip.allocate_tensors()
    ip.set_tensor(ip.get_input_details()[0]["index"], x)
    ip.invoke()

    consts = {k: jnp.asarray(v) for k, v in ex.consts.items()}
    n_l2 = n_elu = n_exact = n_arith = 0
    for qop in ex.ops:
        def get(ti):
            if ti in ex._const_idx:
                return jnp.asarray(ex._const_idx[ti])
            return jnp.asarray(ip.get_tensor(ti))
        ours = np.asarray(ex.run_op(qop, consts, get))
        ref = ip.get_tensor(qop.outputs[0])
        name = ex.meta[qop.outputs[0]].name
        if qop.code == ELU:
            # float island: XNNPACK's expm1 may differ in the last ULP
            assert np.max(np.abs(ours - ref)) < 1e-6, name
            n_elu += 1
        elif qop.code == L2_NORM:
            np.testing.assert_array_equal(ours, ref, err_msg=name)
            n_l2 += 1
        elif ours.dtype == np.float32:
            np.testing.assert_array_equal(ours, ref, err_msg=name)
            n_exact += 1
        elif qop.code in (2, 17, 22, 45, 69, 114):
            # data movement + (re)quantize byte-exact
            np.testing.assert_array_equal(ours, ref, err_msg=name)
            n_exact += 1
        else:
            d = np.abs(ours.astype(np.int64) - ref.astype(np.int64))
            assert d.max() <= 1, f"{name} (op {qop.code}): {d.max()}"
            n_arith += 1
    assert n_l2 == 1 and n_elu >= 4
    assert n_arith > 10 and n_exact > 8


@pytest.mark.timeout(900)
def test_quantized_encoder_matches_interpreter_e2e(mars_int8, rng):
    """End-to-end features from the integer-datapath encoder vs the stock
    interpreter on the same crops: cosine agreement far inside the 0.2
    matching threshold (XNNPACK 1-LSB conv drift compounds mildly through
    the 17-conv stack; the final int8 L2 norm re-quantizes to 1/128)."""
    tf = _tf()
    enc = make_quantized_mars_encoder(mars_int8, conv_impl="portable")
    patches = rng.uniform(0, 255, (4, 128, 64, 3)).astype(np.float32)
    ours = np.asarray(jax.jit(enc.apply)(jnp.asarray(patches)))

    ip = tf.lite.Interpreter(model_path=mars_int8)
    ip.allocate_tensors()
    din = ip.get_input_details()[0]
    ref = []
    for p in patches:
        ip.set_tensor(din["index"], p[None])
        ip.invoke()
        ref.append(ip.get_tensor(ip.get_output_details()[0]["index"])[0])
    ref = np.asarray(ref)
    ref = ref / np.linalg.norm(ref, axis=1, keepdims=True)
    cos = 1.0 - (ref * ours).sum(axis=1)
    assert np.max(np.abs(cos)) < 0.01, cos
    np.testing.assert_allclose(np.linalg.norm(ours, axis=1), 1.0, atol=1e-3)


def test_encoder_dispatch_and_framestep(mars_int8, rng):
    """create_box_encoder on a full-integer .tflite selects the integer
    datapath and composes into the fused FrameStep chunk program."""
    from deepdish_tpu import tracker as tt
    from deepdish_tpu.models import create_box_encoder, create_detector
    from deepdish_tpu.pipeline import FrameStep, FrameStepConfig

    enc = create_box_encoder(mars_int8)
    assert enc.feature_dim == 128 and enc.image_shape[0] == 128
    assert isinstance(enc.params, dict)          # executor consts

    det = create_detector("ssd_mobilenet", max_outputs=8,
                          score_threshold=0.3)
    cfg = tt.TrackerConfig(max_tracks=8, max_detections=4, gallery_size=8,
                           pending_size=4, num_labels=2, max_age=5)
    fs = FrameStep(det, enc, cfg, ["person"], (72, 96),
                   FrameStepConfig(encode_capacity=2))
    frames = rng.randint(0, 255, size=(4, 72, 96, 3)).astype(np.uint8)
    state, outs, snaps = fs.run_chunk(fs.init_state(), frames)
    assert np.asarray(outs.track_id).shape[0] == 4


@pytest.mark.timeout(900)
def test_float_tflite_still_converts_structurally(tmp_path):
    """A FLOAT mars tflite keeps taking the structural float-conversion
    path (the integer dispatch must reject it cleanly)."""
    tf = _tf()
    from deepdish_tpu.models.encoders import create_box_encoder
    from test_convert import _keras_mars, _randomize_keras_bn
    model = _keras_mars(tf)
    _randomize_keras_bn(model)
    blob = tf.lite.TFLiteConverter.from_keras_model(model).convert()
    path = str(tmp_path / "mars_float.tflite")
    with open(path, "wb") as f:
        f.write(blob)
    enc = create_box_encoder(path)
    assert enc.feature_dim == 128
    assert not isinstance(enc.params, dict) or "params" in enc.params
