"""Real-flatbuffer ingestion for the FULL EfficientDet-Lite0 architecture.

The hardest converter topology: EfficientNet-Lite0 MBConv backbone, three
BiFPN layers of same-shape 64-channel separable convs in a fused DAG, and
box/class head towers that are IDENTICAL in shape and producer — only
their eventual prediction conv (36 vs 810 channels) tells them apart, six
hops downstream. Exercises the structural-signature binding end to end.
Mirrors the real export contract: normalization lives on the host (read
from flatbuffer metadata, tools/tflite_object_detector.py:117-131), not in
the graph.
"""
import numpy as np
import pytest

from deepdish_tpu.models import convert as cv_mod


def _tf():
    return pytest.importorskip("tensorflow")


SIZE = 320
NC = 90
FPN_CH = 64
BLOCKS = [  # (expand, channels, repeats, stride, kernel)
    (1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3), (6, 112, 3, 1, 5), (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3)]


def _make_efficientdet_tflite(tmp_path, full_int8=False,
                              upsample="repeat"):
    """upsample="resize" emits RESIZE_NEAREST_NEIGHBOR instead of TILE
    (numerically identical for exact 2x nearest + crop), making the
    artifact executable by the BUILTIN_REF reference-kernel resolver —
    the whole-graph byte-exactness oracle
    (test_qgraph.test_full_efficientdet_resizenn_int8_byte_exact)."""
    tf = _tf()
    rng = np.random.RandomState(23)

    def conv_w(cin, cout, k, scale=0.2):
        return (rng.normal(0, scale, (k, k, cin, cout)).astype(np.float32),
                rng.uniform(0.7, 1.3, cout).astype(np.float32),
                rng.normal(0, 0.1, cout).astype(np.float32),
                rng.normal(0, 0.1, cout).astype(np.float32),
                rng.uniform(0.7, 1.4, cout).astype(np.float32))

    def dw_w(c, k):
        return (rng.normal(0, 0.2, (k, k, c, 1)).astype(np.float32),
                rng.uniform(0.7, 1.3, c).astype(np.float32),
                rng.normal(0, 0.1, c).astype(np.float32),
                rng.normal(0, 0.1, c).astype(np.float32),
                rng.uniform(0.7, 1.4, c).astype(np.float32))

    def conv_bn(x, w, stride=1, act=True):
        tf = _tf()
        x = tf.nn.conv2d(x, w[0], stride, "SAME")
        x = tf.nn.batch_normalization(x, w[3], w[4], w[2], w[1], 1e-3)
        return tf.nn.relu6(x) if act else x

    def dw_bn(x, w, stride=1):
        tf = _tf()
        x = tf.nn.depthwise_conv2d(x, w[0], (1, stride, stride, 1), "SAME")
        x = tf.nn.batch_normalization(x, w[3], w[4], w[2], w[1], 1e-3)
        return tf.nn.relu6(x)

    # --- weights, declared in flax execution order ---
    w_stem = conv_w(3, 32, 3)
    w_blocks = []
    c_in = 32
    for (e, c, r, s, k) in BLOCKS:
        reps = []
        for ri in range(r):
            exp = conv_w(c_in, c_in * e, 1) if e != 1 else None
            c_mid = c_in * e if e != 1 else c_in
            reps.append((exp, dw_w(c_mid, k), conv_w(c_mid, c, 1), c_in,
                         s if ri == 0 else 1))
            c_in = c
        w_blocks.append(reps)
    w_lats = [conv_w(40, FPN_CH, 1), conv_w(112, FPN_CH, 1),
              conv_w(320, FPN_CH, 1), conv_w(320, FPN_CH, 1)]

    def sep_w():
        # dw (no BN between dw and pw in _SepConvBN), pw WITH bias, BN
        return (rng.normal(0, 0.2, (3, 3, FPN_CH, 1)).astype(np.float32),
                rng.normal(0, 0.2, (1, 1, FPN_CH, FPN_CH)).astype(
                    np.float32),
                rng.normal(0, 0.1, FPN_CH).astype(np.float32),     # pw bias
                rng.uniform(0.7, 1.3, FPN_CH).astype(np.float32),  # gamma
                rng.normal(0, 0.1, FPN_CH).astype(np.float32),     # beta
                rng.normal(0, 0.1, FPN_CH).astype(np.float32),     # mean
                rng.uniform(0.7, 1.4, FPN_CH).astype(np.float32))  # var

    def sep_bn(x, w, act=False):
        tf = _tf()
        x = tf.nn.depthwise_conv2d(x, w[0], (1, 1, 1, 1), "SAME")
        x = tf.nn.conv2d(x, w[1], 1, "SAME") + w[2]
        x = tf.nn.batch_normalization(x, w[5], w[6], w[4], w[3], 1e-3)
        return tf.nn.relu6(x) if act else x

    w_bifpn = [[sep_w() for _ in range(8)] for _ in range(3)]
    na = 9
    w_towers = []
    for li in range(5):
        per = []
        for hi in range(3):
            per.append((sep_w(), sep_w()))      # (boxh, clsh)
        w_towers.append(per)
    w_preds = [(rng.normal(0, 0.05, (3, 3, FPN_CH, na * 4)).astype(
                    np.float32),
                rng.normal(0, 0.05, na * 4).astype(np.float32),
                rng.normal(0, 0.05, (3, 3, FPN_CH, na * NC)).astype(
                    np.float32),
                rng.normal(0, 0.05, na * NC).astype(np.float32))
               for _ in range(5)]

    class M(tf.Module):
        @tf.function(input_signature=[
            tf.TensorSpec((1, SIZE, SIZE, 3), tf.float32)])
        def __call__(self, img):
            tf = _tf()

            def down2(x):
                return tf.nn.max_pool2d(x, 3, 2, "SAME")

            def up_to(x, like):
                if upsample == "resize":
                    y = tf.compat.v1.image.resize_nearest_neighbor(
                        x, (x.shape[1] * 2, x.shape[2] * 2))
                else:
                    y = tf.repeat(x, 2, axis=1)
                    y = tf.repeat(y, 2, axis=2)
                return y[:, :like.shape[1], :like.shape[2], :]

            x = img  # normalization lives on the host (metadata-driven)
            x = conv_bn(x, w_stem, 2)
            feats = {}
            for bi, reps in enumerate(w_blocks):
                for (exp, dw, proj, cin, stride) in reps:
                    y = x
                    if exp is not None:
                        y = conv_bn(y, exp)
                    y = dw_bn(y, dw, stride)
                    y = conv_bn(y, proj, act=False)
                    if stride == 1 and cin == proj[0].shape[-1]:
                        y = x + y
                    x = y
                if bi == 2:
                    feats[3] = x
                elif bi == 4:
                    feats[4] = x
                elif bi == 6:
                    feats[5] = x
            p3 = conv_bn(feats[3], w_lats[0], act=False)
            p4 = conv_bn(feats[4], w_lats[1], act=False)
            p5 = conv_bn(feats[5], w_lats[2], act=False)
            p6 = down2(conv_bn(feats[5], w_lats[3], act=False))
            p7 = down2(p6)
            p = [p3, p4, p5, p6, p7]
            for w8 in w_bifpn:
                q3, q4, q5, q6, q7 = p
                td6 = sep_bn(tf.nn.relu6(q6 + up_to(q7, q6)), w8[0])
                td5 = sep_bn(tf.nn.relu6(q5 + up_to(td6, q5)), w8[1])
                td4 = sep_bn(tf.nn.relu6(q4 + up_to(td5, q4)), w8[2])
                o3 = sep_bn(tf.nn.relu6(q3 + up_to(td4, q3)), w8[3])
                o4 = sep_bn(tf.nn.relu6(q4 + td4 + down2(o3)), w8[4])
                o5 = sep_bn(tf.nn.relu6(q5 + td5 + down2(o4)), w8[5])
                o6 = sep_bn(tf.nn.relu6(q6 + td6 + down2(o5)), w8[6])
                o7 = sep_bn(tf.nn.relu6(q7 + down2(o6)), w8[7])
                p = [o3, o4, o5, o6, o7]
            box_out, cls_out = [], []
            for li, f in enumerate(p):
                b = c = f
                for (wb, wc) in w_towers[li]:
                    b = sep_bn(b, wb, act=True)
                    c = sep_bn(c, wc, act=True)
                bk, bb, ck, cb = w_preds[li]
                b = tf.nn.conv2d(b, bk, 1, "SAME") + bb
                c = tf.nn.conv2d(c, ck, 1, "SAME") + cb
                box_out.append(tf.reshape(b, (-1, 4)))
                cls_out.append(tf.reshape(c, (-1, NC)))
            return tf.concat(box_out, 0), tf.concat(cls_out, 0)

    m = M()
    conv = tf.lite.TFLiteConverter.from_concrete_functions(
        [m.__call__.get_concrete_function()], m)
    if full_int8:
        # the real zoo EfficientDet-Lite0 artifact format: full-integer
        # export (uint8 input, int8 activations) — exercises the quantized
        # executor's TILE/STRIDED_SLICE data-movement ops too
        def _rep():
            r = np.random.RandomState(11)
            for _ in range(4):
                yield [r.uniform(0, 255, (1, SIZE, SIZE, 3))
                       .astype(np.float32)]
        conv.optimizations = [tf.lite.Optimize.DEFAULT]
        conv.representative_dataset = _rep
        conv.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS_INT8]
        conv.inference_input_type = tf.uint8
        conv.inference_output_type = tf.float32
    blob = conv.convert()
    tag = "_rnn" if upsample == "resize" else ""
    path = str(tmp_path / (f"efficientdet_lite0{tag}_int8.tflite"
                           if full_int8
                           else f"efficientdet_lite0{tag}_full.tflite"))
    with open(path, "wb") as f:
        f.write(blob)
    return path


@pytest.fixture(scope="module")
def effdet_tflite(tmp_path_factory):
    return _make_efficientdet_tflite(tmp_path_factory.mktemp("effdet"))


@pytest.mark.timeout(900)
def test_full_efficientdet_flatbuffer_roundtrip(effdet_tflite):
    import jax.numpy as jnp
    from deepdish_tpu.models.efficientdet import EfficientDetLite0

    path = effdet_tflite
    variables, report = cv_mod.load_efficientdet_tflite(path)
    assert report["assigned"] == report["total"], report
    assert not report["missing"] and not report["unused_ops"], report

    tf = _tf()
    x = np.random.RandomState(3).uniform(
        0, 255, (1, SIZE, SIZE, 3)).astype(np.float32)
    interp = tf.lite.Interpreter(model_path=path)
    interp.allocate_tensors()
    # host normalization (the metadata defaults our net also applies)
    interp.set_tensor(interp.get_input_details()[0]["index"],
                      (x - 127.0) / 128.0)
    interp.invoke()
    outs = {interp.get_tensor(d["index"]).shape[-1]:
            interp.get_tensor(d["index"])
            for d in interp.get_output_details()}

    net = EfficientDetLite0(compute_dtype=jnp.float32)
    boxes, logits = net.apply(variables, x[0])
    np.testing.assert_allclose(np.asarray(boxes), outs[4],
                               rtol=5e-3, atol=2e-1)
    np.testing.assert_allclose(np.asarray(logits), outs[NC],
                               rtol=5e-3, atol=2e-1)


@pytest.mark.timeout(900)
def test_efficientdet_postprocess_op_configures_detector(effdet_tflite,
                                                         tmp_path):
    """Zoo-layout EfficientDet (TFLite_Detection_PostProcess appended, as
    tools/tflite_object_detector.py:154-172 consumes): the op's normalized
    anchors, unit decode scales and NMS thresholds must configure the
    native detector through the registry."""
    from pp_builder import append_detection_postprocess
    from deepdish_tpu.models.efficientdet import INPUT_SIZE, generate_anchors
    from deepdish_tpu.models.registry import create_detector

    anchors = generate_anchors() / float(INPUT_SIZE)   # export convention
    A = len(anchors)
    blob = open(effdet_tflite, "rb").read()
    blob = append_detection_postprocess(
        blob, anchors, box_shape=(A, 4), score_shape=(A, NC),
        num_classes=NC, y_scale=1.0, x_scale=1.0, h_scale=1.0, w_scale=1.0,
        nms_score_threshold=0.4, nms_iou_threshold=0.6, max_detections=25,
        use_regular_nms=False)
    path = str(tmp_path / "efficientdet_pp.tflite")
    with open(path, "wb") as f:
        f.write(blob)

    pp = cv_mod.read_tflite_postprocess(path)
    assert pp is not None and pp.scales == (1.0, 1.0, 1.0, 1.0)
    assert pp.max_detections == 25 and not pp.use_regular_nms

    _, report = cv_mod.load_efficientdet_tflite(path)
    assert report["assigned"] == report["total"]
    assert report["anchors_verified"], report.get("anchors_max_abs_diff")

    det = create_detector(path)
    np.testing.assert_allclose(np.asarray(det.anchors),
                               anchors * INPUT_SIZE, rtol=1e-5, atol=1e-3)
    assert det.box_scale == (1.0, 1.0, 1.0, 1.0)
    assert abs(det.iou_threshold - 0.6) < 1e-6
    assert abs(det.score_threshold - 0.5) < 1e-6   # max(CLI 0.5, op 0.4)


@pytest.mark.timeout(900)
def test_pipeline_cli_with_efficientdet_flatbuffer(effdet_tflite, tmp_path):
    """tflite-demo.sh analog: `--model <efficientdet .tflite>` through the
    actual CLI pipeline (generic-TFLite detector path, metadata-driven
    normalization defaults), converting loudly and running to completion."""
    import asyncio
    import contextlib
    import io
    import os

    import cv2

    from deepdish_tpu.pipeline.main import amain

    video = tmp_path / "v.mp4"
    vw = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 15,
                         (320, 240))
    rng = np.random.RandomState(0)
    for _ in range(8):
        vw.write(rng.randint(0, 200, (240, 320, 3)).astype(np.uint8))
    vw.release()

    log = tmp_path / "o.log"
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        asyncio.run(amain([
            "--input", str(video), "--model", effdet_tflite,
            "--encoder-model", "dummy", "--disable-graphics",
            "--disable-background-subtraction",
            "--log", str(log), "--wanted-labels", "person"]))
    out = buf.getvalue()
    assert "weight conversion failed" not in out
    assert out.count("Frame ") >= 8
    assert os.path.exists(log)
