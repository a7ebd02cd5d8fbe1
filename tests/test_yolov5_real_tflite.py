"""Real-flatbuffer ingestion for the FULL YOLOv5s architecture.

TF mirror of models/yolov5.py (stem/C3 backbone, SPPF, PANet neck, three
heads) exported through the real tf.lite converter, then structurally
ingested and forward-parity-checked. Exercises the converter on deep CSP
topology: residual bottlenecks, parallel cv1/cv2 branches reading the same
tensor (equal producer depth), concats, and nearest-neighbor upsampling.
"""
import numpy as np
import pytest

from deepdish_tpu.models import convert as cv_mod


def _tf():
    return pytest.importorskip("tensorflow")


SIZE = 320
NC = 80


def _make_yolov5_tflite(tmp_path, full_int8=False, upsample="repeat"):
    """upsample="repeat" converts to TILE ops (like real yolov5 exports);
    "resize" emits RESIZE_NEAREST_NEIGHBOR instead — numerically identical
    for exact 2x nearest upsampling, but executable by the BUILTIN_REF
    reference-kernel resolver (whose int8 TILE registration this TF build
    lacks), enabling a WHOLE-GRAPH byte-exactness oracle
    (test_qgraph.test_full_yolov5_resizenn_int8_byte_exact)."""
    tf = _tf()
    rng = np.random.RandomState(11)
    params = []

    def cb_weights(cin, cout, k):
        w = (rng.normal(0, 0.1, (k, k, cin, cout)).astype(np.float32),
             rng.uniform(0.7, 1.3, cout).astype(np.float32),
             rng.normal(0, 0.1, cout).astype(np.float32),
             rng.normal(0, 0.1, cout).astype(np.float32),
             rng.uniform(0.7, 1.4, cout).astype(np.float32))
        params.append(w)
        return w

    def conv_block(x, w, stride=1, pad=None):
        tf = _tf()
        k = w[0].shape[0]
        p = k // 2 if pad is None else pad
        if p:
            x = tf.pad(x, [[0, 0], [p, p], [p, p], [0, 0]])
        x = tf.nn.conv2d(x, w[0], stride, "VALID")
        x = tf.nn.batch_normalization(x, w[3], w[4], w[2], w[1], 1e-3)
        return tf.nn.silu(x)

    def bottleneck_w(c):
        return (cb_weights(c, c, 1), cb_weights(c, c, 3))

    def c3_w(cin, f, n):
        c_ = f // 2
        return (cb_weights(cin, c_, 1),
                [bottleneck_w(c_) for _ in range(n)],
                cb_weights(cin, c_, 1),
                cb_weights(2 * c_, f, 1))

    def c3(x, w, shortcut=True):
        tf = _tf()
        cv1, bns, cv2, cv3 = w
        a = conv_block(x, cv1)
        for b1, b2 in bns:
            y = conv_block(a, b1)
            y = conv_block(y, b2)
            a = a + y if shortcut else y
        b = conv_block(x, cv2)
        return conv_block(tf.concat([a, b], -1), cv3)

    def up2(x):
        tf = _tf()
        if upsample == "resize":
            s = x.shape
            return tf.compat.v1.image.resize_nearest_neighbor(
                x, (s[1] * 2, s[2] * 2))
        x = tf.repeat(x, 2, axis=1)
        return tf.repeat(x, 2, axis=2)

    # weight declaration ORDER mirrors the flax execution order exactly
    w_stem = cb_weights(3, 32, 6)
    w_down1 = cb_weights(32, 64, 3)
    w_c31 = c3_w(64, 64, 1)
    w_down2 = cb_weights(64, 128, 3)
    w_c32 = c3_w(128, 128, 2)
    w_down3 = cb_weights(128, 256, 3)
    w_c33 = c3_w(256, 256, 3)
    w_down4 = cb_weights(256, 512, 3)
    w_c34 = c3_w(512, 512, 1)
    w_sppf1 = cb_weights(512, 256, 1)
    w_sppf2 = cb_weights(1024, 512, 1)
    w_ncv1 = cb_weights(512, 256, 1)
    w_nc31 = c3_w(512, 256, 1)
    w_ncv2 = cb_weights(256, 128, 1)
    w_nc32 = c3_w(256, 128, 1)
    w_nd1 = cb_weights(128, 128, 3)
    w_nc33 = c3_w(256, 256, 1)
    w_nd2 = cb_weights(256, 256, 3)
    w_nc34 = c3_w(512, 512, 1)
    no = 3 * (5 + NC)
    heads = [(rng.normal(0, 0.05, (1, 1, c, no)).astype(np.float32),
              rng.normal(0, 0.05, no).astype(np.float32))
             for c in (128, 256, 512)]

    class M(tf.Module):
        @tf.function(input_signature=[
            tf.TensorSpec((1, SIZE, SIZE, 3), tf.float32)])
        def __call__(self, img):
            # real yolov5 TFLite exports take [0,1] float input — the
            # /255 lives on the host (tools/yolov5.py:102); baking it in
            # here would get constant-folded into the stem kernel
            tf = _tf()
            x = conv_block(img, w_stem, 2, pad=2)
            x = conv_block(x, w_down1, 2)
            x = c3(x, w_c31)
            x = conv_block(x, w_down2, 2)
            p3 = c3(x, w_c32)
            x = conv_block(p3, w_down3, 2)
            p4 = c3(x, w_c33)
            x = conv_block(p4, w_down4, 2)
            x = c3(x, w_c34)
            # SPPF
            x = conv_block(x, w_sppf1)
            m1 = tf.nn.max_pool2d(x, 5, 1, "SAME")
            m2 = tf.nn.max_pool2d(m1, 5, 1, "SAME")
            m3 = tf.nn.max_pool2d(m2, 5, 1, "SAME")
            p5 = conv_block(tf.concat([x, m1, m2, m3], -1), w_sppf2)
            # PANet neck
            u5 = conv_block(p5, w_ncv1)
            x = tf.concat([up2(u5), p4], -1)
            n4 = c3(x, w_nc31, shortcut=False)
            u4 = conv_block(n4, w_ncv2)
            x = tf.concat([up2(u4), p3], -1)
            o3 = c3(x, w_nc32, shortcut=False)
            x = conv_block(o3, w_nd1, 2)
            x = tf.concat([x, u4], -1)
            o4 = c3(x, w_nc33, shortcut=False)
            x = conv_block(o4, w_nd2, 2)
            x = tf.concat([x, u5], -1)
            o5 = c3(x, w_nc34, shortcut=False)
            h3 = tf.nn.conv2d(o3, heads[0][0], 1, "SAME") + heads[0][1]
            h4 = tf.nn.conv2d(o4, heads[1][0], 1, "SAME") + heads[1][1]
            h5 = tf.nn.conv2d(o5, heads[2][0], 1, "SAME") + heads[2][1]
            return h3, h4, h5

    m = M()
    conv = tf.lite.TFLiteConverter.from_concrete_functions(
        [m.__call__.get_concrete_function()], m)
    if full_int8:
        # the reference's int8 yolov5 artifact contract: int8 input/output
        # tensors dequantized via scale/zero-point (tools/yolov5.py:102-118)
        def _rep():
            r = np.random.RandomState(11)
            for _ in range(4):
                yield [r.uniform(0, 1, (1, SIZE, SIZE, 3))
                       .astype(np.float32)]
        conv.optimizations = [tf.lite.Optimize.DEFAULT]
        conv.representative_dataset = _rep
        conv.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS_INT8]
        conv.inference_input_type = tf.int8
        conv.inference_output_type = tf.int8
    blob = conv.convert()
    tag = "_rnn" if upsample == "resize" else ""
    path = str(tmp_path / (f"yolov5s{tag}_int8.tflite" if full_int8
                           else f"yolov5s{tag}_full.tflite"))
    with open(path, "wb") as f:
        f.write(blob)
    return path


@pytest.mark.timeout(900)
def test_full_yolov5_flatbuffer_roundtrip(tmp_path):
    import jax.numpy as jnp
    from deepdish_tpu.models.yolov5 import YOLOv5s

    path = _make_yolov5_tflite(tmp_path)
    variables, report = cv_mod.load_yolov5_tflite(path, input_size=SIZE)
    assert report["assigned"] == report["total"]
    assert not report["missing"] and not report["unused_ops"]

    tf = _tf()
    x = np.random.RandomState(2).uniform(
        0, 255, (1, SIZE, SIZE, 3)).astype(np.float32)
    interp = tf.lite.Interpreter(model_path=path)
    interp.allocate_tensors()
    # the interpreter consumes host-normalized [0,1] input; our net takes
    # raw 0..255 frames and normalizes internally
    interp.set_tensor(interp.get_input_details()[0]["index"], x / 255.0)
    interp.invoke()
    want = {interp.get_tensor(d["index"]).shape[1]:
            interp.get_tensor(d["index"])[0]
            for d in interp.get_output_details()}

    net = YOLOv5s(compute_dtype=jnp.float32)
    got = net.apply(variables, x[0])
    # f32 accumulation-order noise through the 60-conv CSP stack (XLA vs
    # TFLite CPU kernels); a binding error shows up as O(10)s everywhere
    for h in got:
        np.testing.assert_allclose(np.asarray(h), want[h.shape[0]],
                                   rtol=5e-3, atol=2e-1)
