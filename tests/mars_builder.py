"""In-test full-integer MARS encoder artifact, built with the real tf.lite
converter — the analog of the reference's quantized `mars-little*.tflite`
encoder files (tools/generate_detections.py:151-177). A TF mirror of the
MARS architecture (models/mars.py / freeze_model.py:88-157) at full size
(128x64x3 -> L2-normalized 128-d), post-training full-int8 quantized with
float input/output (the converter keeps ELU in float behind
DEQUANTIZE/QUANTIZE pairs and ends with DEQUANTIZE after the int8
L2_NORMALIZATION — exactly the op stream models/qgraph.py executes)."""
import numpy as np


def _tf():
    import tensorflow as tf
    return tf


def make_mars_int8_tflite(tmp_path, seed: int = 5) -> str:
    tf = _tf()
    rng = np.random.RandomState(seed)

    def w(shape, scale=0.08):
        return tf.constant(rng.normal(0, scale, shape).astype(np.float32))

    def bn_params(c):
        return (tf.constant(rng.normal(0, 0.3, c).astype(np.float32)),  # mean
                tf.constant(rng.uniform(0.5, 1.5, c).astype(np.float32)),  # var
                tf.constant(rng.normal(0, 0.3, c).astype(np.float32)))  # beta

    weights = {}

    def conv_bn_elu(x, name, cin, cout, stride=1):
        if name not in weights:
            weights[name] = (w((3, 3, cin, cout)), bn_params(cout))
        k, (m, v, b) = weights[name]
        x = tf.nn.conv2d(x, k, stride, "SAME")
        x = tf.nn.batch_normalization(x, m, v, b, None, 1e-3)
        return tf.nn.elu(x)

    def residual(x, name, cin, cout, increase):
        tfm = _tf()
        if name not in weights:
            weights[name] = dict(
                pre=bn_params(cin),
                c1=(w((3, 3, cin, cout)), bn_params(cout)),
                c2=(w((3, 3, cout, cout)),
                    tfm.constant(rng.normal(0, 0.1, cout)
                                 .astype(np.float32))),
                proj=w((1, 1, cin, cout)) if increase else None)
        ws = weights[name]
        m, v, b = ws["pre"]
        pre = tfm.nn.elu(tfm.nn.batch_normalization(x, m, v, b, None, 1e-3))
        k1, (m1, v1, b1) = ws["c1"]
        y = tfm.nn.conv2d(pre, k1, 2 if increase else 1, "SAME")
        y = tfm.nn.elu(tfm.nn.batch_normalization(y, m1, v1, b1, None, 1e-3))
        k2, bias2 = ws["c2"]
        y = tfm.nn.conv2d(y, k2, 1, "SAME") + bias2
        if increase:
            return tfm.nn.conv2d(x, ws["proj"], 2, "SAME") + y
        return x + y

    class M(tf.Module):
        @tf.function(input_signature=[
            tf.TensorSpec((1, 128, 64, 3), tf.float32)])
        def __call__(self, img):
            tfm = _tf()
            x = conv_bn_elu(img, "conv1_1", 3, 32)
            x = conv_bn_elu(x, "conv1_2", 32, 32)
            x = tfm.nn.max_pool2d(x, 3, 2, "VALID")
            x = residual(x, "conv2_1", 32, 32, False)
            x = residual(x, "conv2_3", 32, 32, False)
            x = residual(x, "conv3_1", 32, 64, True)
            x = residual(x, "conv3_3", 64, 64, False)
            x = residual(x, "conv4_1", 64, 128, True)
            x = residual(x, "conv4_3", 128, 128, False)
            x = tfm.reshape(x, (1, -1))
            if "fc1" not in weights:
                weights["fc1"] = (w((int(x.shape[1]), 128), 0.02),
                                  bn_params(128), bn_params(128))
            kf, (m1, v1, b1), (m2, v2, b2) = weights["fc1"]
            x = tfm.matmul(x, kf)
            x = tfm.nn.batch_normalization(x, m1, v1, b1, None, 1e-3)
            x = tfm.nn.elu(x)
            x = tfm.nn.batch_normalization(x, m2, v2, b2, None, 1e-3)
            return tfm.math.l2_normalize(x, axis=1, epsilon=1e-8)

    m = M()
    conv = tf.lite.TFLiteConverter.from_concrete_functions(
        [m.__call__.get_concrete_function()], m)

    def _rep():
        r = np.random.RandomState(seed + 1)
        for _ in range(4):
            yield [r.uniform(0, 255, (1, 128, 64, 3)).astype(np.float32)]

    conv.optimizations = [tf.lite.Optimize.DEFAULT]
    conv.representative_dataset = _rep
    conv.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS_INT8]
    conv.inference_input_type = tf.float32
    conv.inference_output_type = tf.float32
    blob = conv.convert()
    path = str(tmp_path / "mars-little128_int8.tflite")
    with open(path, "wb") as f:
        f.write(blob)
    return path
