"""Weight-ingestion tests: slot tracing, BN-fold round trips for every model
family, real TFLite flatbuffer round trips (gated on tensorflow), MARS
frozen-pb name map, TF-OD SSD name map, Keras h5 structural conversion.

The reference consumes pre-trained weights through external runtimes
(/root/reference/tools/ssd_mobilenet.py:100-103, tools/yolov5.py:102-118,
tools/generate_detections.py:118-177, tools/yolo.py:186); these tests prove
the converters reproduce that capability: an artifact's weights land in the
right flax leaves and the forward pass matches.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepdish_tpu.models import convert as cv


def _tf():
    return pytest.importorskip("tensorflow")


# --------------------------------------------------------------------------
# Slot tracing
# --------------------------------------------------------------------------

def test_trace_slots_ssd():
    from deepdish_tpu.models.ssd_mobilenet import SSDMobileNetV1, INPUT_SIZE
    _, slots = cv.trace_slots(SSDMobileNetV1(compute_dtype=jnp.float32),
                              (INPUT_SIZE, INPUT_SIZE, 3))
    kinds = [s.kind for s in slots]
    assert kinds.count("dw") == 13
    assert kinds.count("conv") == 1 + 13 + 8 + 12   # conv0, pw, extras, heads
    assert kinds.count("bn") == 0                    # all BNs conv-attached
    by_path = {"/".join(s.path): s for s in slots}
    assert by_path["ds5/dw"].bn_path == ("ds5", "dw_bn")
    assert by_path["box_head3"].has_bias
    assert by_path["box_head3"].bn_path is None


def test_trace_slots_mars_no_misassociation():
    from deepdish_tpu.models.mars import MarsNet
    _, slots = cv.trace_slots(MarsNet(), (1, 128, 64, 3))
    by_path = {"/".join(s.path): s for s in slots}
    # 5 standalone pre-activation BNs + ball
    standalone = [s for s in slots if s.kind == "bn"]
    assert len(standalone) == 6
    # the projection conv must NOT capture the next block's pre_bn
    assert by_path["conv3_1/projection"].bn_path is None
    assert by_path["conv4_1/projection"].bn_path is None
    # inner conv2 has a bias and no BN
    s = by_path["conv2_1/inner/conv2"]
    assert s.has_bias and s.bn_path is None
    # conv1_1 owns conv1_1_bn; fc1 owns fc1_bn
    assert by_path["conv1_1"].bn_path == ("conv1_1_bn", "BatchNorm_0")
    assert by_path["fc1"].kind == "dense"
    assert by_path["fc1"].bn_path == ("fc1_bn", "BatchNorm_0")
    assert not by_path["fc1"].bn_has_scale    # slim center-only BN


# --------------------------------------------------------------------------
# BN-fold round trips per family: donor variables -> folded TFLite-style op
# stream -> assigned onto a fresh init -> identical forward pass.
# --------------------------------------------------------------------------

def _randomize_bn(variables, rng):
    """Give BN stats non-trivial values so folding mistakes can't hide."""
    def walk(tree, in_stats):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, in_stats)
            elif in_stats and k == "mean":
                tree[k] = rng.normal(0, 0.3, v.shape).astype(np.float32)
            elif in_stats and k == "var":
                tree[k] = rng.uniform(0.5, 2.0, v.shape).astype(np.float32)
    variables = jax.tree.map(np.asarray, variables)
    walk(variables["batch_stats"], True)
    return variables


FAMILIES = {
    "mars": ("deepdish_tpu.models.mars", "MarsNet", (2, 128, 64, 3), {}),
    "ssd": ("deepdish_tpu.models.ssd_mobilenet", "SSDMobileNetV1",
            (300, 300, 3), {"compute_dtype": jnp.float32}),
    "yolov5": ("deepdish_tpu.models.yolov5", "YOLOv5s", (320, 320, 3),
               {"compute_dtype": jnp.float32}),
    "yolov3": ("deepdish_tpu.models.yolov3", "YOLOv3", (416, 416, 3),
               {"compute_dtype": jnp.float32}),
    "efficientdet": ("deepdish_tpu.models.efficientdet", "EfficientDetLite0",
                     (320, 320, 3), {"compute_dtype": jnp.float32}),
}


@pytest.mark.parametrize("family", list(FAMILIES))
def test_fold_roundtrip(family, rng):
    import importlib
    modname, clsname, shape, kw = FAMILIES[family]
    net = getattr(importlib.import_module(modname), clsname)(**kw)
    donor, slots = cv.trace_slots(net, shape)
    donor = _randomize_bn(donor, rng)
    ops = cv.fold_slots_to_ops(donor, slots)
    fresh, _ = cv.trace_slots(net, shape, rngs=jax.random.PRNGKey(7))
    converted, report = cv.assign_slots(slots, ops, fresh)
    assert report["assigned"] == report["total"] == len(slots)
    assert not report["missing"] and not report["unused_ops"]

    x = rng.uniform(0, 255, shape).astype(np.float32)
    ref = net.apply(donor, x)
    out = net.apply(converted, x)
    for r, o in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_assign_strict_failure(rng):
    from deepdish_tpu.models.mars import MarsNet
    net = MarsNet()
    donor, slots = cv.trace_slots(net, (1, 128, 64, 3))
    ops = cv.fold_slots_to_ops(donor, slots)
    with pytest.raises(ValueError, match="incomplete"):
        cv.assign_slots(slots, ops[:-4], donor)


# --------------------------------------------------------------------------
# Real TFLite flatbuffers (gated on tensorflow): build a small model with
# TF, convert, ingest, compare against the TFLite interpreter.
# --------------------------------------------------------------------------

class _SmallNet:
    """flax mirror of the TF model built in _make_tf_module."""

    def build(self):
        import flax.linen as nn

        class Net(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Conv(8, (3, 3), padding="SAME", use_bias=False,
                            name="c1")(x)
                x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                                 name="bn1")(x)
                x = nn.relu(x)
                x = nn.Conv(8, (3, 3), padding="SAME",
                            feature_group_count=8, use_bias=False,
                            name="dw")(x)
                x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                                 name="bn2")(x)
                x = nn.relu(x)
                x = x.reshape((x.shape[0], -1))
                x = nn.Dense(4, name="fc")(x)
                return x

        return Net()


def _make_tflite(tmp_path, quantize=False):
    tf = _tf()
    rng = np.random.RandomState(3)
    k1 = rng.normal(0, 0.5, (3, 3, 3, 8)).astype(np.float32)
    g1 = rng.uniform(0.5, 1.5, 8).astype(np.float32)
    b1 = rng.normal(0, 0.2, 8).astype(np.float32)
    m1 = rng.normal(0, 0.3, 8).astype(np.float32)
    v1 = rng.uniform(0.5, 2.0, 8).astype(np.float32)
    kd = rng.normal(0, 0.5, (3, 3, 8, 1)).astype(np.float32)
    g2 = rng.uniform(0.5, 1.5, 8).astype(np.float32)
    b2 = rng.normal(0, 0.2, 8).astype(np.float32)
    m2 = rng.normal(0, 0.3, 8).astype(np.float32)
    v2 = rng.uniform(0.5, 2.0, 8).astype(np.float32)
    kf = rng.normal(0, 0.2, (16 * 16 * 8, 4)).astype(np.float32)
    bf = rng.normal(0, 0.2, 4).astype(np.float32)

    class M(tf.Module):
        @tf.function(input_signature=[
            tf.TensorSpec((1, 16, 16, 3), tf.float32)])
        def __call__(self, x):
            x = tf.nn.conv2d(x, k1, 1, "SAME")
            x = tf.nn.batch_normalization(x, m1, v1, b1, g1, 1e-3)
            x = tf.nn.relu(x)
            x = tf.nn.depthwise_conv2d(x, kd, (1, 1, 1, 1), "SAME")
            x = tf.nn.batch_normalization(x, m2, v2, b2, g2, 1e-3)
            x = tf.nn.relu(x)
            x = tf.reshape(x, (1, -1))
            return tf.linalg.matmul(x, kf) + bf

    m = M()
    conv = tf.lite.TFLiteConverter.from_concrete_functions(
        [m.__call__.get_concrete_function()], m)
    if quantize:
        conv.optimizations = [tf.lite.Optimize.DEFAULT]
    blob = conv.convert()
    path = str(tmp_path / ("q.tflite" if quantize else "f.tflite"))
    with open(path, "wb") as f:
        f.write(blob)

    weights = dict(k1=k1, g1=g1, b1=b1, m1=m1, v1=v1, kd=kd, g2=g2, b2=b2,
                   m2=m2, v2=v2, kf=kf, bf=bf)
    return path, weights


def _tflite_forward(path, x):
    tf = _tf()
    interp = tf.lite.Interpreter(model_path=path)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    interp.set_tensor(inp["index"], x)
    interp.invoke()
    return interp.get_tensor(out["index"])


@pytest.mark.parametrize("quantize", [False, True])
def test_real_tflite_roundtrip(tmp_path, quantize):
    path, _ = _make_tflite(tmp_path, quantize=quantize)
    float_path = path if not quantize else _make_tflite(tmp_path)[0]
    net = _SmallNet().build()
    variables, report = cv.convert_tflite(net, (1, 16, 16, 3), path)
    assert not report["missing"] and not report["unused_ops"]

    x = np.random.RandomState(5).uniform(-1, 1, (1, 16, 16, 3)) \
        .astype(np.float32)
    # the quantized interpreter also quantizes activations dynamically at
    # runtime; dequantized-weight fidelity is judged against the float model
    want = _tflite_forward(float_path, x)
    got = np.asarray(net.apply(variables, x))
    tol = 2e-1 if quantize else 1e-4
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)

    if quantize:
        # the sharp check: each dequantized kernel within its int8 step of
        # the float flatbuffer's (both are BN-folded by the converter)
        q_ops, _ = cv.read_tflite(path)
        f_ops, _ = cv.read_tflite(float_path)
        q_convs = [o for o in q_ops if o.kind in ("conv", "dw", "dense")]
        f_convs = [o for o in f_ops if o.kind in ("conv", "dw", "dense")]
        assert len(q_convs) == len(f_convs) == 3
        for qo, fo in zip(q_convs, f_convs):
            step = np.abs(fo.kernel).max() / 127.0
            np.testing.assert_allclose(qo.kernel, fo.kernel,
                                       atol=step + 1e-6)


# --------------------------------------------------------------------------
# MARS frozen-pb name map
# --------------------------------------------------------------------------

def _mars_reference_named_tensors(variables):
    """Emit the slim-frozen-graph constant dict (freeze_model.py names, with
    the nested-scope duplication quirk) from a MarsNet variable tree."""
    p = variables["params"]
    s = variables["batch_stats"]
    out = {}

    def bn(frag, node, nested):
        scope = f"{frag.split('/')[0]}/{frag}" if nested else frag
        out[f"{scope}/bn/beta"] = np.asarray(node["bias"])

    def bn_full(frag, pnode, snode, nested=True):
        scope = f"{frag}/{frag}" if nested else frag
        out[f"{scope}/bn/beta"] = np.asarray(pnode["bias"])
        out[f"{scope}/bn/moving_mean"] = np.asarray(snode["mean"])
        out[f"{scope}/bn/moving_variance"] = np.asarray(snode["var"])

    for c in ("conv1_1", "conv1_2"):
        out[f"{c}/weights"] = np.asarray(p[c]["kernel"])
        bn_full(c, p[f"{c}_bn"]["BatchNorm_0"], s[f"{c}_bn"]["BatchNorm_0"])
    blocks = [("conv2_1", False, True), ("conv2_3", False, False),
              ("conv3_1", True, False), ("conv3_3", False, False),
              ("conv4_1", True, False), ("conv4_3", False, False)]
    for blk, inc, first in blocks:
        if not first:
            bn_full(blk, p[blk]["pre_bn"]["BatchNorm_0"],
                    s[blk]["pre_bn"]["BatchNorm_0"], nested=False)
        out[f"{blk}/1/weights"] = np.asarray(p[blk]["inner"]["conv1"]["kernel"])
        bn_full(f"{blk}/1", p[blk]["inner"]["bn1"]["BatchNorm_0"],
                s[blk]["inner"]["bn1"]["BatchNorm_0"])
        out[f"{blk}/2/weights"] = np.asarray(p[blk]["inner"]["conv2"]["kernel"])
        out[f"{blk}/2/biases"] = np.asarray(p[blk]["inner"]["conv2"]["bias"])
        if inc:
            out[f"{blk}/projection/weights"] = \
                np.asarray(p[blk]["projection"]["kernel"])
    out["fc1/weights"] = np.asarray(p["fc1"]["kernel"])
    bn_full("fc1", p["fc1_bn"]["BatchNorm_0"], s["fc1_bn"]["BatchNorm_0"])
    out["ball/beta"] = np.asarray(p["ball"]["BatchNorm_0"]["bias"])
    out["ball/moving_mean"] = np.asarray(s["ball"]["BatchNorm_0"]["mean"])
    out["ball/moving_variance"] = np.asarray(s["ball"]["BatchNorm_0"]["var"])
    return out


def test_mars_pb_name_map(rng):
    from deepdish_tpu.models.mars import MarsNet
    net = MarsNet()
    donor, _ = cv.trace_slots(net, (2, 128, 64, 3))
    donor = _randomize_bn(donor, rng)
    tensors = _mars_reference_named_tensors(donor)
    fresh, _ = cv.trace_slots(net, (2, 128, 64, 3),
                              rngs=jax.random.PRNGKey(9))
    converted, report = cv.convert_mars_pb(tensors, fresh)
    assert not report["missing"]

    x = rng.uniform(0, 255, (2, 128, 64, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(net.apply(converted, x)),
                               np.asarray(net.apply(donor, x)),
                               rtol=1e-5, atol=1e-5)


def test_mars_pb_missing_raises(rng):
    from deepdish_tpu.models.mars import MarsNet
    net = MarsNet()
    donor, _ = cv.trace_slots(net, (1, 128, 64, 3))
    tensors = _mars_reference_named_tensors(donor)
    del tensors["conv3_1/projection/weights"]
    with pytest.raises(ValueError, match="missing"):
        cv.convert_mars_pb(tensors, donor)


# --------------------------------------------------------------------------
# TF-OD SSD name map (unfolded-BN export style)
# --------------------------------------------------------------------------

def _ssd_tfod_named_tensors(variables, slots):
    """TF-OD-style named tensors (HWIO convs, HWCM depthwise, separate
    BatchNorm vars) from an SSDMobileNetV1 variable tree."""
    flat_p = cv._flatten(variables["params"])
    flat_s = cv._flatten(variables["batch_stats"])
    base = "FeatureExtractor/MobilenetV1/MobilenetV1"
    names = {}

    def put_bn(prefix, bnpath):
        bn = "/".join(bnpath)
        names[f"{prefix}/BatchNorm/gamma"] = flat_p[f"{bn}/scale"]
        names[f"{prefix}/BatchNorm/beta"] = flat_p[f"{bn}/bias"]
        names[f"{prefix}/BatchNorm/moving_mean"] = flat_s[f"{bn}/mean"]
        names[f"{prefix}/BatchNorm/moving_variance"] = flat_s[f"{bn}/var"]

    by_path = {"/".join(s.path): s for s in slots}
    names[f"{base}/Conv2d_0/weights"] = flat_p["conv0/Conv_0/kernel"]
    put_bn(f"{base}/Conv2d_0", by_path["conv0/Conv_0"].bn_path)
    for i in range(1, 14):
        dw = flat_p[f"ds{i}/dw/kernel"]            # (kh, kw, 1, C)
        names[f"{base}/Conv2d_{i}_depthwise/depthwise_weights"] = \
            np.transpose(dw, (0, 1, 3, 2))          # HWCM
        put_bn(f"{base}/Conv2d_{i}_depthwise", by_path[f"ds{i}/dw"].bn_path)
        names[f"{base}/Conv2d_{i}_pointwise/weights"] = \
            flat_p[f"ds{i}/pw/kernel"]
        put_bn(f"{base}/Conv2d_{i}_pointwise", by_path[f"ds{i}/pw"].bn_path)
    fx = "FeatureExtractor/MobilenetV1"
    for i in range(4):
        for tag, mod in (("1", f"extra{i}_1x1"), ("2", f"extra{i}_3x3")):
            kind = "1x1_256" if tag == "1" else "3x3_s2_512"
            prefix = f"{fx}/Conv2d_13_pointwise_{tag}_Conv2d_{i + 2}_{kind}"
            names[f"{prefix}/weights"] = flat_p[f"{mod}/Conv_0/kernel"]
            put_bn(prefix, by_path[f"{mod}/Conv_0"].bn_path)
    for i in range(6):
        for head, mod in (("BoxEncodingPredictor", f"box_head{i}"),
                          ("ClassPredictor", f"cls_head{i}")):
            names[f"BoxPredictor_{i}/{head}/weights"] = \
                flat_p[f"{mod}/kernel"]
            names[f"BoxPredictor_{i}/{head}/biases"] = flat_p[f"{mod}/bias"]
    return names


def test_ssd_tfod_name_map(rng):
    from deepdish_tpu.models.ssd_mobilenet import SSDMobileNetV1
    net = SSDMobileNetV1(compute_dtype=jnp.float32)
    donor, slots = cv.trace_slots(net, (300, 300, 3))
    donor = _randomize_bn(donor, rng)
    tensors = _ssd_tfod_named_tensors(donor, slots)
    converted, report = cv.convert_ssd_tfod(tensors, net=net)
    assert not report["missing"]

    x = rng.uniform(0, 255, (300, 300, 3)).astype(np.float32)
    ref = net.apply(donor, x)
    out = net.apply(converted, x)
    for r, o in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)


# --------------------------------------------------------------------------
# Keras HDF5 (yolo.h5-style) structural conversion
# --------------------------------------------------------------------------

def test_keras_h5_roundtrip(tmp_path):
    tf = _tf()
    keras = tf.keras
    inp = keras.Input((16, 16, 3))
    x = keras.layers.Conv2D(8, 3, padding="same", use_bias=False)(inp)
    x = keras.layers.BatchNormalization(epsilon=1e-3)(x)
    x = keras.layers.LeakyReLU(negative_slope=0.1)(x)
    x = keras.layers.Conv2D(12, 3, padding="same", use_bias=False)(x)
    x = keras.layers.BatchNormalization(epsilon=1e-3)(x)
    x = keras.layers.LeakyReLU(negative_slope=0.1)(x)
    x = keras.layers.Conv2D(4, 1, use_bias=True)(x)
    model = keras.Model(inp, x)
    # non-trivial BN stats
    for layer in model.layers:
        if isinstance(layer, keras.layers.BatchNormalization):
            ws = layer.get_weights()
            r = np.random.RandomState(1)
            ws[2] = r.normal(0, 0.3, ws[2].shape).astype(np.float32)
            ws[3] = r.uniform(0.5, 2.0, ws[3].shape).astype(np.float32)
            layer.set_weights(ws)
    path = str(tmp_path / "m.h5")
    model.save(path)

    import flax.linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), padding="SAME", use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-3)(x)
            x = nn.leaky_relu(x, 0.1)
            x = nn.Conv(12, (3, 3), padding="SAME", use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-3)(x)
            x = nn.leaky_relu(x, 0.1)
            return nn.Conv(4, (1, 1))(x)

    net = Net()
    variables, report = cv.convert_keras_h5(net, (1, 16, 16, 3), path)
    assert report["assigned"] == report["total"]

    x = np.random.RandomState(2).uniform(-1, 1, (1, 16, 16, 3)) \
        .astype(np.float32)
    want = model.predict(x, verbose=0)
    got = np.asarray(net.apply(variables, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------------------
# Format-real MARS artifact tests: a Keras mirror of the slim network,
# exported to a REAL .tflite (BN folding + pre-activation BNs as MUL/ADD),
# converted structurally onto MarsNet, forward parity vs Keras. Plus the
# TF-checkpoint ingestion path (tools/freeze_model.py:189-193 artifact).
# --------------------------------------------------------------------------

def _keras_mars(tf):
    """Keras functional mirror of freeze_model.py:88-157 (inference mode)."""
    keras = tf.keras
    L = keras.layers

    def bn(x):
        return L.BatchNormalization(epsilon=1e-3, scale=False)(x)

    def inner(x, n, stride):
        y = L.Conv2D(n, 3, strides=stride, padding="same",
                     use_bias=False)(x)
        y = bn(y)
        y = L.ELU()(y)
        return L.Conv2D(n, 3, padding="same", use_bias=True)(y)

    def block(x, n, increase=False, first=False):
        pre = x if first else L.ELU()(bn(x))
        out_n = n * 2 if increase else n
        stride = 2 if increase else 1
        y = inner(pre, out_n, stride)
        if increase:
            proj = L.Conv2D(out_n, 1, strides=2, padding="same",
                            use_bias=False)(x)
            return L.Add()([proj, y])
        return L.Add()([x, y])

    inp = keras.Input((128, 64, 3))
    x = L.Conv2D(32, 3, padding="same", use_bias=False)(inp)
    x = L.ELU()(bn(x))
    x = L.Conv2D(32, 3, padding="same", use_bias=False)(x)
    x = L.ELU()(bn(x))
    x = L.MaxPool2D(3, strides=2, padding="valid")(x)
    x = block(x, 32, first=True)
    x = block(x, 32)
    x = block(x, 32, increase=True)
    x = block(x, 64)
    x = block(x, 64, increase=True)
    x = block(x, 128)
    x = L.Flatten()(x)
    x = L.Dense(128, use_bias=False)(x)
    x = L.ELU()(bn(x))
    x = bn(x)
    norm = L.Lambda(lambda t: t / tf.sqrt(
        1e-8 + tf.reduce_sum(tf.square(t), axis=1, keepdims=True)),
        output_shape=(128,))(x)
    return keras.Model(inp, norm)


def _randomize_keras_bn(model, seed=11):
    r = np.random.RandomState(seed)
    for layer in model.layers:
        if "batch_normalization" in layer.name:
            ws = layer.get_weights()     # [beta, moving_mean, moving_var]
            ws[0] = r.normal(0, 0.3, ws[0].shape).astype(np.float32)
            ws[1] = r.normal(0, 0.3, ws[1].shape).astype(np.float32)
            ws[2] = r.uniform(0.5, 2.0, ws[2].shape).astype(np.float32)
            layer.set_weights(ws)


@pytest.mark.timeout(900)
def test_mars_real_tflite_artifact(tmp_path):
    """The reference's TFLite MARS encoder path
    (tools/generate_detections.py:151-177), end to end on a real
    flatbuffer: Keras slim-mirror -> tflite -> structural conversion ->
    MarsNet forward parity."""
    tf = _tf()
    model = _keras_mars(tf)
    _randomize_keras_bn(model)
    conv = tf.lite.TFLiteConverter.from_keras_model(model)
    blob = conv.convert()
    path = str(tmp_path / "mars.tflite")
    with open(path, "wb") as f:
        f.write(blob)

    from deepdish_tpu.models.convert import load_mars
    variables, report = load_mars(path)
    assert not report["missing"] and not report["unused_ops"]

    from deepdish_tpu.models.mars import MarsNet
    x = np.random.RandomState(6).uniform(0, 255, (2, 128, 64, 3)) \
        .astype(np.float32)
    want = model.predict(x, verbose=0)
    got = np.asarray(MarsNet().apply(variables, x))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_mars_checkpoint_ingestion(tmp_path, rng):
    """TF-checkpoint artifact path: write a checkpoint carrying the slim
    variable names, load via load_mars, forward parity vs donor."""
    tf = _tf()
    from deepdish_tpu.models.mars import MarsNet
    net = MarsNet()
    donor, _ = cv.trace_slots(net, (2, 128, 64, 3))
    donor = _randomize_bn(donor, rng)
    tensors = _mars_reference_named_tensors(donor)

    path = str(tmp_path / "mars-small128.ckpt-68577")
    import tensorflow.compat.v1 as tf1
    with tf1.Session(graph=tf1.Graph()) as s:
        vs = {k: tf1.get_variable(k, initializer=v)
              for k, v in tensors.items()}
        s.run(tf1.global_variables_initializer())
        tf1.train.Saver(vs).save(s, path)

    from deepdish_tpu.models.convert import load_mars
    variables, report = load_mars(path)
    assert not report["missing"]
    x = rng.uniform(0, 255, (2, 128, 64, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(net.apply(variables, x)),
                               np.asarray(net.apply(donor, x)),
                               rtol=1e-5, atol=1e-5)
