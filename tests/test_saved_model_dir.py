"""SavedModel-DIRECTORY ingestion for the SSD family (VERDICT r2 #9).

The reference's SAVED_MODEL path (tools/saved_model.py:9-29, selected by
the 'saved_model' substring at deepdish.py:489) consumes a TF SavedModel
through the TF runtime. For TF-OD SSD exports we instead read the
directory's variables checkpoint and convert the weights through the
existing convert_ssd_tfod name map onto the native TPU detector — no TF
execution in the serving path.

The in-test artifact is a TF1-style SavedModel whose variables carry the
TF-OD graph names (the export_inference_graph convention), built from a
randomly initialized native net so forward equality closes the loop.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepdish_tpu.models import convert as cv

from test_convert import _randomize_bn, _ssd_tfod_named_tensors


def _tf():
    return pytest.importorskip("tensorflow")


@pytest.fixture(scope="module")
def ssd_saved_model(tmp_path_factory):
    """(saved_model_dir, donor_variables): TF1 SavedModel whose variables
    carry TF-OD names/values from a random SSDMobileNetV1 tree."""
    tf = _tf()
    from deepdish_tpu.models.ssd_mobilenet import SSDMobileNetV1
    rng = np.random.RandomState(5)
    net = SSDMobileNetV1(compute_dtype=jnp.float32)
    donor, slots = cv.trace_slots(net, (300, 300, 3))
    donor = _randomize_bn(donor, rng)
    tensors = _ssd_tfod_named_tensors(donor, slots)

    out_dir = str(tmp_path_factory.mktemp("sm") / "ssd_saved_model")
    tf1 = tf.compat.v1
    g = tf1.Graph()
    with g.as_default():
        for name, val in tensors.items():
            tf1.get_variable(name, initializer=np.asarray(val, np.float32))
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            b = tf1.saved_model.Builder(out_dir)
            b.add_meta_graph_and_variables(sess, ["serve"])
            b.save()
    return out_dir, donor


@pytest.mark.timeout(900)
def test_saved_model_dir_converts_to_native_ssd(ssd_saved_model):
    from deepdish_tpu.models.ssd_mobilenet import SSDMobileNetV1
    out_dir, donor = ssd_saved_model
    variables, report = cv.load_ssd_saved_model(out_dir)
    assert not report["missing"], report["missing"]

    net = SSDMobileNetV1(compute_dtype=jnp.float32)
    x = np.random.RandomState(2).uniform(
        0, 255, (300, 300, 3)).astype(np.float32)
    ref = net.apply(donor, x)
    got = net.apply(variables, x)
    for r, o in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.timeout(900)
def test_create_detector_with_saved_model_dir(ssd_saved_model):
    """create_detector('<dir>/ssd_saved_model') -> native TPU SSD with the
    directory's weights (not the host executor, not random init)."""
    from deepdish_tpu.models.registry import create_detector
    from deepdish_tpu.models.ssd_mobilenet import SSDMobileNetDetector
    out_dir, donor = ssd_saved_model
    det = create_detector(out_dir)
    assert isinstance(det, SSDMobileNetDetector)
    got = det.params["params"]["conv0"]["Conv_0"]["kernel"]
    want = donor["params"]["conv0"]["Conv_0"]["kernel"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


@pytest.mark.timeout(900)
def test_non_ssd_saved_model_falls_back_to_host(tmp_path):
    """A SavedModel that is NOT a TF-OD SSD export routes to the gated
    host executor (tools/saved_model.py parity for e.g. Faster-RCNN)."""
    tf = _tf()
    from deepdish_tpu.models.registry import create_detector
    from deepdish_tpu.models.saved_model import SavedModelDetector

    class M(tf.Module):
        @tf.function(input_signature=[
            tf.TensorSpec((1, None, None, 3), tf.uint8)])
        def __call__(self, img):
            x = tf.cast(img, tf.float32)
            n = tf.shape(x)[0]
            return {
                "detection_boxes": tf.zeros((n, 4, 4)) +
                tf.constant([[0.1, 0.1, 0.5, 0.5]]),
                "detection_classes": tf.ones((n, 4)),
                "detection_scores": tf.constant([[0.9, 0.8, 0.2, 0.1]]) +
                tf.zeros((n, 4)),
            }

    m = M()
    out_dir = str(tmp_path / "frcnn_saved_model")
    tf.saved_model.save(m, out_dir,
                        signatures={"serving_default":
                                    m.__call__.get_concrete_function()})
    labelmap = tmp_path / "map.pbtxt"
    labelmap.write_text(
        'item {\n  id: 1\n  name: "person"\n}\n')
    det = create_detector(out_dir, label_file=str(labelmap),
                          wanted_labels=["person"])
    assert isinstance(det, SavedModelDetector)
    frame = np.zeros((100, 200, 3), np.uint8)
    tlwh, classes, scores = det.detect_host(frame)
    assert len(tlwh) == 2                 # two detections above 0.5
    assert classes == [0, 0]              # wanted-vocab indices
    np.testing.assert_allclose(tlwh[0], [20.0, 10.0, 80.0, 40.0])
