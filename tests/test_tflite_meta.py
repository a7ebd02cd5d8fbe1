"""TFLite metadata extraction (tools/tflite_object_detector.py:117-137
parity): NormalizationOptions mean/std from the metadata flatbuffer and
labels from the ZIP-packed associated file, read without tflite_support.

The test builds a REAL metadata flatbuffer with the flatbuffers builder
(slot numbers per tensorflow/lite metadata_schema.fbs), embeds it in a
TFLite model's metadata section via the schema object API, appends the
label file as a ZIP (the packer's on-disk format), and reads it all back.
"""
import io
import zipfile

import numpy as np
import pytest

from deepdish_tpu.models.tflite_meta import FBTable, read_metadata

flatbuffers = pytest.importorskip("flatbuffers")


def _build_metadata(mean, std, label_file="labels.txt"):
    b = flatbuffers.Builder(0)
    name_off = b.CreateString(label_file)

    def f32vec(vals):
        b.StartVector(4, len(vals), 4)
        for v in reversed(vals):
            b.PrependFloat32(v)
        return b.EndVector()

    def tabvec(items):
        b.StartVector(4, len(items), 4)
        for it in reversed(items):
            b.PrependUOffsetTRelative(it)
        return b.EndVector()

    mean_v = f32vec(mean)
    std_v = f32vec(std)
    b.StartObject(2)                       # NormalizationOptions
    b.PrependUOffsetTRelativeSlot(0, mean_v, 0)
    b.PrependUOffsetTRelativeSlot(1, std_v, 0)
    norm = b.EndObject()

    b.StartObject(2)                       # ProcessUnit
    b.PrependUint8Slot(0, 1, 0)            # options_type = NormalizationOptions
    b.PrependUOffsetTRelativeSlot(1, norm, 0)
    pu = b.EndObject()
    pu_vec = tabvec([pu])

    b.StartObject(7)                       # input TensorMetadata
    b.PrependUOffsetTRelativeSlot(4, pu_vec, 0)   # process_units
    in_tm = b.EndObject()

    b.StartObject(4)                       # AssociatedFile
    b.PrependUOffsetTRelativeSlot(0, name_off, 0)
    b.PrependInt8Slot(2, 2, 0)             # type = TENSOR_AXIS_LABELS
    af = b.EndObject()
    af_vec = tabvec([af])

    b.StartObject(7)                       # output TensorMetadata
    b.PrependUOffsetTRelativeSlot(6, af_vec, 0)   # associated_files
    out_tm = b.EndObject()

    in_vec = tabvec([in_tm])
    out_vec = tabvec([out_tm])
    b.StartObject(7)                       # SubGraphMetadata
    b.PrependUOffsetTRelativeSlot(2, in_vec, 0)
    b.PrependUOffsetTRelativeSlot(3, out_vec, 0)
    sg = b.EndObject()
    sg_vec = tabvec([sg])

    b.StartObject(8)                       # ModelMetadata
    b.PrependUOffsetTRelativeSlot(3, sg_vec, 0)
    mm = b.EndObject()
    b.Finish(mm)
    return bytes(b.Output())


def _attach_metadata(model_blob: bytes, meta: bytes) -> bytes:
    """Embed a TFLITE_METADATA buffer via the schema object API."""
    from tensorflow.lite.python import schema_py_generated as fb
    model = fb.ModelT.InitFromPackedBuf(bytearray(model_blob), 0)
    buf = fb.BufferT()
    buf.data = np.frombuffer(meta, np.uint8)
    model.buffers.append(buf)
    md = fb.MetadataT()
    md.name = "TFLITE_METADATA"
    md.buffer = len(model.buffers) - 1
    model.metadata = (model.metadata or []) + [md]
    b = flatbuffers.Builder(0)
    b.Finish(model.Pack(b), b"TFL3")
    return bytes(b.Output())


def _append_zip(blob: bytes, files: dict) -> bytes:
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w") as z:
        for name, data in files.items():
            z.writestr(name, data)
    return blob + bio.getvalue()


@pytest.fixture(scope="module")
def tiny_tflite(tmp_path_factory):
    tf = pytest.importorskip("tensorflow")

    class M(tf.Module):
        @tf.function(input_signature=[
            tf.TensorSpec((1, 8, 8, 3), tf.float32)])
        def __call__(self, x):
            return tf.reduce_mean(x, axis=(1, 2))

    m = M()
    conv = tf.lite.TFLiteConverter.from_concrete_functions(
        [m.__call__.get_concrete_function()], m)
    return conv.convert()


def test_fbtable_roundtrip():
    meta = _build_metadata([1.5, 2.5], [3.0])
    root = FBTable.root(meta)
    sg = root.vector_tables(3)[0]
    pu = sg.vector_tables(2)[0].vector_tables(4)[0]
    assert pu.scalar(0, "<B", 0) == 1
    opts = pu.table(1)
    np.testing.assert_allclose(opts.vector_f32(0), [1.5, 2.5])
    np.testing.assert_allclose(opts.vector_f32(1), [3.0])
    af = sg.vector_tables(3)[0].vector_tables(6)[0]
    assert af.string(0) == "labels.txt"
    assert af.scalar(2, "<b", 0) == 2


def test_read_metadata_full(tiny_tflite, tmp_path):
    blob = _attach_metadata(tiny_tflite,
                            _build_metadata([110.0, 115.0, 120.0], [55.0]))
    blob = _append_zip(blob, {"labels.txt": "person\ncar\nbicycle\n"})
    path = str(tmp_path / "meta.tflite")
    with open(path, "wb") as f:
        f.write(blob)
    got = read_metadata(path)
    assert got["mean"] == [110.0, 115.0, 120.0]
    assert got["std"] == [55.0]
    assert got["labels"] == ["person", "car", "bicycle"]


def test_read_metadata_absent(tiny_tflite, tmp_path):
    path = str(tmp_path / "plain.tflite")
    with open(path, "wb") as f:
        f.write(tiny_tflite)
    # absent metadata -> NO fields reported, so family-specific defaults
    # (EfficientDet-Lite mean 127 / std 128) survive at the call site
    got = read_metadata(path)
    assert got == {}


def test_detector_uses_metadata(tiny_tflite, tmp_path):
    """create_detector('...tflite') picks up metadata mean/std + labels
    (falls back to random-init weights for this non-EfficientDet file)."""
    from deepdish_tpu.models import create_detector
    blob = _attach_metadata(tiny_tflite,
                            _build_metadata([100.0], [50.0]))
    blob = _append_zip(blob, {"labels.txt": "aardvark\nzebra\n"})
    path = str(tmp_path / "edet.tflite")
    with open(path, "wb") as f:
        f.write(blob)
    det = create_detector(path, allow_random_weights=True)
    assert det.labels[0] == "aardvark" and det.labels[1] == "zebra"
    assert det.net.norm_mean == (100.0,)
    assert det.net.norm_std == (50.0,)