"""TFLite metadata extraction: normalization mean/std + packed label files.

The reference's generic TFLite detector configures itself from the model's
embedded metadata (/root/reference/tools/tflite_object_detector.py:117-137):
NormalizationOptions (mean/std) from the input tensor's process units, and
the label list from an associated file packed into the flatbuffer. This
module reproduces that without tflite_support: the metadata flatbuffer is
walked with a minimal generic reader (vtable/uoffset navigation per the
flatbuffers wire format), and associated files are read from the ZIP archive
that the metadata packer appends to the .tflite file (zipfile finds the
central directory at EOF regardless of the flatbuffer prefix).

Schema field slots follow tensorflow/lite's metadata_schema.fbs:
  ModelMetadata.subgraph_metadata = field 3
  SubGraphMetadata.input_tensor_metadata = field 2
  TensorMetadata.process_units = field 4, .associated_files = field 6
  ProcessUnit.options_type = field 0 (union: 1 = NormalizationOptions)
  ProcessUnit.options = field 1
  NormalizationOptions.mean = field 0, .std = field 1
  AssociatedFile.name = field 0, .type = field 2
"""
from __future__ import annotations

import io
import struct
import zipfile
from typing import Dict, List, Optional

import numpy as np


class FBTable:
    """Minimal flatbuffers table reader (little-endian wire format)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos

    @classmethod
    def root(cls, buf: bytes):
        (off,) = struct.unpack_from("<I", buf, 0)
        return cls(buf, off)

    def _field_pos(self, slot: int) -> Optional[int]:
        (soff,) = struct.unpack_from("<i", self.buf, self.pos)
        vtable = self.pos - soff
        (vsize,) = struct.unpack_from("<H", self.buf, vtable)
        entry = 4 + 2 * slot
        if entry + 2 > vsize:
            return None
        (foff,) = struct.unpack_from("<H", self.buf, vtable + entry)
        if foff == 0:
            return None
        return self.pos + foff

    def scalar(self, slot: int, fmt: str, default=0):
        p = self._field_pos(slot)
        if p is None:
            return default
        return struct.unpack_from(fmt, self.buf, p)[0]

    def _indirect(self, p: int) -> int:
        (uoff,) = struct.unpack_from("<I", self.buf, p)
        return p + uoff

    def string(self, slot: int) -> Optional[str]:
        p = self._field_pos(slot)
        if p is None:
            return None
        sp = self._indirect(p)
        (n,) = struct.unpack_from("<I", self.buf, sp)
        return self.buf[sp + 4:sp + 4 + n].decode("utf-8", "replace")

    def table(self, slot: int) -> Optional["FBTable"]:
        p = self._field_pos(slot)
        if p is None:
            return None
        return FBTable(self.buf, self._indirect(p))

    def _vector(self, slot: int):
        p = self._field_pos(slot)
        if p is None:
            return None
        vp = self._indirect(p)
        (n,) = struct.unpack_from("<I", self.buf, vp)
        return vp + 4, n

    def vector_tables(self, slot: int) -> List["FBTable"]:
        v = self._vector(slot)
        if v is None:
            return []
        base, n = v
        return [FBTable(self.buf, self._indirect(base + 4 * i))
                for i in range(n)]

    def vector_f32(self, slot: int) -> Optional[np.ndarray]:
        v = self._vector(slot)
        if v is None:
            return None
        base, n = v
        return np.frombuffer(self.buf, np.dtype("<f4"), n, base).copy()


def _metadata_buffer(model_path: str) -> Optional[bytes]:
    """The TFLITE_METADATA buffer from the model flatbuffer (via TF's
    generated schema — gated import like models/convert.py)."""
    from tensorflow.lite.python import schema_py_generated as fb
    with open(model_path, "rb") as f:
        buf = bytearray(f.read())
    model = fb.Model.GetRootAsModel(buf, 0)
    for i in range(model.MetadataLength()):
        m = model.Metadata(i)
        if m.Name() and m.Name().decode() == "TFLITE_METADATA":
            b = model.Buffers(m.Buffer())
            if b.DataLength():
                return b.DataAsNumpy().tobytes()
    return None


# AssociatedFileType enum values that carry per-class labels
_LABEL_FILE_TYPES = (2, 3)   # TENSOR_AXIS_LABELS, TENSOR_VALUE_LABELS


def read_metadata(model_path: str) -> Dict:
    """Returns only the fields actually present in the flatbuffer metadata
    (a subset of {"mean", "std", "label_file", "labels"}), so callers'
    family-specific defaults survive when a piece is absent — the reference
    falls back to 127.5/127.5 only when NormalizationOptions is missing
    (tflite_object_detector.py:123-131), and EfficientDet-Lite exports
    document mean 127 / std 128."""
    out: Dict = {}
    meta = _metadata_buffer(model_path)
    if meta is None:
        return out
    root = FBTable.root(meta)
    subgraphs = root.vector_tables(3)          # ModelMetadata.subgraph_metadata
    if not subgraphs:
        return out
    sg = subgraphs[0]
    inputs = sg.vector_tables(2)               # input_tensor_metadata
    if inputs:
        t = inputs[0]
        for pu in t.vector_tables(4):          # process_units
            if pu.scalar(0, "<B", 0) == 1:     # NormalizationOptions
                opts = pu.table(1)
                if opts is not None:
                    mean = opts.vector_f32(0)
                    std = opts.vector_f32(1)
                    if mean is not None:
                        out["mean"] = [float(x) for x in mean]
                    if std is not None:
                        out["std"] = [float(x) for x in std]
        # input tensors don't carry labels; fall through
    for t in sg.vector_tables(3):              # output_tensor_metadata
        for af in t.vector_tables(6):          # associated_files
            if af.scalar(2, "<b", 0) in _LABEL_FILE_TYPES:
                out["label_file"] = af.string(0)
                break
        if out.get("label_file"):
            break
    if not out.get("label_file"):
        # some packers attach the labels at the subgraph/model level
        for holder in ([sg] + [root]):
            for af in holder.vector_tables(4 if holder is sg else 6):
                name = af.string(0)
                if name and name.endswith(".txt"):
                    out["label_file"] = name
                    break
            if out.get("label_file"):
                break
    if out.get("label_file"):
        labels = _read_packed_file(model_path, out["label_file"])
        if labels:
            out["labels"] = labels
    return out


def _read_packed_file(model_path: str, name: str) -> Optional[List[str]]:
    """Associated files live in a ZIP appended to the .tflite."""
    try:
        with open(model_path, "rb") as f:
            data = f.read()
        with zipfile.ZipFile(io.BytesIO(data)) as z:
            for zn in z.namelist():
                if zn == name or zn.endswith("/" + name):
                    text = z.read(zn).decode("utf-8", "replace")
                    return [ln.strip() for ln in text.splitlines()
                            if ln.strip()]
    except (zipfile.BadZipFile, KeyError, OSError):
        return None
    return None
