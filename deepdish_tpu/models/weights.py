"""Model weight persistence and TFLite flatbuffer conversion.

The reference consumes pre-trained weights through external runtimes
(uint8/fp16 TFLite flatbuffers for SSD-MobileNet/YOLOv5/EfficientDet and
the frozen MARS graph, SURVEY.md §2.4). This module provides:

  * save_npz / load_npz — native weight persistence for all deepdish_tpu
    flax models (flattened path -> array);
  * import_tflite — best-effort conversion of a TFLite flatbuffer's
    dequantized tensors into a {name: array} dict via the TF interpreter
    (gated: requires tensorflow and a real .tflite file);
  * convert_ssd_mobilenet_v1 — maps TF-OD SSD-MobileNetV1 tensor names onto
    the deepdish_tpu.models.ssd_mobilenet parameter tree.

With no weight files shipped in this environment the converters are
exercised by round-trip tests only; the mapping tables document the exact
correspondence for when real flatbuffers are available.
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: Dict = {}
    for path, arr in flat.items():
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree


def save_npz(params, path: str):
    """Persist a flax param pytree as a flat .npz."""
    np.savez_compressed(path, **_flatten(params))


def load_npz(path: str):
    """Load a flax param pytree saved by save_npz."""
    with np.load(path) as f:
        return _unflatten({k: f[k] for k in f.files})


def import_tflite(model_path: str) -> Dict[str, np.ndarray]:
    """Extract dequantized constant tensors from a TFLite flatbuffer.

    Returns {tensor_name: float32 array}. Quantized tensors are dequantized
    with their (scale, zero_point) metadata — the same arithmetic the
    reference's interpreter applies (tools/yolov5.py:102-118).
    """
    import tensorflow as tf  # gated import

    interp = tf.lite.Interpreter(model_path=model_path,
                                 experimental_preserve_all_tensors=True)
    interp.allocate_tensors()
    out = {}
    for det in interp.get_tensor_details():
        try:
            arr = interp.get_tensor(det["index"])
        except ValueError:
            continue
        if arr is None or arr.size == 0:
            continue
        q = det.get("quantization_parameters") or {}
        scales = np.asarray(q.get("scales", []))
        zps = np.asarray(q.get("zero_points", []))
        if scales.size and arr.dtype in (np.int8, np.uint8, np.int32):
            axis = q.get("quantized_dimension", 0)
            shape = [1] * arr.ndim
            if scales.size > 1 and arr.ndim:
                shape[axis] = scales.size
            arr = (arr.astype(np.float32) -
                   zps.reshape(shape) if zps.size else arr.astype(np.float32)
                   ) * scales.reshape(shape)
        out[det["name"]] = np.asarray(arr, np.float32)
    return out


# TF-OD SSD-MobileNetV1 tensor-name fragments -> deepdish_tpu module names.
_SSD_NAME_MAP = [
    (r"Conv2d_0(?!\d)", "conv0"),
    *[(rf"Conv2d_{i}_depthwise", f"ds{i}/dw") for i in range(1, 14)],
    *[(rf"Conv2d_{i}_pointwise", f"ds{i}/pw") for i in range(1, 14)],
    (r"BoxEncodingPredictor_0|BoxPredictor_0/BoxEncodingPredictor",
     "box_head0"),
    (r"ClassPredictor_0|BoxPredictor_0/ClassPredictor", "cls_head0"),
]


def convert_ssd_mobilenet_v1(tensors: Dict[str, np.ndarray],
                             init_params) -> Dict:
    """Map TF-OD/TFLite SSD-MobileNetV1 tensors onto our param tree.

    `init_params` provides the target structure/shapes (from
    SSDMobileNetV1.init); any tensor whose mapped name+shape matches is
    substituted. Returns the updated tree and leaves unmatched parameters
    at their initialized values (reported via the 'converted' count in the
    returned tree's companion — see tests).
    """
    flat = _flatten(init_params)
    converted = 0
    by_shape = {}
    for name, arr in tensors.items():
        by_shape.setdefault(arr.shape, []).append((name, arr))
    for path, target in flat.items():
        cands = by_shape.get(tuple(target.shape), [])
        for frag, mod in _SSD_NAME_MAP:
            if mod in path:
                for name, arr in cands:
                    if re.search(frag, name):
                        flat[path] = arr.astype(target.dtype)
                        converted += 1
                        break
    tree = _unflatten(flat)
    tree_stats = {"converted": converted, "total": len(flat)}
    return tree, tree_stats
