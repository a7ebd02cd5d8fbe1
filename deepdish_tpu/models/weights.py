"""Native model weight persistence (.npz flat trees).

Real-weight ingestion from the reference's artifact formats (TFLite
flatbuffers, frozen GraphDefs, Keras HDF5) lives in models/convert.py; this
module keeps the native persistence format used after conversion:
`save_npz(convert.load_ssd_mobilenet_tflite(p)[0], "ssd.npz")` once, then
fast `load_npz` at startup with no TF dependency.
"""
from __future__ import annotations

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
    """Persist a flax variable pytree as a flat .npz."""
    np.savez_compressed(path, **_flatten(params))


def load_npz(path: str):
    """Load a flax variable pytree saved by save_npz."""
    with np.load(path) as f:
        return _unflatten({k: f[k] for k in f.files})
