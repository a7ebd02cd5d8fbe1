"""Full pipeline-state checkpointing.

The reference's only resume mechanism is counters-from-log
(deepdish.py:546-558; SURVEY.md §5.4 notes tracker state is lost). The TPU
rebuild's state is a fixed-shape pytree, so checkpointing the ENTIRE
tracker (Kalman table, galleries, label votes, MOG2 model) is one savez:
`--state-checkpoint FILE` restores mid-stream tracking exactly, on top of
the log-based counter restore.
"""
from __future__ import annotations

import os
import numpy as np

from .. import tracker as tt
from ..ops import bgsub
from .framestep import PipelineState


def save_state(path: str, state: PipelineState, counters: dict,
               frame_count: int):
    flat = {"__frame_count__": np.asarray(frame_count)}
    for k, v in counters.items():
        flat[f"__counter__{k}"] = np.asarray(v)
    for name, arr in zip(tt.TrackTable._fields, state.table):
        flat[f"table/{name}"] = np.asarray(arr)
    if state.bg is not None:
        for name, arr in zip(bgsub.MOG2State._fields, state.bg):
            flat[f"bg/{name}"] = np.asarray(arr)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **flat)
    os.replace(tmp, path)


def load_state(path: str, template: PipelineState):
    """Returns (state, counters, frame_count); shapes must match the
    template (same capacities/config)."""
    import jax.numpy as jnp
    with np.load(path) as f:
        loaded = {n: f[f"table/{n}"] for n in tt.TrackTable._fields}
        # The tracker stores appearance rows unit-normalized (so the
        # per-frame cosine distance can skip re-normalizing the whole
        # gallery). Normalizing here is idempotent for new checkpoints and
        # upgrades pre-normalization checkpoints that stored raw features.
        for key in ("gallery", "pending"):
            arr = loaded[key].astype(np.float32, copy=False)
            n = np.linalg.norm(arr, axis=-1, keepdims=True)
            loaded[key] = (arr / np.where(n == 0.0, 1.0, n)
                           ).astype(loaded[key].dtype)
        table = tt.TrackTable(*[jnp.asarray(loaded[n])
                                for n in tt.TrackTable._fields])
        bg = None
        if template.bg is not None and "bg/weight" in f.files:
            bg = bgsub.MOG2State(*[jnp.asarray(f[f"bg/{n}"])
                                   for n in bgsub.MOG2State._fields])
        counters = {k[len("__counter__"):]: int(f[k])
                    for k in f.files if k.startswith("__counter__")}
        frame_count = int(f["__frame_count__"])
    for a, b in zip(table, template.table):
        if np.asarray(a).shape != np.asarray(b).shape:
            raise ValueError(
                "checkpoint capacities do not match the configured tracker")
    return PipelineState(table, bg), counters, frame_count
