"""Temporal sequence parallelism: one hot stream over many chips.

Stream-DP (parallel/multistream.py) scales aggregate throughput but can
never speed up a SINGLE stream — the reference has no answer to that
either (it is single-device by construction, SURVEY.md §2.2). This engine
is the TPU-native answer: within one stream's chunk of F frames, the
per-frame detector + NMS + crop + appearance-encoder work (≈85 % of the
fused step's wall-clock, docs/BENCH_NOTES.md round-3 component table) has
no temporal state, so it is sharded over the mesh's frame axis — each of
D devices runs detect+encode for F/D frames. Only the tiny fixed-capacity
detection tensors (boxes, scores, labels, E feature vectors per frame —
a few KB/frame, *not* the frames) are then `all_gather`ed over ICI, and
the cheap sequential tracker scan (~0.09 ms/frame) runs replicated on
every device, so the updated track table is already resident everywhere
for the next chunk with no further communication.

This is the app's analog of sequence parallelism: the "sequence" is the
frame axis, the attention-like sequential part is the tracker recurrence,
and the collective rides ICI because the gathered activations are the
compact post-NMS detections rather than pixels.

Constraints:
  * background subtraction must be off — the MOG2 GMM state is a strict
    frame-to-frame recurrence over full-resolution pixel state, which
    would serialize the shards (and gathering it would ship whole frames).
    The high-throughput offline configs run with bgsub disabled anyway
    (the reference's own demos do too: tflite-demo.sh:10).
  * F must be a multiple of the mesh size (static shapes per shard).

Semantics are identical to `FrameStep.run_chunk` on one device: the
detector/NMS math is per-frame, the MARS encoder has no cross-sample
coupling (inference-mode BN), and the tracker scan consumes the same
gathered detections in the same frame order.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import tracker as tt
from ..ops import colorspace
from ..pipeline.framestep import FrameStep, PipelineState
from .multistream import make_mesh


class TemporalChunkEngine:
    """Shards one stream's chunk over the mesh's frame axis."""

    def __init__(self, framestep: FrameStep, mesh: Optional[Mesh] = None,
                 axis_name: str = "frame"):
        if framestep.step_cfg.background_subtraction:
            raise ValueError(
                "temporal sequence parallelism requires background "
                "subtraction off: the MOG2 state is a frame-to-frame "
                "recurrence over full-resolution pixels, which would "
                "serialize the frame shards")
        self.fs = framestep
        self.mesh = mesh if mesh is not None else make_mesh(
            axis_name=axis_name)
        # Honor the caller's axis_name when it exists in a user-supplied
        # mesh; otherwise fall back to the mesh's first axis. Frames are
        # sharded along that one axis only, so the divisibility check and
        # shard count must use that axis's extent — on a 2-D mesh the
        # second axis merely replicates the (deterministic) work.
        if axis_name in self.mesh.axis_names:
            axis = axis_name
        else:
            axis = self.mesh.axis_names[0]
        self.n_devices = int(self.mesh.shape[axis])
        self._repl = NamedSharding(self.mesh, P())
        self._shard = NamedSharding(self.mesh, P(axis))

        def gather(tree):
            return jax.tree.map(
                lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True),
                tree)

        def sharded_chunk(params, table, frames):
            # in-shard view: frames is this device's (F/D, H, W, 3) slice
            dets_l, snaps_l = self.fs._detect_encode_frames(params, frames)
            dets, snaps = gather(dets_l), gather(snaps_l)

            def scan_body(tbl, det):
                tbl, out = tt.step(self.fs.tracker_cfg, tbl, det)
                return tbl, out

            table, outs = jax.lax.scan(scan_body, table, dets)
            return table, outs, snaps

        def sharded_chunk_yuv(params, table, yuv_frames):
            frames = jax.vmap(
                lambda f: colorspace.yuv420_to_rgb_u8(
                    f, self.fs.frame_h, self.fs.frame_w))(yuv_frames)
            return sharded_chunk(params, table, frames)

        # weights + track table replicated; frames sharded on the frame
        # axis; every output replicated (identical on all devices after the
        # gather, so the next chunk needs no redistribution).
        specs = dict(mesh=self.mesh, in_specs=(P(), P(), P(axis)),
                     out_specs=(P(), P(), P()), check_vma=False)
        self._chunk_jit = jax.jit(jax.shard_map(sharded_chunk, **specs))
        self._chunk_yuv_jit = jax.jit(
            jax.shard_map(sharded_chunk_yuv, **specs))

    def _check(self, n_frames: int):
        if n_frames % self.n_devices:
            raise ValueError(
                f"chunk length ({n_frames}) must be a multiple of the "
                f"mesh size ({self.n_devices})")

    def run_chunk(self, state: PipelineState, frames_rgb: np.ndarray):
        """F frames (F, H, W, 3) uint8, F % n_devices == 0. Returns
        (state, outs, snaps) exactly like FrameStep.run_chunk."""
        self._check(frames_rgb.shape[0])
        frames = jax.device_put(frames_rgb, self._shard)
        table, outs, snaps = self._chunk_jit(self.fs._params, state.table,
                                             frames)
        return PipelineState(table, state.bg), outs, snaps

    def run_chunk_yuv(self, state: PipelineState, yuv_frames: np.ndarray):
        """F planar I420 frames (F, H*3/2, W) uint8 in one dispatch."""
        self._check(yuv_frames.shape[0])
        frames = jax.device_put(yuv_frames, self._shard)
        table, outs, snaps = self._chunk_yuv_jit(self.fs._params,
                                                 state.table, frames)
        return PipelineState(table, state.bg), outs, snaps
