"""2-D grid parallelism: stream-DP x temporal-SP on one device mesh.

Composes the two 1-D engines (parallel/multistream.py, parallel/temporal.py)
into a single SPMD program over a 2-D `jax.sharding.Mesh` with axes
(stream, frame): each device owns S/ds streams and, within each owned
stream's chunk, F/dt of its frames. The per-frame detector + NMS + crop +
appearance-encoder work (the FLOPs bulk, no temporal state) runs fully
sharded on both axes; then ONE `all_gather` along the *frame* axis moves
the compact post-NMS detection tensors (a few KB per frame — never pixels)
so every frame-shard of a stream holds that stream's full chunk, and the
cheap sequential tracker scan runs replicated along the frame axis but
still sharded by stream. No collective ever crosses the stream axis —
trackers are independent — so the gather rides ICI rings within the frame
axis only.

When to choose which engine (all semantics-identical to
`FrameStep.run_chunk` per stream):
  * many streams, throughput       -> MultiStreamEngine (1-D, no comms)
  * ONE hot stream, latency        -> TemporalChunkEngine (1-D, gather)
  * several hot streams on a slice -> GridEngine (this module): e.g. 4
    streams on a 16-device slice = a (4, 4) mesh gives each stream 4-way
    frame parallelism, where pure stream-DP would leave 12 devices idle
    and pure temporal-SP would serialize the streams.

Same constraint as the temporal engine: background subtraction must be
off (the MOG2 GMM is a strict frame-to-frame recurrence over full-
resolution pixel state, which would serialize the frame shards).

The reference has no counterpart (it is single-device by construction,
SURVEY.md §2.2); this is TPU-native scale-out design, not a port.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import tracker as tt
from ..ops import colorspace
from ..pipeline.framestep import FrameStep, PipelineState


def make_grid_mesh(n_stream_shards: int, n_frame_shards: int,
                   stream_axis: str = "stream",
                   frame_axis: str = "frame") -> Mesh:
    """A (stream, frame) 2-D mesh over the first ds*dt local devices."""
    n = n_stream_shards * n_frame_shards
    devs = jax.devices()
    if len(devs) < n:
        raise ValueError(f"need {n} devices for a "
                         f"({n_stream_shards}, {n_frame_shards}) grid, "
                         f"have {len(devs)}")
    grid = np.array(devs[:n]).reshape(n_stream_shards, n_frame_shards)
    return Mesh(grid, (stream_axis, frame_axis))


class GridEngine:
    """S streams, F frames/stream/chunk, sharded (stream, frame)."""

    def __init__(self, framestep: FrameStep, n_streams: int,
                 mesh: Optional[Mesh] = None,
                 stream_axis: str = "stream", frame_axis: str = "frame"):
        if framestep.step_cfg.background_subtraction:
            raise ValueError(
                "grid parallelism requires background subtraction off: "
                "the MOG2 state is a frame-to-frame recurrence over full-"
                "resolution pixels, which would serialize the frame shards")
        self.fs = framestep
        self.n_streams = n_streams
        if mesh is None:
            n = len(jax.devices())
            mesh = make_grid_mesh(max(n // 2, 1), min(2, n),
                                  stream_axis, frame_axis)
        for ax in (stream_axis, frame_axis):
            if ax not in mesh.axis_names:
                raise ValueError(f"mesh is missing the '{ax}' axis "
                                 f"(has {mesh.axis_names})")
        self.mesh = mesh
        self.stream_axis, self.frame_axis = stream_axis, frame_axis
        self.ds = int(mesh.shape[stream_axis])
        self.dt = int(mesh.shape[frame_axis])
        if n_streams % self.ds:
            raise ValueError(f"n_streams ({n_streams}) must be a multiple "
                             f"of the stream-axis size ({self.ds})")
        self._table_shard = NamedSharding(mesh, P(stream_axis))
        self._frame_shard = NamedSharding(mesh, P(stream_axis, frame_axis))

        def gather_frames(tree):
            # (S_l, F/dt, ...) -> (S_l, F, ...): compact detections only
            return jax.tree.map(
                lambda x: jax.lax.all_gather(
                    x, frame_axis, axis=1, tiled=True), tree)

        def grid_chunk(params, tables, frames):
            # local views: tables (S_l, ...) [replicated along frame axis],
            # frames (S_l, F/dt, H, W, 3)
            dets_l, snaps_l = jax.vmap(
                lambda fr: self.fs._detect_encode_frames(params, fr)
            )(frames)
            dets = gather_frames(dets_l)

            def one_stream(tbl, det):
                return jax.lax.scan(
                    lambda t, d: tt.step(self.fs.tracker_cfg, t, d),
                    tbl, det)

            tables, outs = jax.vmap(one_stream)(tables, dets)
            return tables, outs, snaps_l

        def grid_chunk_yuv(params, tables, yuv):
            frames = jax.vmap(jax.vmap(
                lambda f: colorspace.yuv420_to_rgb_u8(
                    f, self.fs.frame_h, self.fs.frame_w)))(yuv)
            return grid_chunk(params, tables, frames)

        # weights replicated; track tables sharded by stream (replicated
        # along the frame axis — every frame-shard of a stream computes the
        # identical scan on the gathered detections, so the updated table
        # is already resident wherever the next chunk needs it); frames and
        # snapshots sharded on both axes.
        specs = dict(
            mesh=mesh,
            in_specs=(P(), P(stream_axis), P(stream_axis, frame_axis)),
            out_specs=(P(stream_axis), P(stream_axis),
                       P(stream_axis, frame_axis)),
            check_vma=False)
        self._chunk_jit = jax.jit(jax.shard_map(grid_chunk, **specs))
        self._chunk_yuv_jit = jax.jit(jax.shard_map(grid_chunk_yuv, **specs))

    def init_states(self) -> PipelineState:
        """Stacked (S, ...) pipeline state, tables sharded on the stream
        axis (bg is None — bgsub is rejected in __init__)."""
        one = self.fs.init_state()
        tables = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (self.n_streams,) + x.shape),
            one.table)
        tables = jax.device_put(
            tables, jax.tree.map(lambda _: self._table_shard, tables))
        return PipelineState(tables, None)

    def _check(self, frames, ndim_frame):
        if frames.ndim != ndim_frame:
            raise ValueError(f"expected {ndim_frame}-D (S, F, ...) input, "
                             f"got shape {frames.shape}")
        S, F = frames.shape[:2]
        if S != self.n_streams:
            raise ValueError(f"got {S} streams, engine built for "
                             f"{self.n_streams}")
        if F % self.dt:
            raise ValueError(f"chunk length ({F}) must be a multiple of "
                             f"the frame-axis size ({self.dt})")

    def run_chunk(self, states: PipelineState, frames_rgb: np.ndarray):
        """frames (S, F, H, W, 3) uint8 -> (states, outs, snaps) with outs
        stacked (S, F, ...) — per stream identical to FrameStep.run_chunk."""
        self._check(frames_rgb, 5)
        frames = jax.device_put(frames_rgb, self._frame_shard)
        tables, outs, snaps = self._chunk_jit(self.fs._params,
                                              states.table, frames)
        return PipelineState(tables, states.bg), outs, snaps

    def run_chunk_yuv(self, states: PipelineState, yuv_frames: np.ndarray):
        """frames (S, F, H*3/2, W) planar I420 uint8; converts on device."""
        self._check(yuv_frames, 4)
        frames = jax.device_put(yuv_frames, self._frame_shard)
        tables, outs, snaps = self._chunk_yuv_jit(self.fs._params,
                                                  states.table, frames)
        return PipelineState(tables, states.bg), outs, snaps
