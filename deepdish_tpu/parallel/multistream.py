"""Multi-stream data parallelism over a TPU device mesh.

The reference is strictly single-stream (SURVEY.md §2.2); the TPU-native
scale-out story (BASELINE.json config 5: "16 concurrent 720p videos") is a
batch-of-streams: the fused per-frame program is vmapped over a leading
stream axis and sharded over a 1-D `jax.sharding.Mesh`, so each device owns
S/D streams' detector+encoder+tracker state. Trackers are independent per
stream, so no cross-stream collectives are needed — XLA partitions the
whole program with zero communication, and ICI is only touched if a future
model-parallel axis is added.

Weights are replicated; per-stream track tables and frames are sharded on
the stream axis.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..pipeline.framestep import FrameStep


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "stream") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


class MultiStreamEngine:
    """S independent pipelines, one fused SPMD program per frame step."""

    def __init__(self, framestep: FrameStep, n_streams: int,
                 mesh: Optional[Mesh] = None):
        self.fs = framestep
        self.n_streams = n_streams
        self.mesh = mesh if mesh is not None else make_mesh()
        n_dev = len(self.mesh.devices.flat)
        if n_streams % n_dev:
            raise ValueError(f"n_streams ({n_streams}) must be a multiple "
                             f"of the mesh size ({n_dev})")
        axis = self.mesh.axis_names[0]
        self._repl = NamedSharding(self.mesh, P())
        self._shard = NamedSharding(self.mesh, P(axis))

        # shard_map over the stream axis: each device runs the vmapped
        # fused program on ITS streams only — trackers are independent, so
        # the program is communication-free by construction, and opaque
        # kernels (the Pallas JV solver, batched via its custom_vmap grid
        # rule) execute locally per device instead of needing the SPMD
        # partitioner to split them.
        def stacked_step(params, states, frames):
            return jax.vmap(
                lambda st, fr: self.fs._step(params, st, fr)[:3]
            )(states, frames)

        self._step_jit = jax.jit(jax.shard_map(
            stacked_step, mesh=self.mesh,
            in_specs=(P(), P(axis), P(axis)),
            out_specs=P(axis), check_vma=False))

        # Chunked variant: each stream scans F frames per dispatch. The
        # tracker scan's many small sequential ops then process all local
        # streams per op instead of one, which is where the aggregate
        # throughput win over per-frame stepping comes from.
        def stacked_chunk(params, states, frames):
            return jax.vmap(
                lambda st, fr: self.fs._run_chunk(params, st, fr)
            )(states, frames)

        self._chunk_jit = jax.jit(jax.shard_map(
            stacked_chunk, mesh=self.mesh,
            in_specs=(P(), P(axis), P(axis)),
            out_specs=P(axis), check_vma=False))

        # YUV-transport variant, built lazily (step_chunk_yuv): planar
        # I420 chunks from the native loader are half the bytes of RGB on
        # the host->device link, and the fused program converts on device
        # (ops/colorspace.yuv420_to_rgb_u8) — same transport the
        # single-stream bench uses.
        self._chunk_yuv_jit = None
        self._convert_yuv_jit = None

    def init_tables(self):
        """Stacked (S, ...) pipeline states, sharded over the mesh."""
        one = self.fs.init_state()
        stacked = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (self.n_streams,) + x.shape),
            one)
        return jax.device_put(
            stacked, jax.tree.map(lambda _: self._shard, stacked))

    init_states = init_tables

    def step(self, states, frames):
        """frames: (S, H, W, 3) uint8. Returns (states, outs, snaps) with
        every per-stream array sharded over the mesh."""
        frames = jax.device_put(frames, self._shard)
        return self._step_jit(self.fs._params, states, frames)

    def step_chunk(self, states, frames):
        """frames: (S, F, H, W, 3) uint8 — F frames per stream in one
        dispatch. Returns (states, outs, snaps) stacked (S, F, ...)."""
        frames = jax.device_put(frames, self._shard)
        return self._chunk_jit(self.fs._params, states, frames)

    def step_chunk_yuv(self, states, yuv_frames):
        """yuv_frames: (S, F, H*3/2, W) uint8 planar I420 — the native
        loader's half-bandwidth transport. Conversion to RGB happens on
        device inside the fused program. Mirrors FrameStep.run_chunk_yuv,
        including its int8-detector dispatch split (the round-4
        int8 x yuv x chunk-32 XLA worker crash workaround,
        pipeline/framestep.py)."""
        axis = self.mesh.axis_names[0]
        yuv_frames = jax.device_put(yuv_frames, self._shard)
        if self.fs._yuv_split:
            if self._convert_yuv_jit is None:
                from ..ops import colorspace
                h, w = self.fs.frame_h, self.fs.frame_w
                self._convert_yuv_jit = jax.jit(jax.vmap(jax.vmap(
                    lambda f: colorspace.yuv420_to_rgb_u8(f, h, w))))
            frames = self._convert_yuv_jit(yuv_frames)
            return self._chunk_jit(self.fs._params, states, frames)
        if self._chunk_yuv_jit is None:
            def stacked_chunk_yuv(params, states, frames):
                return jax.vmap(
                    lambda st, fr: self.fs._run_chunk_yuv(params, st, fr)
                )(states, frames)
            self._chunk_yuv_jit = jax.jit(jax.shard_map(
                stacked_chunk_yuv, mesh=self.mesh,
                in_specs=(P(), P(axis), P(axis)),
                out_specs=P(axis), check_vma=False))
        return self._chunk_yuv_jit(self.fs._params, states, yuv_frames)
