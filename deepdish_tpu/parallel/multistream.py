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
        # The Pallas JV kernel is vmap-safe (grid-batched custom_vmap rule),
        # so single-device meshes keep it. Across devices the SPMD
        # partitioner cannot split the opaque kernel call over the sharded
        # stream axis, so multi-device meshes use the XLA solver.
        if (len(self.mesh.devices.flat) > 1
                and framestep.tracker_cfg.lsap_impl != "xla"):
            import dataclasses
            framestep.tracker_cfg = dataclasses.replace(
                framestep.tracker_cfg, lsap_impl="xla")
        axis = self.mesh.axis_names[0]
        self._repl = NamedSharding(self.mesh, P())
        self._shard = NamedSharding(self.mesh, P(axis))

        def stacked_step(params, states, frames):
            return jax.vmap(
                lambda st, fr: self.fs._step(params, st, fr)[:3]
            )(states, frames)

        def shard_tree(tree):
            return jax.tree.map(lambda _: self._shard, tree)

        self._step_jit = None
        self._stacked_step = stacked_step

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
        tables = states
        if self._step_jit is None:
            out_tree = jax.eval_shape(self._stacked_step, self.fs._params,
                                      tables, frames)
            self._step_jit = jax.jit(
                self._stacked_step,
                in_shardings=(
                    jax.tree.map(lambda _: self._repl, self.fs._params),
                    jax.tree.map(lambda _: self._shard, tables),
                    self._shard),
                out_shardings=jax.tree.map(lambda _: self._shard, out_tree))
        frames = jax.device_put(frames, self._shard)
        return self._step_jit(self.fs._params, tables, frames)
