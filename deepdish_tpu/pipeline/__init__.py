"""Pipeline package.

Lazy attribute exports: importing host-only modules (mqtt, mjpeg, config,
counting, ...) must not pull in jax — the TPU backend init can take seconds
to minutes on a busy pool, and services/tools that never touch the device
should start instantly.
"""

__all__ = ["DetectionSnapshot", "FrameStep", "FrameStepConfig",
           "PipelineState"]


def __getattr__(name):
    if name in __all__:
        from . import framestep
        return getattr(framestep, name)
    raise AttributeError(name)
