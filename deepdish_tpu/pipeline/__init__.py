from .framestep import DetectionSnapshot, FrameStep, FrameStepConfig  # noqa: F401
