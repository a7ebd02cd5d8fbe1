"""deepdish_tpu: TPU-native tracking-by-detection video analytics framework.

A ground-up JAX/XLA/Pallas re-design of the AdaptiveCity/deepdish pipeline
(video -> detection -> appearance embedding -> Deep SORT tracking ->
countline analytics -> MQTT/video/web/log), built for TPU: fixed-capacity
tensor tables instead of Python object lists, one fused jit program per
frame batch, and `shard_map` multi-stream scaling over a device mesh.
"""

__version__ = "0.1.0"
