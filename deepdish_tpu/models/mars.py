"""MARS appearance-descriptor network (cosine-metric-learning CNN), in flax.

JAX re-implementation of the TF1-slim network defined in the reference's
tools/freeze_model.py:88-157 (the frozen `mars-small128.pb` / TFLite MARS
encoder consumed at tools/generate_detections.py:118-177): two 3x3 convs
(BN+ELU), 3x3/2 VALID max-pool, six residual blocks (32->64->128 channels,
stride-2 projections on dim increase), dense 128 with BN+ELU, a final BN
("ball") and L2 normalization. Input is (N, 128, 64, 3) float RGB in
[0, 255] — the reference applies no mean/std scaling, only BGR->RGB
(freeze_model.py:175-177); BN at the first conv absorbs the input scale.

TPU notes: NHWC layout, channels padded well for MXU convs when run in
bf16; inference-mode BN is a fused scale+shift. All shapes static.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

FEATURE_DIM = 128
INPUT_SHAPE = (128, 64, 3)  # (H, W, C)


class _BN(nn.Module):
    """Inference-mode batch norm (slim defaults: eps 1e-3, no scale=False —
    slim.batch_norm default center=True, scale=False)."""
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                            use_scale=False, use_bias=True,
                            dtype=self.dtype)(x)


class _InnerBlock(nn.Module):
    features: int
    increase_dim: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        n = self.features * (2 if self.increase_dim else 1)
        stride = 2 if self.increase_dim else 1
        # slim.conv2d omits the conv bias whenever normalizer_fn is set
        # (freeze_model.py:55-59), so conv1 has no bias; conv2 (no BN) does.
        y = nn.Conv(n, (3, 3), strides=(stride, stride), padding="SAME",
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = _BN(dtype=self.dtype, name="bn1")(y)
        y = nn.elu(y)
        # dropout(keep=0.6) is identity at inference (freeze_model.py:62)
        y = nn.Conv(n, (3, 3), strides=(1, 1), padding="SAME",
                    dtype=self.dtype, name="conv2")(y)
        return y


class _ResidualBlock(nn.Module):
    """create_link + create_inner_block (freeze_model.py:13-85)."""
    features: int
    increase_dim: bool = False
    is_first: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if self.is_first:
            pre = x
        else:
            pre = _BN(dtype=self.dtype, name="pre_bn")(x)
            pre = nn.elu(pre)
        block = _InnerBlock(self.features, self.increase_dim,
                            dtype=self.dtype, name="inner")(pre)
        if self.increase_dim:
            proj = nn.Conv(self.features * 2, (1, 1), strides=(2, 2),
                           padding="SAME", use_bias=False,
                           dtype=self.dtype, name="projection")(x)
            return proj + block
        return x + block


class MarsNet(nn.Module):
    """Returns L2-normalized 128-d features for (N, 128, 64, 3) inputs."""
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        # dtype=compute_dtype on every layer keeps the MXU work in bf16
        # (params stay f32); without it flax promotes activations back to
        # f32 against the f32 params and the whole net silently runs f32.
        dt = self.compute_dtype
        x = images.astype(dt)
        # BN follows each of these convs, so slim omits their biases
        # (freeze_model.py:102-110).
        x = nn.Conv(32, (3, 3), padding="SAME", use_bias=False,
                    dtype=dt, name="conv1_1")(x)
        x = _BN(dtype=dt, name="conv1_1_bn")(x)
        x = nn.elu(x)
        x = nn.Conv(32, (3, 3), padding="SAME", use_bias=False,
                    dtype=dt, name="conv1_2")(x)
        x = _BN(dtype=dt, name="conv1_2_bn")(x)
        x = nn.elu(x)
        # slim.max_pool2d default padding is VALID (freeze_model.py:116)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = _ResidualBlock(32, is_first=True, dtype=dt, name="conv2_1")(x)
        x = _ResidualBlock(32, dtype=dt, name="conv2_3")(x)
        x = _ResidualBlock(32, increase_dim=True, dtype=dt,
                           name="conv3_1")(x)
        x = _ResidualBlock(64, dtype=dt, name="conv3_3")(x)
        x = _ResidualBlock(64, increase_dim=True, dtype=dt,
                           name="conv4_1")(x)
        x = _ResidualBlock(128, dtype=dt, name="conv4_3")(x)
        x = x.reshape((x.shape[0], -1))
        # fc1 is BN-normalized in slim, so it has no bias either
        # (freeze_model.py:146-149).
        x = nn.Dense(FEATURE_DIM, use_bias=False, dtype=dt, name="fc1")(x)
        x = _BN(dtype=dt, name="fc1_bn")(x)
        x = nn.elu(x)
        x = _BN(dtype=dt, name="ball")(x)
        x = x.astype(jnp.float32)
        norm = jnp.sqrt(1e-8 + jnp.sum(jnp.square(x), axis=1, keepdims=True))
        return x / norm
