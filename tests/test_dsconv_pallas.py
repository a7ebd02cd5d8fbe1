"""Fused depthwise-separable Pallas kernel parity (interpreter mode).

The kernel (ops/dsconv_pallas.py) fuses MobileNetV1's hot block —
depthwise 3x3 + BN + ReLU6 + pointwise 1x1 + BN + ReLU6 (the stages the
round-3 trace located the detector's MFU plateau in) — keeping the
intermediate VMEM-resident. Parity target is the model's current XLA
lowering (`dsconv_reference`, the exact composition inside
models/ssd_mobilenet.py `_DepthwiseSeparable`), checked at both strides,
odd/even spatial sizes (the asymmetric TF SAME stride-2 pad), row-chunked
and single-chunk paths, and real MobileNet-300 stage shapes.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from deepdish_tpu.ops.dsconv_pallas import (dsconv_reference, fold_bn,
                                            fused_dsconv)


def _block_args(rng, b, h, w, cin, cout, dtype=np.float32):
    return (rng.standard_normal((b, h, w, cin)).astype(dtype),
            (rng.standard_normal((3, 3, cin)) * 0.2).astype(np.float32),
            (rng.random(cin) + 0.5).astype(np.float32),
            (rng.standard_normal(cin) * 0.1).astype(np.float32),
            (rng.standard_normal((cin, cout)) * 0.2).astype(np.float32),
            (rng.random(cout) + 0.5).astype(np.float32),
            (rng.standard_normal(cout) * 0.1).astype(np.float32))


@pytest.mark.timeout(600)
@pytest.mark.parametrize("h,w,cin,cout,stride", [
    (10, 12, 8, 16, 1),     # even spatial, stride 1
    (11, 13, 8, 16, 2),     # odd spatial, asymmetric SAME pad
    (10, 12, 8, 16, 2),     # even spatial stride 2 (pad top=0 side)
    (9, 9, 16, 8, 1),       # Cout < Cin
])
def test_fused_matches_xla_composition(rng, h, w, cin, cout, stride):
    a = _block_args(np.random.default_rng(rng.randint(1 << 30)),
                    2, h, w, cin, cout)
    ref = np.asarray(dsconv_reference(*a, stride=stride))
    got = np.asarray(fused_dsconv(*a, stride=stride, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


@pytest.mark.timeout(600)
@pytest.mark.parametrize("h,w,cin,cout,stride", [
    (75, 75, 16, 32, 1),    # row-chunked path (odd H, rh < H)
    (75, 75, 16, 32, 2),    # row-chunked stride-2 phase planes
])
def test_fused_row_chunked_large_spatial(rng, h, w, cin, cout, stride):
    """Shapes big enough that the kernel processes multiple row chunks
    (the VMEM-bounding path used by the 150^2/75^2 MobileNet stages)."""
    a = _block_args(np.random.default_rng(rng.randint(1 << 30)),
                    1, h, w, cin, cout)
    ref = np.asarray(dsconv_reference(*a, stride=stride))
    got = np.asarray(fused_dsconv(*a, stride=stride, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


@pytest.mark.timeout(600)
def test_fused_bf16_io_dtype(rng):
    """bf16 activations (the serving dtype): output dtype preserved and
    values match the XLA composition at bf16 resolution."""
    a = _block_args(np.random.default_rng(0), 2, 10, 10, 8, 16)
    x16 = jnp.asarray(a[0], jnp.bfloat16)
    ref = dsconv_reference(x16, *a[1:], stride=1)
    got = fused_dsconv(x16, *a[1:], stride=1, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=0.06, rtol=0.05)


@pytest.mark.timeout(600)
def test_fold_bn_matches_batchnorm():
    """fold_bn reproduces inference BatchNorm: y = g*(x-m)/sqrt(v+eps)+b."""
    rng = np.random.default_rng(1)
    g, b = rng.random(8) + 0.5, rng.standard_normal(8)
    m, v = rng.standard_normal(8), rng.random(8) + 0.1
    x = rng.standard_normal((4, 8))
    scale, bias = fold_bn(g, b, m, v, eps=1e-3)
    want = g * (x - m) / np.sqrt(v + 1e-3) + b
    np.testing.assert_allclose(x * scale + bias, want, rtol=1e-6)
