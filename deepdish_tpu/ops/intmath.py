"""TFLite/gemmlowp fixed-point requantization, exact and int64-free.

Full-integer TFLite artifacts (the reference's actual EdgeTPU models,
tools/ssd_mobilenet.py:100-103, tools/yolov5.py:102-118) scale int32
accumulators back to int8 with gemmlowp fixed-point arithmetic:

    out = RoundingDivideByPOT(
              SaturatingRoundingDoublingHighMul(acc << left_shift, M0),
              right_shift) + zero_point

where (M0, shift) = QuantizeMultiplier(in_scale * w_scale / out_scale).
Replaying that bit-exactly is what makes a quantized graph's outputs
byte-equal to the TFLite interpreter's (models/qgraph.py).

SaturatingRoundingDoublingHighMul needs the high 33 bits of a 64-bit
signed product. JAX under the default (x64-disabled) config canonicalizes
int64 away, and the TPU VPU prefers 32-bit lanes anyway, so the product is
computed with 16-bit limbs in uint32 (wrapping) arithmetic plus the
standard signed-high-word correction — exact for every int32 pair, no
int64 anywhere. Golden-tested against an int64 numpy oracle in
tests/test_qgraph.py.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

INT32_MIN = -(1 << 31)
INT32_MAX = (1 << 31) - 1


def quantize_multiplier(real_multiplier: float):
    """TFLite QuantizeMultiplier (quantization_util.cc): a positive double
    -> (M0 int32 in [2^30, 2^31) or 0, shift) with M0 * 2^shift ~= value.
    Host-side (numpy float64), exact replica incl. the rounding-overflow
    renormalization and the shift < -31 flush-to-zero."""
    if real_multiplier == 0.0:
        return 0, 0
    q, shift = np.frexp(np.float64(real_multiplier))
    q_fixed = int(np.floor(q * (1 << 31) + 0.5))   # round half away (q>0)
    if q_fixed == (1 << 31):
        q_fixed //= 2
        shift += 1
    if shift < -31:
        shift = 0
        q_fixed = 0
    if shift > 30:            # TFLite clamps via the left-shift cap
        shift = 30
        q_fixed = INT32_MAX
    return int(q_fixed), int(shift)


def _mul_s32_high64(a, m):
    """Signed 64-bit product of two int32 arrays as (hi int32-patterned
    uint32, lo uint32), via 16-bit limbs in wrapping uint32 arithmetic.
    hi carries the exact high signed word (two's complement)."""
    ua = a.astype(jnp.uint32)
    um = m.astype(jnp.uint32)
    a0 = ua & 0xFFFF
    a1 = ua >> 16
    m0 = um & 0xFFFF
    m1 = um >> 16
    p00 = a0 * m0                      # <= (2^16-1)^2 < 2^32
    p01 = a0 * m1
    p10 = a1 * m0
    p11 = a1 * m1
    # low word + carries into the high word; every partial sum < 2^32
    mid = (p00 >> 16) + (p01 & 0xFFFF) + (p10 & 0xFFFF)   # < 3 * 2^16
    lo = (p00 & 0xFFFF) | ((mid & 0xFFFF) << 16)
    hi = (mid >> 16) + (p01 >> 16) + (p10 >> 16) + p11    # unsigned high
    # signed correction: s_hi = u_hi - (a < 0 ? m : 0) - (m < 0 ? a : 0)
    hi = hi - jnp.where(a < 0, um, jnp.uint32(0)) \
            - jnp.where(m < 0, ua, jnp.uint32(0))
    return hi, lo


def saturating_rounding_doubling_high_mul(a, m):
    """gemmlowp SaturatingRoundingDoublingHighMul on int32 arrays:
    (2*a*m + 2^30-ish nudge) >> 31, saturated at INT32_MIN*INT32_MIN."""
    a = a.astype(jnp.int32)
    m = jnp.asarray(m, jnp.int32)
    hi, lo = _mul_s32_high64(a, m)
    neg = hi.astype(jnp.int32) < 0          # sign of the 64-bit product
    # nudge = 2^30 (ab >= 0) else 1 - 2^30; add into (hi, lo) with carry
    nudge_lo = jnp.where(neg, jnp.uint32((1 - (1 << 30)) & 0xFFFFFFFF),
                         jnp.uint32(1 << 30))
    nudge_hi = jnp.where(neg, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
    new_lo = lo + nudge_lo
    carry = (new_lo < lo).astype(jnp.uint32)
    new_hi = hi + nudge_hi + carry
    # gemmlowp divides by (1ll << 31) with C++ semantics: TRUNCATION
    # toward zero, not an arithmetic shift. floor-shift first, then +1
    # for negative non-exact quotients.
    res = ((new_hi.astype(jnp.int32) << 1)
           | (new_lo >> 31).astype(jnp.int32))
    neg = new_hi.astype(jnp.int32) < 0
    inexact = (new_lo & jnp.uint32(0x7FFFFFFF)) != 0
    res = res + jnp.where(neg & inexact, jnp.int32(1), jnp.int32(0))
    overflow = (a == INT32_MIN) & (m == INT32_MIN)
    return jnp.where(overflow, jnp.int32(INT32_MAX), res)


def rounding_divide_by_pot(x, exponent):
    """gemmlowp RoundingDivideByPOT on int32 arrays: arithmetic >> exponent
    rounding to nearest, ties away from zero. exponent: int array or
    scalar, 0..31."""
    x = x.astype(jnp.int32)
    exponent = jnp.asarray(exponent, jnp.int32)
    mask = ((jnp.int32(1) << exponent) - 1).astype(jnp.int32)
    remainder = (x & mask).astype(jnp.int32)
    threshold = (mask >> 1) + jnp.where(x < 0, jnp.int32(1), jnp.int32(0))
    return (x >> exponent) + jnp.where(remainder > threshold,
                                       jnp.int32(1), jnp.int32(0))


def multiply_by_quantized_multiplier(x, quantized_multiplier, shift):
    """TFLite MultiplyByQuantizedMultiplier, DOUBLE-rounding variant
    (gemmlowp SRDHM + RoundingDivideByPOT): the semantics of standard
    TFLite builds (TFLITE_SINGLE_ROUNDING=0 — including the TF wheel in
    this image, verified per-tensor in tests/test_qgraph.py) and of the
    EdgeTPU-era runtimes. x int32 array, M0 (int32 array or scalar),
    shift (positive = multiply by 2^shift)."""
    shift = jnp.asarray(shift, jnp.int32)
    left = jnp.maximum(shift, 0)
    right = jnp.maximum(-shift, 0)
    shifted = (x.astype(jnp.int32) << left)
    return rounding_divide_by_pot(
        saturating_rounding_doubling_high_mul(shifted, quantized_multiplier),
        right)


def multiply_by_quantized_multiplier_single(x, quantized_multiplier, shift):
    """TFLite MultiplyByQuantizedMultiplier, SINGLE-rounding variant —
    what TFLite builds with TFLITE_SINGLE_ROUNDING=1 use:

        total = 31 - shift            # in [1, 62]
        result = (x * M0 + (1 << (total-1))) >> total    # int64, floor

    i.e. round-half-toward-+inf at one final position. Computed int64-free
    from the limb product (hi, lo) with a two-range shift (t <= 32 via a
    cross-word funnel shift, t > 32 via the high word alone — exact
    because 0 <= lo < 2^32 cannot change the floor there). Result fits
    int32 by the kernel contract (DCHECKed, not clamped, upstream)."""
    x = x.astype(jnp.int32)
    m = jnp.asarray(quantized_multiplier, jnp.int32)
    t = (31 - jnp.asarray(shift, jnp.int32)).astype(jnp.int32)
    hi, lo = _mul_s32_high64(x, m)
    t_le_32 = t <= 32
    tm1 = jnp.clip(t - 1, 0, 31).astype(jnp.uint32)
    tm33 = jnp.clip(t - 33, 0, 31).astype(jnp.uint32)
    r_lo = jnp.where(t_le_32, jnp.uint32(1) << tm1, jnp.uint32(0))
    r_hi = jnp.where(t_le_32, jnp.uint32(0), jnp.uint32(1) << tm33)
    lo2 = lo + r_lo
    carry = (lo2 < lo).astype(jnp.uint32)
    hi2 = hi + r_hi + carry
    hi2s = hi2.astype(jnp.int32)
    ta = jnp.clip(t, 1, 31).astype(jnp.uint32)
    res_low = ((lo2 >> ta) | (hi2 << (jnp.uint32(32) - ta))) \
        .astype(jnp.int32)
    tb = jnp.clip(t - 32, 0, 31)
    return jnp.where(t <= 31, res_low,
                     jnp.where(t == 32, hi2s, hi2s >> tb))


def _clz32(x):
    """Count leading zeros of positive int32 values (exact, bit-smear +
    population count — no float log2)."""
    v = x.astype(jnp.uint32)
    v = v | (v >> 1)
    v = v | (v >> 2)
    v = v | (v >> 4)
    v = v | (v >> 8)
    v = v | (v >> 16)
    import jax.lax as lax
    return (jnp.uint32(32) - lax.population_count(v)).astype(jnp.int32)


def _srmbpot(x, exponent: int):
    """gemmlowp SaturatingRoundingMultiplyByPOT with a STATIC exponent:
    positive = saturating left shift, negative = RoundingDivideByPOT."""
    if exponent == 0:
        return x
    if exponent < 0:
        return rounding_divide_by_pot(x, -exponent)
    threshold = jnp.int32((1 << (31 - exponent)) - 1)
    shifted = (x.astype(jnp.int32) << exponent)
    shifted = jnp.where(x > threshold, jnp.int32(INT32_MAX), shifted)
    return jnp.where(x < -threshold, jnp.int32(INT32_MIN), shifted)


def get_inv_sqrt_quantized_multiplier_exp(input_):
    """TFLite GetInvSqrtQuantizedMultiplierExp (quantization_util.cc) with
    reverse_shift = -1 (the only value the kernels use), vectorized over an
    int32 array of non-negative sums-of-squares. Returns (multiplier int32,
    shift int32) such that MultiplyByQuantizedMultiplier(v, multiplier,
    shift + k) reproduces the kernel's 1/sqrt rescale bit-exactly.

    Replica notes: the `input /= 4` normalization loop runs at most twice
    for int32 inputs (2^31 / 16 < 2^29), so it is unrolled; CountLeadingZeros
    is exact integer bit-smear + popcount; the Newton-Raphson iteration is
    gemmlowp F3 fixed-point (SRDHM products, saturating POT rescales)."""
    x = input_.astype(jnp.int32)
    shift = jnp.full(x.shape, 11, jnp.int32)
    for _ in range(2):                     # while (input >= 1 << 29)
        big = x >= (1 << 29)
        x = jnp.where(big, x >> 2, x)      # positive: /4 == >>2
        shift = shift + big.astype(jnp.int32)
    # guard the input<=1 branch through the pipeline with a safe value
    trivial = input_.astype(jnp.int32) <= 1
    x = jnp.where(trivial, jnp.int32(1 << 28), x)
    max_left_shift_bits = _clz32(x) - 1
    left_shift_bit_pairs = (max_left_shift_bits // 2) - 1
    shift = shift - left_shift_bit_pairs
    x = x << (2 * left_shift_bit_pairs)

    # F3 Newton-Raphson for 1/sqrt (gemmlowp fixed-point, 5 iterations)
    half_input = rounding_divide_by_pot(x >> 1, 1)     # SRMBPOT<-1>(F3 raw)
    half_three = jnp.int32((1 << 28) + (1 << 27))
    nr = jnp.full(x.shape, 1 << 28, jnp.int32)         # F3::One()
    for _ in range(5):
        x2 = saturating_rounding_doubling_high_mul(nr, nr)          # F6
        x3 = saturating_rounding_doubling_high_mul(x2, nr)          # F9
        x3 = _srmbpot(x3, 6)                                        # ->F3
        t1 = saturating_rounding_doubling_high_mul(half_three, nr)  # F6
        t2 = saturating_rounding_doubling_high_mul(half_input, x3)  # F6
        nr = _srmbpot(t1 - t2, 3)                                   # ->F3
    half_sqrt_2 = jnp.int32(1518500250)                # F0 sqrt(2)/2
    nr = saturating_rounding_doubling_high_mul(nr, half_sqrt_2)     # F3

    neg = shift < 0
    mult = jnp.where(neg, nr << jnp.maximum(-shift, 0), nr)
    shift = jnp.where(neg, jnp.int32(0), shift)
    shift = -shift                                     # reverse_shift = -1
    mult = jnp.where(trivial, jnp.int32(INT32_MAX), mult)
    shift = jnp.where(trivial, jnp.int32(0), shift)
    return mult, shift


# ---------------------------------------------------------------------------
# numpy int64 oracles (tests + host-side precomputation)
# ---------------------------------------------------------------------------

def np_srdhm(a, m):
    a = np.asarray(a, np.int64)
    m = np.asarray(m, np.int64)
    ab = a * m
    nudge = np.where(ab >= 0, 1 << 30, 1 - (1 << 30))
    q = ab + nudge
    # C++ int64 division truncates toward zero (gemmlowp uses /, not >>)
    res = np.sign(q) * (np.abs(q) >> 31)
    res = np.where((a == INT32_MIN) & (m == INT32_MIN), INT32_MAX, res)
    return res.astype(np.int32)


def np_rdbp(x, exponent):
    x = np.asarray(x, np.int64).astype(np.int32)
    exponent = np.asarray(exponent, np.int32)
    mask = ((np.int64(1) << exponent) - 1).astype(np.int32)
    remainder = (x & mask).astype(np.int32)
    threshold = (mask >> 1) + (x < 0).astype(np.int32)
    return (x >> exponent) + (remainder > threshold).astype(np.int32)


def np_mbqm(x, m0, shift):
    shift = np.asarray(shift, np.int32)
    left = np.maximum(shift, 0)
    right = np.maximum(-shift, 0)
    return np_rdbp(np_srdhm(np.asarray(x, np.int32) << left, m0), right)


def np_mbqm_single(x, m0, shift):
    """int64 oracle for the single-rounding MultiplyByQuantizedMultiplier."""
    total = (31 - np.asarray(shift, np.int64)).astype(np.int64)
    prod = np.asarray(x, np.int64) * np.asarray(m0, np.int64)
    return ((prod + (np.int64(1) << (total - 1))) >> total).astype(np.int32)
