"""byte315 minifloat tests, ported from the reference's expectations
(/root/reference/src/core/util/small_float.rs:39-115 and
 /root/reference/src/core/search/similarity/bm25_similarity.rs:400-411)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rucene_spark.smallfloat import (
    NORM_TABLE,
    byte315_to_float,
    encode_norm_value,
    float_to_byte315,
)


def origin_byte_to_float(b: int) -> np.float32:
    """Independent mantissa/exponent reimplementation, ported from the
    reference's own cross-check (small_float.rs:45-53)."""
    if b == 0:
        return np.float32(0.0)
    mantissa = b & 7
    exponent = (b >> 3) & 31
    bits = ((exponent + (63 - 15)) << 24) | (mantissa << 21)
    return np.uint32(bits).view(np.float32)


def origin_float_to_byte(f: np.float32) -> int:
    """Ported from small_float.rs:55-74."""
    if f < 0.0:
        return 0
    bits = int(np.float32(f).view(np.int32))
    mantissa = (bits & 0xFF_FFFF) >> 21
    exponent = ((bits >> 24) & 0x7F) - 63 + 15
    if exponent > 31:
        exponent, mantissa = 31, 7
    if exponent < 0 or (exponent == 0 and mantissa == 0):
        exponent, mantissa = 0, 1
    return (exponent << 3) | mantissa


def test_boundaries():
    # small_float.rs:77-93
    min_value = np.float32(1.4e-45)
    max_value = np.float32(3.4028235e38)
    pos_inf = np.float32(np.inf)
    neg_inf = np.float32(-np.inf)

    assert float_to_byte315(np.float32(5.8123817e-10))[0] == 1
    assert float_to_byte315(np.float32(0.0))[0] == 0
    assert float_to_byte315(min_value)[0] == 1
    assert float_to_byte315(max_value)[0] == 255
    assert float_to_byte315(pos_inf)[0] == 255
    assert float_to_byte315(-min_value)[0] == 0
    assert float_to_byte315(-max_value)[0] == 0
    assert float_to_byte315(neg_inf)[0] == 0


@settings(max_examples=300)
@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_matches_origin_impl(bit_pattern):
    # the reference fuzz test small_float.rs:95-105 (random bit patterns).
    # -0.0 (0x80000000) is excluded: the reference's two impls disagree there
    # (float_to_byte315 → 0 via `bits <= 0`; origin_float_to_byte → 1 via
    # `f < 0.0` being false for -0.0). We follow the production impl.
    # ±0.0 likewise diverges (production → 0, asserted at small_float.rs:86;
    # helper → 1); both zeros are pinned in test_boundaries instead.
    if bit_pattern in (0x0000_0000, 0x8000_0000):
        return
    f = np.uint32(bit_pattern).view(np.float32)
    if np.isnan(f):
        return
    assert float_to_byte315(f)[0] == origin_float_to_byte(f)


def test_negative_zero_follows_production_impl():
    assert float_to_byte315(np.float32(-0.0))[0] == 0


def test_decode_matches_origin():
    # small_float.rs:108-115
    for i in range(256):
        assert byte315_to_float(i)[0] == origin_byte_to_float(i)


def test_norm_table_sane():
    # bm25_similarity.rs:400-411 — positive, finite, strictly decreasing
    assert (NORM_TABLE >= 0).all()
    assert np.isfinite(NORM_TABLE).all()
    assert (NORM_TABLE[1:] < NORM_TABLE[:-1]).all()


def test_encode_norm_value_vectorized():
    lengths = np.arange(1, 5000)
    enc = encode_norm_value(1.0, lengths)
    scalar = np.array(
        [float_to_byte315(np.float32(1.0) / np.sqrt(np.float32(n)))[0] for n in lengths]
    )
    assert (enc == scalar).all()
    # longer docs never get a larger norm byte
    assert (np.diff(enc.astype(int)) <= 0).all()
