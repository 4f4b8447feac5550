"""BM25 kernel tests ported from the reference
(/root/reference/src/core/search/similarity/bm25_similarity.rs:394-466)."""

import math

import numpy as np

from rucene_spark.bm25 import (
    avgdl32,
    idf32,
    idf_sum32,
    norm_cache32,
    score32,
    score64,
)
from rucene_spark.smallfloat import encode_norm_value


def test_idf_spot_values():
    # bm25_similarity.rs:413-428:
    # (doc_count=-1 → max_doc=11, df=1) → ln 8 ; (doc_count=32, df=1) → ln 22
    assert abs(idf32(1, 11) - np.float32(math.log(8.0))) < np.finfo(np.float32).eps
    assert abs(idf32(1, 32) - np.float32(math.log(22.0))) < np.finfo(np.float32).eps


def test_avgdl_fallbacks():
    # bm25_similarity.rs:430-440
    assert avgdl32(0, 5) == np.float32(1.0)       # sttf <= 0 → 1
    assert avgdl32(8, 2) == np.float32(4.0)
    assert avgdl32(9, 3) == np.float32(3.0)


def test_value_for_normalization():
    # bm25_similarity.rs:443-449: doc_count=32, sttf=120, df=1, boost=1
    # weight = idf; weight^2 ≈ 9.5545435
    idf = idf_sum32([1], 32)
    assert abs(idf * idf - np.float32(9.5545435)) < np.finfo(np.float32).eps


def test_score_monotonicity():
    # bm25_similarity.rs:443-465: higher tf wins; shorter doc wins at same tf
    avgdl = avgdl32(120, 32)
    cache = norm_cache32(avgdl)
    weight = idf_sum32([1], 32)
    norm_b = encode_norm_value(1.0, np.array([10, 100]))
    s_hi = score32(weight, np.array([100.0]), norm_b[:1], cache)[0]
    s_lo = score32(weight, np.array([20.0]), norm_b[:1], cache)[0]
    assert s_hi > s_lo
    s_short = score32(weight, np.array([10.0]), norm_b[:1], cache)[0]
    s_long = score32(weight, np.array([10.0]), norm_b[1:], cache)[0]
    assert s_short > s_long


def test_score_without_norms_uses_k1():
    # bm25_similarity.rs:203-212 — norms absent → denominator freq + k1
    w = np.float32(2.0)
    got = score32(w, np.array([3.0]), None, norm_cache32(np.float32(1.0)))[0]
    exp = np.float32(w * np.float32(2.2) * np.float32(3.0) / np.float32(3.0 + 1.2))
    assert got == exp


def test_score32_is_float32_exact():
    """The f32 path must be bitwise-reproducible: same inputs → same bits."""
    avgdl = avgdl32(5432, 100)
    cache = norm_cache32(avgdl)
    w = idf_sum32([7], 100)
    tf = np.arange(1, 11, dtype=np.float64)
    nb = encode_norm_value(1.0, np.arange(1, 11) * 7)
    a = score32(w, tf, nb, cache)
    b = score32(w, tf, nb, cache)
    assert a.dtype == np.float32
    assert (a.view(np.int32) == b.view(np.int32)).all()


def test_score64_matches_closed_form():
    got = score64(idf=2.0, freq=np.array([3.0]), doc_len=np.array([50]), avgdl=25.0)[0]
    exp = 2.0 * 2.2 * 3.0 / (3.0 + 1.2 * (0.25 + 0.75 * 50 / 25.0))
    assert got == exp
