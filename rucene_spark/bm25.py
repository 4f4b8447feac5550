"""BM25 scoring kernel — bit-faithful float32 path + a float64 "precise" path.

The float32 ("lucene") path reproduces the reference's cast sequence exactly
(``/root/reference/src/core/search/similarity/bm25_similarity.rs``):

* ``idf``     — f64 log, cast to f32 per term, f32-accumulated   (``:99-114``)
* ``avgdl``   — ``sttf_f64 / doc_count_f64`` cast to f32          (``:72-83``)
* ``cache[i]``— ``k1 * ((1-b) + b * NORM_TABLE[i]/avgdl)`` in f32 (``:161-165``)
* ``score``   — ``weight * (k1+1) * freq / (freq + cache[norm])`` (``:203-212``)
  left-associative, f32, ``weight = idf * boost`` (``:363-366``)
* norms absent → denominator ``freq + k1``                        (``:203-212``)

Collection/term statistics are computed **globally** over all segments (the
documented divergence from rucene's largest-segment shortcut,
``searcher.rs:306-363`` — see SURVEY.md §2.7).

The float64 "precise" path uses the same formula with exact field lengths
(no byte315 quantization) and no down-casts; it exists so results can be
validated against an ANSI-SQL oracle (DuckDB) which has no float32 type.
The indexed-tf cap ``min(tf, 10)`` (``posting_writer.rs:641``) applies to
both paths because it is baked into the stored postings.
"""

from __future__ import annotations

import math

import numpy as np

from .smallfloat import NORM_TABLE

DEFAULT_K1 = 1.2  # bm25_similarity.rs:45
DEFAULT_B = 0.75  # bm25_similarity.rs:46

#: Per-document term-frequency cap applied at index time
#: (posting_writer.rs:641, postings/mod.rs:82 DEFAULT_DOC_TERM_FREQ).
TERM_FREQ_LIMIT = 10


def idf32(df: int, doc_count: int) -> np.float32:
    """Single-term idf, f64 math cast to f32 (bm25_similarity.rs:107-113)."""
    v = math.log(1.0 + (float(doc_count) - float(df) + 0.5) / (float(df) + 0.5))
    return np.float32(v)


def idf_sum32(dfs: list[int], doc_count: int) -> np.float32:
    """Multi-term weight = f32 sum of per-term f32 idfs (bm25_similarity.rs:99-114)."""
    total = np.float32(0.0)
    for df in dfs:
        total = np.float32(total + idf32(df, doc_count))
    return total


def avgdl32(sum_total_term_freq: int, doc_count: int) -> np.float32:
    """Average field length; 1.0 if sttf <= 0 (bm25_similarity.rs:72-83)."""
    if sum_total_term_freq <= 0:
        return np.float32(1.0)
    return np.float32(float(sum_total_term_freq) / float(doc_count))


def norm_cache32(avgdl: np.float32, k1: float = DEFAULT_K1, b: float = DEFAULT_B) -> np.ndarray:
    """256-entry f32 cache ``k1*((1-b) + b*NORM_TABLE[i]/avgdl)`` (bm25_similarity.rs:161-165)."""
    k1f = np.float32(k1)
    bf = np.float32(b)
    return (k1f * ((np.float32(1.0) - bf) + bf * (NORM_TABLE / np.float32(avgdl)))).astype(
        np.float32
    )


def score32(
    weight: np.float32,
    freq: np.ndarray,
    norm_bytes: np.ndarray | None,
    cache: np.ndarray,
    k1: float = DEFAULT_K1,
) -> np.ndarray:
    """Vectorized f32 BM25: ``weight * (k1+1) * freq / (freq + cache[norm])``.

    ``freq`` may be fractional (sloppy-phrase freq). Reference:
    bm25_similarity.rs:203-212 (norms → cache lookup; absent norms → ``+ k1``).
    """
    f = np.asarray(freq, dtype=np.float32)
    k1f = np.float32(k1)
    if norm_bytes is None:
        denom_add = k1f
    else:
        denom_add = cache[np.asarray(norm_bytes, dtype=np.int64)]
    return ((np.float32(weight) * (k1f + np.float32(1.0))) * f / (f + denom_add)).astype(
        np.float32
    )


# ---------------------------------------------------------------------------
# float64 "precise" path (SQL-oracle-comparable; no quantization)
# ---------------------------------------------------------------------------


def idf64(df: np.ndarray | int, doc_count: int) -> np.ndarray:
    return np.log(1.0 + (float(doc_count) - np.asarray(df, dtype=np.float64) + 0.5)
                  / (np.asarray(df, dtype=np.float64) + 0.5))


def score64(
    idf: np.ndarray | float,
    freq: np.ndarray,
    doc_len: np.ndarray,
    avgdl: float,
    boost: float = 1.0,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> np.ndarray:
    """Exact-length float64 BM25 (the ANSI-SQL-expressible variant)."""
    f = np.asarray(freq, dtype=np.float64)
    dl = np.asarray(doc_len, dtype=np.float64)
    denom = f + k1 * ((1.0 - b) + b * dl / avgdl)
    return np.asarray(idf, dtype=np.float64) * boost * (k1 + 1.0) * f / denom
