"""Lucene ``SmallFloat`` byte315 minifloat — 3-bit mantissa, 5-bit exponent,
zero-point 15 — used to encode per-document field-length norms in one byte.

Semantics ported from the reference implementation
(``/root/reference/src/core/util/small_float.rs:16-36``); the reference in turn
follows Lucene 6.2's ``SmallFloat.floatToByte315`` exactly.  Bit-exactness here
is load-bearing: BM25 scores are rank-compared against the oracle at float32
resolution, and the norm byte feeds the 256-entry score cache
(``bm25_similarity.rs:33-43,161-165``).

Everything is vectorized numpy (no per-row Python in the hot path).
"""

from __future__ import annotations

import numpy as np

# (63 - 15) << 3 — the exponent re-bias between IEEE754 single (bias 63 after
# the >>24 shift of the sign-free view used by Lucene) and byte315 (bias 15).
_BIAS_SHIFTED = (63 - 15) << 3


def float_to_byte315(f: np.ndarray | float) -> np.ndarray:
    """Encode float32 values to byte315 (vectorized).

    Reference: ``small_float.rs:16-26``. ``bits`` is the raw IEEE754 pattern
    reinterpreted as *signed* int32, so negatives (and -0.0, NaN with sign bit)
    fall into the ``bits <= 0`` branch and encode to 0.
    """
    arr = np.atleast_1d(np.asarray(f, dtype=np.float32))
    bits = arr.view(np.int32)
    small = bits >> (24 - 3)  # arithmetic shift, matches Rust i32 >>
    out = (small - _BIAS_SHIFTED).astype(np.int64)
    too_small = small <= _BIAS_SHIFTED
    too_big = small >= _BIAS_SHIFTED + 0x100
    out = np.where(too_small, np.where(bits <= 0, 0, 1), out)
    out = np.where(too_big & ~too_small, 255, out)
    return out.astype(np.uint8)


def byte315_to_float(b: np.ndarray | int) -> np.ndarray:
    """Decode byte315 back to float32 (vectorized). Reference: ``small_float.rs:28-36``."""
    barr = np.atleast_1d(np.asarray(b, dtype=np.uint32))
    bits = (barr << (24 - 3)) + np.uint32((63 - 15) << 24)
    out = bits.astype(np.uint32).view(np.float32).copy()
    out[barr == 0] = 0.0
    return out


def _build_norm_table() -> np.ndarray:
    """``NORM_TABLE[b] = 1/(byte315_to_float(b))^2``; ``NORM_TABLE[0] = 1/NORM_TABLE[255]``.

    Reference: ``bm25_similarity.rs:33-43``. All arithmetic in float32.
    """
    f = byte315_to_float(np.arange(256, dtype=np.uint32))
    with np.errstate(divide="ignore"):
        table = (np.float32(1.0) / (f * f)).astype(np.float32)
    table[0] = np.float32(1.0) / table[255]
    return table


#: 256-entry decoded norm table (float32), index = norm byte.
NORM_TABLE: np.ndarray = _build_norm_table()


def encode_norm_value(boost: float, field_length: np.ndarray | int) -> np.ndarray:
    """``byte315(boost / sqrt(field_length))`` — the index-time norm byte.

    Reference: ``bm25_similarity.rs:85-97`` (``encode_norm_value``); float32
    arithmetic throughout. ``field_length`` is ``length - num_overlap``.
    """
    fl = np.asarray(field_length, dtype=np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        val = np.float32(boost) / np.sqrt(fl, dtype=np.float32)
    return float_to_byte315(val.astype(np.float32))
