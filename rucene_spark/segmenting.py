"""Deterministic doc→segment assignment, shared by the engine and the oracle.

Doc ids must be a pure function of (key, segmenting config) — never
``monotonically_increasing_id`` — so retries/resumes yield identical indexes
(SURVEY.md §7.3.4). Global doc order is the composite ``(segment_id,
local_doc_id)``; local ids are the rank of the key within the segment — the
Spark analogue of rucene's per-DWPT id assignment + leaf ordering
(doc_writer.rs:198-288, searcher leaves order).

Two strategies:

* ``hash``  — ``crc32(key) % n_segments``; key-stable under any input order.
* ``range`` — contiguous key ranges (for integer keys: ``key*nseg//(hi+1)``),
  which makes global doc order equal key order — used when downstream
  tie-breaks must match an external ordering (e.g. SQL oracles ordering by
  the source key).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd


def hash_segment(keys: pd.Series, n_segments: int) -> np.ndarray:
    ks = keys.astype(str)
    return np.fromiter(
        (zlib.crc32(k.encode("utf-8")) % n_segments for k in ks),
        dtype=np.int64,
        count=len(ks),
    )


def range_segment(keys: pd.Series, n_segments: int, lo: int, hi: int) -> np.ndarray:
    """Integer keys in [lo, hi] → contiguous buckets."""
    k = keys.to_numpy()
    width = hi - lo + 1
    return ((k.astype(np.int64) - lo) * n_segments) // width


def assign_doc_ids(keys: pd.Series) -> np.ndarray:
    """Local doc id = rank of key within its segment (ascending, dense)."""
    order = np.argsort(keys.to_numpy(), kind="stable")
    ids = np.empty(len(keys), dtype=np.int64)
    ids[order] = np.arange(len(keys), dtype=np.int64)
    return ids
