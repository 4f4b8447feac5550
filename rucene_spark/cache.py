"""Query cache: LRU-evicted cached filter sets + usage-tracking policy.

Reference semantics (zhihu/rucene):

- ``query_cache.rs:42-54`` — ``QueryCache::do_cache`` contract: the cached
  weight is only equivalent when scores are NOT needed.  We therefore
  consult the cache exclusively in filter context
  (``IndexSearcher._frame(needs_scores=False)`` — ConstantScore inners,
  boolean ``filter``/``must_not`` clauses, BoostingQuery negatives), where
  every caller discards the score column.
- ``query_cache.rs:416-456`` — ``CachingWrapperWeight::create_scorer``
  protocol, mirrored step for step by
  ``IndexSearcher._cached_filter_frame``: (1) ``policy.on_use`` once per
  use, (2) segment-size eligibility short-circuit, (3) cache lookup → hit
  returns a constant-score set, (4) miss → ``policy.should_cache`` gates
  compute-and-store, else run uncached.
- ``query_cache.rs:229-248`` — ``LRUQueryCache::new``: LRU over unique
  query keys with ``max_size`` entries, ``min_size=10_000``,
  ``min_size_ratio=0.03``; eviction drops the query from every leaf cache
  (``query_cache.rs:190-216``).
- ``cache_policy.rs:56-128`` — ``UsageTrackingQueryCachingPolicy``: a
  frequency-tracking ring buffer of query hash codes; a query becomes
  cache-worthy at frequency 2 if costly (point ranges), 20 if cheap
  (plain term), 5 otherwise; MatchAll is never cached
  (``cache_policy.rs:112-121``).

The reference ships with the cache DISABLED (``searcher.rs:696-701``
builds ``NoCacheQueryCache``); ours matches — ``IndexSearcher`` takes
``query_cache=None`` by default and behaves identically without one.

Spark-native mapping.  A per-leaf ``DocIdSet`` bitset becomes a PERSISTED
``(seg, doc)`` DataFrame: ``StorageLevel.MEMORY_AND_DISK`` blocks live on
the executors' block managers partition-by-partition — the distributed
analogue of one bitset per leaf, and the reason this scales to a real
cluster (each executor holds only its partitions of the cached set; a hit
is a local-block scan, no recompute, no shuffle of the filter subtree).
The reference keys leaf caches by core reader and drops them via core
drop listeners because leaves die independently at merge
(``query_cache.rs:396-404``); our commit point is the manifest, so
entries carry the searcher's manifest content hash and a
refresh/merge/delete naturally invalidates — ``purge_generations`` plays
the drop listener, unpersisting entries whose generation no longer
matches any live searcher.  ``min_size`` gates on the index doc count
(materializing a set over a tiny corpus costs more block-manager traffic
than recomputing the filter); ``min_size_ratio``'s job in the reference —
skip leaves about to be merged away — is carried by the generation key.
"""

from __future__ import annotations

import zlib
from collections import Counter, OrderedDict, deque

__all__ = [
    "FrequencyTrackingRingBuffer",
    "AlwaysCacheQueryCachingPolicy",
    "UsageTrackingQueryCachingPolicy",
    "LRUQueryCache",
    "query_cache_key",
    "query_hash",
]


def query_cache_key(q) -> str | None:
    """Canonical cache key for a query, or None if uncacheable.

    The reference keys by the weight's Display string
    (query_cache.rs:283).  Our Query dataclasses have deterministic
    reprs built from literal fields — except FilterQuery wrapping a
    Python callable, whose repr embeds an object id; those are
    uncacheable (as is anything carrying a non-literal payload).
    """
    r = repr(q)
    if " at 0x" in r or "<" in r:
        return None
    return r


def query_hash(key: str) -> int:
    """Stable 32-bit hash of a query key (hash_code, query_cache.rs:284-292).

    crc32 rather than Python hash(): deterministic across processes, so
    policy behavior is reproducible in tests and across driver restarts.
    """
    return zlib.crc32(key.encode("utf-8")) & 0xFFFFFFFF


class FrequencyTrackingRingBuffer:
    """Fixed-size ring buffer tracking the frequency of its members.

    Value-identical to cache_policy.rs:136-181 (ring buffer + IntBag):
    a deque bounded at ``max_size`` evicts the oldest entry on overflow
    and a Counter tracks live frequencies — the same observable
    ``add``/``frequency`` semantics without re-implementing the
    open-addressing bag (that structure exists for allocation control,
    not behavior).
    """

    def __init__(self, max_size: int):
        if max_size < 2:
            raise ValueError("max_size must be at least 2")
        self.max_size = max_size
        self._buf: deque[int] = deque()
        self._freq: Counter[int] = Counter()

    def add(self, key: int) -> None:
        if len(self._buf) == self.max_size:
            old = self._buf.popleft()
            self._freq[old] -= 1
            if self._freq[old] <= 0:
                del self._freq[old]
        self._buf.append(key)
        self._freq[key] += 1

    def frequency(self, key: int) -> int:
        return self._freq.get(key, 0)


class AlwaysCacheQueryCachingPolicy:
    """cache_policy.rs:40-54 — cache everything (test policy)."""

    def on_use(self, q, key: str) -> None:
        pass

    def should_cache(self, q, key: str) -> bool:
        return True


class UsageTrackingQueryCachingPolicy:
    """cache_policy.rs:56-128 — cache filters that recur in recent history.

    Thresholds (cache_policy.rs:82-90): costly queries (point ranges —
    RangeQuery/MultiRangeQuery here) cache at the 2nd recent use, cheap
    ones (plain TermQuery) at the 20th, everything else at the 5th.
    MatchAll never caches (should_cache, cache_policy.rs:112-121): it is
    already a metadata scan.
    """

    def __init__(self, history_size: int = 256):
        self._history = FrequencyTrackingRingBuffer(history_size)

    @staticmethod
    def _min_frequency(q) -> int | None:
        from .query import (MatchAllDocsQuery, MultiRangeQuery, RangeQuery,
                            TermQuery)
        if isinstance(q, MatchAllDocsQuery):
            return None
        if isinstance(q, (RangeQuery, MultiRangeQuery)):
            return 2    # is_costly (cache_policy.rs:73-76)
        if isinstance(q, TermQuery):
            return 20   # is_cheap (cache_policy.rs:78-80)
        return 5

    def on_use(self, q, key: str) -> None:
        self._history.add(query_hash(key))

    def frequency(self, key: str) -> int:
        return self._history.frequency(query_hash(key))

    def should_cache(self, q, key: str) -> bool:
        min_freq = self._min_frequency(q)
        if min_freq is None:
            return False
        return self.frequency(key) >= min_freq


class LRUQueryCache:
    """LRU cache of persisted (seg, doc) filter frames.

    One entry per (generation, query key); ``max_size`` total entries
    with least-recently-used eviction (query_cache.rs:190-216 — evicting
    a query drops its sets everywhere; here an entry IS the whole-index
    set, so eviction == unpersist).  ``min_size`` mirrors
    LRUQueryCache::new's min_size=10_000 (query_cache.rs:240): indices
    smaller than this never cache.

    Shareable across searchers/generations like the reference cache is
    shared across readers; entries are generation-keyed so a refreshed
    searcher can never see a stale set.
    """

    def __init__(self, max_size: int = 64, min_size: int = 10_000):
        self.max_size = int(max_size)
        self.min_size = int(min_size)
        self._entries: OrderedDict[tuple[str, str], object] = OrderedDict()
        self.hit_count = 0
        self.miss_count = 0
        self.cache_count = 0       # sets computed and stored
        self.eviction_count = 0

    def __len__(self) -> int:
        return len(self._entries)

    def get(self, gen: str, key: str):
        """Cached frame for (generation, key) or None; a hit refreshes LRU
        recency (CacheData::get moves the query to MRU, query_cache.rs:
        139-151)."""
        ent = self._entries.get((gen, key))
        if ent is None:
            self.miss_count += 1
            return None
        self._entries.move_to_end((gen, key))
        self.hit_count += 1
        return ent

    def put(self, gen: str, key: str, frame):
        """Persist + store ``frame`` (a (seg, doc) DataFrame); returns the
        stored frame.  Keeps the first writer's entry on a race
        (put_if_absent, query_cache.rs:96-100)."""
        k = (gen, key)
        if k in self._entries:
            return self._entries[k]
        while len(self._entries) >= self.max_size:
            _, old = self._entries.popitem(last=False)
            self._unpersist(old)
            self.eviction_count += 1
        from pyspark import StorageLevel
        frame = frame.persist(StorageLevel.MEMORY_AND_DISK)
        # materialize eagerly: the reference caches by bulk-scoring the
        # whole leaf up front (cache_into_bitset, query_cache.rs:322-348)
        frame.count()
        self._entries[k] = frame
        self.cache_count += 1
        return frame

    def purge_generations(self, live_gens: set[str]) -> int:
        """Drop entries whose generation is not in ``live_gens`` — the
        core-drop-listener analogue (query_cache.rs:396-404).  Returns
        the number of entries dropped."""
        dead = [k for k in self._entries if k[0] not in live_gens]
        for k in dead:
            self._unpersist(self._entries.pop(k))
        return len(dead)

    def clear(self) -> None:
        for ent in self._entries.values():
            self._unpersist(ent)
        self._entries.clear()

    @staticmethod
    def _unpersist(frame) -> None:
        try:
            frame.unpersist()
        except Exception:
            pass  # session already stopped; nothing to release
