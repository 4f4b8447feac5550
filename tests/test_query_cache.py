"""Query cache: LRU cached filter sets + usage-tracking policy.

Reference: query_cache.rs:42-54 (cache only when scores are not needed),
:229-248 (LRU sizing), :416-456 (on_use → eligibility → lookup →
should_cache protocol); cache_policy.rs:56-128 (usage-tracking policy
with per-type min frequencies, MatchAll never cached). The reference
ships the cache disabled (searcher.rs:696-701) — so does our searcher;
these tests opt in explicitly.
"""

import pytest

from rucene_spark.build import IndexWriter
from rucene_spark.cache import (AlwaysCacheQueryCachingPolicy,
                                FrequencyTrackingRingBuffer, LRUQueryCache,
                                UsageTrackingQueryCachingPolicy,
                                query_cache_key)
from rucene_spark.merge import update_doc_values
from rucene_spark.query import (BooleanQuery, MatchAllDocsQuery, RangeQuery,
                                TermQuery)
from rucene_spark.search import IndexSearcher


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    rows = [
        (i, f"common w{i % 7} x{i % 3}", i % 10)
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, pop long")
    d = str(tmp_path_factory.mktemp("qcache_idx"))
    IndexWriter(spark, d, n_segments=2, key_col="doc_id",
                partitioner="range").build(df)
    return d


def _rows(df):
    return sorted((r["doc_id"], round(float(r["score"]), 5))
                  for r in df.collect())


FILTERED = BooleanQuery(musts=[TermQuery("text", "w1")],
                        filters=[RangeQuery("pop", 2, 8)])


# -- unit: ring buffer + policy ------------------------------------------


def test_ring_buffer_frequency_decay():
    # cache_policy.rs:136-181 — oldest entry drops out of the history
    rb = FrequencyTrackingRingBuffer(4)
    for k in (1, 1, 2, 3):
        rb.add(k)
    assert rb.frequency(1) == 2 and rb.frequency(2) == 1
    rb.add(4)  # evicts the first 1
    rb.add(5)  # evicts the second 1
    assert rb.frequency(1) == 0
    assert rb.frequency(4) == rb.frequency(5) == 1
    with pytest.raises(ValueError):
        FrequencyTrackingRingBuffer(1)


def test_policy_min_frequencies():
    # cache_policy.rs:82-90,112-121 — costly 2 / default 5 / cheap 20,
    # MatchAll never
    pol = UsageTrackingQueryCachingPolicy()
    rng = RangeQuery("pop", 1, 3)
    kr = query_cache_key(rng)
    assert not pol.should_cache(rng, kr)
    pol.on_use(rng, kr)
    assert not pol.should_cache(rng, kr)
    pol.on_use(rng, kr)
    assert pol.should_cache(rng, kr)          # costly: 2 uses

    bq = BooleanQuery(musts=[TermQuery("text", "w1")],
                      must_nots=[TermQuery("text", "x2")])
    kb = query_cache_key(bq)
    for i in range(5):
        assert not pol.should_cache(bq, kb)
        pol.on_use(bq, kb)
    assert pol.should_cache(bq, kb)           # default: 5 uses

    tq = TermQuery("text", "w1")
    kt = query_cache_key(tq)
    for _ in range(19):
        pol.on_use(tq, kt)
    assert not pol.should_cache(tq, kt)
    pol.on_use(tq, kt)
    assert pol.should_cache(tq, kt)           # cheap: 20 uses

    ma = MatchAllDocsQuery()
    km = query_cache_key(ma)
    for _ in range(30):
        pol.on_use(ma, km)
    assert not pol.should_cache(ma, km)       # never


def test_uncacheable_keys():
    # FilterQuery over a Python callable has no canonical key
    from rucene_spark.query import FilterQuery
    q = FilterQuery(TermQuery("text", "w1"), lambda pdf: pdf["pop"] > 2)
    assert query_cache_key(q) is None
    assert query_cache_key(RangeQuery("pop", 1, 2)) is not None


# -- end-to-end through the searcher --------------------------------------


def test_cached_results_identical(spark, idx):
    plain = IndexSearcher(spark, idx)
    want = _rows(plain.search(FILTERED, 20))
    qc = LRUQueryCache(max_size=8, min_size=1)
    s = IndexSearcher(spark, idx, query_cache=qc,
                      caching_policy=AlwaysCacheQueryCachingPolicy())
    got1 = _rows(s.search(FILTERED, 20))
    assert got1 == want
    assert qc.cache_count == 1                # the range filter clause
    # a DIFFERENT top-level query sharing the filter clause hits the set
    other = BooleanQuery(musts=[TermQuery("text", "w2")],
                         filters=[RangeQuery("pop", 2, 8)])
    want2 = _rows(plain.search(other, 20))
    assert _rows(s.search(other, 20)) == want2
    assert qc.hit_count >= 1
    assert qc.cache_count == 1                # no recompute


def test_usage_tracking_caches_on_second_use(spark, idx):
    qc = LRUQueryCache(max_size=8, min_size=1)
    s = IndexSearcher(spark, idx, query_cache=qc)  # default policy
    q1 = BooleanQuery(musts=[TermQuery("text", "w1")],
                      filters=[RangeQuery("pop", 2, 8)])
    q2 = BooleanQuery(musts=[TermQuery("text", "w2")],
                      filters=[RangeQuery("pop", 2, 8)])
    s.search(q1, 5)
    assert qc.cache_count == 0                # 1st use: below min freq 2
    s.search(q2, 5)
    assert qc.cache_count == 1                # 2nd recent use: cached
    plain = IndexSearcher(spark, idx)
    assert _rows(s.search(q2, 5)) == _rows(plain.search(q2, 5))


def test_lru_eviction_unpersists(spark, idx):
    qc = LRUQueryCache(max_size=1, min_size=1)
    s = IndexSearcher(spark, idx, query_cache=qc,
                      caching_policy=AlwaysCacheQueryCachingPolicy())
    s.search(BooleanQuery(musts=[TermQuery("text", "w1")],
                          filters=[RangeQuery("pop", 0, 4)]), 5)
    s.search(BooleanQuery(musts=[TermQuery("text", "w1")],
                          filters=[RangeQuery("pop", 5, 9)]), 5)
    assert qc.cache_count == 2
    assert qc.eviction_count == 1
    assert len(qc) == 1


def test_min_size_gates_tiny_index(spark, idx):
    # query_cache.rs:240 min_size=10000 — our 60-doc corpus is below it
    qc = LRUQueryCache(max_size=8)            # default min_size=10_000
    s = IndexSearcher(spark, idx, query_cache=qc,
                      caching_policy=AlwaysCacheQueryCachingPolicy())
    s.search(FILTERED, 5)
    assert qc.cache_count == 0 and len(qc) == 0


def test_dv_update_invalidates_generation(spark, idx, tmp_path):
    import shutil
    d = str(tmp_path / "idx2")
    shutil.copytree(idx, d)
    qc = LRUQueryCache(max_size=8, min_size=1)
    pol = AlwaysCacheQueryCachingPolicy()
    s1 = IndexSearcher(spark, d, query_cache=qc, caching_policy=pol)
    before = _rows(s1.search(FILTERED, 30))
    assert qc.cache_count == 1
    # move doc 15 (w1, pop=5) out of the range WITHOUT a new manifest
    update_doc_values(d, "pop", {15: 99.0})
    s2 = IndexSearcher(spark, d, query_cache=qc, caching_policy=pol)
    assert s2._gen_key != s1._gen_key
    after = _rows(s2.search(FILTERED, 30))
    assert qc.cache_count == 2                # fresh set, no stale hit
    assert [i for i, _ in before if i == 15] == [15]
    assert all(i != 15 for i, _ in after)
    # dropping the old generation releases its persisted set
    assert qc.purge_generations({s2._gen_key}) == 1
    assert len(qc) == 1


def test_searcher_manager_purges_old_generation(spark, idx, tmp_path):
    import shutil
    from rucene_spark.build import IndexWriter as IW
    from rucene_spark.streaming import SearcherManager
    d = str(tmp_path / "idx3")
    shutil.copytree(idx, d)
    qc = LRUQueryCache(max_size=8, min_size=1)
    mgr = SearcherManager(spark, d, query_cache=qc,
                          caching_policy=AlwaysCacheQueryCachingPolicy())
    s = mgr.acquire()
    s.search(FILTERED, 5)
    assert len(qc) == 1
    delta = spark.createDataFrame(
        [(1000, "common w1 x1", 3)], "doc_id long, text string, pop long")
    IW(spark, d, key_col="doc_id").add_documents(delta)
    assert mgr.maybe_refresh()
    assert len(qc) == 0                        # old generation unpersisted
    fresh = mgr.acquire()
    plain = IndexSearcher(spark, d)
    assert _rows(fresh.search(FILTERED, 30)) == _rows(plain.search(FILTERED, 30))
