"""Concurrent merge scheduler (ConcurrentMergeScheduler analogue,
merge_scheduler.rs:141-198): disjoint merges run their data phases on
driver threads with the manifest commit serialized; results must be
invariant vs the sequential scheduler, including under deletes."""

import pandas as pd
import pytest

from rucene_spark.build import IndexWriter, load_manifest
from rucene_spark.merge import (
    TieredMergePolicy,
    delete_by_keys,
    find_merge_wave,
    has_tombstones,
    maybe_merge,
)
from rucene_spark.query import BooleanQuery, MatchAllDocsQuery, TermQuery
from rucene_spark.search import IndexSearcher
from rucene_spark.webtext import make_corpus, term_df_spectrum


@pytest.fixture(scope="module")
def corpus() -> pd.DataFrame:
    return make_corpus(600, seed=23)


@pytest.fixture(scope="module")
def qterms(corpus):
    dfs = term_df_spectrum(corpus)
    plain = [t for t in dfs.index if t.startswith("t0")]
    return plain[0], plain[len(plain) // 3], plain[-1]


def _build(spark, corpus, d, n_segments=8):
    IndexWriter(spark, d, n_segments=n_segments).build(
        spark.createDataFrame(corpus[["url", "text", "lang"]]))
    return d


def _results(searcher, qterms, k=1000):
    hi, mid, rare = qterms
    out = {}
    for name, q in {
        "term": TermQuery("text", hi),
        "bool": BooleanQuery.build(
            [], [TermQuery("text", hi), TermQuery("text", mid)], [], []),
        "rare": TermQuery("text", rare),
    }.items():
        rows = searcher.search(q, k).collect()
        # full match set, order-insensitive (tied scores may order
        # differently across segment layouts)
        out[name] = {(r["url"], round(float(r["score"]), 5)) for r in rows}
    return out


# ---------------------------------------------------------------------------
# wave planning (pure policy math, no Spark)
# ---------------------------------------------------------------------------


def _segs(sizes):
    return [{"segment_id": i, "bytes": b, "docs": 100, "deleted_docs": 0}
            for i, b in enumerate(sizes)]


def test_wave_picks_are_disjoint_and_adjacent():
    pol = TieredMergePolicy(floor_segment_bytes=1 << 30, segs_per_tier=2.0,
                            max_merge_at_once=3)
    segs = _segs([100] * 12)
    picks = find_merge_wave(pol, segs, max_picks=4)
    assert picks, "12 uniform segments over a 2-per-tier bar must merge"
    seen: set[int] = set()
    for run in picks:
        assert run == sorted(run)
        assert run == list(range(run[0], run[-1] + 1)), (
            "each pick must be an adjacent run in original order")
        assert not (set(run) & seen), "picks must be disjoint"
        seen |= set(run)


def test_wave_respects_max_picks():
    pol = TieredMergePolicy(floor_segment_bytes=1 << 30, segs_per_tier=2.0,
                            max_merge_at_once=3)
    segs = _segs([100] * 12)
    assert len(find_merge_wave(pol, segs, max_picks=1)) == 1
    assert len(find_merge_wave(pol, segs, max_picks=2)) <= 2


def test_wave_empty_when_balanced():
    pol = TieredMergePolicy(floor_segment_bytes=1, segs_per_tier=10.0)
    segs = _segs([100, 1000, 10000])
    assert find_merge_wave(pol, segs, max_picks=4) == []


# ---------------------------------------------------------------------------
# concurrent scheduler end-to-end
# ---------------------------------------------------------------------------


def test_concurrent_quiescence_matches_results(spark, corpus, qterms,
                                               tmp_index):
    _build(spark, corpus, tmp_index, n_segments=8)
    before = _results(IndexSearcher(spark, tmp_index), qterms)
    pol = TieredMergePolicy(floor_segment_bytes=1 << 30, segs_per_tier=2.0,
                            max_merge_at_once=3)
    # the first wave over 8 uniform segments must have >1 disjoint pick,
    # otherwise this test isn't exercising concurrency at all
    m0 = load_manifest(tmp_index)
    segs0 = [dict(s) for s in m0["segments"]]
    assert len(find_merge_wave(pol, segs0, max_picks=4)) > 1

    done = maybe_merge(spark, tmp_index, pol, threads=4)
    assert len(done) >= 2
    m = load_manifest(tmp_index)
    assert len(m["segments"]) < 8
    assert m["doc_count"] == len(corpus)
    # every committed merge row is in the final lineage or was itself
    # merged away by a later wave; ids unique
    ids = [s["segment_id"] for s in m["segments"]]
    assert len(ids) == len(set(ids))
    assert _results(IndexSearcher(spark, tmp_index), qterms) == before


def test_concurrent_merge_with_deletes(spark, corpus, qterms, tmp_index):
    """Tombstone consumption must compose across concurrently committed
    merges: deletes stay hidden throughout and are physically squeezed
    wherever a merge covered them."""
    hi, _, _ = qterms
    _build(spark, corpus, tmp_index, n_segments=8)
    s0 = IndexSearcher(spark, tmp_index)
    top = s0.search(TermQuery("text", hi), 6).collect()
    victims = [r["url"] for r in top[:3]]
    n_all = s0.count(MatchAllDocsQuery())
    delete_by_keys(tmp_index, victims)

    pol = TieredMergePolicy(floor_segment_bytes=1 << 30, segs_per_tier=2.0,
                            max_merge_at_once=3)
    done = maybe_merge(spark, tmp_index, pol, threads=4)
    assert len(done) >= 2

    s1 = IndexSearcher(spark, tmp_index)
    assert s1.count(MatchAllDocsQuery()) == n_all - 3
    hits = s1.search(TermQuery("text", hi), 1000).collect()
    assert not {r["url"] for r in hits} & set(victims)
    m = load_manifest(tmp_index)
    # the squeeze counts live on the committed merge rows (later waves
    # re-merge already-squeezed segments with deleted_docs=0)
    squeezed = sum(int(r.get("deleted_docs", 0)) for r in done)
    # at quiescence under a 2-per-tier bar every original segment was
    # covered by some merge, so all 3 tombstones are consumed
    if not has_tombstones(tmp_index):
        assert m["doc_count"] == n_all - 3
        assert squeezed == 3
