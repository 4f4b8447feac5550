"""Random-query-tree fuzz over the ROUND-4 physical layouts.

The engine-parity fuzz (test_engine_parity.py) covers the fresh-build
layout only. These tests push the same seeded random trees through the
layouts a long-lived index actually serves from:

1. tombstoned (deletes pending, live-docs anti-join active) — the two
   engine routes (per-segment collector kernel vs JVM frame path) must be
   bit-identical to each other; the oracle cannot be consulted here
   because Lucene semantics keep deleted docs in df/ttf until merge.
2. sharded-merged (deletes folded by a multi-file doc-range-sharded
   SegmentMerger.merge) — both engine routes must be rank- AND
   float32-score-bit-identical to a fresh oracle over the surviving
   corpus: a full merge re-aggregates stats, so the merged index is
   semantically a fresh build (segment_merger.rs doc-id squeeze), and the
   sequential remap preserves (seg, key-sorted local) order, so doc-asc
   tie-breaks line up with the oracle's (seg, local) order.
"""

import numpy as np
import pytest
from conftest import corpus_query_material, random_query_tree

from rucene_spark.build import IndexWriter, load_manifest
from rucene_spark.merge import SegmentMerger, delete_by_keys
from rucene_spark.oracle import OracleSearcher, build_oracle_index
from rucene_spark.search import IndexSearcher
from rucene_spark.webtext import make_corpus

N_DOCS = 420
N_SEG = 6
N_TREES = 35
SEED = 20260819


@pytest.fixture(scope="module")
def corpus():
    return make_corpus(N_DOCS, seed=7)


@pytest.fixture(scope="module")
def victims(corpus):
    # spread deletions across hash segments: every 9th doc
    return corpus["url"].iloc[::9].tolist()


def _build(spark, corpus, d):
    df = spark.createDataFrame(corpus.drop(columns=["html"]))
    IndexWriter(spark, d, n_segments=N_SEG, key_col="url").build(df)
    return d


@pytest.fixture(scope="module")
def tombstoned(spark, corpus, victims, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fuzz_tomb"))
    _build(spark, corpus, d)
    delete_by_keys(d, victims)
    return d


@pytest.fixture(scope="module")
def merged(spark, corpus, victims, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fuzz_merged"))
    _build(spark, corpus, d)
    delete_by_keys(d, victims)
    row = SegmentMerger(spark, d, shard_bytes=1, max_shards=4).merge(
        list(range(N_SEG)))
    assert row["doc_sharded"] is True
    assert len(load_manifest(d)["segments"]) == 1
    return d


@pytest.fixture(scope="module")
def merged_oracle(corpus, victims):
    survivors = corpus[~corpus["url"].isin(set(victims))].reset_index(
        drop=True)
    idx = build_oracle_index(survivors, n_segments=N_SEG)
    return OracleSearcher(idx)


def _hits(searcher, q, k=10):
    rows = searcher.search(q, k).collect()
    return [(r["url"], np.float32(r["score"]).view(np.int32).item())
            for r in rows]


def _trees(corpus):
    vocab, bigrams = corpus_query_material(corpus)
    rng = np.random.default_rng(SEED)
    return [random_query_tree(rng, vocab, bigrams) for _ in range(N_TREES)]


def _route(spark, d, monkeypatch, collector: bool):
    monkeypatch.setenv("RUCENE_COLLECTOR_MIN_DOCS",
                       "0" if collector else str(10**9))
    return IndexSearcher(spark, d)


def test_tombstoned_routes_bit_identical(spark, corpus, tombstoned,
                                         monkeypatch):
    """Collector kernel vs frame path on a live-docs-filtered index:
    same urls, same float32 score bits, same order, tree by tree."""
    trees = _trees(corpus)
    col = _route(spark, tombstoned, monkeypatch, collector=True)
    col_hits = [_hits(col, q) for q in trees]
    frame = _route(spark, tombstoned, monkeypatch, collector=False)
    failures = []
    for i, q in enumerate(trees):
        got = _hits(frame, q)
        if got != col_hits[i]:
            failures.append(f"fuzz#{i}: collector={col_hits[i][:3]} "
                            f"frame={got[:3]} :: {q!r}"[:400])
    assert not failures, "\n".join(failures)


def test_merged_search_many_matches_per_query(spark, corpus, merged):
    """The micro-batch serving executor over the sharded merged layout:
    one job for the whole fuzz batch, rank/score-identical per qid to
    per-query search() (which the oracle test below pins)."""
    trees = _trees(corpus)
    s = IndexSearcher(spark, merged)
    batch = s.search_many(trees, 10).collect()
    by_qid = {}
    for r in batch:
        by_qid.setdefault(r["qid"], []).append(
            (r["url"], round(float(r["score"]), 6)))
    for i, q in enumerate(trees):
        want = [(r["url"], round(float(r["score"]), 6))
                for r in s.search(q, 10).collect()]
        assert by_qid.get(i, []) == want, f"qid {i}: {q!r}"


@pytest.mark.parametrize("collector", [True, False],
                         ids=["collector", "frame"])
def test_merged_sharded_matches_oracle(spark, corpus, merged, merged_oracle,
                                       monkeypatch, collector):
    """Both routes over the multi-file sharded merged segment must be
    rank- and score-bit-identical to a fresh oracle on the survivors."""
    trees = _trees(corpus)
    s = _route(spark, merged, monkeypatch, collector=collector)
    failures = []
    for i, q in enumerate(trees):
        eng = _hits(s, q)
        orc = [(u, np.float32(sc).view(np.int32).item())
               for (u, sc, _) in merged_oracle.search(q, 10)]
        if eng != orc:
            failures.append(
                f"fuzz#{i}: engine={eng[:3]} oracle={orc[:3]} :: {q!r}"[:400])
    assert not failures, "\n".join(failures)
