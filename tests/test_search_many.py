"""Micro-batch serving: search_many must be rank- and score-identical
to per-query search() for every query in the batch (one distributed job
replaces N dispatches; semantics unchanged)."""

import pytest

from rucene_spark.build import IndexWriter
from rucene_spark.query import (
    BooleanQuery,
    DisjunctionMaxQuery,
    PhraseQuery,
    QueryStringQueryBuilder,
    TermQuery,
)
from rucene_spark.search import IndexSearcher


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d = str(tmp_path_factory.mktemp("many_idx"))
    IndexWriter(spark, d, n_segments=4, key_col="doc_id",
                partitioner="range").build(docs)
    return d


def _rows(df):
    return [(r["doc_id"], round(r["score"], 6)) for r in df.collect()]


def test_search_many_matches_per_query(spark, idx):
    s = IndexSearcher(spark, idx)
    queries = [
        TermQuery("text", "table"),
        QueryStringQueryBuilder("table +query", [("text", 1.0)]).build(),
        BooleanQuery.build(
            [TermQuery("text", "scan")], [TermQuery("text", "table")], [], []),
        DisjunctionMaxQuery([TermQuery("text", "table"),
                             TermQuery("text", "query")], 0.3),
        PhraseQuery.build("text", ["key", "agg"], slop=0),
        BooleanQuery.build(
            [], [TermQuery("text", "table"), TermQuery("text", "query"),
                 TermQuery("text", "scan")], [], [], min_should_match=2),
        BooleanQuery.build(
            [TermQuery("text", "table")], [], [],
            [TermQuery("text", "query")]),
        BooleanQuery.build(
            [], [TermQuery("text", "table", boost=2.5),
                 TermQuery("text", "scan", boost=0.5)], [], []),
        BooleanQuery.build(
            [TermQuery("text", "table")], [], [TermQuery("text", "query")],
            []),
        TermQuery("text", "tzzzzzz"),  # absent term: zero rows for qid
        # nested one-level groups (batched via virtual root clauses)
        QueryStringQueryBuilder("table +(query scan)",
                                [("text", 1.0)]).build(),
        QueryStringQueryBuilder("(table query) +(scan key)",
                                [("text", 1.0)]).build(),
        QueryStringQueryBuilder("+table (query scan^2)",
                                [("text", 1.0)]).build(),
        BooleanQuery.build(
            [], [TermQuery("text", "table")], [],
            [BooleanQuery.build([], [TermQuery("text", "query"),
                                     TermQuery("text", "scan")], [], [],
                                min_should_match=2)]),
    ]
    batch = s.search_many(queries, 10).collect()
    by_qid = {}
    for r in batch:
        by_qid.setdefault(r["qid"], []).append(
            (r["doc_id"], round(r["score"], 6)))
    for i, q in enumerate(queries):
        assert by_qid.get(i, []) == _rows(s.search(q, 10)), f"qid {i}"


def test_search_many_plan_cached(spark, idx):
    s = IndexSearcher(spark, idx)
    queries = [TermQuery("text", "table"), TermQuery("text", "query")]
    df1 = s.search_many(queries, 5)
    df2 = s.search_many(queries, 5)
    assert df1 is df2  # same planned DataFrame object on the second call
    assert df1.count() == 10


def test_search_many_with_deletes(spark, idx, tmp_path):
    """Collector kernel must mask tombstones in-worker BEFORE per-segment
    ranks are assigned — a deleted doc may not occupy a top-k slot (same
    semantics as the per-query _live anti-join)."""
    import shutil

    from rucene_spark.merge import delete_by_keys

    d = str(tmp_path / "del_idx")
    shutil.copytree(idx, d)
    s0 = IndexSearcher(spark, d)
    # delete the current top-2 docs for "table" so ranks must shift
    top = s0.search(TermQuery("text", "table"), 2).collect()
    delete_by_keys(d, [r["doc_id"] for r in top])
    s = IndexSearcher(spark, d)
    queries = [
        TermQuery("text", "table"),
        BooleanQuery.build(
            [], [TermQuery("text", "table"), TermQuery("text", "query")],
            [], [], min_should_match=1),
    ]
    batch = s.search_many(queries, 10).collect()
    by_qid = {}
    for r in batch:
        by_qid.setdefault(r["qid"], []).append(
            (r["doc_id"], round(r["score"], 6)))
    deleted = {r["doc_id"] for r in top}
    for i, q in enumerate(queries):
        assert by_qid.get(i, []) == _rows(s.search(q, 10)), f"qid {i}"
        assert not deleted & {d_ for d_, _ in by_qid.get(i, [])}
