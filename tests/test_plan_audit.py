"""Physical-plan audits: the properties that make the engine viable at
100 TB must be visible in the plans Catalyst actually produces.

* postings scans push the term predicate into the Parquet reader
  (the blocktree-seek analogue — row-group pruning on the sorted term
  column does the seeking);
* scans prune columns (a top-k search must not read position bytes);
* the final hit join broadcasts the tiny top-k side;
* block-max pass-2 pushes the metadata block filter into the scan.
"""

import pytest

from pyspark.sql import functions as F

from rucene_spark.build import IndexWriter
from rucene_spark.query import QueryStringQueryBuilder, TermQuery
from rucene_spark.search import IndexSearcher
from rucene_spark.webtext import make_corpus


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    corpus = make_corpus(300, seed=13)
    d = str(tmp_path_factory.mktemp("audit_idx"))
    IndexWriter(spark, d, n_segments=2).build(
        spark.createDataFrame(corpus.drop(columns=["html"])))
    return IndexSearcher(spark, d)


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().toString()


def test_term_scan_pushes_predicate_and_prunes_columns(searcher):
    frame = searcher._frame(TermQuery("text", "t000000"),
                            __import__("numpy").float32(1.0), True)
    plan = _optimized(frame)
    assert "PushedFilters" in plan
    assert "EqualTo(term,t000000)" in plan.replace(" ", "")
    # column pruning: a scoring scan must not read the position bytes
    import re
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and "pos_bin" not in m.group(1), m.group(0)


def test_multi_term_scan_pushes_in_filter(searcher):
    q = QueryStringQueryBuilder("t000000 t000001", [("text", 1.0)]).build()
    frame = searcher._frame(q, __import__("numpy").float32(1.0), True)
    plan = _optimized(frame)
    assert "PushedFilters" in plan and "In(term" in plan


def test_topk_join_is_broadcast(searcher):
    out = searcher.search(TermQuery("text", "t000000"), 10)
    plan = _physical_plan(out)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_blockmax_pass2_filter_reaches_scan(searcher):
    ctr: dict = {}
    out = searcher.search_blockmax(["t000000", "t000001"], 5,
                                   prune_counter=ctr)
    out.collect()
    # the metadata-only bound uses stored per-block columns; the term IN
    # filter must still be pushed on the essential scan
    assert ctr["total_blocks"] >= ctr["kept_blocks"]


def test_tokenizer_stage_is_single_shuffle(spark, tmp_path_factory):
    """The build dataflow has exactly ONE wide exchange (by segment_id)."""
    corpus = make_corpus(200, seed=17)
    df = spark.createDataFrame(corpus.drop(columns=["html"]))
    from rucene_spark.build import IndexWriter as IW
    w = IW(spark, str(tmp_path_factory.mktemp("one_shuffle")), n_segments=2)
    src = w._with_segment_id(df.select("url", "text"))
    plan = src.groupBy("segment_id").count()._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("Exchange") <= 2  # groupBy partial+final only


def test_ivf_assign_is_shuffle_free(spark):
    """IVF cell assignment must be a single scan projection — the K
    centroids are inlined literals, so no join and no exchange (at 100 TB
    a K×N shuffle of cross-joined rows would dominate the job)."""
    import numpy as np
    from rucene_spark.ann import ivf_assign
    rng = np.random.default_rng(9)
    rows = [(i, [float(x) for x in rng.normal(size=64)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    plan = _physical_plan(ivf_assign(df))
    core = plan.split("Sort")[-1]  # below the presentation orderBy
    assert "Join" not in core
    assert "Exchange hashpartitioning" not in core


def test_events_rollup_single_exchange(spark):
    """The tumbling-window rollup is one partial-aggregated shuffle."""
    import datetime
    from rucene_spark.events import window_rollup
    rows = [(i, datetime.datetime(2024, 1, 1, i % 24, 0, 0), i % 5,
             "click", 1.0, "{}") for i in range(100)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long,"
              " event_type string, value double, props string")
    plan = _physical_plan(window_rollup(df))
    assert plan.count("Exchange hashpartitioning") == 1
