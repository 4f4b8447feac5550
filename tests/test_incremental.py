"""Incremental (delta-segment) index appends and score explanations."""

import numpy as np
import pytest

from rucene_spark.build import IndexWriter, load_manifest
from rucene_spark.query import BooleanQuery, TermQuery
from rucene_spark.search import IndexSearcher
from rucene_spark.webtext import make_corpus, term_df_spectrum


@pytest.fixture(scope="module")
def corpus():
    return make_corpus(600, seed=21)


@pytest.fixture(scope="module")
def hi_mid(corpus):
    dfs = term_df_spectrum(corpus)
    plain = [t for t in dfs.index if t.startswith("t0")]
    return plain[0], plain[len(plain) // 3]


def test_add_documents_equals_fresh_build(spark, corpus, hi_mid, tmp_index):
    hi, mid = hi_mid
    a = corpus.iloc[:400].reset_index(drop=True)
    b = corpus.iloc[400:].reset_index(drop=True)

    w = IndexWriter(spark, tmp_index, n_segments=4)
    w.build(spark.createDataFrame(a[["url", "text", "lang"]]))
    m = w.add_documents(spark.createDataFrame(b[["url", "text", "lang"]]),
                        n_segments=2)
    assert m["doc_count"] == 600
    assert [s["status"] for s in m["segments"]].count("delta") == 2
    # delta segments sort after the originals → stable global doc order
    assert [s["segment_id"] for s in m["segments"]] == [0, 1, 2, 3, 4, 5]

    import tempfile, shutil
    fresh = tempfile.mkdtemp(prefix="rucene_fresh_inc_")
    try:
        IndexWriter(spark, fresh, n_segments=4).build(
            spark.createDataFrame(corpus[["url", "text", "lang"]]))
        s_inc = IndexSearcher(spark, tmp_index)
        s_fr = IndexSearcher(spark, fresh)
        assert s_inc.doc_count == s_fr.doc_count
        assert s_inc.sum_ttf == s_fr.sum_ttf
        for q in (TermQuery("text", hi),
                  BooleanQuery.build([], [TermQuery("text", hi),
                                          TermQuery("text", mid)], [], [])):
            ri = {(r["url"], np.float32(r["score"]).view(np.int32).item())
                  for r in s_inc.search(q, 1000).collect()}
            rf = {(r["url"], np.float32(r["score"]).view(np.int32).item())
                  for r in s_fr.search(q, 1000).collect()}
            assert ri == rf
    finally:
        shutil.rmtree(fresh, ignore_errors=True)


def test_explain_matches_search_score(spark, corpus, hi_mid, tmp_index):
    hi, mid = hi_mid
    IndexWriter(spark, tmp_index, n_segments=4).build(
        spark.createDataFrame(corpus[["url", "text", "lang"]]))
    s = IndexSearcher(spark, tmp_index)

    top = s.search(TermQuery("text", hi), 3).collect()
    for r in top:
        e = s.explain(TermQuery("text", hi), r["seg"], r["doc"])
        assert e["match"]
        assert np.float32(e["value"]).view(np.int32) == \
            np.float32(r["score"]).view(np.int32)
        descs = [d["description"] for d in e["details"]]
        assert any(d.startswith("idf") for d in descs)
        assert any(d.startswith("tfNorm") for d in descs)

    q = BooleanQuery.build([], [TermQuery("text", hi), TermQuery("text", mid)],
                           [], [])
    top = s.search(q, 3).collect()
    for r in top:
        e = s.explain(q, r["seg"], r["doc"])
        assert e["match"]
        assert abs(e["value"] - float(r["score"])) < 1e-5

    miss = s.explain(TermQuery("text", "tzzzzzz"), 0, 0)
    assert not miss["match"] and miss["value"] == 0.0


def test_explain_boolean_non_match_cases(spark, corpus, hi_mid, tmp_index):
    """BooleanWeight.explain must report match=False when a required clause
    fails, a prohibited clause matches, or min_should_match is unmet —
    search() and explain() must agree doc-by-doc (ADVICE r1)."""
    hi, mid = hi_mid
    IndexWriter(spark, tmp_index, n_segments=4).build(
        spark.createDataFrame(corpus[["url", "text", "lang"]]))
    s = IndexSearcher(spark, tmp_index)

    # a doc matching hi but NOT mid
    q_not = BooleanQuery.build([TermQuery("text", hi)], [], [],
                               [TermQuery("text", mid)])
    only_hi = s.search(q_not, 1).collect()
    if only_hi:
        r = only_hi[0]
        # must with a failing second must → non-match
        e = s.explain(BooleanQuery(
            musts=[TermQuery("text", hi), TermQuery("text", mid)]),
            r["seg"], r["doc"])
        assert not e["match"] and e["value"] == 0.0
        assert "required" in e["description"]
        # msm=2 with only one matching should → non-match
        e = s.explain(BooleanQuery(
            shoulds=[TermQuery("text", hi), TermQuery("text", mid)],
            min_should_match=2), r["seg"], r["doc"])
        assert not e["match"]

    # a doc matching BOTH → must_not(mid) makes it a non-match
    q_both = BooleanQuery.build(
        [TermQuery("text", hi), TermQuery("text", mid)], [], [], [])
    both = s.search(q_both, 1).collect()
    if both:
        r = both[0]
        e = s.explain(BooleanQuery(
            musts=[TermQuery("text", hi)],
            must_nots=[TermQuery("text", mid)]), r["seg"], r["doc"])
        assert not e["match"]
        assert "prohibited" in e["description"]
        # filter clause that fails → non-match
        from rucene_spark.query import RangeQuery
        e = s.explain(BooleanQuery(
            musts=[TermQuery("text", hi)],
            filters=[RangeQuery("lang", "zz", "zz")]), r["seg"], r["doc"])
        assert not e["match"]


def test_update_documents_replaces_by_key(spark, corpus, hi_mid, tmp_index):
    """IndexWriter::update_document analogue: delete-then-add by key in
    one call; the replacement is visible, the old copy is not, and a
    merge folds the old copy physically."""
    from rucene_spark.merge import force_merge
    from rucene_spark.query import MatchAllDocsQuery
    import pandas as pd

    hi, _ = hi_mid
    w = IndexWriter(spark, tmp_index, n_segments=4)
    w.build(spark.createDataFrame(corpus[["url", "text", "lang"]]))
    victim = corpus["url"].iloc[3]

    upd = pd.DataFrame({"url": [victim], "text": ["zupdated only text"],
                        "lang": ["de"]})
    w.update_documents(spark.createDataFrame(upd), n_segments=1)

    s = IndexSearcher(spark, tmp_index)
    assert s.count(MatchAllDocsQuery()) == len(corpus)
    hits = s.search(TermQuery("text", "zupdated"), 5).collect()
    assert [r["url"] for r in hits] == [victim]
    assert hits[0]["lang"] == "de"

    force_merge(spark, tmp_index)
    s2 = IndexSearcher(spark, tmp_index)
    assert s2.count(MatchAllDocsQuery()) == len(corpus)
    assert [r["url"] for r in s2.search(TermQuery("text", "zupdated"), 5)
            .collect()] == [victim]


def test_doc_values_update_in_place(spark, tmp_path_factory):
    """update_doc_values overlays a numeric column without reindexing:
    sorted search sees the new values, scoring stats stay untouched, and
    the latest update per key wins (index_writer.rs
    update_numeric_doc_value semantics via a .dvu-style overlay)."""
    from rucene_spark.build import IndexWriter
    from rucene_spark.merge import update_doc_values
    from rucene_spark.query import TermQuery
    from rucene_spark.search import IndexSearcher

    rows = [(i, f"common t{i:03d}", 100 + i) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string, rank long")
    d = str(tmp_path_factory.mktemp("dvu_idx"))
    IndexWriter(spark, d, n_segments=2, key_col="doc_id",
                partitioner="range").build(df)

    s0 = IndexSearcher(spark, d)
    base = [r["doc_id"] for r in
            s0.search_sorted(TermQuery("text", "common"),
                             [__import__("pyspark.sql.functions",
                                         fromlist=["desc"]).desc("rank")],
                             6).collect()]
    assert base == [5, 4, 3, 2, 1, 0]
    base_scores = {r["doc_id"]: r["score"]
                   for r in s0.search(TermQuery("text", "common"), 6).collect()}

    update_doc_values(d, "rank", {0: 999.0, 5: 1.0})
    update_doc_values(d, "rank", {5: 500.0})   # latest wins for key 5

    s1 = IndexSearcher(spark, d)
    from pyspark.sql import functions as F
    got = [(r["doc_id"], r["rank"]) for r in
           s1.search_sorted(TermQuery("text", "common"),
                            [F.desc("rank")], 6).collect()]
    assert got == [(0, 999), (5, 500), (4, 104), (3, 103), (2, 102), (1, 101)]
    # scoring is untouched by DV updates
    new_scores = {r["doc_id"]: r["score"]
                  for r in s1.search(TermQuery("text", "common"), 6).collect()}
    assert new_scores == base_scores


def test_doc_values_update_is_gen_scoped(spark, tmp_path_factory):
    """A DV update only applies to segments committed at or before it
    (bufferd_updates.rs del_gen scoping): a doc re-added with the same key
    AFTER the update must NOT inherit the stale overlay value, while docs
    from older segments still see it. A merge folds the applicable overlay
    physically into the merged docmeta, so the values survive the merged
    segment's higher generation."""
    from pyspark.sql import functions as F

    from rucene_spark.build import IndexWriter
    from rucene_spark.merge import force_merge, update_doc_values
    from rucene_spark.query import TermQuery
    from rucene_spark.search import IndexSearcher

    rows = [(i, f"common t{i:03d}", 100 + i) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string, rank long")
    d = str(tmp_path_factory.mktemp("dvu_gen_idx"))
    w = IndexWriter(spark, d, n_segments=2, key_col="doc_id",
                    partitioner="range")
    w.build(df)

    update_doc_values(d, "rank", {0: 999.0, 3: 888.0})
    # delete-then-readd key 3 with a NEW stored rank: the re-added doc
    # lives in a higher-gen delta segment the update cannot touch
    w.update_documents(spark.createDataFrame(
        [(3, "common zrefreshed", 42)],
        "doc_id long, text string, rank long"))

    def ranks(searcher):
        return {r["doc_id"]: r["rank"] for r in
                searcher.search_sorted(TermQuery("text", "common"),
                                       [F.desc("rank")], 10).collect()}

    got = ranks(IndexSearcher(spark, d))
    assert got[0] == 999       # old segment: overlay applies
    assert got[3] == 42        # re-added doc: stale overlay must NOT apply
    assert got[5] == 105

    # merge folds the overlay physically; values unchanged afterwards
    force_merge(spark, d)
    got2 = ranks(IndexSearcher(spark, d))
    assert got2 == got


def test_search_with_timeout(spark, tmp_path_factory):
    """Generous deadline returns exactly search()'s rows; an impossible
    deadline raises TimeoutError (TimeoutCollector analogue via job-group
    cancellation)."""
    import pytest as _pytest

    from rucene_spark.build import IndexWriter
    from rucene_spark.query import TermQuery
    from rucene_spark.search import IndexSearcher

    rows = [(i, f"shared t{i:03d}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path_factory.mktemp("to_idx"))
    IndexWriter(spark, d, n_segments=2, key_col="doc_id",
                partitioner="range").build(df)
    s = IndexSearcher(spark, d)
    q = TermQuery("text", "shared")
    normal = [(r["doc_id"], r["score"]) for r in s.search(q, 5).collect()]
    timed = [(r["doc_id"], r["score"]) for r in
             s.search_with_timeout(q, 5, timeout_s=120.0)]
    assert timed == normal
    with _pytest.raises(TimeoutError):
        s.search_with_timeout(q, 5, timeout_s=0.0001)


def test_explain_phrase_span_dismax_bit_parity(spark, corpus, hi_mid,
                                               tmp_index):
    """explain() for phrase/span/dismax must reproduce the search-path
    score bit-for-bit (bm25_similarity.rs:265-361 / dis_max.rs explain)."""
    from rucene_spark.query import (
        DisjunctionMaxQuery,
        PhraseQuery,
        SpanNearQuery,
        SpanTermQuery,
    )

    hi, mid = hi_mid
    IndexWriter(spark, tmp_index, n_segments=4).build(
        spark.createDataFrame(corpus[["url", "text", "lang"]]))
    s = IndexSearcher(spark, tmp_index)

    toks = corpus["text"].iloc[0].split()
    w1, w2 = toks[0], toks[1]

    cases = [
        PhraseQuery.build("text", [w1, w2]),
        PhraseQuery.build("text", [w1, w2], slop=2),
        SpanNearQuery([SpanTermQuery("text", w1),
                       SpanTermQuery("text", w2)], slop=1, in_order=True),
        DisjunctionMaxQuery([TermQuery("text", hi), TermQuery("text", mid)],
                            tie_breaker=0.0),
        DisjunctionMaxQuery([TermQuery("text", hi), TermQuery("text", mid)],
                            tie_breaker=0.3),
    ]
    checked = 0
    for q in cases:
        hits = s.search(q, 3).collect()
        assert hits, q
        for r in hits:
            e = s.explain(q, r["seg"], r["doc"])
            assert e["match"], (q, r)
            assert np.float32(e["value"]).view(np.int32) == \
                np.float32(r["score"]).view(np.int32), (q, e, r)
            assert e["details"], q
            checked += 1
    assert checked >= 8

    # non-match reporting
    e = s.explain(PhraseQuery.build("text", [w2, w1]), 0, 0)
    assert not e["match"] and e["value"] == 0.0


def test_dv_overlay_broadcast_capped(spark, tmp_path_factory, monkeypatch):
    """Above DV_BROADCAST_CAP the overlay joins by shuffle, not broadcast
    (round-3 VERDICT #3): a bulk update touching 10^8 keys must not
    flood every executor. Values stay identical either way."""
    import rucene_spark.merge as merge_mod
    from rucene_spark.build import IndexWriter
    from rucene_spark.merge import update_doc_values
    from rucene_spark.query import TermQuery
    from rucene_spark.search import IndexSearcher
    from pyspark.sql import functions as F

    rows = [(i, f"common t{i:03d}", 100 + i) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string, rank long")
    d = str(tmp_path_factory.mktemp("dvu_cap_idx"))
    IndexWriter(spark, d, n_segments=2, key_col="doc_id",
                partitioner="range").build(df)
    update_doc_values(d, "rank", {0: 999.0, 5: 1.0})

    def plan_of(searcher):
        return searcher._docmeta._jdf.queryExecution().executedPlan().toString()

    # disable Catalyst's size-based auto-broadcast so the presence or
    # absence of OUR broadcast hint is what decides the join strategy
    # (at real scale the auto threshold never fires for a 10^8-row
    # overlay anyway — the hint forcing it is exactly the bug)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # small overlay -> hinted broadcast join even with auto off
        assert "BroadcastHashJoin" in plan_of(IndexSearcher(spark, d))
        # cap below the overlay size -> no hint -> shuffle join
        monkeypatch.setattr(merge_mod, "DV_BROADCAST_CAP", 1)
        s = IndexSearcher(spark, d)
        assert "BroadcastHashJoin" not in plan_of(s)
        got = [(r["doc_id"], r["rank"]) for r in
               s.search_sorted(TermQuery("text", "common"),
                               [F.desc("rank")], 6).collect()]
        assert got == [(0, 999), (4, 104), (3, 103), (2, 102), (1, 101),
                       (5, 1)]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
