"""FilterQuery (column + pandas-callable predicates) and highlighting."""

import pytest

from rucene_spark.build import IndexWriter
from rucene_spark.highlight import highlight_term
from rucene_spark.query import FilterQuery, TermQuery
from rucene_spark.search import IndexSearcher
from rucene_spark.webtext import make_corpus, term_df_spectrum


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    corpus = make_corpus(400, seed=31)
    d = str(tmp_path_factory.mktemp("fh_idx"))
    docs = spark.createDataFrame(corpus.drop(columns=["html"]))
    IndexWriter(spark, d, n_segments=4).build(docs)
    dfs = term_df_spectrum(corpus)
    hi = next(t for t in dfs.index if t.startswith("t0"))
    return IndexSearcher(spark, d), docs, hi


def test_filter_query_column_predicate(spark, setup):
    from pyspark.sql import functions as F

    s, docs, hi = setup
    base = {r["url"] for r in s.search(TermQuery("text", hi), 1000).collect()}
    q = FilterQuery(TermQuery("text", hi), F.col("lang") == "en")
    got = s.search(q, 1000).collect()
    assert got, "en docs matching the head term must exist"
    assert {r["url"] for r in got} <= base
    assert all(r["lang"] == "en" for r in got)


def test_filter_query_pandas_predicate(spark, setup):
    s, docs, hi = setup
    q = FilterQuery(TermQuery("text", hi),
                    lambda pdf: pdf["doc_len"] % 2 == 0)
    got = s.search(q, 1000).collect()
    assert got
    assert all(r["doc_len"] % 2 == 0 for r in got)
    # scores must equal the unfiltered query's scores for the same docs
    base = {r["url"]: r["score"]
            for r in s.search(TermQuery("text", hi), 1000).collect()}
    for r in got:
        assert r["score"] == base[r["url"]]


def test_highlight_wraps_first_match_window(spark, setup):
    s, docs, hi = setup
    rows = highlight_term(s, docs, hi, k=5, window=2).collect()
    assert len(rows) == 5
    for r in rows:
        snippet = r["snippet"]
        assert f"<b>{hi}</b>" in snippet
        toks = snippet.split(" ")
        assert len(toks) <= 5  # window 2 + match + window 2
        # the wrapped token is the first occurrence in the source doc
        src = next(d["text"] for d in docs.collect() if d["url"] == r["url"])
        src_toks = src.split(" ")
        i = src_toks.index(hi)
        lo = max(0, i - 2)
        expect = [f"<b>{t}</b>" if t == hi else t
                  for t in src_toks[lo:i + 3]]
        assert toks == expect


def test_highlight_query_multi_term_best_window(spark, setup):
    """Multi-term highlighting picks the window with the MOST query-term
    occurrences and wraps every matched token (FVH fragment semantics)."""
    from rucene_spark.highlight import highlight_query
    from rucene_spark.query import BooleanQuery

    s, docs, hi = setup
    # second term from the same corpus
    from rucene_spark.webtext import term_df_spectrum
    import pandas as pd
    corpus = docs.toPandas()
    dfs = term_df_spectrum(corpus)
    plain = [t for t in dfs.index if t.startswith("t0")]
    mid = plain[len(plain) // 3]
    q = BooleanQuery.build([], [__import__("rucene_spark.query",
                                           fromlist=["TermQuery"])
                               .TermQuery("text", hi),
                               __import__("rucene_spark.query",
                                          fromlist=["TermQuery"])
                               .TermQuery("text", mid)], [], [])
    w = 7
    rows = highlight_query(s, docs, q, k=10, window_tokens=w).collect()
    assert rows
    text_of = {r["url"]: r["text"] for r in docs.collect()}
    for r in rows:
        snippet = r["snippet"]
        toks = snippet.split(" ")
        assert len(toks) <= w
        # every hi/mid token in the window is wrapped; others untouched
        assert (f"<b>{hi}</b>" in snippet) or (f"<b>{mid}</b>" in snippet)
        assert f" {hi} " not in f" {snippet} "
        assert f" {mid} " not in f" {snippet} "
        # replay the window rule in python: the chosen window's match
        # count equals the max over all windows
        src = text_of[r["url"]].split(" ")
        tset = {hi, mid}
        nstarts = max(len(src) - w + 1, 1)
        scores = [sum(1 for t in src[s0:s0 + w] if t in tset)
                  for s0 in range(nstarts)]
        got_count = sum(1 for t in toks if t.startswith("<b>"))
        assert got_count == max(scores)


def test_highlight_phrase_unit_wrap(spark):
    """Phrase highlighting wraps the whole occurrence as ONE tag pair and
    windows around the phrase start, even when the individual terms also
    appear scattered elsewhere (FVH FieldPhraseList: phrase = one unit)."""
    from rucene_spark.highlight import highlight_phrase

    rows = [
        # 'red fox' scattered-first: red@0 ... fox@3, phrase at 5-6
        (0, "red dog and fox then red fox runs far away tonight"),
        # phrase at position 0 (window clamps at the left edge)
        (1, "red fox starts the line and more words follow here"),
        (2, "no phrase here just red things and a fox alone"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    import tempfile
    d = tempfile.mkdtemp(prefix="hlph_idx_")
    IndexWriter(spark, d, n_segments=2, key_col="doc_id",
                partitioner="range").build(docs)
    s = IndexSearcher(spark, d)
    out = {r["doc_id"]: r["snippet"]
           for r in highlight_phrase(s, docs, ["red", "fox"],
                                     k=10, window=2).collect()}
    assert set(out) == {0, 1}                     # doc 2 has no phrase
    # doc 0: first PHRASE occurrence is at tokens 5-6, not the scattered
    # red@0/fox@3; window=2 → tokens 3..8, one tag pair around 'red fox'
    assert out[0] == "fox then <b>red fox</b> runs far"
    # doc 1: phrase at 0, left window clamped
    assert out[1] == "<b>red fox</b> starts the"
