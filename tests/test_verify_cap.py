"""Candidate cap on the per-doc Python verify paths (round-3 VERDICT #1).

Sloppy phrases with 3+ positions or repeated terms and span trees verify
candidates doc-by-doc in Python; the searcher bounds that set with the
metadata upper bound (min required-clause df) against
``verify_candidate_cap`` and rejects with guidance instead of running a
corpus-sized Python loop. Two-distinct-term sloppy phrases are exempt —
their walk is batch-vectorized.
"""

import shutil
import tempfile

import pytest

from rucene_spark.build import IndexWriter
from rucene_spark.query import (
    PhraseQuery,
    SpanNearQuery,
    SpanTermQuery,
    TermQuery,
)
from rucene_spark.search import IndexSearcher
from rucene_spark.webtext import make_corpus, term_df_spectrum


@pytest.fixture(scope="module")
def idx(spark):
    d = tempfile.mkdtemp(prefix="rucene_cap_idx_")
    IndexWriter(spark, d, n_segments=3).build(
        spark.createDataFrame(make_corpus(300, seed=11)))
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def probe(idx):
    dfs = term_df_spectrum(make_corpus(300, seed=11))
    terms = [t for t in dfs.index if dfs[t] >= 30]
    return terms[0], terms[1], terms[2]


def test_multi_term_sloppy_capped(spark, idx, probe):
    a, b, c = probe
    s = IndexSearcher(spark, idx, verify_candidate_cap=5)
    with pytest.raises(ValueError, match="verify_candidate_cap"):
        s.search(PhraseQuery.build("text", [a, b, c], slop=2), 10)


def test_span_capped(spark, idx, probe):
    a, b, _ = probe
    s = IndexSearcher(spark, idx, verify_candidate_cap=5)
    q = SpanNearQuery([SpanTermQuery("text", a), SpanTermQuery("text", b)],
                      slop=3, in_order=False)
    with pytest.raises(ValueError, match="verify_candidate_cap"):
        s.search(q, 10)


def test_two_term_sloppy_exempt_and_exact_path_exempt(spark, idx, probe):
    a, b, c = probe
    s = IndexSearcher(spark, idx, verify_candidate_cap=5)
    # vectorized 2-term sloppy runs regardless of df
    assert s.search(PhraseQuery.build("text", [a, b], slop=2), 10).count() >= 0
    # exact phrases are fully JVM-side — never capped
    assert s.search(PhraseQuery.build("text", [a, b, c], slop=0), 10).count() >= 0
    # term queries untouched
    assert s.search(TermQuery("text", a), 10).count() == 10


def test_cap_default_allows_normal_queries(spark, idx, probe):
    a, b, c = probe
    s = IndexSearcher(spark, idx)
    assert s.search(PhraseQuery.build("text", [a, b, c], slop=2), 10).count() >= 0
