"""Corpus determinism + html/text invariant (input_hint) + oracle sanity."""

import hashlib

import numpy as np

from rucene_spark.oracle import OracleSearcher, build_oracle_index
from rucene_spark.query import BooleanQuery, QueryStringQueryBuilder, TermQuery
from rucene_spark.webtext import extract_text, make_corpus, make_query_strings


def corpus_hash(pdf) -> str:
    h = hashlib.sha256()
    for row in pdf.itertuples(index=False):
        h.update(repr(tuple(row)).encode())
    return h.hexdigest()


def test_corpus_deterministic():
    a = make_corpus(200, seed=42)
    b = make_corpus(200, seed=42)
    assert corpus_hash(a) == corpus_hash(b)
    assert a["url"].is_unique


def test_extracted_text_byte_identical():
    # the per-url invariant from BASELINE.json input_hint
    corpus = make_corpus(200, seed=42)
    for html, text in zip(corpus["html"], corpus["text"]):
        assert extract_text(html).encode() == text.encode()


def test_query_set_deterministic_and_parseable():
    corpus = make_corpus(200, seed=42)
    qs = make_query_strings(corpus)
    assert qs == make_query_strings(make_corpus(200, seed=42))
    for q in qs:
        QueryStringQueryBuilder(q, [("text", 1.0)]).build()


def test_oracle_count_and_tf_cap():
    corpus = make_corpus(150, seed=7)
    idx = build_oracle_index(corpus, n_segments=3)
    # every stored tf is capped at 10 (posting_writer.rs:641)
    assert max(p.tf for pl in idx.postings.values() for p in pl.values()) <= 10
    s = OracleSearcher(idx)
    # count of a should-pair == union of posting lists
    t1, t2 = "t000000", "t000001"
    docs1 = set(idx.postings.get(("text", t1), {}))
    docs2 = set(idx.postings.get(("text", t2), {}))
    q = BooleanQuery.build([], [TermQuery("text", t1), TermQuery("text", t2)])
    assert s.count(q) == len(docs1 | docs2)
    # must pair == intersection
    q = BooleanQuery.build([TermQuery("text", t1), TermQuery("text", t2)], [])
    assert s.count(q) == len(docs1 & docs2)
    # must_not
    q = BooleanQuery.build([TermQuery("text", t1)], [], [], [TermQuery("text", t2)])
    assert s.count(q) == len(docs1 - docs2)


def test_oracle_topk_tiebreak_doc_order():
    corpus = make_corpus(150, seed=7)
    idx = build_oracle_index(corpus, n_segments=3)
    s = OracleSearcher(idx)
    hits = s.search(TermQuery("text", "t000000"), 20)
    scores = [float(h[1]) for h in hits]
    assert scores == sorted(scores, reverse=True)
    # within equal scores, (segment, doc) ascending
    for i in range(1, len(hits)):
        if scores[i] == scores[i - 1]:
            assert hits[i][2] > hits[i - 1][2]


def test_oracle_scores_are_float32():
    corpus = make_corpus(100, seed=3)
    idx = build_oracle_index(corpus)
    s = OracleSearcher(idx)
    for _, score, _ in s.search(TermQuery("text", "t000001"), 5):
        assert isinstance(score, np.float32)
