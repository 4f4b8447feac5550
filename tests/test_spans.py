"""Span queries: kernel semantics vs the reference's documented behavior
(span_near.rs) and engine↔oracle float32 bit parity on the webtext corpus."""

import numpy as np
import pytest

from rucene_spark.build import IndexWriter
from rucene_spark.oracle import OracleSearcher, build_oracle_index
from rucene_spark.query import (
    SpanGapQuery,
    SpanNearQuery,
    SpanOrQuery,
    SpanTermQuery,
)
from rucene_spark.search import IndexSearcher
from rucene_spark.spans import (
    ordered_near_spans,
    span_freq,
    term_spans,
    unordered_near_spans,
)
from rucene_spark.webtext import make_corpus, term_df_spectrum


# ---------------------------------------------------------------------------
# kernel semantics
# ---------------------------------------------------------------------------


def test_ordered_overlap_example_from_reference():
    """span_near.rs:714-722: querying (t1 t2 t3) with slop >= 1 over
    't1 t2 t1 t3 t2 t3' matches twice."""
    c1 = term_spans([0, 2])
    c2 = term_spans([1, 4])
    c3 = term_spans([3, 5])
    out = ordered_near_spans([c1, c2, c3], slop=1)
    assert out == [(0, 4, 1), (2, 6, 1)]
    assert ordered_near_spans([term_spans([0, 2]), term_spans([1, 4]),
                               term_spans([3, 5])], slop=0) == []


def test_ordered_requires_order():
    # "b a": ordered (a, b) cannot match; unordered can
    a, b = term_spans([1]), term_spans([0])
    assert ordered_near_spans([a, b], slop=10) == []
    out = unordered_near_spans([a, b], slop=0)
    assert len(out) == 1
    s, e, w = out[0]
    assert (s, e) == (0, 2)


def test_unordered_slop_math():
    # doc: a . . b  → max_end(4) - min_start(0) - lengths(2) = 2
    a, b = term_spans([0]), term_spans([3])
    assert unordered_near_spans([a, b], slop=1) == []
    out = unordered_near_spans([a, b], slop=2)
    assert out == [(0, 4, 3)]  # width = start(max_end_cell) - min_start


def test_gap_consumes_positions():
    # near(a, gap(1), b) slop 0 over "a x b"
    a, b = term_spans([0]), term_spans([2])
    out = ordered_near_spans([a, ("gap", 1), b], slop=0)
    assert out == [(0, 3, 0)]
    # without the gap the same pattern needs slop 1
    assert ordered_near_spans([a, b], slop=0) == []
    assert ordered_near_spans([a, b], slop=1) == [(0, 3, 1)]


def test_span_freq_f32_accumulation():
    pos_map = {0: np.array([0, 10]), 1: np.array([2, 11])}
    spec = ("near", [("term", 0), ("term", 1)], 2, True)
    f = span_freq(spec, pos_map)
    want = np.float32(np.float32(1.0 / 2.0) + np.float32(1.0 / 1.0))
    assert np.float32(f).view(np.int32) == want.view(np.int32)


def test_or_union_and_nested_near():
    pos_map = {0: [0], 1: [5], 2: [6]}
    spec = ("near",
            [("or", [("term", 0), ("term", 1)]), ("term", 2)], 0, True)
    # or-spans at 0 and 5; term 2 at 6 → only the 5-branch matches
    out_freq = span_freq(spec, {k: np.asarray(v) for k, v in pos_map.items()})
    assert float(out_freq) == 1.0


# ---------------------------------------------------------------------------
# engine ↔ oracle parity
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def corpus():
    return make_corpus(300, seed=5)


@pytest.fixture(scope="module")
def built(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("span_idx"))
    IndexWriter(spark, d, n_segments=3, key_col="url").build(
        spark.createDataFrame(corpus.drop(columns=["html"])))
    return d


@pytest.fixture(scope="module")
def oracle(corpus):
    idx = build_oracle_index(corpus, n_segments=3)
    return OracleSearcher(idx)


def test_span_queries_rank_identical(spark, corpus, built, oracle):
    dfs = term_df_spectrum(corpus)
    plain = [t for t in dfs.index if t.startswith("t0")]
    hi, hi2 = plain[0], plain[1]
    mid = plain[len(plain) // 3]
    s = IndexSearcher(spark, built)
    T = SpanTermQuery
    queries = [
        T("text", hi),
        SpanNearQuery([T("text", hi), T("text", mid)], slop=4, in_order=True),
        SpanNearQuery([T("text", hi), T("text", mid)], slop=4, in_order=False),
        SpanNearQuery([T("text", mid), T("text", hi)], slop=8, in_order=True),
        SpanNearQuery([T("text", hi), SpanGapQuery("text", 1), T("text", hi2)],
                      slop=3, in_order=True),
        SpanOrQuery([T("text", hi), T("text", mid)]),
        SpanNearQuery(
            [SpanOrQuery([T("text", hi), T("text", hi2)]), T("text", mid)],
            slop=5, in_order=False),
        # nested near as a clause
        SpanNearQuery(
            [SpanNearQuery([T("text", hi), T("text", hi2)], slop=2,
                           in_order=False), T("text", mid)],
            slop=6, in_order=False),
    ]
    for q in queries:
        eng = [(r["url"], np.float32(r["score"]).view(np.int32).item())
               for r in s.search(q, 10).collect()]
        orc = [(u, np.float32(sc).view(np.int32).item())
               for (u, sc, _) in oracle.search(q, 10)]
        assert eng == orc, (str(q), eng[:3], orc[:3])
    # at least one query must actually produce matches
    q = SpanNearQuery([T("text", hi), T("text", mid)], slop=50, in_order=False)
    assert s.search(q, 10).collect()


def test_span_count_and_unknown_field(spark, built, corpus, oracle):
    dfs = term_df_spectrum(corpus)
    plain = [t for t in dfs.index if t.startswith("t0")]
    hi, mid = plain[0], plain[len(plain) // 3]
    s = IndexSearcher(spark, built)
    q = SpanNearQuery([SpanTermQuery("text", hi), SpanTermQuery("text", mid)],
                      slop=20, in_order=False)
    assert s.count(q) == oracle.count(q)
    with pytest.raises(ValueError, match="unknown field"):
        s.search(SpanTermQuery("body", hi), 5)


# ---------------------------------------------------------------------------
# vectorized 2-term ordered near (serving fast path)
# ---------------------------------------------------------------------------


def test_ordered_2term_batch_bit_identical_fuzz():
    """ordered_near_freq_2term_batch == scalar span_freq, f32 BIT equality,
    over 400 random docs incl. exhaustion / empty / same-term cases."""
    from rucene_spark.spans import ordered_near_freq_2term_batch

    rng = np.random.default_rng(42)
    for slop in (0, 1, 3, 50):
        lists_a, lists_b, expect = [], [], []
        for _ in range(100):
            na, nb = int(rng.integers(0, 11)), int(rng.integers(0, 11))
            a = np.sort(rng.choice(60, size=na, replace=False)).astype(np.int64)
            b = np.sort(rng.choice(60, size=nb, replace=False)).astype(np.int64)
            if rng.integers(0, 4) == 0:
                b = a.copy()  # same-term-twice shape
            lists_a.append(a.tolist())
            lists_b.append(b.tolist())
            spec = ("near", [("term", 0), ("term", 1)], slop, True)
            expect.append(np.float32(span_freq(spec, {0: a, 1: b})))
        got = ordered_near_freq_2term_batch(lists_a, lists_b, slop)
        assert got.dtype == np.float32
        assert [g.tobytes() for g in got] == [e.tobytes() for e in expect]


def test_ordered_2term_span_exempt_from_cap(spark):
    """The vectorized ordered 2-term span shape runs under a tiny cap
    (like the 2-distinct-term sloppy exemption); unordered stays capped."""
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="rucene_span_fast_idx_")
    try:
        IndexWriter(spark, d, n_segments=2).build(
            spark.createDataFrame(make_corpus(200, seed=5)))
        dfs = term_df_spectrum(make_corpus(200, seed=5))
        hi = [t for t in dfs.index if dfs[t] >= 20]
        a, b = hi[0], hi[1]
        s = IndexSearcher(spark, d, verify_candidate_cap=1)
        q = SpanNearQuery([SpanTermQuery("text", a), SpanTermQuery("text", b)],
                          slop=4, in_order=True)
        assert s.search(q, 10).count() >= 0  # runs despite cap=1
        qu = SpanNearQuery([SpanTermQuery("text", a), SpanTermQuery("text", b)],
                           slop=4, in_order=False)
        with pytest.raises(ValueError, match="verify_candidate_cap"):
            s.search(qu, 10)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_span_collector_matches_frame_and_deletes(spark, corpus, built,
                                                  tmp_path, monkeypatch):
    """The per-segment span collector (default route for root span
    queries) must match the exhaustive frame path bit-for-bit on every
    shape, and deleted docs must neither inflate its impact-ordering θ
    nor appear in results."""
    from rucene_spark.merge import delete_by_keys
    from rucene_spark.query import SpanBoostQuery

    dfs = term_df_spectrum(corpus)
    plain = [t for t in dfs.index if t.startswith("t0")]
    hi, hi2 = plain[0], plain[1]
    mid = plain[len(plain) // 3]
    T = SpanTermQuery
    queries = [
        SpanNearQuery([T("text", hi), T("text", mid)], slop=4,
                      in_order=True),
        SpanNearQuery([T("text", hi), T("text", mid)], slop=4,
                      in_order=False),
        SpanBoostQuery(
            SpanNearQuery([T("text", hi), T("text", mid)], slop=8,
                          in_order=True), 2.5),
        SpanOrQuery([T("text", hi), T("text", mid)]),
        SpanNearQuery(
            [SpanOrQuery([T("text", hi), T("text", hi2)]),
             T("text", mid)], slop=5, in_order=False),
    ]
    s = IndexSearcher(spark, built)
    for q in queries:
        # clear the plan cache around each env flip — search() memoizes
        # per (query, k), which would otherwise return the first route's
        # cached plan for the second call
        monkeypatch.setenv("RUCENE_SPAN_COLLECTOR", "1")
        s._plan_cache.clear()
        kern = [(r["url"], np.float32(r["score"]).view(np.int32).item())
                for r in s.search(q, 10).collect()]
        monkeypatch.setenv("RUCENE_SPAN_COLLECTOR", "0")
        s._plan_cache.clear()
        frame = [(r["url"], np.float32(r["score"]).view(np.int32).item())
                 for r in s.search(q, 10).collect()]
        assert kern == frame, str(q)
        monkeypatch.delenv("RUCENE_SPAN_COLLECTOR")

    # deletes: kill the current top-3, re-search through the collector
    d = str(tmp_path / "span_tomb")
    IndexWriter(spark, d, n_segments=3, key_col="url").build(
        spark.createDataFrame(corpus.drop(columns=["html"])))
    q = SpanNearQuery([T("text", hi), T("text", mid)], slop=4,
                      in_order=True)
    s0 = IndexSearcher(spark, d)
    top = s0.search(q, 3).collect()
    delete_by_keys(d, [r["url"] for r in top])
    s1 = IndexSearcher(spark, d)
    kern = s1.search(q, 10).collect()
    assert not {r["url"] for r in top} & {r["url"] for r in kern}
    monkeypatch.setenv("RUCENE_SPAN_COLLECTOR", "0")
    frame = IndexSearcher(spark, d).search(q, 10).collect()
    assert [(r["url"], r["score"]) for r in kern] == [
        (r["url"], r["score"]) for r in frame]


def test_ordered_2term_flat_equals_list_kernel():
    """The flat-input core (what the span collector feeds directly)
    returns bit-identical freqs to the list wrapper, including zero-tf
    rows and empty batches."""
    from rucene_spark.spans import (
        ordered_near_freq_2term_batch,
        ordered_near_freq_2term_flat,
    )

    rng = np.random.default_rng(11)
    for slop in (0, 2, 9):
        lists_a, lists_b = [], []
        for _ in range(200):
            na, nb = int(rng.integers(0, 11)), int(rng.integers(0, 11))
            lists_a.append(np.sort(rng.choice(
                60, size=na, replace=False)).astype(np.int64))
            lists_b.append(np.sort(rng.choice(
                60, size=nb, replace=False)).astype(np.int64))
        want = ordered_near_freq_2term_batch(lists_a, lists_b, slop)
        la = np.array([len(x) for x in lists_a], dtype=np.int64)
        lb = np.array([len(x) for x in lists_b], dtype=np.int64)
        got = ordered_near_freq_2term_flat(
            np.concatenate(lists_a), la, np.concatenate(lists_b), lb, slop)
        assert got.tobytes() == want.tobytes()
    e = np.empty(0, dtype=np.int64)
    assert len(ordered_near_freq_2term_flat(e, e, e, e, 3)) == 0


def test_nclause_ordered_batch_bit_identical_fuzz():
    """The lockstep n-clause ordered-near kernel must be float32-BIT-
    identical to span_freq for 2..5 term clauses, with and without gap
    clauses (round-4 verdict #2)."""
    from itertools import chain

    from rucene_spark.spans import ordered_near_freq_nclause_flat

    rng = np.random.default_rng(77)
    for _ in range(600):
        S = int(rng.integers(2, 6))
        n = int(rng.integers(1, 25))
        slop = int(rng.integers(0, 8))
        gap_at = int(rng.integers(1, S)) if (rng.random() < 0.3
                                             and S >= 2) else None
        gap_w = int(rng.integers(0, 3))
        pls = [[np.sort(rng.choice(40, size=int(rng.integers(1, 11)),
                                   replace=False)).astype(np.int64)
                for _ in range(n)] for _ in range(S)]
        clauses, subs = [], []
        for s in range(S):
            if gap_at is not None and s == gap_at:
                clauses.append(("gap", gap_w))
                subs.append(("gap", gap_w))
            ln = np.fromiter((len(x) for x in pls[s]), np.int64, n)
            flat = np.fromiter(chain.from_iterable(pls[s]), np.int64,
                               int(ln.sum()))
            clauses.append(("pos", flat, ln))
            subs.append(("term", s))
        got = ordered_near_freq_nclause_flat(clauses, slop)
        spec = ("near", subs, slop, True)
        for i in range(n):
            want = span_freq(spec, {s: pls[s][i] for s in range(S)})
            assert (np.float32(got[i]).view(np.int32)
                    == np.float32(want).view(np.int32)), (
                [pls[s][i].tolist() for s in range(S)], slop, gap_at,
                gap_w, got[i], want)
