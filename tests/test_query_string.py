"""Query-string parser goldens, ported verbatim from the reference
(/root/reference/src/core/search/query/query_string.rs:252-412)."""

import pytest

from rucene_spark.query import (
    BooleanQuery,
    BoostQuery,
    MatchAllDocsQuery,
    PhraseQuery,
    QueryStringQueryBuilder,
    TermQuery,
)


def parse(s, fields=None, msm=0, boost=1.0):
    return str(QueryStringQueryBuilder(s, fields or [("title", 1.0)], msm, boost).build())


def test_single_term():
    assert parse("test") == "TermQuery(field: title, term: test, boost: 1)"


def test_group_with_boosts_cjk():
    assert parse("(test^0.2 | 测试^2)") == (
        "BooleanQuery(must: [], should: [TermQuery(field: title, term: test, boost: 0.2), "
        "TermQuery(field: title, term: 测试, boost: 2)], filters: [], must_not: [], "
        "match: 1)"
    )


def test_quoted_term_with_boost():
    assert parse('test^0.2 "测试"^2') == (
        "BooleanQuery(must: [], should: [TermQuery(field: title, term: test, boost: 0.2), "
        "TermQuery(field: title, term: 测试, boost: 2)], filters: [], must_not: [], "
        "match: 1)"
    )


def test_single_must_unwraps():
    assert parse("+test") == "TermQuery(field: title, term: test, boost: 1)"


def test_two_shoulds():
    assert parse("test search") == (
        "BooleanQuery(must: [], should: [TermQuery(field: title, term: test, boost: 1), "
        "TermQuery(field: title, term: search, boost: 1)], filters: [], must_not: [], "
        "match: 1)"
    )


def test_should_plus_must():
    assert parse("test +search") == (
        "BooleanQuery(must: [TermQuery(field: title, term: search, boost: 1)], should: "
        "[TermQuery(field: title, term: test, boost: 1)], filters: [], must_not: [], "
        "match: 0)"
    )


def test_must_group():
    assert parse("test +(search 搜索)") == (
        "BooleanQuery(must: [BooleanQuery(must: [], should: [TermQuery(field: title, "
        "term: search, boost: 1), TermQuery(field: title, term: 搜索, boost: 1)], "
        "filters: [], must_not: [], match: 1)], should: [TermQuery(field: title, term: "
        "test, boost: 1)], filters: [], must_not: [], match: 0)"
    )


def test_multi_field():
    assert parse("test +search", fields=[("title", 1.0), ("content", 1.0)]) == (
        "BooleanQuery(must: [BooleanQuery(must: [], should: [TermQuery(field: title, "
        "term: search, boost: 1), TermQuery(field: content, term: search, boost: 1)], "
        "filters: [], must_not: [], match: 1)], should: [BooleanQuery(must: [], should: "
        "[TermQuery(field: title, term: test, boost: 1), TermQuery(field: content, term: "
        "test, boost: 1)], filters: [], must_not: [], match: 1)], filters: [], must_not: "
        "[], match: 0)"
    )


def test_deep_cjk_nesting():
    q = "从 +(市场定位 (+市场 +定位)) 分析 +b2b +((电子商务 电商^0.8) (+电子 +商务)) +网站"
    assert parse(q) == (
        "BooleanQuery(must: [BooleanQuery(must: [], should: [TermQuery(field: title, "
        "term: 市场定位, boost: 1), BooleanQuery(must: [TermQuery(field: title, term: "
        "市场, boost: 1), TermQuery(field: title, term: 定位, boost: 1)], should: [], "
        "filters: [], must_not: [], match: 0)], filters: [], must_not: [], match: 1), "
        "TermQuery(field: title, term: b2b, boost: 1), BooleanQuery(must: [], should: "
        "[BooleanQuery(must: [], should: [TermQuery(field: title, term: 电子商务, boost: "
        "1), TermQuery(field: title, term: 电商, boost: 0.8)], filters: [], must_not: [], "
        "match: 1), BooleanQuery(must: [TermQuery(field: title, term: 电子, boost: 1), "
        "TermQuery(field: title, term: 商务, boost: 1)], should: [], filters: [], "
        "must_not: [], match: 0)], filters: [], must_not: [], match: 1), TermQuery(field: "
        "title, term: 网站, boost: 1)], should: [TermQuery(field: title, term: 从, boost: "
        "1), TermQuery(field: title, term: 分析, boost: 1)], filters: [], must_not: [], "
        "match: 0)"
    )


# --- our additional coverage beyond the reference goldens ---


def test_phrase_with_slop_builds_phrase_query():
    q = QueryStringQueryBuilder('"a b"~3', [("body", 1.0)]).build()
    assert isinstance(q, PhraseQuery)
    assert q.terms == ["a", "b"] and q.slop == 3 and q.positions == [0, 1]


def test_phrase_with_field_boost_wraps():
    q = QueryStringQueryBuilder('"a b"~0', [("body", 2.0)]).build()
    assert isinstance(q, BoostQuery) and q.boost == 2.0
    assert isinstance(q.query, PhraseQuery)


def test_boolean_build_rules():
    # filter-only → ConstantScore(0); pure negation adds MatchAll
    t = TermQuery("f", "x")
    cs = BooleanQuery.build([], [], [t], [])
    assert "ConstantScoreQuery" in str(cs) and "boost: 0" in str(cs)
    neg = BooleanQuery.build([], [], [], [t])
    assert isinstance(neg, BooleanQuery)
    assert isinstance(neg.musts[0], MatchAllDocsQuery)
    # msm default: no musts → 1
    b = BooleanQuery.build([], [t, TermQuery("f", "y")], [], [])
    assert b.min_should_match == 1


def test_mismatched_paren_raises():
    with pytest.raises(ValueError):
        QueryStringQueryBuilder("a)", [("t", 1.0)]).build()


def test_empty_raises():
    with pytest.raises(ValueError):
        QueryStringQueryBuilder("", [("t", 1.0)]).build()


def test_parser_fuzz_never_crashes():
    """Seeded fuzz: arbitrary query strings (operators, quotes, carets,
    parens, CJK, control chars) must parse to SOME query or raise a clean
    ValueError — never an unhandled exception (query_string.rs returns
    Result; user-facing parsers cannot panic)."""
    import numpy as np

    from rucene_spark.query import QueryStringQueryBuilder

    rng = np.random.default_rng(7)
    alphabet = list("abc ()+|\"^~0123.5 搜索引擎 \t") + ["  ", "t0", "^2", "~1"]
    for i in range(300):
        n = int(rng.integers(0, 12))
        s = "".join(alphabet[int(rng.integers(len(alphabet)))]
                    for _ in range(n))
        try:
            q = QueryStringQueryBuilder(s, [("text", 1.0)]).build()
        except ValueError:
            continue
        assert q is not None
