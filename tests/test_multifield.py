"""Multi-field indexing + search: the reference's document model is a bag
of named fields, each independently indexed/scored (field.rs:23-29,
doc_consumer.rs:255-320). Per-field stats (df, avgdl, norms) must differ,
per-field boosts must expand through the query-string builder
(query_string.rs:198-249), and unknown fields must be a hard error (round-1
VERDICT 'What's wrong #1': silent double-scoring)."""

import numpy as np
import pytest

from rucene_spark.build import IndexWriter
from rucene_spark.oracle import OracleSearcher, build_oracle_index
from rucene_spark.query import (
    BooleanQuery,
    DisjunctionMaxQuery,
    PhraseQuery,
    QueryStringQueryBuilder,
    TermQuery,
)
from rucene_spark.search import IndexSearcher
from rucene_spark.webtext import make_corpus, term_df_spectrum

N_DOCS = 300
N_SEG = 3
FIELDS = [("text", "text"), ("title", "title")]


@pytest.fixture(scope="module")
def corpus():
    c = make_corpus(N_DOCS, seed=77)
    # derived title field = first 5 tokens (same derivation as the html
    # <title> and the driver gate's oracle)
    c["title"] = [" ".join(t.split(" ")[:5]) for t in c["text"]]
    return c


@pytest.fixture(scope="module")
def built(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mf_idx"))
    df = spark.createDataFrame(corpus.drop(columns=["html"]))
    m = IndexWriter(spark, d, n_segments=N_SEG, key_col="url",
                    fields=FIELDS).build(df)
    return d, m


@pytest.fixture(scope="module")
def oracle(corpus):
    idx = build_oracle_index(corpus.drop(columns=["html"]),
                             n_segments=N_SEG, fields=FIELDS)
    return idx, OracleSearcher(idx)


@pytest.fixture(scope="module")
def terms(corpus):
    dfs = term_df_spectrum(corpus)
    plain = [t for t in dfs.index if t.startswith("t0")]
    return plain[0], plain[len(plain) // 3], plain[-1]


def _hits(searcher, q, k=10):
    rows = searcher.search(q, k).collect()
    return [(r["url"], np.float32(r["score"]).view(np.int32).item())
            for r in rows]


def _ohits(osearch, q, k=10):
    return [(u, np.float32(s).view(np.int32).item())
            for (u, s, _) in osearch.search(q, k)]


def test_per_field_stats_differ(built, oracle):
    _, m = built
    idx, _ = oracle
    assert m["fields"] == ["text", "title"]
    assert m["field_stats"]["text"]["sum_ttf"] == idx.sum_ttf_f["text"]
    assert m["field_stats"]["title"]["sum_ttf"] == idx.sum_ttf_f["title"]
    assert m["field_stats"]["title"]["sum_ttf"] < \
        m["field_stats"]["text"]["sum_ttf"]


def test_multifield_queries_rank_identical(spark, built, oracle, terms):
    d, _ = built
    _, osearch = oracle
    s = IndexSearcher(spark, d)
    hi, mid, rare = terms
    queries = [
        TermQuery("title", hi),
        TermQuery("text", hi),
        # per-field boosted expansion through the parser
        QueryStringQueryBuilder(hi, [("title", 2.0), ("text", 1.0)]).build(),
        QueryStringQueryBuilder(f"{hi} +{mid}",
                                [("title", 0.5), ("text", 1.0)]).build(),
        # cross-field boolean: must in title, should in text
        BooleanQuery.build([TermQuery("title", hi)],
                           [TermQuery("text", mid)], [], []),
        # cross-field dismax
        DisjunctionMaxQuery([TermQuery("title", hi), TermQuery("text", hi)],
                            0.3),
        # phrase against the title field
        QueryStringQueryBuilder(f'"{hi} {mid}"~4',
                                [("title", 1.0)]).build(),
    ]
    for q in queries:
        eng, orc = _hits(s, q), _ohits(osearch, q)
        assert eng == orc, (str(q), eng[:3], orc[:3])
    # same term scores differently in title vs text (different stats)
    th = _hits(s, TermQuery("title", hi))
    tx = _hits(s, TermQuery("text", hi))
    assert th and tx and th != tx


def test_title_is_subset_and_counts(spark, built, oracle, terms):
    d, _ = built
    _, osearch = oracle
    s = IndexSearcher(spark, d)
    hi, _, _ = terms
    ct = s.count(TermQuery("title", hi))
    cx = s.count(TermQuery("text", hi))
    assert ct == osearch.count(TermQuery("title", hi))
    assert cx == osearch.count(TermQuery("text", hi))
    assert 0 < ct < cx  # title tokens ⊂ text tokens


def test_unknown_field_is_hard_error(spark, built, oracle, terms):
    d, _ = built
    _, osearch = oracle
    s = IndexSearcher(spark, d)
    hi, _, _ = terms
    with pytest.raises(ValueError, match="unknown field"):
        s.search(TermQuery("body", hi), 5)
    with pytest.raises(ValueError, match="unknown field"):
        s.count(TermQuery("body", hi))
    with pytest.raises(ValueError, match="unknown field"):
        osearch.search(TermQuery("body", hi), 5)
    with pytest.raises(ValueError, match="unknown field"):
        s.search(PhraseQuery.build("body", [hi, hi]), 5)


def test_docmeta_has_per_field_norms(spark, built):
    from rucene_spark.build import load_manifest, read_seg_table
    d, _ = built
    dm = read_seg_table(spark, d, load_manifest(d), "docmeta")
    cols = set(dm.columns)
    assert {"doc_len", "norm_byte", "doc_len_title", "norm_byte_title"} <= cols
    row = dm.limit(1).collect()[0]
    assert row["doc_len_title"] <= row["doc_len"]


def test_explain_multifield(spark, built, terms):
    d, _ = built
    s = IndexSearcher(spark, d)
    hi, _, _ = terms
    top = s.search(TermQuery("title", hi), 1).collect()
    r = top[0]
    e = s.explain(TermQuery("title", hi), r["seg"], r["doc"])
    assert e["match"]
    assert np.float32(e["value"]).view(np.int32) == \
        np.float32(r["score"]).view(np.int32)


def test_per_field_similarity_parity(spark, built, corpus, terms):
    """SimilarityProducer analogue: different (k1, b) per field changes
    scores but engine and oracle stay bit-identical."""
    from rucene_spark.oracle import OracleSearcher, build_oracle_index

    d, _ = built
    sim = {"title": (0.9, 0.4), "text": (1.6, 0.3)}
    s = IndexSearcher(spark, d, similarity=sim)
    idx = build_oracle_index(corpus.drop(columns=["html"]),
                             n_segments=N_SEG, fields=FIELDS)
    o = OracleSearcher(idx, similarity=sim)
    hi, mid, _ = terms
    for q in (TermQuery("title", hi), TermQuery("text", hi),
              QueryStringQueryBuilder(
                  f"{hi} {mid}", [("title", 2.0), ("text", 1.0)]).build(),
              PhraseQuery.build("title", [hi, mid], slop=4)):
        eng = _hits(s, q)
        orc = _ohits(o, q)
        assert eng == orc, str(q)
    # and the custom-sim scores differ from default-sim scores
    s0 = IndexSearcher(spark, d)
    assert _hits(s, TermQuery("text", hi)) != _hits(s0, TermQuery("text", hi))
