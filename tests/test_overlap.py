"""Position-increment / overlap-token semantics (synonym analyzer).

Reference contract (/root/reference):
* a token with ``pos_incr == 0`` shares the previous token's position and
  increments ``num_overlap`` (doc_consumer.rs:906-926);
* the field length used for norms is ``length - num_overlap``
  (bm25_similarity.rs:86) — synonyms must not change a doc's norm;
* overlapped tokens match term and same-position phrase queries like any
  other token (the positions stream carries the shared position).
"""

import numpy as np
import pytest

from rucene_spark.analysis import (
    parse_synonym_mode,
    tokenize_factorized_overlap,
)
from rucene_spark.build import IndexWriter
from rucene_spark.query import PhraseQuery, TermQuery
from rucene_spark.search import IndexSearcher
from rucene_spark.smallfloat import encode_norm_value


def test_parse_synonym_mode():
    assert parse_synonym_mode("synonym:quick=fast|rapid,big=large") == {
        "quick": ["fast", "rapid"], "big": ["large"]}
    with pytest.raises(ValueError):
        parse_synonym_mode("synonym:quick")


def test_tokenize_overlap_positions_and_mask():
    di, codes, uniques, pos, overlap = tokenize_factorized_overlap(
        ["the quick fox", "no match here"], mode="synonym:quick=fast")
    terms = uniques[codes]
    base = overlap == False  # noqa: E712
    # base tokens unchanged
    assert sorted(terms[base]) == sorted(
        ["the", "quick", "fox", "no", "match", "here"])
    # one synonym token, same doc and SAME position as its source
    syn = np.flatnonzero(overlap)
    assert len(syn) == 1
    src = np.flatnonzero(terms == "quick")[0]
    assert terms[syn[0]] == "fast"
    assert di[syn[0]] == di[src]
    assert pos[syn[0]] == pos[src]


@pytest.fixture(scope="module")
def syn_index(spark, tmp_path_factory):
    rows = [
        (0, "the quick brown fox"),
        (1, "a fast brown fox"),
        (2, "slow green turtle x1 x2 x3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path_factory.mktemp("syn_idx"))
    IndexWriter(spark, d, n_segments=1, key_col="doc_id",
                partitioner="range",
                analyzer="synonym:quick=fast").build(df)
    return d


def test_overlap_excluded_from_field_length(spark, syn_index):
    s = IndexSearcher(spark, syn_index)
    dm = {r["doc_id"]: r.asDict()
          for r in s._docmeta.select("doc_id", "doc_len", "norm_byte")
          .collect()}
    # doc 0 has 4 real tokens + 1 synonym overlap → length 4, not 5
    assert dm[0]["doc_len"] == 4
    assert dm[0]["norm_byte"] == int(encode_norm_value(1.0, np.array([4]))[0])
    assert dm[1]["doc_len"] == 4
    assert dm[2]["doc_len"] == 6


def test_overlap_token_matches_term_and_phrase(spark, syn_index):
    s = IndexSearcher(spark, syn_index)
    # "fast" matches doc 1 (literal) AND doc 0 (synonym of quick)
    hits = {r["doc_id"] for r in s.search(TermQuery("text", "fast"), 10)
            .collect()}
    assert hits == {0, 1}
    # same stats → same score for both docs (df=2, tf=1, same norm)
    scores = {r["doc_id"]: r["score"]
              for r in s.search(TermQuery("text", "fast"), 10).collect()}
    assert scores[0] == scores[1]
    # phrase through the synonym position: "fast brown" matches doc 0
    # because fast sits AT quick's position (same-position matching)
    ph = {r["doc_id"] for r in
          s.search(PhraseQuery.build("text", ["fast", "brown"], slop=0), 10)
          .collect()}
    assert ph == {0, 1}
    # count() agrees
    assert s.count(TermQuery("text", "fast")) == 2
