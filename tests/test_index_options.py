"""Per-field index-options levels: docs / freqs / positions.

Mirrors the reference's IndexOptions posting levels
(src/core/doc/index_options.rs:18-24): DOCS stores membership only
(freq()==1, ttf==df), DOCS_AND_FREQS stores real term frequencies but no
positions, and positional queries against a lower-level field are a hard
error.
"""

import shutil
import tempfile

import numpy as np
import pytest

from rucene_spark.bm25 import idf32
from rucene_spark.build import IndexWriter, load_manifest
from rucene_spark.query import PhraseQuery, SpanNearQuery, SpanTermQuery, TermQuery
from rucene_spark.search import IndexSearcher
from rucene_spark.webtext import make_corpus, term_df_spectrum


@pytest.fixture(scope="module")
def corpus():
    return make_corpus(400, seed=33)


@pytest.fixture(scope="module")
def probe_terms(corpus):
    dfs = term_df_spectrum(corpus)
    plain = [t for t in dfs.index if t.startswith("t0")]
    return plain[0], plain[len(plain) // 3]


def _build(spark, corpus, opt):
    d = tempfile.mkdtemp(prefix=f"rucene_iopt_{opt}_")
    IndexWriter(spark, d, n_segments=4,
                fields=[("text", "text", opt)]).build(
        spark.createDataFrame(corpus[["url", "text", "lang"]]))
    return d


def test_freqs_level_term_scores_bit_identical(spark, corpus, probe_terms):
    """DOCS_AND_FREQS drops only the position stream — every tf/norm/stat
    is unchanged, so term scoring must be bit-identical to a full index."""
    hi, mid = probe_terms
    d_pos = _build(spark, corpus, "positions")
    d_frq = _build(spark, corpus, "freqs")
    try:
        s_pos = IndexSearcher(spark, d_pos)
        s_frq = IndexSearcher(spark, d_frq)
        for t in (hi, mid):
            a = [(r["url"], np.float32(r["score"]).view(np.int32).item())
                 for r in s_pos.search(TermQuery("text", t), 50).collect()]
            b = [(r["url"], np.float32(r["score"]).view(np.int32).item())
                 for r in s_frq.search(TermQuery("text", t), 50).collect()]
            assert a == b and a
        # the position bytes are actually absent
        blocks = s_frq._postings.select("pos_bin").collect()
        assert all(len(r["pos_bin"]) == 0 for r in blocks)
        blocks = s_pos._postings.select("pos_bin").limit(50).collect()
        assert any(len(r["pos_bin"]) > 0 for r in blocks)
    finally:
        shutil.rmtree(d_pos, ignore_errors=True)
        shutil.rmtree(d_frq, ignore_errors=True)


def test_docs_level_scores_freq_one_and_ttf_equals_df(spark, corpus,
                                                      probe_terms):
    """DOCS level: stored tf is 1 → BM25 scores with freq=1 (computed here
    independently from bm25 primitives + docmeta norms), and the manifest
    stats degrade to ttf==df exactly like the reference's DOCS fields."""
    hi, _ = probe_terms
    d = _build(spark, corpus, "docs")
    try:
        s = IndexSearcher(spark, d)
        m = load_manifest(d)
        assert m["field_index_options"] == {"text": "docs"}
        hits = s.search(TermQuery("text", hi), 20).collect()
        assert hits
        # independent score recompute: freq=1, norm byte from docmeta
        row = s._stats_for([("text", hi)])[("text", hi)]
        df_ = int(row["df"])
        assert int(row["ttf"]) == df_  # ttf==df at DOCS level
        idf = idf32(df_, s.doc_count)
        k1, _b = s.sim_f["text"]
        cache = s.cache_f["text"]
        one = np.float32(1.0)
        for r in hits:
            nb = int(r["norm_byte"])
            want = np.float32(
                np.float32(idf * one) * (np.float32(k1) + one) * one
                / (one + cache[nb]))
            assert np.float32(r["score"]).view(np.int32) == \
                want.view(np.int32)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_positional_queries_rejected_below_positions(spark, corpus,
                                                     probe_terms):
    hi, mid = probe_terms
    for opt in ("docs", "freqs"):
        d = _build(spark, corpus, opt)
        try:
            s = IndexSearcher(spark, d)
            with pytest.raises(ValueError, match="without positions|no"):
                s.search(PhraseQuery.build("text", [hi, mid]), 5)
            with pytest.raises(ValueError, match="positions"):
                s.search(SpanNearQuery(
                    [SpanTermQuery("text", hi), SpanTermQuery("text", mid)],
                    slop=3, in_order=False), 5)
        finally:
            shutil.rmtree(d, ignore_errors=True)


def test_mixed_fields_and_offsets_guard(spark, corpus, probe_terms):
    """One positional field + one docs-level field in the same index:
    phrase works on the former, errors on the latter; index_offsets on a
    lower-level field is rejected at writer construction."""
    hi, mid = probe_terms
    body = corpus[["url", "text", "lang"]].copy()
    body["tags"] = body["lang"] + " webtext"
    d = tempfile.mkdtemp(prefix="rucene_iopt_mixed_")
    try:
        IndexWriter(spark, d, n_segments=2,
                    fields=[("text", "text", "positions"),
                            ("tags", "tags", "docs")]).build(
            spark.createDataFrame(body))
        s = IndexSearcher(spark, d)
        assert s.field_options == {"text": "positions", "tags": "docs"}
        assert s.search(TermQuery("tags", "webtext"), 5).count() == 5
        toks = corpus["text"].iloc[0].split()[:2]
        assert s.search(PhraseQuery.build("text", toks), 5).count() > 0
        with pytest.raises(ValueError, match="positions"):
            s.search(PhraseQuery.build("tags", ["en", "webtext"]), 5)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    with pytest.raises(ValueError, match="index_offsets requires"):
        IndexWriter(spark, "/tmp/never", fields=[("t", "text", "docs")],
                    index_offsets=True)
    with pytest.raises(ValueError, match="unknown index options"):
        IndexWriter(spark, "/tmp/never", fields=[("t", "text", "bogus")])


def test_docs_level_survives_merge_with_deletes(spark, corpus, probe_terms):
    """Tiered merge over a docs-level index: position-less blocks remap
    cleanly (empty pos_bin in → empty pos_bin out) and post-merge term
    results equal pre-merge minus the deleted docs."""
    from rucene_spark.merge import delete_by_keys, force_merge

    hi, _ = probe_terms
    d = _build(spark, corpus, "docs")
    try:
        s0 = IndexSearcher(spark, d)
        before = {(r["url"], np.float32(r["score"]).view(np.int32).item())
                  for r in s0.search(TermQuery("text", hi), 1000).collect()}
        victims = [u for u, _ in sorted(before)[:5]]
        delete_by_keys(d, victims)
        force_merge(spark, d)
        s1 = IndexSearcher(spark, d)
        after = {(r["url"], np.float32(r["score"]).view(np.int32).item())
                 for r in s1.search(TermQuery("text", hi), 1000).collect()}
        assert {u for u, _ in after} == \
            {u for u, _ in before if u not in victims}
        blocks = s1._postings.select("pos_bin").collect()
        assert all(len(r["pos_bin"]) == 0 for r in blocks)
        # the merged index must score exactly like a fresh docs-level
        # build over the surviving corpus (stats shrink with the merge)
        survivors = corpus[~corpus["url"].isin(victims)].reset_index(
            drop=True)
        d_fresh = _build(spark, survivors, "docs")
        try:
            s_fresh = IndexSearcher(spark, d_fresh)
            fresh = {(r["url"],
                      np.float32(r["score"]).view(np.int32).item())
                     for r in s_fresh.search(
                         TermQuery("text", hi), 1000).collect()}
            assert after == fresh
        finally:
            shutil.rmtree(d_fresh, ignore_errors=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)
