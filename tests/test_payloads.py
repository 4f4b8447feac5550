"""Per-position payloads: delimited_payload analyzer mode + pay_bin sidecar.

The reference stores payloads in the postings format and exposes them via
the postings iterator (posting_reader.rs ``payload()``); it ships no
payload-emitting analyzer and no payload-consuming query. Our analogue:
the ``delimited_payload[:<delim>]`` analyzer mode (Lucene's public
DelimitedPayloadTokenFilter pattern — token ``term|payload`` indexes
``term`` with ``payload`` bytes at its position), an opt-in ``pay_bin``
sidecar carried through merges, and ``IndexSearcher.payloads()``.
"""

import shutil
import tempfile

import numpy as np
import pandas as pd
import pytest

from rucene_spark.build import IndexWriter
from rucene_spark.query import PhraseQuery, TermQuery
from rucene_spark.search import IndexSearcher


@pytest.fixture(scope="module")
def corpus():
    rows = []
    for i in range(60):
        toks = []
        for j in range(1 + (i % 7)):
            toks.append(f"w{j:02d}|P{i}_{j}")
        toks.append("plain")          # token without a payload
        if i % 3 == 0:
            toks.append("w00|AGAIN")  # repeated term, second payload
        rows.append({"url": f"u{i:04d}", "text": " ".join(toks)})
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def idx(spark, corpus):
    d = tempfile.mkdtemp(prefix="rucene_payload_idx_")
    IndexWriter(spark, d, n_segments=3,
                analyzer="delimited_payload").build(
        spark.createDataFrame(corpus))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_payloads_round_trip(spark, corpus, idx):
    s = IndexSearcher(spark, idx)
    # terms index WITHOUT the payload suffix
    hits = s.search(TermQuery("text", "w00"), 100).collect()
    assert len(hits) == 60
    by_url = {r["url"]: (r["seg"], r["doc"]) for r in hits}
    for i in (0, 3, 7, 59):
        seg, doc = by_url[f"u{i:04d}"]
        got = s.payloads("text", "w00", seg, doc)
        want = [(0, f"P{i}_0".encode())]
        if i % 3 == 0:
            # the repeated w00 sits after the per-doc tokens + "plain"
            want.append((1 + (i % 7) + 1, b"AGAIN"))
        assert got == want, (i, got, want)
    # a token without a delimiter carries an empty payload
    seg, doc = by_url["u0005"]
    got = s.payloads("text", "plain", seg, doc)
    assert got == [(6, b"")]
    # positional queries still work on the payload-stripped positions
    assert s.search(
        PhraseQuery.build("text", ["w00", "w01"]), 5).count() == 5


def test_payloads_survive_merge(spark, corpus, idx):
    from rucene_spark.merge import delete_by_keys, force_merge

    d2 = tempfile.mkdtemp(prefix="rucene_payload_m_")
    try:
        IndexWriter(spark, d2, n_segments=3,
                    analyzer="delimited_payload").build(
            spark.createDataFrame(corpus))
        delete_by_keys(d2, ["u0001", "u0002"])
        force_merge(spark, d2)
        s = IndexSearcher(spark, d2)
        hits = s.search(TermQuery("text", "w00"), 100).collect()
        assert len(hits) == 58
        by_url = {r["url"]: (r["seg"], r["doc"]) for r in hits}
        for i in (0, 3, 59):
            seg, doc = by_url[f"u{i:04d}"]
            got = s.payloads("text", "w00", seg, doc)
            assert got[0] == (0, f"P{i}_0".encode())
    finally:
        shutil.rmtree(d2, ignore_errors=True)


def test_payload_guards(spark):
    with pytest.raises(ValueError, match="mutually exclusive"):
        IndexWriter(spark, "/tmp/never", analyzer="delimited_payload",
                    index_offsets=True)
    from rucene_spark.analysis import parse_payload_mode
    assert parse_payload_mode("delimited_payload") == "|"
    assert parse_payload_mode("delimited_payload:#") == "#"
    with pytest.raises(ValueError):
        parse_payload_mode("delimited_payload:")


def test_payloads_survive_mixed_field_merge(spark, corpus):
    """Regression (r3 ADVICE): the merge's payload-carry check was
    batch-global (`all(len(b) > 0 ...)`), so a mapInPandas batch mixing
    pay_bin-bearing text blocks with bare docs-level blocks silently
    dropped EVERY payload in the batch. Carry is per row now."""
    from rucene_spark.merge import delete_by_keys, force_merge

    d = tempfile.mkdtemp(prefix="rucene_payload_mix_")
    try:
        df = corpus.copy()
        df["tags"] = [f"tag{i % 5}" for i in range(len(df))]
        IndexWriter(
            spark, d, n_segments=2, analyzer="delimited_payload",
            fields=[("text", "text", "positions"),
                    ("tags", "tags", "docs")],
        ).build(spark.createDataFrame(df))
        delete_by_keys(d, ["u0004"])
        force_merge(spark, d)
        s = IndexSearcher(spark, d)
        hits = s.search(TermQuery("text", "w00"), 100).collect()
        assert len(hits) == 59
        by_url = {r["url"]: (r["seg"], r["doc"]) for r in hits}
        for i in (0, 3, 59):
            seg, doc = by_url[f"u{i:04d}"]
            got = s.payloads("text", "w00", seg, doc)
            assert got and got[0] == (0, f"P{i}_0".encode()), (i, got)
        # the docs-level field still matches and stays bare
        assert s.search(TermQuery("tags", "tag0"), 100).count() == 12
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_merge_tolerates_pre_sidecar_segments(spark, corpus):
    """Regression (r3 ADVICE): merging segments written before the
    offs_bin/pay_bin columns existed surfaces those columns as null in
    the unmerged-schema read; the merge must treat null as absent (drop
    that row's sidecar) instead of raising TypeError."""
    import os

    import pyarrow.parquet as pq

    from rucene_spark.build import load_manifest, seg_dir
    from rucene_spark.merge import delete_by_keys, force_merge

    d = tempfile.mkdtemp(prefix="rucene_payload_presc_")
    try:
        IndexWriter(spark, d, n_segments=3,
                    analyzer="delimited_payload").build(
            spark.createDataFrame(corpus))
        m = load_manifest(d)
        pdir = os.path.join(d, "postings", seg_dir(m["segments"][0]))
        for f in os.listdir(pdir):
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(pdir, f))
                t = t.drop_columns(["offs_bin", "pay_bin"])
                pq.write_table(t, os.path.join(pdir, f))
        delete_by_keys(d, ["u0002"])
        force_merge(spark, d)  # must not raise
        s = IndexSearcher(spark, d)
        assert s.search(TermQuery("text", "w00"), 100).count() == 59
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_add_documents_rejects_mismatched_writer(spark, corpus, idx):
    """Regression (r3 ADVICE): a writer whose analysis config contradicts
    the existing manifest must fail fast instead of appending delta
    segments with divergent tokenization / posting levels."""
    w = IndexWriter(spark, idx, n_segments=2)  # default whitespace
    with pytest.raises(ValueError, match="analyzer"):
        w.add_documents(spark.createDataFrame(corpus.head(5)))
    with pytest.raises(ValueError, match="analyzer"):
        w.update_documents(spark.createDataFrame(corpus.head(5)))
