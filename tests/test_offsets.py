"""Offsets-in-postings index option + offset-based highlighting.

Reference contract: ``IndexOptions::DocsAndFreqsAndPositionsAndOffsets``
(/root/reference/src/core/doc/index_options.rs:18-24,
posting_iterator.rs:54-79) — per-position character offsets stored in the
postings stream, enabling analyzer-independent highlighting. The repo's
source-derived highlighters assume space-recoverable tokens; the offsets
sidecar removes that assumption (standard analyzer lowercases and strips
punctuation, so its tokens are NOT substrings of the source).
"""

import numpy as np
import pytest

from rucene_spark.build import IndexWriter, load_manifest
from rucene_spark.codec import (
    batch_unpack_offsets,
    pack_offsets,
    unpack_offsets,
)
from rucene_spark.highlight import highlight_term_offsets
from rucene_spark.query import TermQuery
from rucene_spark.search import IndexSearcher


def test_offsets_codec_roundtrip():
    rng = np.random.default_rng(31)
    starts = np.sort(rng.choice(10_000, size=200, replace=False))
    lens = rng.integers(1, 20, size=200)
    ends = starts + lens
    buf = pack_offsets(starts, ends)
    s2, e2 = unpack_offsets(buf, 200)
    assert (s2 == starts).all() and (e2 == ends).all()
    # batch: split into 3 buffers at arbitrary token boundaries
    bufs = [pack_offsets(starts[:50], ends[:50]),
            pack_offsets(starts[50:120], ends[50:120]),
            pack_offsets(starts[120:], ends[120:])]
    s3, e3 = batch_unpack_offsets(bufs, np.array([50, 70, 80]))
    assert (s3 == starts).all() and (e3 == ends).all()
    assert pack_offsets(np.empty(0), np.empty(0)) == b""


TEXTS = [
    (0, "The QUICK-brown Fox; jumped over the lazy dog."),
    (1, "No quick animals here, only a slow turtle."),
    (2, "Punctuation, CASE and hyphen-ation all survive offsets."),
]


@pytest.fixture(scope="module")
def offs_index(spark, tmp_path_factory):
    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    d = str(tmp_path_factory.mktemp("offs_idx"))
    IndexWriter(spark, d, n_segments=2, key_col="doc_id",
                partitioner="range", analyzer="standard",
                index_offsets=True).build(df)
    return d


def test_offsets_manifest_flag(spark, offs_index):
    assert load_manifest(offs_index)["index_offsets"] is True


def test_offset_highlight_non_recoverable_tokens(spark, offs_index):
    """Token 'quick' (standard-analyzed) maps back to the ORIGINAL
    'QUICK' substring — impossible for the whitespace re-derivation
    highlighter since 'QUICK-brown' is one whitespace token."""
    docs = spark.createDataFrame(TEXTS, "doc_id long, text string")
    s = IndexSearcher(spark, offs_index)
    rows = highlight_term_offsets(s, docs, "quick", k=5,
                                  char_window=10).collect()
    by_id = {r["doc_id"]: r["snippet"] for r in rows}
    assert set(by_id) == {0, 1}
    assert "<b>QUICK</b>" in by_id[0]
    assert by_id[0] == "The <b>QUICK</b>-brown Fox"
    assert "<b>quick</b>" in by_id[1]


def test_offsets_survive_merge_with_deletes(spark, offs_index):
    from rucene_spark.merge import delete_by_keys, force_merge

    docs = spark.createDataFrame(TEXTS, "doc_id long, text string")
    delete_by_keys(offs_index, [1])
    force_merge(spark, offs_index)
    s = IndexSearcher(spark, offs_index)
    assert len(s.manifest["segments"]) == 1
    rows = highlight_term_offsets(s, docs, "quick", k=5,
                                  char_window=10).collect()
    by_id = {r["doc_id"]: r["snippet"] for r in rows}
    assert set(by_id) == {0}
    assert by_id[0] == "The <b>QUICK</b>-brown Fox"
    # offsets for other terms survive the remap too
    rows2 = highlight_term_offsets(s, docs, "hyphen", k=5,
                                   char_window=8).collect()
    assert rows2 and "<b>hyphen</b>-ation" in rows2[0]["snippet"]
