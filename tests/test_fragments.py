"""FVH multi-fragment + boundary-scanner semantics (round-3 VERDICT
missing #2). Expectations hand-derived from the reference algorithm:
frag_list_builder.rs:39-121 (greedy span packing + recentering),
mod.rs:1112-1156 (SimpleBoundaryScanner), fragments_builder.rs:313-436
(edge snapping + max_num_fragments + score ordering)."""

import pytest

from rucene_spark.highlight import (
    _find_end_offset,
    _find_start_offset,
    highlight_fragments,
    make_fragments,
)

B = " \t\n,，|!！?？;；.。:："


def test_boundary_scanner_start():
    # scan LEFT stops AFTER a boundary char; hitting 0 returns 0;
    # fruitless scan returns start (mod.rs:1112-1135)
    t = "aaaa bbbb"
    assert _find_start_offset(t, 7, B, 50) == 5   # snaps to after space
    assert _find_start_offset(t, 3, B, 50) == 0   # reached 0
    assert _find_start_offset(t, 7, B, 1) == 7    # out of scan budget
    assert _find_start_offset(t, 0, B, 50) == 0   # start < 1 passthrough


def test_boundary_scanner_end():
    # scan RIGHT stops ON a boundary char; fruitless scan returns start
    t = "aaaa bbbb"
    assert _find_end_offset(t, 2, B, 50) == 4     # stops on the space
    assert _find_end_offset(t, 6, B, 50) == 6     # nothing right: start
    assert _find_end_offset(t, 2, B, 1) == 2      # out of scan budget


def test_two_separated_matches_two_fragments():
    text = "aa bb cc dd ee ff gg hh ii jj"
    got = make_fragments(text, {"cc", "hh"}, frag_char_size=18)
    assert got == [
        "aa bb <b>cc</b> dd ee ff gg",
        "gg <b>hh</b> ii jj",
    ]


def test_close_matches_pack_into_one_fragment():
    text = "aa bb cc dd cc ee ff gg hh ii jj kk"
    got = make_fragments(text, {"cc"}, frag_char_size=18)
    assert got == ["aa bb <b>cc</b> dd <b>cc</b> ee ff"]


def test_sentence_boundary_snapping():
    text = "one. two three four. five matched six seven."
    got = make_fragments(text, {"matched"}, frag_char_size=18)
    # span recenters to [21,39); end snaps right to the final '.',
    # start snaps left to after the space following 'four.'
    assert got == ["five <b>matched</b> six seven"]


def test_max_num_fragments_and_score_order():
    # three clusters: two matches / one / one, far apart
    far = " ".join(["zz"] * 12)
    text = f"cc dd cc {far} cc {far} cc"
    offset_order = make_fragments(text, {"cc"}, frag_char_size=18,
                                  max_num_fragments=2)
    assert len(offset_order) == 2
    assert offset_order[0].count("<b>") == 2      # first cluster has 2
    score_order = make_fragments(text, {"cc"}, frag_char_size=18,
                                 max_num_fragments=1, score_ordered=True)
    assert score_order[0].count("<b>") == 2       # densest first
    # offset order with max=1 keeps the EARLIEST fragment instead
    assert make_fragments(text, {"cc"}, frag_char_size=18,
                          max_num_fragments=1) == [offset_order[0]]


def test_frag_char_size_too_small_raises():
    with pytest.raises(ValueError, match="too small"):
        make_fragments("aa bb", {"aa"}, frag_char_size=10)  # < 3*margin


def test_no_match_no_fragments():
    assert make_fragments("aa bb cc", {"zz"}, frag_char_size=18) == []


def test_highlight_fragments_end_to_end(spark, tmp_path_factory):
    from rucene_spark.build import IndexWriter
    from rucene_spark.query import TermQuery
    from rucene_spark.search import IndexSearcher

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d = str(tmp_path_factory.mktemp("frag_idx"))
    IndexWriter(spark, d, n_segments=4, key_col="doc_id",
                partitioner="range").build(docs)
    s = IndexSearcher(spark, d)
    rows = highlight_fragments(
        s, docs, TermQuery("text", "table"), k=5,
        frag_char_size=60, max_num_fragments=2).collect()
    assert len(rows) == 5
    for r in rows:
        assert 1 <= len(r["fragments"]) <= 2
        assert all("<b>table</b>" in f for f in r["fragments"])
        # UDF output must agree with the driver-side reference impl
        text = docs.filter(f"doc_id = {r['doc_id']}").first()["text"]
        assert r["fragments"] == make_fragments(
            text, {"table"}, frag_char_size=60, max_num_fragments=2)
