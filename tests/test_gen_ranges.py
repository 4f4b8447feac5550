"""Per-doc add-generation scoping (gen_ranges): a delete issued while a
merge is in flight must still hide its victims after the merge commits
(DocumentsWriterDeleteQueue sequence-number semantics,
index_writer.rs:471 / buffered-updates application at merge commit),
while delete-then-re-add stays protected across compactions."""

import pandas as pd
import pytest

from rucene_spark.build import IndexWriter, load_manifest
from rucene_spark.merge import (
    SegmentMerger,
    _compose_gen_ranges,
    delete_by_keys,
    force_merge,
    gen_scope_expr,
    has_tombstones,
)
from rucene_spark.query import MatchAllDocsQuery, TermQuery
from rucene_spark.search import IndexSearcher
from rucene_spark.webtext import make_corpus


@pytest.fixture(scope="module")
def corpus() -> pd.DataFrame:
    return make_corpus(300, seed=31)


def _build(spark, corpus, d, n_segments=4):
    IndexWriter(spark, d, n_segments=n_segments).build(
        spark.createDataFrame(corpus[["url", "text", "lang"]]))
    return d


# ---------------------------------------------------------------------------
# pure range math
# ---------------------------------------------------------------------------


def test_compose_ranges_plain_segments():
    seg_rows = {1: {"segment_id": 1, "gen": 3, "docs": 10},
                2: {"segment_id": 2, "gen": 5, "docs": 7}}
    offsets = {1: 0, 2: 10}
    out = _compose_gen_ranges([1, 2], seg_rows, offsets, {})
    assert out == [[0, 3], [10, 5]]


def test_compose_ranges_equal_gens_coalesce():
    seg_rows = {1: {"segment_id": 1, "gen": 3, "docs": 10},
                2: {"segment_id": 2, "gen": 3, "docs": 7}}
    out = _compose_gen_ranges([1, 2], seg_rows, {1: 0, 2: 10}, {})
    assert out == [[0, 3]]


def test_compose_ranges_cascade_with_deletes():
    # segment 9 is itself a merge product: docs [0,5) added at gen 1,
    # [5,12) at gen 4. Three of its gen-1 docs were deleted below the
    # boundary → the boundary shifts left by 3 in the new numbering.
    seg_rows = {9: {"segment_id": 9, "gen": 6, "docs": 12,
                    "gen_ranges": [[0, 1], [5, 4]]},
                3: {"segment_id": 3, "gen": 7, "docs": 4}}
    offsets = {9: 0, 3: 9}   # 12 - 3 deleted = 9 live
    out = _compose_gen_ranges([9, 3], seg_rows, offsets,
                              {(9, 5): 3})
    assert out == [[0, 1], [2, 4], [9, 7]]


def test_compose_ranges_emptied_range_replaced():
    # every gen-1 doc below the boundary deleted → first range empty;
    # the gen-4 range takes over at start 0
    seg_rows = {9: {"segment_id": 9, "gen": 6, "docs": 12,
                    "gen_ranges": [[0, 1], [5, 4]]}}
    out = _compose_gen_ranges([9], seg_rows, {9: 0}, {(9, 5): 5})
    assert out == [[0, 4]]


def test_gen_scope_expr_piecewise(spark):
    segs = [{"segment_id": 1, "gen": 2},
            {"segment_id": 7, "gen": 9,
             "gen_ranges": [[0, 1], [4, 5], [10, 8]]}]
    df = spark.createDataFrame(
        [(1, 0), (1, 99), (7, 0), (7, 3), (7, 4), (7, 9), (7, 10)],
        "seg int, doc int")
    got = {(r["seg"], r["doc"]): r["g"]
           for r in df.select("seg", "doc",
                              gen_scope_expr(segs).alias("g")).collect()}
    assert got == {(1, 0): 2, (1, 99): 2, (7, 0): 1, (7, 3): 1,
                   (7, 4): 5, (7, 9): 5, (7, 10): 8}


# ---------------------------------------------------------------------------
# the race, deterministically: a lock-shaped seam whose second acquisition
# (the commit section) injects a delete between resolve and commit
# ---------------------------------------------------------------------------


class _InjectOnCommit:
    def __init__(self, index_dir: str, keys: list):
        self.index_dir = index_dir
        self.keys = keys
        self.enters = 0

    def __enter__(self):
        self.enters += 1
        if self.enters == 2 and self.keys:   # commit section
            delete_by_keys(self.index_dir, self.keys)
            self.keys = []

    def __exit__(self, *exc):
        return False


def test_delete_racing_merge_still_hides(spark, corpus, tmp_index):
    _build(spark, corpus, tmp_index, n_segments=4)
    s0 = IndexSearcher(spark, tmp_index)
    n_all = s0.count(MatchAllDocsQuery())
    victim = corpus["url"].iloc[17]

    m = load_manifest(tmp_index)
    run = [s["segment_id"] for s in m["segments"]]
    new_row = SegmentMerger(spark, tmp_index).merge(
        run, commit_lock=_InjectOnCommit(tmp_index, [victim]))
    assert new_row["gen_ranges"], "merged row must carry per-doc add-gens"

    # the late tombstone survived consumption and still hides the doc
    assert has_tombstones(tmp_index)
    s1 = IndexSearcher(spark, tmp_index)
    assert s1.count(MatchAllDocsQuery()) == n_all - 1
    hits = s1.search(MatchAllDocsQuery(), 1000).collect()
    assert victim not in {r["url"] for r in hits}

    # the next merge physically squeezes it and consumes the tombstone
    force_merge(spark, tmp_index)
    assert not has_tombstones(tmp_index)
    s2 = IndexSearcher(spark, tmp_index)
    assert s2.count(MatchAllDocsQuery()) == n_all - 1
    assert load_manifest(tmp_index)["doc_count"] == n_all - 1


def test_readd_after_merge_not_hidden_by_old_tombstone(spark, corpus,
                                                       tmp_index):
    """Re-add protection must survive compaction: the re-added doc's
    range keeps its delta-segment gen inside the merged segment, so the
    older tombstone (kept alive by an unrelated late delete) cannot
    touch it."""
    _build(spark, corpus, tmp_index, n_segments=3)
    victim = corpus["url"].iloc[5]
    delete_by_keys(tmp_index, [victim])

    # re-add the same key with fresh content in a delta segment
    readd = corpus[corpus["url"] == victim].copy()
    w = IndexWriter(spark, tmp_index, n_segments=3)
    w.add_documents(spark.createDataFrame(readd[["url", "text", "lang"]]))

    s0 = IndexSearcher(spark, tmp_index)
    n_all = s0.count(MatchAllDocsQuery())
    hits0 = {r["url"] for r in s0.search(MatchAllDocsQuery(), 1000).collect()}
    assert victim in hits0   # the re-added copy is visible

    # full merge; the old tombstone is consumed (its victim squeezed),
    # the re-added copy lands in a gen_ranges slice at its delta gen
    force_merge(spark, tmp_index)
    s1 = IndexSearcher(spark, tmp_index)
    assert s1.count(MatchAllDocsQuery()) == n_all
    hits1 = {r["url"] for r in s1.search(MatchAllDocsQuery(), 1000).collect()}
    assert victim in hits1


class _InjectUpdateOnCommit:
    def __init__(self, index_dir: str, col: str, updates: dict):
        self.index_dir, self.col, self.updates = index_dir, col, updates
        self.enters = 0

    def __enter__(self):
        from rucene_spark.merge import update_doc_values
        self.enters += 1
        if self.enters == 2 and self.updates:   # commit section
            update_doc_values(self.index_dir, self.col, self.updates)
            self.updates = {}

    def __exit__(self, *exc):
        return False


def test_dv_update_racing_merge_still_applies(spark, tmp_path_factory):
    """An update_doc_values issued between a merge's fold and its commit
    must keep applying to the merged segment (per-doc add-gen scope),
    survive dead-overlay GC until a later merge folds it (dv_fold_gen,
    not the commit gen), then become durable and collectable."""
    import os

    from pyspark.sql import functions as F

    from rucene_spark.merge import DV_UPDATES, force_merge
    from rucene_spark.query import TermQuery

    rows = [(i, f"common t{i:03d}", 100 + i) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string, rank long")
    d = str(tmp_path_factory.mktemp("dvu_race_idx"))
    IndexWriter(spark, d, n_segments=2, key_col="doc_id",
                partitioner="range").build(df)

    m = load_manifest(d)
    SegmentMerger(spark, d).merge(
        [s["segment_id"] for s in m["segments"]],
        commit_lock=_InjectUpdateOnCommit(d, "rank", {2: 777.0}))

    def ranks(searcher):
        return {r["doc_id"]: r["rank"] for r in
                searcher.search_sorted(TermQuery("text", "common"),
                                       [F.desc("rank")], 10).collect()}

    # the raced update projects onto the merged segment per-doc, and
    # its file survived the wave-end GC (fold predates it)
    dvu = os.path.join(d, DV_UPDATES)
    assert any(f.endswith(".parquet") for f in os.listdir(dvu))
    s1 = IndexSearcher(spark, d)
    assert ranks(s1)[2] == 777

    # the next merge folds it durably; GC then retires the file
    force_merge(spark, d)
    assert not any(f.endswith(".parquet") for f in os.listdir(dvu))
    s2 = IndexSearcher(spark, d)
    assert ranks(s2)[2] == 777


def test_concurrent_scheduler_preserves_gen_ranges(spark, corpus, tmp_index):
    """Waves of concurrent merges compose gen_ranges correctly: after
    quiescence every doc is still findable and counts are exact."""
    from rucene_spark.merge import TieredMergePolicy, maybe_merge

    _build(spark, corpus, tmp_index, n_segments=8)
    victim = corpus["url"].iloc[33]
    delete_by_keys(tmp_index, [victim])
    maybe_merge(spark, tmp_index,
                TieredMergePolicy(floor_segment_bytes=1 << 30,
                                  segs_per_tier=2.0, max_merge_at_once=3),
                threads=4)
    m = load_manifest(tmp_index)
    for s in m["segments"]:
        if s.get("merged_from"):
            assert s.get("gen_ranges"), s
            starts = [r[0] for r in s["gen_ranges"]]
            assert starts == sorted(starts)
            assert starts[0] == 0
    s1 = IndexSearcher(spark, tmp_index)
    assert s1.count(MatchAllDocsQuery()) == len(corpus) - 1
