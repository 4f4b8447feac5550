"""Tiered merge + tombstone deletes: results must be invariant under
compaction, and deletes must behave like Lucene live-docs (hidden at query
time, squeezed out with stats recomputed at merge)."""

import numpy as np
import pandas as pd
import pytest

from rucene_spark.build import IndexWriter, load_manifest
from rucene_spark.merge import (
    SegmentMerger,
    TieredMergePolicy,
    delete_by_keys,
    delete_by_query,
    force_merge,
    maybe_merge,
)
from rucene_spark.query import BooleanQuery, PhraseQuery, TermQuery
from rucene_spark.search import IndexSearcher
from rucene_spark.webtext import make_corpus, term_df_spectrum


@pytest.fixture(scope="module")
def corpus() -> pd.DataFrame:
    return make_corpus(600, seed=11)


@pytest.fixture(scope="module")
def qterms(corpus):
    dfs = term_df_spectrum(corpus)
    plain = [t for t in dfs.index if t.startswith("t0")]
    return plain[0], plain[len(plain) // 3], plain[-1]


def _build(spark, corpus, d, n_segments=6):
    IndexWriter(spark, d, n_segments=n_segments).build(
        spark.createDataFrame(corpus[["url", "text", "lang"]])
    )
    return d


def _results(searcher, qterms, k=20):
    hi, mid, rare = qterms
    out = {}
    for name, q in {
        "term": TermQuery("text", hi),
        "bool": BooleanQuery.build(
            [], [TermQuery("text", hi), TermQuery("text", mid)], [], []),
        "rare": TermQuery("text", rare),
    }.items():
        rows = searcher.search(q, k).collect()
        out[name] = [(r["url"], round(float(r["score"]), 5)) for r in rows]
    return out


# ---------------------------------------------------------------------------
# policy math
# ---------------------------------------------------------------------------


def test_policy_no_merge_when_balanced():
    p = TieredMergePolicy(floor_segment_bytes=1)
    segs = [{"segment_id": i, "bytes": 1000} for i in range(4)]
    assert p.find_merge(segs) is None


def test_policy_merges_small_tier():
    p = TieredMergePolicy(floor_segment_bytes=1, segs_per_tier=2.0,
                          max_merge_at_once=3)
    segs = [{"segment_id": i, "bytes": 100} for i in range(8)]
    pick = p.find_merge(segs)
    assert pick is not None
    assert len(pick) <= 3
    assert pick == sorted(pick)
    ids = [s["segment_id"] for s in segs]
    i = ids.index(pick[0])
    assert pick == ids[i:i + len(pick)]  # adjacent run


def test_policy_respects_max_segment():
    p = TieredMergePolicy(floor_segment_bytes=1, segs_per_tier=1.0,
                          max_merged_segment_bytes=150)
    segs = [{"segment_id": i, "bytes": 100} for i in range(6)]
    pick = p.find_merge(segs)
    assert pick is None  # any 2-run exceeds 150; singletons aren't merges


def test_policy_prefers_delete_heavy():
    p = TieredMergePolicy(floor_segment_bytes=1, segs_per_tier=1.0)
    segs = [
        {"segment_id": 0, "bytes": 100, "del_ratio": 0.0},
        {"segment_id": 1, "bytes": 100, "del_ratio": 0.0},
        {"segment_id": 2, "bytes": 100, "del_ratio": 0.5},
        {"segment_id": 3, "bytes": 100, "del_ratio": 0.5},
    ]
    pick = p.find_merge(segs)
    assert pick == [2, 3]


# ---------------------------------------------------------------------------
# merger end-to-end
# ---------------------------------------------------------------------------


def test_force_merge_preserves_results(spark, corpus, qterms, tmp_index):
    _build(spark, corpus, tmp_index)
    s0 = IndexSearcher(spark, tmp_index)
    before = _results(s0, qterms)
    doc_count0, sum_ttf0 = s0.doc_count, s0.sum_ttf

    row = force_merge(spark, tmp_index)
    m = load_manifest(tmp_index)
    assert len(m["segments"]) == 1
    assert row["merged_from"] == list(range(6))
    assert m["doc_count"] == doc_count0
    assert m["sum_ttf"] == sum_ttf0

    s1 = IndexSearcher(spark, tmp_index)
    assert _results(s1, qterms) == before


def test_partial_adjacent_merge_preserves_results(spark, corpus, qterms, tmp_index):
    _build(spark, corpus, tmp_index)
    before = _results(IndexSearcher(spark, tmp_index), qterms)
    SegmentMerger(spark, tmp_index).merge([2, 3, 4])
    m = load_manifest(tmp_index)
    assert [s["segment_id"] for s in m["segments"]] == [0, 1, 2, 5]
    assert _results(IndexSearcher(spark, tmp_index), qterms) == before


def test_maybe_merge_runs_policy_to_quiescence(spark, corpus, qterms, tmp_index):
    _build(spark, corpus, tmp_index, n_segments=8)
    before = _results(IndexSearcher(spark, tmp_index), qterms)
    done = maybe_merge(
        spark, tmp_index,
        TieredMergePolicy(floor_segment_bytes=1 << 30, segs_per_tier=2.0,
                          max_merge_at_once=4),
    )
    assert done, "uniform small segments must trigger at least one merge"
    m = load_manifest(tmp_index)
    assert len(m["segments"]) < 8
    assert _results(IndexSearcher(spark, tmp_index), qterms) == before


# ---------------------------------------------------------------------------
# deletes
# ---------------------------------------------------------------------------


def test_deletes_hidden_then_squeezed(spark, corpus, qterms, tmp_index):
    hi, mid, _ = qterms
    _build(spark, corpus, tmp_index, n_segments=4)
    s0 = IndexSearcher(spark, tmp_index)
    top = s0.search(TermQuery("text", hi), 5).collect()
    victims = [r["url"] for r in top[:2]]
    n_all = s0.count(TermQuery("text", hi))

    delete_by_keys(tmp_index, victims)
    s1 = IndexSearcher(spark, tmp_index)
    hits = s1.search(TermQuery("text", hi), 10).collect()
    assert not {r["url"] for r in hits} & set(victims)
    # live count drops by exactly the victims (both matched the term)
    assert s1.count(TermQuery("text", hi)) == n_all - 2
    # match_all honors deletes via the generic path
    assert s1.count(__import__("rucene_spark.query", fromlist=["MatchAllDocsQuery"])
                    .MatchAllDocsQuery()) == len(corpus) - 2

    # squeeze: merge all; tombstones consumed, stats recomputed
    force_merge(spark, tmp_index)
    m = load_manifest(tmp_index)
    assert m["doc_count"] == len(corpus) - 2
    assert m["segments"][0]["deleted_docs"] == 2
    from rucene_spark.merge import has_tombstones
    assert not has_tombstones(tmp_index)

    # the squeezed index must equal a fresh 1-segment build on the
    # surviving corpus: same global stats → identical scores per url
    import tempfile, shutil
    survivors = corpus[~corpus["url"].isin(victims)].reset_index(drop=True)
    fresh_dir = tempfile.mkdtemp(prefix="rucene_fresh_")
    try:
        IndexWriter(spark, fresh_dir, n_segments=1).build(
            spark.createDataFrame(survivors[["url", "text", "lang"]]))
        s_m = IndexSearcher(spark, tmp_index)
        s_f = IndexSearcher(spark, fresh_dir)
        assert s_m.doc_count == s_f.doc_count
        assert s_m.sum_ttf == s_f.sum_ttf
        for q in (TermQuery("text", hi),
                  BooleanQuery.build([], [TermQuery("text", hi),
                                          TermQuery("text", mid)], [], [])):
            # k > corpus size: compare the FULL match sets (a k cut could
            # split tied scores differently between the two doc orders)
            rm = {(r["url"], round(float(r["score"]), 5))
                  for r in s_m.search(q, 1000).collect()}
            rf = {(r["url"], round(float(r["score"]), 5))
                  for r in s_f.search(q, 1000).collect()}
            assert rm == rf
    finally:
        shutil.rmtree(fresh_dir, ignore_errors=True)


def test_delete_by_query(spark, corpus, qterms, tmp_index):
    """delete_documents_by_queries analogue: resolve a query to doc keys at
    delete time, buffer as tombstones (index_writer.rs:485-510)."""
    hi, mid, rare = qterms
    _build(spark, corpus, tmp_index, n_segments=4)
    s0 = IndexSearcher(spark, tmp_index)
    n_rare = s0.count(TermQuery("text", rare))
    rare_urls = {r["url"] for r in s0.search(TermQuery("text", rare), 1000).collect()}
    assert n_rare > 0

    n_del = delete_by_query(spark, tmp_index, TermQuery("text", rare))
    assert n_del == n_rare

    s1 = IndexSearcher(spark, tmp_index)
    assert s1.count(TermQuery("text", rare)) == 0
    # docs not matching the deleted query are unaffected
    hits = {r["url"] for r in s1.search(TermQuery("text", hi), 1000).collect()}
    assert hits == {
        r["url"] for r in s0.search(TermQuery("text", hi), 1000).collect()
    } - rare_urls

    # merge folds the query-resolved tombstones physically
    force_merge(spark, tmp_index)
    m = load_manifest(tmp_index)
    assert m["doc_count"] == len(corpus) - n_rare
    from rucene_spark.merge import has_tombstones
    assert not has_tombstones(tmp_index)


def test_delete_then_readd_not_hidden(spark, corpus, tmp_index):
    """Tombstones are generation-scoped (DocumentsWriterDeleteQueue
    sequence numbers): delete(k) then re-adding k must NOT hide the new
    doc, and a merge must not permanently drop it (ADVICE r1)."""
    from rucene_spark.query import MatchAllDocsQuery
    _build(spark, corpus, tmp_index, n_segments=4)
    victim = corpus["url"].iloc[0]
    delete_by_keys(tmp_index, [victim])

    s0 = IndexSearcher(spark, tmp_index)
    assert s0.count(MatchAllDocsQuery()) == len(corpus) - 1

    # re-add the SAME key with new content carrying a unique marker term
    import pandas as pd
    readd = pd.DataFrame({"url": [victim],
                          "text": ["zmarker zmarker tail"],
                          "lang": ["en"]})
    IndexWriter(spark, tmp_index, n_segments=4).add_documents(
        spark.createDataFrame(readd), n_segments=1)

    s1 = IndexSearcher(spark, tmp_index)
    # old copy hidden, new copy visible
    assert s1.count(MatchAllDocsQuery()) == len(corpus)
    hits = s1.search(TermQuery("text", "zmarker"), 5).collect()
    assert [r["url"] for r in hits] == [victim]

    # merge folds the OLD copy only; the re-added doc survives
    force_merge(spark, tmp_index)
    s2 = IndexSearcher(spark, tmp_index)
    assert s2.count(MatchAllDocsQuery()) == len(corpus)
    hits = s2.search(TermQuery("text", "zmarker"), 5).collect()
    assert [r["url"] for r in hits] == [victim]


def test_partial_merge_keeps_tombstone_for_outside_copy(spark, corpus, tmp_index):
    """A partial merge may only consume a tombstone if EVERY doc it can
    hide was inside the merged run; a copy of the key in a segment outside
    the run must stay hidden (ADVICE r1)."""
    from rucene_spark.merge import has_tombstones
    from rucene_spark.query import MatchAllDocsQuery
    _build(spark, corpus, tmp_index, n_segments=4)
    dup = corpus["url"].iloc[5]
    # second copy of the same key in a NEW delta segment (id 4)
    import pandas as pd
    readd = pd.DataFrame({"url": [dup], "text": ["zdup zdup"],
                          "lang": ["en"]})
    IndexWriter(spark, tmp_index, n_segments=4).add_documents(
        spark.createDataFrame(readd), n_segments=1)
    # delete AFTER both copies exist → hides both
    delete_by_keys(tmp_index, [dup])
    s0 = IndexSearcher(spark, tmp_index)
    assert s0.count(MatchAllDocsQuery()) == len(corpus) - 1
    assert s0.count(TermQuery("text", "zdup")) == 0

    # merge only the base run [0..3]: squeezes the original copy; the
    # tombstone must SURVIVE to keep the delta-segment copy hidden
    SegmentMerger(spark, tmp_index).merge([0, 1, 2, 3])
    assert has_tombstones(tmp_index)
    s1 = IndexSearcher(spark, tmp_index)
    assert s1.count(MatchAllDocsQuery()) == len(corpus) - 1
    assert s1.count(TermQuery("text", "zdup")) == 0

    # full merge finally consumes it
    force_merge(spark, tmp_index)
    assert not has_tombstones(tmp_index)
    s2 = IndexSearcher(spark, tmp_index)
    assert s2.count(MatchAllDocsQuery()) == len(corpus) - 1


def test_manifest_is_the_commit_point(spark, corpus, qterms, tmp_index):
    """Readers follow the manifest's dir list: orphaned/staged dirs from a
    crashed merge are invisible, and gc_index removes them (the Lucene
    publish order: new files, swap commit point, drop old files)."""
    import os
    from rucene_spark.build import gc_index, load_manifest, seg_dir
    _build(spark, corpus, tmp_index, n_segments=4)
    before = _results(IndexSearcher(spark, tmp_index), qterms)

    # simulate a crashed merge: garbage staged dirs inside the table trees
    for t in ("postings", "docmeta", "segstats"):
        os.makedirs(os.path.join(tmp_index, t, "seg-0-mdeadbeef"))
        with open(os.path.join(tmp_index, t, "seg-0-mdeadbeef",
                               "part-0.parquet"), "wb") as fh:
            fh.write(b"not a parquet file")
    os.makedirs(os.path.join(tmp_index, "tmpstage-dels-crashed"))
    assert _results(IndexSearcher(spark, tmp_index), qterms) == before

    removed = gc_index(tmp_index)
    assert any("seg-0-mdeadbeef" in r for r in removed)
    assert any("tmpstage-dels-crashed" in r for r in removed)
    assert _results(IndexSearcher(spark, tmp_index), qterms) == before

    # a real merge: all input dirs gone, output dir manifest-listed
    m0 = load_manifest(tmp_index)
    old_dirs = {seg_dir(s) for s in m0["segments"]}
    SegmentMerger(spark, tmp_index).merge([1, 2])
    m1 = load_manifest(tmp_index)
    live = {seg_dir(s) for s in m1["segments"]}
    on_disk = set(os.listdir(os.path.join(tmp_index, "postings")))
    assert on_disk == live
    assert not (old_dirs - {seg_dir(s) for s in m0["segments"]
                            if s["segment_id"] not in (1, 2)}) & on_disk
    assert _results(IndexSearcher(spark, tmp_index), qterms) == before


def test_merge_with_bulk_tombstone_file(spark, corpus, qterms, tmp_index):
    """10^5-key tombstone file: the merge-delete path must stay distributed
    (resolution via join + partitioned side parquet, no per-doc collect)."""
    import numpy as np
    hi, _, _ = qterms
    _build(spark, corpus, tmp_index, n_segments=4)
    s0 = IndexSearcher(spark, tmp_index)
    top = s0.search(TermQuery("text", hi), 3).collect()
    victims = [r["url"] for r in top[:2]]
    bulk = [f"https://absent{i:06d}.example/x" for i in range(100_000)]
    delete_by_keys(tmp_index, victims + bulk)

    force_merge(spark, tmp_index)
    m = load_manifest(tmp_index)
    assert m["doc_count"] == len(corpus) - 2
    assert m["segments"][0]["deleted_docs"] == 2
    s1 = IndexSearcher(spark, tmp_index)
    assert not {r["url"] for r in s1.search(TermQuery("text", hi), 20)
                .collect()} & set(victims)


def test_phrase_positions_survive_merge_with_deletes(spark, corpus, tmp_index):
    # a real bigram from the corpus (same choice rule as the query set)
    longest = corpus.loc[corpus["text"].str.len().idxmax(), "text"].split(" ")
    b1, b2 = longest[0], longest[1]
    _build(spark, corpus, tmp_index, n_segments=4)
    s0 = IndexSearcher(spark, tmp_index)
    q = PhraseQuery.build("text", [b1, b2], slop=0)
    before = [(r["url"], round(float(r["score"]), 5))
              for r in s0.search(q, 20).collect()]
    assert before, "bigram must match at least its source doc"
    # delete an unrelated doc so position repacking paths run with a mask
    victim = corpus.loc[~corpus["url"].isin([u for u, _ in before]), "url"].iloc[0]
    delete_by_keys(tmp_index, [victim])
    force_merge(spark, tmp_index)
    s1 = IndexSearcher(spark, tmp_index)
    after_urls = [r["url"] for r in s1.search(q, 20).collect()]
    assert after_urls == [u for u, _ in before]


def _run_maintenance_fuzz(spark, d: str, seed: int, steps: int = 8) -> None:
    """Seeded fuzz of the maintenance surface: a random interleaving of
    add_documents / delete_by_keys / update_documents / update_doc_values
    / maybe_merge must keep the searcher's LIVE view (hit sets + counts +
    doc-values) equal to a plain Python model of
    latest-version-per-key minus deletes, at every step. The rank check
    covers the gen-scoped DV overlay: an update followed by
    delete+re-add of the same key must expose the NEW stored value, and
    merges must fold applicable overlays physically.
    (Scores are deliberately not compared: collection stats stay stale
    until merges fold deletes out, exactly like Lucene.)"""
    import numpy as np

    from pyspark.sql import functions as F

    from rucene_spark.build import IndexWriter
    from rucene_spark.merge import (TieredMergePolicy, delete_by_keys,
                                    maybe_merge, update_doc_values)
    from rucene_spark.query import MatchAllDocsQuery, TermQuery
    from rucene_spark.search import IndexSearcher

    rng = np.random.default_rng(seed)
    probes = [f"m{j}" for j in range(4)]

    def text_for(key, version):
        toks = ["base"] + [p for j, p in enumerate(probes)
                           if (key + version + j) % 3 == 0] + [f"v{version}"]
        return " ".join(toks)

    def rank_for(key, version):
        return key * 100 + version

    expected = {i: text_for(i, 0) for i in range(30)}
    versions = {i: 0 for i in range(30)}
    ranks = {i: rank_for(i, 0) for i in range(30)}
    writer = IndexWriter(spark, d, n_segments=4, key_col="doc_id")
    writer.build(spark.createDataFrame(
        [(k, t, ranks[k]) for k, t in expected.items()],
        "doc_id long, text string, rank long"))
    next_key = 30

    def check():
        s = IndexSearcher(spark, d)
        assert s.count(MatchAllDocsQuery()) == len(expected)
        for p in probes:
            want = {k for k, t in expected.items() if p in t.split(" ")}
            got = {r["doc_id"] for r in
                   s.search(TermQuery("text", p), 1000).collect()}
            assert got == want, (p, got ^ want)
        got_ranks = {r["doc_id"]: r["rank"] for r in
                     s.search_sorted(MatchAllDocsQuery(), [F.col("doc_id")],
                                     k=1000).collect()}
        assert got_ranks == ranks, {
            k: (got_ranks.get(k), ranks.get(k))
            for k in set(got_ranks) | set(ranks)
            if got_ranks.get(k) != ranks.get(k)}

    for step in range(steps):
        op = int(rng.integers(0, 5))
        if op == 0:                                   # add new docs
            batch = {}
            for _ in range(int(rng.integers(2, 6))):
                batch[next_key] = text_for(next_key, 0)
                versions[next_key] = 0
                ranks[next_key] = rank_for(next_key, 0)
                next_key += 1
            expected.update(batch)
            writer.add_documents(spark.createDataFrame(
                [(k, t, ranks[k]) for k, t in batch.items()],
                "doc_id long, text string, rank long"), n_segments=1)
        elif op == 1 and expected:                    # delete some keys
            keys = list(rng.choice(sorted(expected), size=min(
                int(rng.integers(1, 4)), len(expected)), replace=False))
            for k in keys:
                expected.pop(int(k))
                ranks.pop(int(k))
            delete_by_keys(d, [int(k) for k in keys])
        elif op == 2 and expected:                    # update (new version)
            keys = [int(k) for k in rng.choice(
                sorted(expected), size=min(2, len(expected)), replace=False)]
            batch = {}
            for k in keys:
                versions[k] += 1
                batch[k] = text_for(k, versions[k])
                ranks[k] = rank_for(k, versions[k])  # re-add resets rank
            expected.update(batch)
            writer.update_documents(spark.createDataFrame(
                [(k, t, ranks[k]) for k, t in batch.items()],
                "doc_id long, text string, rank long"), n_segments=1)
        elif op == 3 and expected:                    # DV update in place
            keys = [int(k) for k in rng.choice(
                sorted(expected), size=min(2, len(expected)), replace=False)]
            upd = {k: 10_000 + int(rng.integers(0, 1000)) for k in keys}
            for k, v in upd.items():
                ranks[k] = v
            update_doc_values(d, "rank", upd)
        else:                                         # merge to quiescence
            maybe_merge(spark, d, TieredMergePolicy(
                floor_segment_bytes=1 << 30, segs_per_tier=2.0,
                max_merge_at_once=4))
        check()

    maybe_merge(spark, d, TieredMergePolicy(
        floor_segment_bytes=1 << 30, segs_per_tier=2.0, max_merge_at_once=4))
    check()


def test_randomized_maintenance_sequence(spark, tmp_path_factory):
    """One fuzz seed in CI; more seeds via MAINT_FUZZ_SEEDS (comma-sep)
    or tools/fuzz_maintenance.py — this pattern found two real bugs in
    round 2 that the targeted tests missed."""
    import os

    seeds = [int(x) for x in
             os.environ.get("MAINT_FUZZ_SEEDS", "11").split(",")]
    for seed in seeds:
        _run_maintenance_fuzz(
            spark, str(tmp_path_factory.mktemp(f"fuzz_maint_{seed}")), seed)


def test_merge_with_tombstones_that_miss_the_run(spark, tmp_path_factory):
    """Tombstones exist but none hit the merged run (the deleted key lives
    only in a delta segment outside it): the merge must succeed (an empty
    deleted-docs side parquet is never staged), and the tombstone must
    SURVIVE to keep hiding the outside doc."""
    from rucene_spark.build import IndexWriter
    from rucene_spark.merge import SegmentMerger, delete_by_keys
    from rucene_spark.query import MatchAllDocsQuery
    from rucene_spark.search import IndexSearcher

    d = str(tmp_path_factory.mktemp("miss_run"))
    base = [(i, f"base b{i}") for i in range(10)]
    writer = IndexWriter(spark, d, n_segments=2, key_col="doc_id",
                         partitioner="range")
    writer.build(spark.createDataFrame(base, "doc_id long, text string"))
    writer.add_documents(spark.createDataFrame(
        [(100, "delta only")], "doc_id long, text string"), n_segments=1)
    delete_by_keys(d, [100])          # hits only the delta segment

    assert IndexSearcher(spark, d).count(MatchAllDocsQuery()) == 10
    SegmentMerger(spark, d).merge([0, 1])   # run = the two base segments
    s = IndexSearcher(spark, d)
    assert s.count(MatchAllDocsQuery()) == 10   # 100 still hidden
