#!/usr/bin/env python
"""Doc-range-sharded merge vs single-file merge: query latency A/B.

The worst case for the one-file-per-segment layout is a fully merged
index: one segment = one scan task, 31 of 32 cores idle
(BENCH_10M_QUIESCE.json: span_near 4.3s over 64 segments -> 16.2s over
11). This bench builds N docs, merges EVERYTHING into one segment twice
from the same pre-merge index — once with max_shards=1 (the old layout)
and once with the default doc-range sharding — and times the query
suite on both.

Writes BENCH_SHARD.json; prints one JSON line.

Env: BSHARD_DOCS (default 1_000_000), BSHARD_CPUS (32),
     BSHARD_PARTS (64), BSHARD_OUT (BENCH_SHARD.json).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DOCS = int(os.environ.get("BSHARD_DOCS", "1000000"))
CPUS = int(os.environ.get("BSHARD_CPUS", "32"))
N_PARTS = int(os.environ.get("BSHARD_PARTS", "64"))
OUT = os.environ.get("BSHARD_OUT", "BENCH_SHARD.json")
TMPFS = os.environ.get(
    "BSHARD_TMP",
    "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir())


def main() -> None:
    from pyspark.sql import SparkSession

    work = tempfile.mkdtemp(prefix="benchshard_", dir=TMPFS)
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("rucene-bench-shard")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.local.dir", os.path.join(work, "spark-local"))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    stages: dict[str, float] = {}
    out: dict = {"docs": DOCS, "cpus": CPUS, "stages": stages}

    try:
        # ---- distributed corpus generation (bench_1m recipe)
        t0 = time.time()
        per_part = DOCS // N_PARTS
        corpus_dir = os.path.join(work, "corpus")

        def gen(batches):
            from rucene_spark.webtext import make_corpus
            for pdf in batches:
                for pid in pdf["id"].tolist():
                    part = make_corpus(per_part, seed=1000 + int(pid))
                    part["url"] = [
                        f"https://p{int(pid):03d}.example/{i:08x}"
                        for i in range(len(part))
                    ]
                    yield part[["url", "warc_ts", "html", "text", "lang"]]

        (spark.range(N_PARTS).repartition(N_PARTS, "id")
         .mapInPandas(gen, "url string, warc_ts timestamp, html binary,"
                           " text string, lang string")
         .write.mode("overwrite").parquet(corpus_dir))
        docs = spark.read.parquet(corpus_dir)
        out["docs_actual"] = docs.count()
        stages["generate"] = round(time.time() - t0, 2)

        from rucene_spark import storage
        from rucene_spark.build import IndexWriter, load_manifest
        from rucene_spark.merge import SegmentMerger
        from rucene_spark.search import IndexSearcher

        idx = os.path.join(work, "idx")
        t0 = time.time()
        IndexWriter(spark, idx, n_segments=N_PARTS, key_col="url",
                    partitioner="hash").build(docs)
        stages["build"] = round(time.time() - t0, 2)

        idx1 = os.path.join(work, "idx_singlefile")
        shutil.copytree(idx, idx1)
        run = [s["segment_id"] for s in load_manifest(idx)["segments"]]

        t0 = time.time()
        SegmentMerger(spark, idx1, max_shards=1).merge(run)
        stages["merge_singlefile"] = round(time.time() - t0, 2)
        t0 = time.time()
        row = SegmentMerger(spark, idx).merge(run)  # default 128MiB shards
        stages["merge_sharded"] = round(time.time() - t0, 2)
        p = os.path.join(idx, "postings", row["dir"])
        out["shard_files"] = sum(
            f.endswith(".parquet") for f in storage.listdir(p))
        out["doc_sharded"] = bool(row.get("doc_sharded"))

        from rucene_spark.query import (
            BooleanQuery,
            DisjunctionMaxQuery,
            PhraseQuery,
            SpanNearQuery,
            SpanTermQuery,
            TermQuery,
        )
        hi, mid, lo = "t000000", "t000050", "t002000"

        def make_suite(s):
            return {
                "term_topk": lambda: s.search(
                    TermQuery("text", hi), 10).collect(),
                "stopword_phrase": lambda: s.search(
                    PhraseQuery.build("text", [hi, "t000001"], slop=0),
                    10).collect(),
                "bool_must": lambda: s.search(
                    BooleanQuery.build(
                        [TermQuery("text", hi), TermQuery("text", mid)],
                        [], [], []), 10).collect(),
                "dismax": lambda: s.search(
                    DisjunctionMaxQuery(
                        [TermQuery("text", hi), TermQuery("text", mid)],
                        0.3), 10).collect(),
                "blockmax": lambda: s.search_blockmax(
                    [hi, mid, lo], 10).collect(),
                "span_near": lambda: s.search(
                    SpanNearQuery([SpanTermQuery("text", hi),
                                   SpanTermQuery("text", "t000001")],
                                  slop=3, in_order=True), 10).collect(),
            }

        results: dict[str, list] = {}
        for prefix, d in (("single_", idx1), ("shard_", idx)):
            s = IndexSearcher(spark, d,
                              verify_candidate_cap=max(2_000_000, 2 * DOCS))
            s.warmup()
            for name, fn in make_suite(s).items():
                fn()  # warm
                s._plan_cache.clear()
                t0 = time.time()
                rows = fn()
                stages[f"{prefix}{name}"] = round(time.time() - t0, 2)
                results.setdefault(name, []).append(
                    [(r["url"], round(float(r["score"]), 4)) for r in rows])
        # layout must be purely physical: identical results on both
        mismatches = [n for n, (a, b) in results.items() if a != b]
        out["result_mismatches"] = mismatches

        speedups = {
            n: round(stages[f"single_{n}"] / stages[f"shard_{n}"], 2)
            for n in make_suite(None) if stages.get(f"shard_{n}", 0) > 0
        }
        out["speedup"] = speedups
        with open(os.path.join(REPO, OUT), "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
