#!/usr/bin/env python
"""Query-cache ON/OFF A/B at corpus scale (round-4 VERDICT 'Next round #9').

The LRUQueryCache landed default-OFF, matching the reference
(searcher.rs:696-701 constructs no cache unless one is supplied); its win
was unmeasured at scale.  This tool measures it: a filter-heavy workload
(the reference cache's design target — filter-context subtrees reused
across many scoring queries, query_cache.rs:416-456) served twice on the
same prebuilt index:

  OFF  IndexSearcher with no cache (the default)
  ON   IndexSearcher with LRUQueryCache + UsageTrackingQueryCachingPolicy
       (the reference's production policy: 2/5/20 usage thresholds)

Workload: F filter clauses (lang ranges — a 'tenant' or 'corpus slice'
filter every serving tier has) x T scoring terms spread across the df
spectrum = F*T boolean queries, each must=[term], filter=[slice].  Every
filter recurs T times, far past the policy thresholds, so the ON side
populates on first touch and serves the remaining (T-1) uses of each
filter from the persisted (seg, doc) set.  Plan memos are cleared
between timed passes (stage reuse would time only the final merge);
term-stats memoization stays (both sides benefit identically).

Reports per-pass wall, per-side medians, ON-side hit/miss/cache counts,
and the ON/OFF latency ratio.  Cache stays default-OFF in the library.

Env: BENCHC_DOCS (default 10_000_000), BENCHC_CPUS (32), BENCHC_PARTS
     (512), BENCHC_ANALYZER (whitespace), BENCHC_TERMS (24 per filter),
     BENCHC_PASSES (3 timed passes per side), BENCHC_OUT
     (BENCH_CACHE_10M.json), BENCHC_IDX (reuse a prebuilt index dir,
     skipping generate+build).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DOCS = int(os.environ.get("BENCHC_DOCS", "10000000"))
CPUS = int(os.environ.get("BENCHC_CPUS", "32"))
N_PARTS = int(os.environ.get("BENCHC_PARTS", "512"))
ANALYZER = os.environ.get("BENCHC_ANALYZER", "whitespace")
N_TERMS = int(os.environ.get("BENCHC_TERMS", "24"))
PASSES = int(os.environ.get("BENCHC_PASSES", "3"))
OUT = os.environ.get("BENCHC_OUT", "BENCH_CACHE_10M.json")
IDX = os.environ.get("BENCHC_IDX", "")
TMPFS = os.environ.get(
    "BENCHC_TMP",
    "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir())


def main() -> None:
    from pyspark.sql import SparkSession

    t_all = time.time()
    work = tempfile.mkdtemp(prefix="benchcache_", dir=TMPFS)
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("rucene-bench-cache")
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
    out: dict = {"docs": DOCS, "cpus": CPUS, "analyzer": ANALYZER,
                 "stages": stages}

    try:
        if IDX:
            idx = IDX
            out["index"] = "reused"
        else:
            # ---- generate + build, same distributed shape as bench_1m
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
            stages["generate"] = round(time.time() - t0, 2)
            docs = spark.read.parquet(corpus_dir)

            from rucene_spark.build import IndexWriter
            idx = os.path.join(work, "idx")
            t0 = time.time()
            IndexWriter(spark, idx, n_segments=N_PARTS, key_col="url",
                        partitioner="hash", analyzer=ANALYZER).build(docs)
            stages["build"] = round(time.time() - t0, 2)

        from rucene_spark.cache import (
            LRUQueryCache,
            UsageTrackingQueryCachingPolicy,
        )
        from rucene_spark.query import BooleanQuery, RangeQuery, TermQuery
        from rucene_spark.search import IndexSearcher

        # F lang-slice filters x T scoring terms; terms stride the df
        # spectrum (t000000 hottest) so the scoring side isn't one shape
        filters = [RangeQuery("lang", lo, lo) for lo in ("en", "zh", "de")]
        terms = [f"t{(7 * i) % 3000:06d}" for i in range(N_TERMS)]
        workload = [
            BooleanQuery.build([TermQuery("text", t)], [], [f], [])
            for f in filters for t in terms
        ]
        out["workload"] = {"filters": len(filters), "terms": N_TERMS,
                           "queries": len(workload)}

        def serve(searcher, label: str) -> list[float]:
            walls = []
            for p in range(PASSES):
                searcher._plan_cache.clear()
                t0 = time.time()
                for q in workload:
                    searcher.search(q, 10).collect()
                walls.append(round(time.time() - t0, 2))
                stages[f"{label}_pass{p}"] = walls[-1]
            return walls

        # ---- OFF side (library default: no cache)
        s_off = IndexSearcher(spark, idx, scoring="lucene")
        for q in workload[:6]:
            s_off.search(q, 10).collect()       # JVM/code-path warm-up
        off_walls = serve(s_off, "off")

        # ---- ON side: reference production policy + cache
        cache = LRUQueryCache(max_size=64)
        s_on = IndexSearcher(spark, idx, scoring="lucene",
                             query_cache=cache,
                             caching_policy=UsageTrackingQueryCachingPolicy())
        t0 = time.time()
        for q in workload:
            s_on.search(q, 10).collect()        # usage history + populate
        stages["on_populate"] = round(time.time() - t0, 2)
        on_walls = serve(s_on, "on")

        off_med = statistics.median(off_walls)
        on_med = statistics.median(on_walls)
        out["off_pass_secs"] = off_walls
        out["on_pass_secs"] = on_walls
        out["off_median_secs"] = off_med
        out["on_median_secs"] = on_med
        out["on_over_off"] = round(on_med / off_med, 3)
        out["per_query_ms"] = {
            "off": round(1000 * off_med / len(workload), 1),
            "on": round(1000 * on_med / len(workload), 1),
        }
        out["cache_stats"] = {
            "hits": cache.hit_count, "misses": cache.miss_count,
            "cached_sets": cache.cache_count,
            "evictions": cache.eviction_count, "entries": len(cache),
        }
        out["total_secs"] = round(time.time() - t_all, 2)
        with open(os.path.join(REPO, OUT), "w") as fh:
            json.dump(out, fh, indent=1)
        print(json.dumps(out))
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
