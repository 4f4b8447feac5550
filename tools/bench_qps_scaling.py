#!/usr/bin/env python
"""Query-SERVING throughput scaling at two core counts (north_rule evidence).

The build-side scaling bench (tools/bench_scaling.py) measures indexing
throughput at N and 4N cores. This tool measures the other half of
BASELINE.json's metric — BM25 top-k query serving — as a THROUGHPUT:
a fixed batch of reference-set queries is served by a pool of concurrent
driver threads (2 x cores streams, the realistic serving shape: a search
tier runs many queries at once, not one query hogging the cluster), on
the SAME prebuilt index, at ``local[N]`` and ``local[4N]``.  Reports
queries/sec at both levels plus scaling efficiency
``qps(4N) / (4 x qps(N))``.

Per-level flow: fresh spark-submit-equivalent subprocess (so each level
gets its own JVM sized to its core count), warm-up pass over every query
class, then ``SCALE_QPS_PASSES`` timed passes over the whole batch.

Environment:
  SCALE_QPS_DOCS    corpus size               (default 240000)
  SCALE_QPS_N       small core count          (default 2; big = 4N)
  SCALE_QPS_PASSES  timed passes per level    (default 3)
  SCALE_QPS_OUT     output JSON filename      (default BENCH_QPS_SCALING.json)
  SCALE_QPS_MODE    "threads" (local[N] vs local[4N], default) or
                    "executors": serve through Spark's local-cluster
                    master — 1 vs 4 SEPARATE executor JVMs with
                    SCALE_QPS_EXEC_CORES cores each (default 1, the
                    regime where the shared host can actually grant the
                    big level its cores — see BENCH_SCALING_EXEC*.json),
                    the north_rule's literal "N and 4N executors" for
                    the serving axis.
  SCALE_QPS_COOLDOWN  seconds to idle before each subprocess (default 20)
  SCALE_QPS_CTL_SECS  target duration of each no-Spark control run (12)

Throttle-neutral protocol (round-5): the sandbox host grants CPU in a
burst-then-throttle pattern (BENCH_QPS_EXEC.json round-4: both levels
decline run-over-run, same code; 2.1x qps spread), so a fixed
small-then-big order biases whichever level runs second. Three
controls:
  * the level ORDER alternates per round (round 0 small->big, round 1
    big->small, ...), so the throttle tax is paid symmetrically;
  * a COOLDOWN idles the host before every subprocess so each
    measurement starts from the same thermal/cgroup budget state;
  * a paired NO-SPARK CONTROL runs adjacent to every Spark
    measurement: a multiprocessing pool at the same process count
    decodes+scores real FOR/varint postings blocks (the serving hot
    kernel) and reports items/sec.  ctl(4N)/(4*ctl(N)) per round is
    the host's actual 1->4 capacity grant in that window; the job's
    paired efficiency normalized by it (job/ceiling) isolates plan
    scaling from host weather — same estimator the build axis uses
    (tools/bench_scaling.py no_spark_control).

Writes {repo}/BENCH_QPS_SCALING.json and prints it.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = int(os.environ.get("SCALE_QPS_DOCS", "240000"))
N_SMALL = int(os.environ.get("SCALE_QPS_N", "2"))
N_BIG = 4 * N_SMALL
PASSES = int(os.environ.get("SCALE_QPS_PASSES", "3"))
TMPFS = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
MODE = os.environ.get("SCALE_QPS_MODE", "threads")
EXEC_CORES = int(os.environ.get("SCALE_QPS_EXEC_CORES", "1"))
EXEC_MEM_MB = int(os.environ.get("SCALE_QPS_EXEC_MEM_MB", "8192"))
# level values: core counts in threads mode, executor counts in
# executors mode; the big level is 4x the small either way, so the
# efficiency divisor stays 4

# executors mode: SCALE_QPS_EXEC_BASE sets the small executor count
# (default 1 → 1 vs 4). A larger base (2 vs 8) shrinks the relative
# contribution of the UNBOUNDED driver JVM (result merge + planning
# threads run on host cores outside the executor grant, worth a
# roughly constant ~1 core at both levels — which inflates the small
# level's qps most when its own grant is smallest).
EXEC_BASE = int(os.environ.get("SCALE_QPS_EXEC_BASE", "1"))
LEVELS = ((EXEC_BASE, 4 * EXEC_BASE) if MODE == "executors"
          else (N_SMALL, N_BIG))
COOLDOWN = float(os.environ.get("SCALE_QPS_COOLDOWN", "20"))
CTL_SECS = float(os.environ.get("SCALE_QPS_CTL_SECS", "12"))


def _procs(level: int) -> int:
    """Host-parallelism equivalent of a level, for the no-Spark control."""
    return level * EXEC_CORES if MODE == "executors" else level


# --- no-Spark qps control: the serving hot kernel, no Spark ----------------
#
# Each work item decodes one FOR+varint-packed postings block set and
# BM25-scores it to a top-10 (the per-(query, segment) collector kernel's
# inner work, rucene_spark/search.py). The pool size matches the Spark
# level's total task slots; items/sec at 4N over 4x items/sec at N is the
# host's real capacity grant for THIS shape of work in THIS window.

_CTL_BLOBS = None


def _qps_ctl_init():
    global _CTL_BLOBS
    sys.path.insert(0, REPO)
    import numpy as np

    from rucene_spark.codec import pack_ints

    rng = np.random.default_rng(42)
    blobs = []
    for _ in range(8):
        gaps = rng.integers(1, 40, size=100_000).astype(np.int64)
        tfs = rng.integers(1, 11, size=100_000).astype(np.int64)
        blobs.append((pack_ints(gaps), pack_ints(tfs), len(gaps)))
    _CTL_BLOBS = blobs


def _qps_ctl_item(_i):
    import numpy as np

    from rucene_spark.bm25 import DEFAULT_K1
    from rucene_spark.codec import unpack_ints

    top = None
    for enc_gaps, enc_tfs, n in _CTL_BLOBS:
        gaps = unpack_ints(enc_gaps, n)
        docs = np.cumsum(gaps)
        tf = unpack_ints(enc_tfs, n).astype(np.float32)
        norm = np.float32(1.2)
        score = np.float32(2.5) * (
            tf / (tf + np.float32(DEFAULT_K1) * norm))
        k = min(10, n)
        idx = np.argpartition(score, -k)[-k:]
        top = docs[idx]
    return int(top[0])


def _qps_control(n_procs: int) -> dict:
    """items/sec for the serving kernel at n_procs pinned workers."""
    with mp.Pool(n_procs, initializer=_qps_ctl_init) as pool:
        # calibrate: first map absorbs worker-init (blob encode), the
        # second times one item per worker; the timed batch is then
        # sized to run ~CTL_SECS so every control sees the same window
        pool.map(_qps_ctl_item, range(n_procs))
        t0 = time.time()
        pool.map(_qps_ctl_item, range(n_procs))
        per_item = max(1e-3, (time.time() - t0))
        n_items = max(n_procs * 2, int(CTL_SECS / per_item * n_procs))
        t0 = time.time()
        pool.map(_qps_ctl_item, range(n_items))
        wall = time.time() - t0
    return {"procs": n_procs, "items": n_items,
            "items_per_sec": round(n_items / wall, 2),
            "wall_secs": round(wall, 2)}


def _master(level: int) -> str:
    if MODE == "executors":
        return f"local-cluster[{level},{EXEC_CORES},{EXEC_MEM_MB}]"
    return f"local[{level}]"

_WORKER = r"""
import json, os, sys, time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.environ["RS_REPO"])
master = os.environ["RS_MASTER"]
cores = int(os.environ["RS_CORES"])  # total task slots at this level
passes = int(os.environ["RS_PASSES"])

from pyspark.sql import SparkSession

from rucene_spark.query import QueryStringQueryBuilder
from rucene_spark.search import IndexSearcher

builder = (SparkSession.builder.master(master)
           .appName(f"rucene-qps-{master}")
           .config("spark.sql.shuffle.partitions", str(cores))
           .config("spark.scheduler.mode", "FAIR")
           .config("spark.ui.enabled", "false")
           .config("spark.local.dir", os.environ["RS_TMP"])
           .config("spark.driver.memory", "16g"))
if master.startswith("local-cluster"):
    # separate executor JVMs: ship the package path to their python
    # workers and size their heaps inside the worker capacity
    builder = (builder
               .config("spark.executor.memory",
                       os.environ.get("RS_EXEC_MEM", "6g"))
               .config("spark.executorEnv.PYTHONPATH",
                       os.environ["RS_REPO"]))
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

searcher = IndexSearcher(spark, os.environ["RS_INDEX"])
qs_list = json.loads(os.environ["RS_QUERIES"])
queries = [QueryStringQueryBuilder(qs, [("text", 1.0)]).build()
           for qs in qs_list]

# Micro-batch serving (IndexSearcher.search_many): a throughput tier
# aggregates concurrent requests into micro-batches — ONE distributed
# job per batch instead of one per query, so per-job driver dispatch (a
# fixed, core-count-independent cost) is amortized over the whole batch
# and the measured scaling reflects cluster work, not the dispatch
# floor.  Each serve call takes a DISTINCT batch from the pool and the
# plan cache is cleared between passes: re-collecting one cached
# DataFrame would let Spark skip the already-materialized shuffle map
# stages (stage reuse), timing only the final merge — a serving tier
# sees NEW queries every batch, so every timed collect here re-runs the
# scan + decode + score work.  Term-stats memoization across batches is
# kept (a real tier caches df/ttf the same way).  Concurrency (streams)
# and offered load are IDENTICAL at both levels.
bs = int(os.environ.get("RS_BATCH", "32"))
batches = [queries[i:i + bs] for i in range(0, len(queries), bs)]

def serve_batch(bi):
    return searcher.search_many(batches[bi], 10).collect()

# Offered load: fixed RS_STREAMS, or RS_STREAMS_PER_CORE x task slots
# (saturation mode). A fixed stream count that doesn't saturate the BIG
# level measures closed-loop latency, not capacity — at 1 executor,
# 4->8 streams raised qps 7.4->12.8 on identical code, proving 4
# streams starved even the SMALL level. Under per-core load both
# levels run at capacity and the qps ratio is the capacity ratio the
# north rule's throughput criterion asks about.
_spc = int(os.environ.get("RS_STREAMS_PER_CORE", "0"))
n_streams = _spc * cores if _spc else int(os.environ.get("RS_STREAMS", "4"))
with ThreadPoolExecutor(n_streams) as pool:
    list(pool.map(serve_batch, range(len(batches))))  # warm-up
    walls = []
    for _ in range(passes):
        searcher._plan_cache.clear()   # force fresh jobs (see above)
        t0 = time.time()
        list(pool.map(serve_batch, range(len(batches))))
        walls.append(time.time() - t0)

n_served = len(queries)
print(json.dumps({
    "cores": cores,
    "streams": n_streams,
    "batch_size": bs,
    "queries_per_pass": n_served,
    "wall_secs_runs": [round(w, 3) for w in walls],
    "qps_runs": [round(n_served / w, 3) for w in walls],
}))
"""


def main() -> None:
    sys.path.insert(0, REPO)
    corpus = f"/tmp/rucene_scale_corpus_{DOCS}.parquet"
    if not os.path.exists(corpus):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "rucene_spark", "cli.py"),
             "corpus", "--docs", str(DOCS), "--out", corpus],
            check=True, capture_output=True, text=True, timeout=1800,
            env=dict(os.environ, PYTHONPATH=REPO))

    # one shared index, built once at the BIG level (build scaling is the
    # other tool's job; serving reads the same files at both levels)
    idx = os.path.join(TMPFS, f"rucene-qps-idx-{DOCS}")
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        from pyspark.sql import SparkSession

        from rucene_spark.build import IndexWriter

        spark = (SparkSession.builder.master(f"local[{N_BIG}]")
                 .config("spark.sql.shuffle.partitions", str(N_BIG))
                 .config("spark.ui.enabled", "false")
                 .config("spark.local.dir", f"{TMPFS}/spark-qps-tmp")
                 .getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        docs = spark.read.parquet(corpus)
        IndexWriter(spark, idx, n_segments=64, key_col="url").build(docs)
        spark.stop()

    # query set from a same-distribution sample (deterministic): the 22
    # reference shapes plus strided spectrum queries up to SCALE_QPS_NQ —
    # a batch must carry enough distinct work per job that dispatch
    # latency (fixed per job) is amortized, or "scaling" measures only
    # the dispatch floor
    import pyarrow.parquet as pq

    from rucene_spark.webtext import make_query_strings_large

    sample = pq.read_table(corpus, columns=["text"]).slice(0, 4000).to_pandas()
    qs_list = make_query_strings_large(
        sample, int(os.environ.get("SCALE_QPS_NQ", "200")))

    results: dict = {
        "docs": DOCS,
        "mode": MODE,
        "levels": [_master(lvl) for lvl in LEVELS],
        "query_set_size": len(qs_list),
    }
    # Throttle-neutral protocol (see module docstring): per round the
    # level ORDER alternates, every subprocess is preceded by a cooldown
    # idle, and a no-Spark control runs adjacent to each measurement —
    # same paired-ratio + host-ceiling estimators as the build axis.
    rounds = int(os.environ.get("SCALE_QPS_ROUNDS", "3"))
    by_level: dict[int, list] = {lvl: [] for lvl in LEVELS}
    round_meds: dict[int, list] = {lvl: [] for lvl in LEVELS}
    ctl_by_level: dict[int, list] = {lvl: [] for lvl in LEVELS}
    streams: dict[int, int] = {}
    for rnd in range(rounds):
        order = LEVELS if rnd % 2 == 0 else tuple(reversed(LEVELS))
        for lvl in order:
            time.sleep(COOLDOWN)
            env = dict(os.environ, RS_REPO=REPO, RS_CORES=str(_procs(lvl)),
                       RS_MASTER=_master(lvl),
                       RS_PASSES=str(PASSES), RS_INDEX=idx,
                       RS_TMP=f"{TMPFS}/spark-qps-tmp",
                       RS_QUERIES=json.dumps(qs_list))
            out = subprocess.run([sys.executable, "-c", _WORKER], env=env,
                                 capture_output=True, text=True, timeout=7200)
            if out.returncode != 0:
                raise RuntimeError(out.stderr[-4000:])
            r = json.loads(out.stdout.strip().splitlines()[-1])
            by_level[lvl].append(statistics.median(r["qps_runs"]))
            round_meds[lvl].append(statistics.median(r["qps_runs"]))
            streams[lvl] = r["streams"]
            ctl = _qps_control(_procs(lvl))
            ctl_by_level[lvl].append(ctl["items_per_sec"])
            print(f"round {rnd} {_master(lvl)}:"
                  f" {round_meds[lvl][-1]} qps,"
                  f" ctl {ctl['items_per_sec']} items/s", file=sys.stderr)

    paired = [round(b / (4.0 * a), 3)
              for a, b in zip(round_meds[LEVELS[0]], round_meds[LEVELS[1]])]
    ctl_paired = [round(b / (4.0 * a), 3)
                  for a, b in zip(ctl_by_level[LEVELS[0]],
                                  ctl_by_level[LEVELS[1]])]
    job_over_ceiling = [round(p / c, 3) if c > 0 else None
                        for p, c in zip(paired, ctl_paired)]
    med = {c: statistics.median(by_level[c]) for c in LEVELS}
    eff = med[LEVELS[1]] / (4.0 * med[LEVELS[0]])
    results["protocol"] = {
        "order": "alternating per round",
        "cooldown_secs": COOLDOWN,
        "control": "no-Spark mp.Pool FOR/varint decode + BM25 top-k,"
                   " adjacent to each Spark run",
    }
    results["serving"] = {
        _master(LEVELS[0]): {"streams": streams[LEVELS[0]],
                             "qps_round_medians": by_level[LEVELS[0]],
                             "qps_median": round(med[LEVELS[0]], 3),
                             "ctl_items_per_sec": ctl_by_level[LEVELS[0]]},
        _master(LEVELS[1]): {"streams": streams[LEVELS[1]],
                             "qps_round_medians": by_level[LEVELS[1]],
                             "qps_median": round(med[LEVELS[1]], 3),
                             "ctl_items_per_sec": ctl_by_level[LEVELS[1]]},
        "scaling_efficiency": round(eff, 3),
        "paired_efficiency_runs": paired,
        "paired_efficiency_median": round(statistics.median(paired), 3),
        "paired_efficiency_best": round(max(paired), 3),
        "host_ceiling_efficiency_runs": ctl_paired,
        "host_ceiling_efficiency_median":
            round(statistics.median(ctl_paired), 3),
        "job_over_ceiling_runs": job_over_ceiling,
        "job_over_ceiling_median": round(statistics.median(
            [j for j in job_over_ceiling if j is not None]), 3),
        "requirement": ">= 0.8 paired (north_rule, serving axis)"
                       " OR >= 0.9 job/ceiling with the control recorded",
    }
    out_name = os.environ.get("SCALE_QPS_OUT", "BENCH_QPS_SCALING.json")
    with open(os.path.join(REPO, out_name), "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
