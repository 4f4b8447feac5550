"""spark-submit entry points (north_rule: launched via
``spark-submit --py-files rucene_spark.zip`` on multi-executor clusters).

Subcommands:

* ``build``  — distributed index build; prints one JSON line of metrics
  (wall seconds, docs/sec, per-segment lineage from the manifest).
* ``search`` — query-string search over a built index; prints hits.
* ``corpus`` — deterministically synthesize a webtext corpus parquet
  (FIXTURES.md shape: url/warc_ts/html/text/lang).

On a real cluster, replace ``--master local[N]`` with the cluster master;
nothing else changes — the build dataflow has one wide exchange
(shuffle by segment_id) and the searcher's plans are partition-count
agnostic.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def _spark(master: str | None, shuffle_partitions: int | None):
    b = SparkSession.builder.appName("rucene-spark-cli")
    if master:
        b = b.master(master)
    if shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    b = (b.config("spark.sql.adaptive.enabled", "true")
         # do NOT let AQE coalesce the build shuffle below n_segments —
         # the per-segment applyInPandas tasks ARE the parallelism
         .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.session.timeZone", "UTC"))
    s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    return s


def cmd_corpus(args) -> None:
    import pandas as pd  # noqa: F401
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rucene_spark.webtext import make_corpus

    pdf = make_corpus(args.docs, seed=args.seed)
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    for i, f in enumerate(table.schema):
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns":
            table = table.set_column(
                i, f.name, table.column(i).cast(pa.timestamp("us", f.type.tz)))
    # small row groups keep the file splittable: the build's source scan
    # parallelizes across row groups instead of one task per file
    pq.write_table(table, args.out, row_group_size=4096)
    print(json.dumps({"docs": args.docs, "seed": args.seed, "out": args.out}))


def _read_input(spark, path: str, fmt: str):
    """Input seam for the source webtext table (north_rule: Iceberg).

    ``parquet`` reads a path; ``iceberg`` reads a catalog table via the
    Iceberg DataSourceV2 connector (requires ``iceberg-spark-runtime`` on
    the cluster classpath + a configured catalog — standard on real
    deployments, absent in this sandbox, hence gated with a clear error);
    ``table`` reads any catalog-registered table (including Iceberg
    tables registered in the session catalog) via ``spark.table``. All
    three yield the same (url, warc_ts, html, text, lang) DataFrame; the
    build dataflow downstream is identical, and Iceberg's DSv2 scan gives
    the same column-pruned splittable read the parquet path gets.
    """
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "table":
        return spark.table(path)
    if fmt == "iceberg":
        try:
            return spark.read.format("iceberg").load(path)
        except Exception as e:  # pragma: no cover - needs iceberg runtime
            raise RuntimeError(
                "iceberg input requires the iceberg-spark-runtime jar and "
                "a configured catalog on this cluster (e.g. spark-submit "
                "--packages org.apache.iceberg:iceberg-spark-runtime-"
                "4.0_2.13:<ver> --conf spark.sql.catalog.web=org.apache."
                "iceberg.spark.SparkCatalog ...); no silent fallback so a "
                "misconfigured scale run fails loudly") from e
    raise ValueError(f"unknown --input-format {fmt!r}")


def cmd_build(args) -> None:
    from rucene_spark.build import IndexWriter

    spark = _spark(args.master, args.segments)
    df = _read_input(spark, args.input, args.input_format)
    t0 = time.time()
    writer = IndexWriter(
        spark, args.index_dir, n_segments=args.segments,
        key_col=args.key_col, partitioner=args.partitioner,
        analyzer=args.analyzer,
    )
    manifest = writer.build(df)
    wall = time.time() - t0
    print(json.dumps({
        "wall_secs": round(wall, 3),
        "docs": manifest["doc_count"],
        "docs_per_sec": round(manifest["doc_count"] / wall, 2),
        "segments": len(manifest["segments"]),
        "postings": int(sum(s["postings"] for s in manifest["segments"])),
        "lineage": [
            {"segment_id": s["segment_id"], "docs": s["docs"],
             "build_secs": round(s["build_secs"], 3),
             "docs_per_sec": round(s["docs"] / max(s["build_secs"], 1e-9), 1)}
            for s in manifest["segments"]
        ],
    }))
    spark.stop()


def cmd_search(args) -> None:
    from rucene_spark.query import QueryStringQueryBuilder
    from rucene_spark.search import IndexSearcher

    spark = _spark(args.master, None)
    s = IndexSearcher(spark, args.index_dir, scoring=args.scoring)
    q = QueryStringQueryBuilder(args.query, [("text", 1.0)]).build()
    t0 = time.time()
    rows = s.search(q, args.k).collect()
    latency = time.time() - t0
    print(json.dumps({
        "query": args.query,
        "latency_secs": round(latency, 4),
        "hits": [
            {"key": str(r[s.key_col]), "seg": r["seg"], "doc": r["doc"],
             "score": float(r["score"])}
            for r in rows
        ],
    }))
    spark.stop()


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="rucene_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("corpus")
    c.add_argument("--docs", type=int, required=True)
    c.add_argument("--seed", type=int, default=42)
    c.add_argument("--out", required=True)
    c.set_defaults(fn=cmd_corpus)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--input-format", default="parquet",
                   choices=["parquet", "iceberg", "table"])
    b.add_argument("--index-dir", required=True)
    b.add_argument("--segments", type=int, default=32)
    b.add_argument("--key-col", default="url")
    b.add_argument("--partitioner", default="hash")
    b.add_argument("--analyzer", default="whitespace",
                   help="whitespace (reference parity) | standard "
                        "(StandardAnalyzer mode) | synonym:... | "
                        "delimited_payload[:d]")
    b.add_argument("--master", default=None)
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("search")
    s.add_argument("--index-dir", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--scoring", default="lucene")
    s.add_argument("--master", default=None)
    s.set_defaults(fn=cmd_search)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
