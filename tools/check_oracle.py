"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and the matching ``oracle_sql()`` on
DuckDB over the same parquet tables, then compares row count, column names,
and an order-insensitive value hash (columns sorted by name, rows sorted).

Usage: python tools/check_oracle.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def value_hash(pdf: pd.DataFrame) -> str:
    n = normalize(pdf)
    payload = n.to_csv(index=False, float_format="%.6f").encode()
    return hashlib.sha256(payload).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    from pyspark.sql import SparkSession

    # config-matrix knobs: results must be invariant to parallelism,
    # shuffle-partition count, and AQE on/off (plan-independence check)
    cpus = os.environ.get("CHECK_CPUS", "8")
    shuffle = os.environ.get("CHECK_SHUFFLE", "8")
    aqe = os.environ.get("CHECK_AQE", "true")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("check-oracle")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if name_filter and name_filter not in name:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: SPARK ERROR {e}")
            print(f"FAIL  {name}: spark error {str(e)[:2000]}")
            continue
        if name not in oracles:
            print(f"SKIP  {name}: no oracle (rows-only check: {len(spark_pdf)} rows)")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: DUCKDB ERROR {e}")
            print(f"FAIL  {name}: duckdb error {str(e)[:2000]}")
            continue
        problems = []
        if len(spark_pdf) != len(duck_pdf):
            problems.append(f"rows {len(spark_pdf)} != {len(duck_pdf)}")
        if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
            problems.append(
                f"cols {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
            )
        if not problems and value_hash(spark_pdf) != value_hash(duck_pdf):
            problems.append("value hash mismatch")
            a, b = normalize(spark_pdf), normalize(duck_pdf)
            diff = a.compare(b) if a.shape == b.shape else None
            print(f"--- spark:\n{a.head(12)}\n--- duck:\n{b.head(12)}")
            if diff is not None and len(diff):
                print(f"--- diff:\n{diff.head(12)}")
        if problems:
            failures.append(f"{name}: {'; '.join(problems)}")
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"OK    {name} ({len(spark_pdf)} rows)")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} passed")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
