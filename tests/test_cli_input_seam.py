"""The build CLI's input-format seam (north_rule: source is an Iceberg
table of web pages).

The sandbox has no iceberg-spark-runtime jar, so the live ``iceberg``
path can't execute here; what IS tested is the seam contract every
format shares — ``table`` (a catalog-registered table, which is exactly
how an Iceberg table surfaces once its catalog is configured) yields the
same DataFrame the ``parquet`` path yields, and the ``iceberg`` branch
fails loudly (no silent fallback) when the connector is absent.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rucene_spark.cli import _read_input
from rucene_spark.webtext import make_corpus


@pytest.fixture(scope="module")
def corpus_path(tmp_path_factory):
    pdf = make_corpus(50, seed=7)
    t = pa.Table.from_pandas(pdf, preserve_index=False)
    for i, f in enumerate(t.schema):
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns":
            t = t.set_column(
                i, f.name, t.column(i).cast(pa.timestamp("us", f.type.tz)))
    p = os.path.join(tmp_path_factory.mktemp("cli_seam"), "corpus.parquet")
    pq.write_table(t, p)
    return p


def test_table_format_matches_parquet(spark, corpus_path):
    via_parquet = _read_input(spark, corpus_path, "parquet")
    spark.read.parquet(corpus_path).createOrReplaceTempView("webpages")
    via_table = _read_input(spark, "webpages", "table")
    assert via_table.schema == via_parquet.schema
    a = sorted(r["url"] for r in via_parquet.select("url").collect())
    b = sorted(r["url"] for r in via_table.select("url").collect())
    assert a == b and len(a) == 50


def test_iceberg_without_runtime_fails_loudly(spark, corpus_path):
    with pytest.raises(Exception) as ei:
        _read_input(spark, "web.db.pages", "iceberg").collect()
    # either our gated RuntimeError or Spark's own missing-source error —
    # both are loud; silent parquet fallback would be the bug
    assert "iceberg" in str(ei.value).lower()


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError):
        _read_input(spark, "x", "orc2")


def test_cli_build_search_standard_analyzer(spark, corpus_path, tmp_path,
                                            monkeypatch, capsys):
    """ACTUAL CLI-level coverage of the --analyzer plumbing (round-4
    ADVICE #1): drive ``main(['build', '--analyzer', 'standard', ...])``
    end-to-end — argparse → cmd_build → IndexWriter — then search the
    built index for the punctuation-normalized term (webtext attaches
    ',' etc. to 2% of tokens; standard mode folds them into the bare
    term, whitespace would not). The CLI's session factory is pointed at
    the shared test session (and its stop() stubbed) so the module-scoped
    fixture survives."""
    import json as _json

    from rucene_spark import cli
    from rucene_spark.build import load_manifest
    from rucene_spark.query import TermQuery
    from rucene_spark.search import IndexSearcher

    monkeypatch.setattr(cli, "_spark", lambda master, segs: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    idx = str(tmp_path / "idx_std")
    cli.main(["build", "--input", corpus_path, "--index-dir", idx,
              "--segments", "2", "--key-col", "url",
              "--analyzer", "standard"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["docs"] > 0
    m = load_manifest(idx)
    assert m["analyzer"] == "standard"
    s = IndexSearcher(spark, idx, scoring="precise")
    hits = s.search(TermQuery("text", "t000000"), 5).collect()
    assert hits, "rank-1 zipf term must match through the standard index"
