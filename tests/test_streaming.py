"""Micro-batch streaming ingestion must converge to the same index state
as one batch build (delta segments + manifest commits per batch)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rucene_spark.build import IndexWriter, load_manifest
from rucene_spark.query import TermQuery
from rucene_spark.search import IndexSearcher
from rucene_spark.streaming import stream_index
from rucene_spark.webtext import make_corpus, term_df_spectrum


def test_stream_index_equals_batch_build(spark, tmp_path):
    corpus = make_corpus(300, seed=41).drop(columns=["html", "warc_ts"])
    hi = next(t for t in term_df_spectrum(
        make_corpus(300, seed=41)).index if t.startswith("t0"))

    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    # three files → three micro-batches with maxFilesPerTrigger=1
    for i, lo in enumerate(range(0, 300, 100)):
        part = corpus.iloc[lo:lo + 100]
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False),
                       os.path.join(src, f"part-{i}.parquet"))

    schema = spark.createDataFrame(corpus.iloc[:1]).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    idx = str(tmp_path / "stream_idx")
    q = stream_index(stream, idx, segments_per_batch=2,
                     checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    m = load_manifest(idx)
    assert m["doc_count"] == 300
    statuses = [s["status"] for s in m["segments"]]
    assert statuses.count("built") == 2      # first batch
    assert statuses.count("delta") >= 2      # later batches appended

    batch_idx = str(tmp_path / "batch_idx")
    IndexWriter(spark, batch_idx, n_segments=4).build(
        spark.createDataFrame(corpus))
    s_stream = IndexSearcher(spark, idx)
    s_batch = IndexSearcher(spark, batch_idx)
    assert s_stream.doc_count == s_batch.doc_count
    assert s_stream.sum_ttf == s_batch.sum_ttf
    rs = {(r["url"], np.float32(r["score"]).view(np.int32).item())
          for r in s_stream.search(TermQuery("text", hi), 1000).collect()}
    rb = {(r["url"], np.float32(r["score"]).view(np.int32).item())
          for r in s_batch.search(TermQuery("text", hi), 1000).collect()}
    assert rs == rb
