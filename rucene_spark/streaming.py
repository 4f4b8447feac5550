"""Streaming index ingestion — the Structured Streaming face of the NRT
story.

The reference's "real-time" indexing is NRT segment publishing: new docs
become new segments made visible by a commit (index_writer.rs:287,677;
SURVEY.md §2.9/§2.10 — rucene has no streaming subsystem, so this is our
Spark-native equivalent, not a parity item). Here each micro-batch becomes
a set of delta segments appended with :meth:`IndexWriter.add_documents`
under the same atomic-manifest commit; a searcher opened after any commit
sees every doc ingested so far ("reopen" = re-read the manifest).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from . import storage
from .build import MANIFEST, IndexWriter


def stream_index(
    stream_df: DataFrame,
    index_dir: str,
    key_col: str = "url",
    text_col: str = "text",
    segments_per_batch: int = 2,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """Start a streaming query that indexes every micro-batch as delta
    segments. Returns the StreamingQuery (caller awaits termination)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        w = IndexWriter(spark, index_dir, n_segments=segments_per_batch,
                        key_col=key_col, text_col=text_col)
        if storage.exists(os.path.join(index_dir, MANIFEST)):
            w.add_documents(batch_df, n_segments=segments_per_batch)
        else:
            w.build(batch_df)

    writer = stream_df.writeStream.foreachBatch(handle)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
