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

import hashlib
import os
import threading

from pyspark.sql import DataFrame, SparkSession

from . import storage
from .build import MANIFEST, IndexWriter
from .search import IndexSearcher


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


class SearcherManager:
    """Share one searcher across serving threads; swap in a fresh one
    when the commit point changes (search_manager.rs:44-132
    SearcherManager + SearcherFactory, :197 acquire, :304
    maybe_refresh).

    The reference's ReferenceManager juggles manual reference counts so
    a searcher closes only after its last in-flight query releases it;
    here Python's GC is the release protocol — :meth:`acquire` hands out
    the current :class:`IndexSearcher` and old ones die when the last
    caller drops theirs. The commit point is the manifest's content
    hash (the index's ``segments_N`` analogue), so a refresh happens
    exactly when a build / delta append / merge / delete published a
    new manifest — touching nothing else is a no-op refresh, same as
    ``maybe_refresh`` returning false.

    ``warm=True`` is the SearcherFactory warm hook: the NEW searcher
    runs :meth:`IndexSearcher.warmup` (worker-pool spawn + footer
    reads) BEFORE the swap, so traffic keeps hitting the warm old
    searcher until the new one is primed — Lucene's
    ``SearcherFactory.newSearcher`` warming contract."""

    def __init__(self, spark: SparkSession, index_dir: str,
                 warm: bool = False, **searcher_kwargs):
        self.spark = spark
        self.index_dir = index_dir
        self.warm = warm
        self._kw = searcher_kwargs
        self._lock = threading.Lock()
        self._token: str | None = None
        self._current: IndexSearcher | None = None
        if not self.maybe_refresh():
            raise FileNotFoundError(
                f"no committed index at {index_dir!r} (missing {MANIFEST})")

    def _commit_token(self) -> str | None:
        p = os.path.join(self.index_dir, MANIFEST)
        if not storage.exists(p):
            return None
        return hashlib.sha256(storage.read_text(p).encode()).hexdigest()

    def acquire(self) -> IndexSearcher:
        """Current searcher (always the one from the last refresh —
        callers see a CONSISTENT commit point for their whole query)."""
        with self._lock:
            if self._current is None:
                raise RuntimeError("SearcherManager is closed")
            return self._current

    def maybe_refresh(self) -> bool:
        """Re-read the manifest; if its content changed since the last
        refresh, build (and optionally warm) a new searcher and swap it
        in. Returns True iff a swap happened."""
        token = self._commit_token()
        if token is None or token == self._token:
            return False
        fresh = IndexSearcher(self.spark, self.index_dir, **self._kw)
        if self.warm:
            fresh.warmup()
        with self._lock:
            self._token = token
            old = self._current
            self._current = fresh
        # core-drop-listener analogue (query_cache.rs:396-404): when the
        # manager owns the last reference to the old generation, its
        # cached filter sets are unreachable — unpersist them now rather
        # than waiting for GC to release the executor block memory.
        qc = self._kw.get("query_cache")
        if qc is not None and old is not None:
            qc.purge_generations({fresh._gen_key})
        return True

    def close(self) -> None:
        with self._lock:
            self._current = None
