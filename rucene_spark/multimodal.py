"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with
typed metadata extracted by Arrow-batched pandas stages (``mapInPandas``),
never row-at-a-time Python. The actual media decode is STUBBED — codec
libraries are not available in this environment — behind
:func:`decode_media`, which raises ``NotImplementedError``; the
deterministic :func:`fake_decode` stands in so the Spark-side plumbing
(schema, batching, partitioning, UDF signatures) is real and tested.

For the correctness gate, blobs are fabricated deterministically from the
``text`` column (UTF-8 bytes), so a DuckDB oracle can reproduce every
extracted metadata value with string/byte functions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

META_SCHEMA = (
    "doc_id long, n_bytes int, magic string, fake_width int, fake_height int"
)


def attach_blob(df: DataFrame) -> DataFrame:
    """Fabricate the opaque payload column (deterministic: UTF-8 of text).
    In production this is the image/audio bytes read from the lake."""
    return df.withColumn("blob", F.encode(F.col("text"), "UTF-8"))


def decode_media(blob: bytes, kind: str = "image"):
    """Real media decode (resize, frame-sample, feature-extract) — STUB.

    The container has no image/audio codecs; a production deployment plugs
    PIL/torchaudio/ffmpeg in here. The Spark-side contract (binary in,
    typed struct out, Arrow batching) is exercised via fake_decode.
    """
    raise NotImplementedError(
        f"media decode for kind={kind!r} requires codec libraries "
        "not present in this environment; use fake_decode for plumbing tests"
    )


def fake_decode(blob: bytes) -> tuple[int, str, int, int]:
    """Deterministic stand-in decode: byte length, 4-byte 'magic' prefix,
    and fake dimensions from the first two bytes."""
    n = len(blob)
    magic = blob[:4].decode("utf-8", errors="replace")
    w = blob[0] if n > 0 else 0
    h = blob[1] if n > 1 else 0
    return n, magic, int(w), int(h)


def extract_metadata(df: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the blob column — the shape
    every real decode stage takes (mapInPandas: binary in, struct out)."""
    blobbed = attach_blob(df).select("doc_id", "blob")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            meta = [fake_decode(b) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_bytes": [m[0] for m in meta],
                    "magic": [m[1] for m in meta],
                    "fake_width": [m[2] for m in meta],
                    "fake_height": [m[3] for m in meta],
                }
            )

    return blobbed.mapInPandas(fn, META_SCHEMA).orderBy("doc_id")


EXTRACT_METADATA_SQL = """
SELECT doc_id,
       octet_length(text::BLOB)::INT AS n_bytes,
       substr(text, 1, 4) AS magic,
       ascii(substr(text, 1, 1))::INT AS fake_width,
       ascii(substr(text, 2, 1))::INT AS fake_height
FROM documents ORDER BY doc_id
"""
