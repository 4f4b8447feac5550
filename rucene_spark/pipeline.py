"""End-to-end corpus-curation composition: the filter → dedup → keep-canonical
pipeline a training-data run executes before indexing, composed from the
first-class operators (textops.lang_id / textops.quality_scores /
dedup.exact_dedup / dedup.dedup_clusters).

One call produces the surviving documents: predicted-language filter,
quality threshold, exact-duplicate canonical only, near-duplicate cluster
canonical only. Every stage is the already-gated operator, so the
composition inherits their scale posture (hash groupBys, LSH blocking with
df caps, label propagation with lineage checkpoints); the join keys are all
doc_id, so AQE plans them as broadcast joins once the survivor set shrinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import (
    BAND_BUCKET_CAP,
    CLUSTER_JACCARD,
    EXACT_DEDUP_SQL,
    dedup_clusters,
    dedup_clusters_sql,
    exact_dedup,
)
from .textops import LANG_ID_SQL, QUALITY_SQL, lang_id, quality_scores

QUALITY_MIN = 0.5
KEEP_LANG = "en"


def clean_corpus(df: DataFrame, lang: str = KEEP_LANG,
                 quality_min: float = QUALITY_MIN,
                 jaccard: float = CLUSTER_JACCARD) -> DataFrame:
    """(doc_id, pred_lang, quality) of the documents that survive the full
    curation pipeline: predicted language == ``lang``, quality >=
    ``quality_min``, canonical member of their exact-duplicate group AND
    of their near-duplicate (MinHash-LSH connected-component) cluster."""
    langs = lang_id(df).where(F.col("pred_lang") == lang)
    quals = quality_scores(df).where(F.col("quality") >= quality_min)
    exact_canon = (exact_dedup(df)
                   .where(F.col("doc_id") == F.col("canonical_id"))
                   .select("doc_id"))
    near_canon = (dedup_clusters(df, threshold=jaccard)
                  .where(F.col("is_canonical") == 1)
                  .select("doc_id"))
    return (
        df.select("doc_id")
        .join(langs.select("doc_id", "pred_lang"), "doc_id")
        .join(quals.select("doc_id", "quality"), "doc_id")
        .join(exact_canon, "doc_id")
        .join(near_canon, "doc_id")
        .orderBy("doc_id")
    )


def clean_corpus_sql(lang: str = KEEP_LANG, quality_min: float = QUALITY_MIN,
                     jaccard: float = CLUSTER_JACCARD) -> str:
    """Oracle = the same composition over the stage oracles, each embedded
    as a subquery (DuckDB permits WITH — including WITH RECURSIVE — inside
    a derived table)."""
    return f"""
SELECT d.doc_id, l.pred_lang, q.quality
FROM documents d
JOIN ({LANG_ID_SQL}) l ON l.doc_id = d.doc_id
JOIN ({QUALITY_SQL}) q ON q.doc_id = d.doc_id
JOIN ({EXACT_DEDUP_SQL}) e ON e.doc_id = d.doc_id
JOIN ({dedup_clusters_sql(jaccard)}) c ON c.doc_id = d.doc_id
WHERE l.pred_lang = '{lang}' AND q.quality >= {quality_min}
  AND e.canonical_id = d.doc_id AND c.is_canonical = 1
ORDER BY d.doc_id
"""
