"""Text-analysis operators for large-scale training-data pipelines.

These extend the engine beyond the reference's search surface (SURVEY.md
notes rucene has no corpus-analytics operators) with the ops a webtext
curation pipeline needs: token counting, quality scoring, language ID and
order-sensitive document fingerprinting.

Design rules:

* pure JVM column expressions — no Python in the hot path (`input_hint`:
  vectorized throughout); everything is a narrow projection over the
  documents scan, so Catalyst prunes to (doc_id, text) and the plan is one
  WholeStageCodegen span per query;
* every numeric is derived from deterministic integer/string arithmetic so
  a DuckDB oracle can replay it bit-for-bit (the shared hash primitive is
  ``md5 → first 15 hex digits → int60``, see :func:`h60_sql`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MERSENNE31 = 2147483647
FP_MOD = 1000000007

# tiny in-vocabulary stoplists (the synthetic corpus vocabulary + common
# webtext function words); shared verbatim with the SQL oracles
EN_STOP = ["the", "a", "of", "to", "and", "in", "is", "it"]
DE_STOP = ["der", "die", "das", "und", "ist", "ein"]


def h60(col):
    """Portable 60-bit hash: md5 → first 15 hex digits → BIGINT.

    Spark: conv(substring(md5(x),1,15),16,10); DuckDB:
    ('0x' || substr(md5(x),1,15))::BIGINT — identical values by md5 spec.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def h31(col):
    return h60(col) % MERSENNE31


def h31_sql(expr: str) -> str:
    return f"({h60_sql(expr)} % {MERSENNE31})"


def _tokens(df: DataFrame) -> DataFrame:
    return df.withColumn("_toks", F.split(F.col("text"), " "))


# ---------------------------------------------------------------------------
# token counting (whitespace + BPE-ish subword estimate)
# ---------------------------------------------------------------------------


def token_stats(df: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_subwords): whitespace tokens plus a BPE-ish
    subword estimate of ceil(len/4) pieces per token (the common ~4
    chars/token heuristic for budget accounting)."""
    return (
        _tokens(df)
        .select(
            "doc_id",
            F.size("_toks").alias("n_tokens"),
            F.expr(
                "aggregate(_toks, 0L,"
                " (acc, t) -> acc + CAST(ceil(length(t) / 4.0) AS LONG))"
            ).alias("n_subwords"),
        )
        .orderBy("doc_id")
    )


TOKEN_STATS_SQL = """
SELECT doc_id,
       len(string_split(text, ' '))::BIGINT AS n_tokens,
       list_sum(list_transform(string_split(text, ' '),
                t -> ceil(length(t) / 4.0)::BIGINT))::BIGINT AS n_subwords
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------


def quality_scores(df: DataFrame) -> DataFrame:
    """(doc_id, punct_ratio, stop_ratio, mean_tok_len, quality): webtext
    quality heuristics — punctuation density, stopword coverage, mean token
    length, combined into one monotone score in [0, 1]-ish."""
    stop_arr = F.array(*[F.lit(s) for s in EN_STOP])
    d = (
        _tokens(df)
        .withColumn("_n", F.size("_toks").cast("double"))
        .withColumn(
            "_punct",
            (F.length("text")
             - F.length(F.regexp_replace("text", r"[,.;!?]", ""))).cast("double"),
        )
        .withColumn(
            "_stop",
            F.size(F.array_intersect("_toks", stop_arr)).cast("double"),
        )
    )
    punct_ratio = F.round(F.col("_punct") / F.length("text"), 6)
    stop_ratio = F.round(F.col("_stop") / F.col("_n"), 6)
    mean_tok = F.round((F.length("text") - F.col("_n") + 1) / F.col("_n"), 6)
    quality = F.round(
        F.lit(0.5) * (F.col("_stop") / F.col("_n"))
        + F.lit(0.5) * F.least(F.col("_n") / F.lit(100.0), F.lit(1.0))
        - F.lit(0.25) * (F.col("_punct") / F.length("text")),
        6,
    )
    return d.select(
        "doc_id",
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        mean_tok.alias("mean_tok_len"),
        quality.alias("quality"),
    ).orderBy("doc_id")


_EN_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in EN_STOP) + "]"

QUALITY_SQL = f"""
WITH d AS (
  SELECT doc_id, text,
         string_split(text, ' ') AS toks,
         len(string_split(text, ' '))::DOUBLE AS n,
         (length(text) - length(regexp_replace(text, '[,.;!?]', '', 'g')))::DOUBLE
           AS punct,
         len(list_intersect(list_distinct(string_split(text, ' ')),
                            {_EN_STOP_SQL}))::DOUBLE AS stop
  FROM documents
)
SELECT doc_id,
       round(punct / length(text), 6) AS punct_ratio,
       round(stop / n, 6) AS stop_ratio,
       round((length(text) - n + 1) / n, 6) AS mean_tok_len,
       round(0.5 * (stop / n) + 0.5 * least(n / 100.0, 1.0)
             - 0.25 * (punct / length(text)), 6) AS quality
FROM d ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# language ID (stopword-coverage heuristic)
# ---------------------------------------------------------------------------


def lang_id(df: DataFrame) -> DataFrame:
    """(doc_id, pred_lang): n-gram-free heuristic — stopword coverage per
    language plus a CJK character ratio; deterministic tie-break en>de>zh."""
    en = F.array(*[F.lit(s) for s in EN_STOP])
    de = F.array(*[F.lit(s) for s in DE_STOP])
    d = (
        _tokens(df)
        .withColumn("_en", F.size(F.array_intersect("_toks", en)))
        .withColumn("_de", F.size(F.array_intersect("_toks", de)))
        .withColumn(
            "_zh",
            F.length(F.regexp_replace("text", r"[^一-鿿]", "")),
        )
    )
    pred = (
        F.when((F.col("_zh") > 0)
               & (F.col("_zh") >= F.col("_en")) & (F.col("_zh") >= F.col("_de")),
               F.lit("zh"))
        .when(F.col("_en") >= F.col("_de"), F.lit("en"))
        .otherwise(F.lit("de"))
    )
    return d.select("doc_id", pred.alias("pred_lang")).orderBy("doc_id")


_DE_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in DE_STOP) + "]"

LANG_ID_SQL = f"""
WITH d AS (
  SELECT doc_id,
         len(list_intersect(list_distinct(string_split(text, ' ')),
                            {_EN_STOP_SQL})) AS en,
         len(list_intersect(list_distinct(string_split(text, ' ')),
                            {_DE_STOP_SQL})) AS de,
         length(regexp_replace(text, '[^\\x{{4e00}}-\\x{{9fff}}]', '', 'g')) AS zh
  FROM documents
)
SELECT doc_id,
       CASE WHEN zh > 0 AND zh >= en AND zh >= de THEN 'zh'
            WHEN en >= de THEN 'en' ELSE 'de' END AS pred_lang
FROM d ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# document fingerprint (order-sensitive rolling hash)
# ---------------------------------------------------------------------------


def fingerprints(df: DataFrame) -> DataFrame:
    """(doc_id, fp): order-sensitive content fingerprint — position is mixed
    into each token hash ('tok#pos'), partial sums mod a prime, so
    reorderings change fp but the computation is a plain distributed sum
    (no sequential scan; identical in SQL)."""
    tok = _tokens(df).select(
        "doc_id", F.posexplode("_toks").alias("pos", "tok")
    )
    h = h60(F.concat_ws("#", F.col("tok"), F.col("pos"))) % FP_MOD
    return (
        tok.groupBy("doc_id")
        .agg((F.sum(h) % FP_MOD).alias("fp"))
        .orderBy("doc_id")
    )


FINGERPRINT_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         unnest(range(0, len(string_split(text, ' ')))) AS pos
  FROM documents
)
SELECT doc_id,
       (sum({h60_sql("concat(tok, '#', pos)")} % {FP_MOD}) % {FP_MOD})::BIGINT
         AS fp
FROM tok GROUP BY doc_id ORDER BY doc_id
"""


def term_vector(df: DataFrame, doc_key, key_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Per-document term vector: (term, tf, positions) sorted by term.

    The reference stores term vectors at index time
    (stored_fields/term_vectors, ~4k LoC) purely so they can be read back
    per doc; here the stored fields ARE the source table, so the vector
    is re-derived by re-running the analyzer over the stored text —
    byte-identical output for the shipped analyzers with zero extra
    storage or write amplification. Positions are 0-based and UNCAPPED
    (term vectors never had the tf-10 postings cap)."""
    toks = F.split(F.col(text_col), " ")
    return (
        df.filter(F.col(key_col) == doc_key)
        .select(F.posexplode(toks).alias("pos", "term"))
        .groupBy("term")
        .agg(
            F.count("*").alias("tf"),
            F.array_join(
                F.transform(F.array_sort(F.collect_list("pos")),
                            lambda x: x.cast("string")),
                ",").alias("positions"),
        )
        .orderBy("term")
    )


def term_vector_sql(doc_key) -> str:
    return f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS term,
         unnest(range(0, len(string_split(text, ' ')))) AS pos
  FROM documents WHERE doc_id = {doc_key}
)
SELECT term, count(*)::BIGINT AS tf,
       string_agg(pos, ',' ORDER BY pos) AS positions
FROM tok GROUP BY term ORDER BY term
"""
