"""Snippet highlighting over search hits.

The reference's FastVectorHighlighter (/root/reference/src/core/highlight/
mod.rs:89-1200, fvh_highlighter.rs) builds fragments from stored term
vectors. Our stored fields ARE the source table (SURVEY.md §2.1), so
highlighting is a post-retrieval projection: join the top-k hits back to
the source text and cut a token window around the first query-term match —
entirely JVM column expressions (split / array_position / slice /
transform), no Python in the path.

Fragment spec (deterministic, SQL-mirrorable): tokens
``[max(0, i-window), i+window]`` around the first exact-token match ``i``,
every matched token wrapped in pre/post tags.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .query import TermQuery
from .search import IndexSearcher


def highlight_term(
    searcher: IndexSearcher,
    docs_df: DataFrame,
    term: str,
    k: int = 10,
    window: int = 3,
    pre: str = "<b>",
    post: str = "</b>",
    text_col: str = "text",
) -> DataFrame:
    """Top-k docs for ``term`` with a highlighted snippet column."""
    key = searcher.key_col
    hits = searcher.search(TermQuery("text", term), k).select(
        key, "seg", "doc", "score")
    joined = hits.join(docs_df.select(key, text_col), key)
    toks = F.split(F.col(text_col), " ")
    i = F.array_position(toks, term)  # 1-based; >0 guaranteed for hits
    start = F.greatest(F.lit(1), i - window)
    length = (i + window) - start + 1
    frag = F.slice(toks, start, length)
    wrapped = F.transform(
        frag,
        lambda t: F.when(t == term, F.concat(F.lit(pre), t, F.lit(post)))
        .otherwise(t),
    )
    return (
        joined.select(
            key, "seg", "doc",
            F.round(F.col("score"), 6).alias("score"),
            F.concat_ws(" ", wrapped).alias("snippet"),
        )
        .orderBy(F.desc("score"), "seg", "doc")
    )


def highlight_term_sql(term: str, k: int = 10, window: int = 3,
                       pre: str = "<b>", post: str = "</b>") -> str:
    """DuckDB mirror over the documents view: same fragment spec on top of
    the float64 BM25 top-k CTE (caller prepends a CTE named ``hits`` with
    columns (doc_id, score))."""
    return f"""
SELECT h.doc_id, round(h.score, 6) AS score,
       array_to_string(list_transform(
         list_slice(string_split(d.text, ' '),
                    greatest(1, list_position(string_split(d.text, ' '), '{term}') - {window}),
                    list_position(string_split(d.text, ' '), '{term}') + {window}),
         t -> CASE WHEN t = '{term}' THEN concat('{pre}', t, '{post}') ELSE t END),
         ' ') AS snippet
FROM hits h JOIN documents d ON d.doc_id = h.doc_id
ORDER BY h.score DESC, h.doc_id
LIMIT {k}
"""
