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


def highlight_query(
    searcher: IndexSearcher,
    docs_df: DataFrame,
    query,
    k: int = 10,
    window_tokens: int = 7,
    pre: str = "<b>",
    post: str = "</b>",
    text_col: str = "text",
) -> DataFrame:
    """Multi-term highlighting: top-k docs for ``query`` with the
    BEST-scoring fragment window and every query term wrapped — the
    FieldPhraseList/frag-builder semantics of the reference's FVH
    (highlight/mod.rs:89-1200) re-expressed as a deterministic,
    SQL-mirrorable rule: among all ``window_tokens``-wide token windows,
    pick the one containing the most query-term occurrences (earliest
    window wins ties), then wrap every matched token. Entirely JVM
    column expressions over the k hit rows."""
    key = searcher.key_col
    terms = sorted({t for _, t in searcher._collect_terms(query)})
    hits = searcher.search(query, k).select(key, "seg", "doc", "score")
    joined = hits.join(docs_df.select(key, text_col), key)

    toks = F.split(F.col(text_col), " ")
    tset = F.array(*[F.lit(t) for t in terms])
    w = window_tokens
    nstarts = F.greatest(F.size(toks) - w + 1, F.lit(1))
    scores = F.transform(
        F.sequence(F.lit(1), nstarts),
        lambda s: F.size(F.filter(F.slice(toks, s, w),
                                  lambda t: F.array_contains(tset, t))),
    )
    best = F.array_position(scores, F.array_max(scores))
    frag = F.slice(toks, best.cast("int"), w)
    wrapped = F.transform(
        frag,
        lambda t: F.when(F.array_contains(tset, t),
                         F.concat(F.lit(pre), t, F.lit(post))).otherwise(t),
    )
    return (
        joined.select(
            key, "seg", "doc",
            F.round(F.col("score"), 6).alias("score"),
            F.concat_ws(" ", wrapped).alias("snippet"),
        )
        .orderBy(F.desc("score"), "seg", "doc")
    )


def highlight_phrase(
    searcher: IndexSearcher,
    docs_df: DataFrame,
    terms: list[str],
    k: int = 10,
    window: int = 3,
    pre: str = "<b>",
    post: str = "</b>",
    text_col: str = "text",
    field: str = "text",
) -> DataFrame:
    """Phrase-unit highlighting — the FieldPhraseList semantics of the
    reference's FVH (highlight/mod.rs: phrase queries highlight as ONE
    unit, never as scattered per-term tags): top-k docs for the exact
    phrase, fragment = ``window`` tokens either side of the first phrase
    occurrence, the whole occurrence wrapped in one pre/post tag pair.
    Deterministic and SQL-mirrorable; JVM column expressions only."""
    from .query import PhraseQuery

    key = searcher.key_col
    p = len(terms)
    hits = searcher.search(PhraseQuery.build(field, terms, slop=0), k).select(
        key, "seg", "doc", "score")
    joined = hits.join(docs_df.select(key, text_col), key)

    toks = F.split(F.col(text_col), " ")
    phrase_arr = F.array(*[F.lit(t) for t in terms])
    starts = F.filter(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - p + 1, F.lit(1))),
        lambda s: F.slice(toks, s, p) == phrase_arr,
    )
    s0 = F.element_at(starts, 1)  # hits guarantee >=1 occurrence
    fstart = F.greatest(F.lit(1), s0 - window)
    fend = F.least(F.size(toks), s0 + p - 1 + window)
    frag = F.slice(toks, fstart, fend - fstart + 1)
    wrapped = F.transform(
        frag,
        lambda t, i: F.concat(
            F.when(fstart + i == s0, F.lit(pre)).otherwise(F.lit("")),
            t,
            F.when(fstart + i == s0 + p - 1, F.lit(post)).otherwise(F.lit("")),
        ),
    )
    return (
        joined.select(
            key, "seg", "doc",
            F.round(F.col("score"), 6).alias("score"),
            F.concat_ws(" ", wrapped).alias("snippet"),
        )
        .orderBy(F.desc("score"), "seg", "doc")
    )


def highlight_phrase_sql(terms: list[str], k: int = 10, window: int = 3,
                         pre: str = "<b>", post: str = "</b>") -> str:
    """DuckDB mirror of :func:`highlight_phrase` (caller prepends a CTE
    named ``hits`` with columns (doc_id, score))."""
    p = len(terms)
    match = " AND ".join(
        f"parts[s + {j}] = '{t}'" for j, t in enumerate(terms))
    return f"""
SELECT doc_id, round(score, 6) AS score,
       array_to_string(
         [ concat(CASE WHEN pos = s0 THEN '{pre}' ELSE '' END,
                  parts[pos],
                  CASE WHEN pos = s0 + {p} - 1 THEN '{post}' ELSE '' END)
           for pos in range(greatest(1, s0 - {window}),
                            least(len(parts), s0 + {p} - 1 + {window}) + 1) ],
         ' ') AS snippet
FROM (
  SELECT h.doc_id, h.score, parts,
         [ s for s in range(1, greatest(len(parts) - {p} + 1, 1) + 1)
           if {match} ][1] AS s0
  FROM hits h JOIN (SELECT doc_id, string_split(text, ' ') AS parts
                    FROM documents) d ON d.doc_id = h.doc_id
)
ORDER BY score DESC, doc_id
LIMIT {k}
"""


def highlight_query_sql(terms: list[str], k: int = 10,
                        window_tokens: int = 7,
                        pre: str = "<b>", post: str = "</b>") -> str:
    """DuckDB mirror of :func:`highlight_query`'s fragment rule (caller
    prepends a CTE named ``hits`` with columns (doc_id, score))."""
    w = window_tokens
    tlist = "[" + ", ".join(f"'{t}'" for t in terms) + "]"
    return f"""
SELECT h.doc_id, round(h.score, 6) AS score,
       array_to_string(list_transform(
         list_slice(parts, best, best + {w} - 1),
         t -> CASE WHEN list_contains({tlist}, t)
                   THEN concat('{pre}', t, '{post}') ELSE t END), ' ')
         AS snippet
FROM (
  SELECT h.doc_id, h.score, parts,
         list_position(scores, list_max(scores)) AS best
  FROM (
    SELECT h.doc_id, h.score, parts,
           [ len(list_filter(list_slice(parts, s, s + {w} - 1),
                             t -> list_contains({tlist}, t)))
             for s in range(1, greatest(len(parts) - {w} + 1, 1) + 1) ]
             AS scores
    FROM hits h JOIN (SELECT doc_id, string_split(text, ' ') AS parts
                      FROM documents) d ON d.doc_id = h.doc_id
  ) h
) h
ORDER BY h.score DESC, h.doc_id
LIMIT {k}
"""


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
