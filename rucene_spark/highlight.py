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

import pandas as pd

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


def highlight_term_offsets(
    searcher: IndexSearcher,
    docs_df: DataFrame,
    term: str,
    k: int = 10,
    char_window: int = 30,
    pre: str = "<b>",
    post: str = "</b>",
    field: str = "text",
    text_col: str = "text",
) -> DataFrame:
    """Offset-based highlighting from the postings' stored offsets sidecar
    (``IndexOptions::DocsAndFreqsAndPositionsAndOffsets``,
    posting_iterator.rs:54-79): the snippet is cut by CHARACTER offsets
    recorded at index time, so it works for analyzers whose tokens are
    not substring-recoverable from the source (lowercasing, punctuation
    stripping — exactly where the re-derivation highlighters above break).
    One pruned postings scan + Arrow offs decode; the snippet assembly is
    JVM ``substring``/``concat`` on the k hit rows."""
    import numpy as np
    import pandas as pd

    from .codec import batch_delta_decode, batch_unpack, batch_unpack_offsets

    if not searcher.manifest.get("index_offsets"):
        raise ValueError(
            "index was not built with index_offsets=True (offsets sidecar"
            " absent); use the source-derived highlighters instead")
    key = searcher.key_col
    hits = searcher.search(TermQuery(field, term), k).select(
        key, "seg", "doc", "score")

    def decode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            counts = pdf["num_docs"].to_numpy(np.int64)
            docs = batch_delta_decode(
                batch_unpack(pdf["docs_bin"].tolist(), counts), counts
            ).astype(np.int64)
            tfs = batch_unpack(pdf["tfs_bin"].tolist(), counts
                               ).astype(np.int64)
            starts, ends = batch_unpack_offsets(
                pdf["offs_bin"].tolist(), tfs)
            first = np.cumsum(tfs) - tfs  # first occurrence per doc
            yield pd.DataFrame({
                "seg": np.repeat(pdf["seg"].to_numpy(np.int32), counts),
                "doc": docs,
                "_os": starts[first],
                "_oe": ends[first],
            })

    offs = (searcher._postings
            .filter((F.col("field") == field) & (F.col("term") == term))
            .select("seg", "num_docs", "docs_bin", "tfs_bin", "offs_bin")
            .mapInPandas(decode, "seg int, doc long, _os long, _oe long"))
    joined = (hits.join(offs, ["seg", "doc"])
              .join(docs_df.select(key, text_col), key))
    s0 = F.col("_os")  # 0-based [s0, e0)
    e0 = F.col("_oe")
    a = F.greatest(F.lit(1), s0 + 1 - char_window)  # 1-based window start
    txt = F.col(text_col)
    snippet = F.concat(
        txt.substr(a.cast("int"), (s0 + 1 - a).cast("int")),
        F.lit(pre),
        txt.substr((s0 + 1).cast("int"), (e0 - s0).cast("int")),
        F.lit(post),
        txt.substr((e0 + 1).cast("int"), F.lit(char_window).cast("int")),
    )
    return (
        joined.select(
            key, "seg", "doc",
            F.round(F.col("score"), 6).alias("score"),
            snippet.alias("snippet"),
        )
        .orderBy(F.desc("score"), "seg", "doc")
    )


DEFAULT_BOUNDARY_CHARS = " \t\n,，|!！?？;；.。:："  # mod.rs:1088
DEFAULT_MAX_SCAN = 50  # mod.rs:1086
_MARGIN_DEFAULT = 6  # frag_list_builder.rs:29


def _find_start_offset(text: str, start: int, boundary_chars: str,
                       max_scan: int) -> int:
    """SimpleBoundaryScanner::find_start_offset (mod.rs:1112-1135): scan
    LEFT from ``start`` up to ``max_scan`` chars; stop AFTER a boundary
    char; reaching 0 returns 0; a fruitless scan returns ``start``."""
    if start > len(text) or start < 1:
        return start
    offset, count = start, max_scan
    while offset > 0 and count > 0:
        if text[offset - 1] in boundary_chars:
            return offset
        count -= 1
        offset -= 1
    return 0 if offset == 0 else start


def _find_end_offset(text: str, start: int, boundary_chars: str,
                     max_scan: int) -> int:
    """SimpleBoundaryScanner::find_end_offset (mod.rs:1137-1156): scan
    RIGHT up to ``max_scan`` chars; stop ON a boundary char; a fruitless
    scan returns ``start``."""
    if start > len(text) or start < 0:
        return start
    offset, count = start, max_scan
    while offset < len(text) and count > 0:
        if text[offset] in boundary_chars:
            return offset
        count -= 1
        offset += 1
    return start


def _frag_list(occs: list[tuple[int, int]], frag_char_size: int,
               margin: int) -> list[tuple[int, int, list[tuple[int, int]]]]:
    """BaseFragListBuilder::create_field_frag_list
    (frag_list_builder.rs:39-121): greedy in offset order — open a span
    at the first unconsumed occurrence, pull every occurrence ending
    within ``span_start + frag_char_size``, then recenter the span on the
    pulled matches and advance the consumed border to its end. Returns
    ``(span_start, span_end, member_occurrences)`` triples.

    ``occs`` are single-term/phrase-unit matches, so accept_phrase
    (rs:191-194) is unconditionally true for 1-occurrence infos and the
    ``match_length <= frag_char_size`` guard applies to multi-char
    phrase units exactly as written."""
    out = []
    start_offset = 0
    curr, n = 0, len(occs)
    while curr < n:
        s0, e0 = occs[curr]
        if s0 < start_offset:  # violates previous fragment border
            curr += 1
            continue
        wpil = []
        span_start = max(s0 - margin, start_offset)
        span_end = max(e0, span_start + frag_char_size)
        curr_end = e0
        curr += 1
        # accept_phrase (rs:191-194) is `terms_offsets.len() <= 1 ||
        # match_length <= frag_char_size`; our occurrences are single
        # units, so acceptance is unconditional
        wpil.append((s0, e0))
        while curr < n and occs[curr][1] <= span_end:
            curr_end = occs[curr][1]
            wpil.append(occs[curr])
            curr += 1
        match_len = curr_end - s0
        new_margin = max(0, (frag_char_size - match_len) // 2)
        span_start = max(s0 - new_margin, start_offset)
        span_end = span_start + max(match_len, frag_char_size)
        start_offset = span_end
        out.append((span_start, span_end, wpil))
    return out


def _term_occurrences(text: str, terms: set[str]) -> list[tuple[int, int]]:
    """Char-offset occurrences of any query term under the whitespace
    token model (the corpus analyzer), in offset order."""
    occs = []
    pos = 0
    for tok in text.split(" "):
        if tok in terms:
            occs.append((pos, pos + len(tok)))
        pos += len(tok) + 1
    return occs


def make_fragments(text: str, terms: set[str], frag_char_size: int = 100,
                   max_num_fragments: int = 3, margin: int = _MARGIN_DEFAULT,
                   pre: str = "<b>", post: str = "</b>",
                   score_ordered: bool = False,
                   boundary_chars: str = DEFAULT_BOUNDARY_CHARS,
                   max_scan: int = DEFAULT_MAX_SCAN) -> list[str]:
    """N highlighted fragments for one doc — the FVH pipeline
    FieldPhraseList → FragListBuilder → BoundaryScanner → fragment
    strings (fvh_highlighter.rs; fragments_builder.rs:356-436).

    ``score_ordered`` mirrors score_order_weighted_frag_info_list
    (fragments_builder.rs:217-219): fragments sorted by total weight
    (here: match count — this API carries no per-query boosts) desc,
    then offset; otherwise offset order. Edge snapping per
    get_fragment_source_mso (fragments_builder.rs:313-325): end via
    find_end_offset unless the text is shorter, start via
    find_start_offset."""
    if margin * 3 > frag_char_size:
        # rs:45-49 panics below min_frag_char_size = 3*margin
        raise ValueError(
            f"frag_char_size({frag_char_size}) is too small;"
            f" must be >= {max(1, margin * 3)}")
    occs = _term_occurrences(text, terms)
    frags = _frag_list(occs, frag_char_size, margin)
    if score_ordered:
        frags = sorted(frags, key=lambda f: (-len(f[2]), f[0]))
    frags = frags[:max_num_fragments]
    out = []
    for span_start, span_end, wpil in frags:
        if len(text) < span_end:
            eo = len(text)
            if span_start - (span_end - len(text) - 1) <= 0:
                span_start = 0
        else:
            eo = _find_end_offset(text, span_end, boundary_chars, max_scan)
        so = _find_start_offset(text, span_start, boundary_chars, max_scan)
        pieces, cur = [], so
        for ms, me in wpil:
            if ms < so or me > eo:
                continue
            pieces.append(text[cur:ms])
            pieces.append(pre + text[ms:me] + post)
            cur = me
        pieces.append(text[cur:eo])
        out.append("".join(pieces))
    return out


def highlight_fragments(
    searcher: IndexSearcher,
    docs_df: DataFrame,
    query,
    k: int = 10,
    frag_char_size: int = 100,
    max_num_fragments: int = 3,
    pre: str = "<b>",
    post: str = "</b>",
    score_ordered: bool = False,
    text_col: str = "text",
) -> DataFrame:
    """Top-k docs with an ARRAY of up to ``max_num_fragments``
    boundary-snapped fragments per hit (the reference FVH's
    max_num_fragments surface, fragments_builder.rs:366-436, which the
    single-window highlighters above do not cover).

    Scale shape: highlighting is presentation-layer work over the k
    RETURNED rows, exactly like the reference (create_fragments runs per
    collected hit) — the Arrow-batched UDF below touches k rows, never
    the corpus, so the distributed cost stays the search itself."""
    from pyspark.sql.functions import pandas_udf

    key = searcher.key_col
    terms = {t for _, t in searcher._collect_terms(query)}
    hits = searcher.search(query, k).select(key, "seg", "doc", "score")
    joined = hits.join(docs_df.select(key, text_col), key)

    @pandas_udf("array<string>")
    def frag_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: make_fragments(
            t, terms, frag_char_size=frag_char_size,
            max_num_fragments=max_num_fragments, pre=pre, post=post,
            score_ordered=score_ordered))

    return (
        joined.select(
            key, "seg", "doc",
            F.round(F.col("score"), 6).alias("score"),
            frag_udf(F.col(text_col)).alias("fragments"),
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
