"""Query model + ES-subset query-string parser.

Dataclasses mirror the reference's ``Query`` tree semantics
(``/root/reference/src/core/search/query/``); ``__str__`` reproduces the
reference's ``Display`` formats so the parser golden tests port 1:1
(``query_string.rs:252-412``).

Builder simplification rules are preserved exactly:

* ``BooleanQuery.build`` — min_should_match defaulting (1 if no musts else 0,
  ``boolean_query.rs:47-55``), single-clause unwrap (``:66-75``),
  filter-only → ``ConstantScoreQuery(boost=0)`` (``:72``),
  pure-negation adds ``MatchAllDocsQuery`` (``:76-79``);
* ``BoostQuery.build`` — boost ≈ 1 unwraps (``boost_query.rs:40-46``);
* ``PhraseQuery.build`` — consecutive positions, normalized so the first is 0
  (``phrase_query.rs:103-135``), ≥2 terms required.

The parser is a 1:1 port of ``QueryStringQueryBuilder::parse_query``
(``query_string.rs:60-250``): ``+``→must, ``|``/space→should, ``(...)``
groups, quoted phrases with ``^boost``/``~slop`` suffixes, multi-field
expansion with per-field boosts.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field


def _fmt(x: float) -> str:
    """Rust `{}` Display of f32 for typical values: 1.0 → "1", 0.2 → "0.2"."""
    s = f"{float(x):g}"
    return s


class Query:
    """Base class; concrete queries below."""


@dataclass(frozen=True)
class SortField:
    """Typed sort key with explicit missing-value ordering
    (sort_field.rs:28-110; field_comparator.rs:124-367).

    ``missing_value`` semantics follow the reference comparators:

    * numeric fields — docs missing the field compare AS IF their value
      were ``missing_value``; when unset, the raw doc-values default 0
      (NumericDocValuesComparator reads 0 for absent docs when no
      missing value is configured).
    * string fields — ``"first"`` / ``"last"`` (SortFieldMissingValue::
      StringFirst/StringLast): missing sorts as the lowest / highest
      value in NATURAL order, so under ``reverse`` "first" lands at the
      end, exactly like a -inf/+inf substitute.

    ``reverse`` flips to descending (``is_reverse``)."""

    field: str
    reverse: bool = False
    missing_value: object = None


@dataclass
class TermQuery(Query):
    field: str
    term: str
    boost: float = 1.0

    def __str__(self) -> str:
        return f"TermQuery(field: {self.field}, term: {self.term}, boost: {_fmt(self.boost)})"


@dataclass
class BooleanQuery(Query):
    musts: list[Query] = dc_field(default_factory=list)
    shoulds: list[Query] = dc_field(default_factory=list)
    filters: list[Query] = dc_field(default_factory=list)
    must_nots: list[Query] = dc_field(default_factory=list)
    min_should_match: int = 0

    @staticmethod
    def build(
        musts: list[Query],
        shoulds: list[Query],
        filters: list[Query] | None = None,
        must_nots: list[Query] | None = None,
        min_should_match: int = 0,
    ) -> Query:
        filters = list(filters or [])
        must_nots = list(must_nots or [])
        musts = list(musts)
        shoulds = list(shoulds)
        # boolean_query.rs:47-55
        msm = min_should_match if min_should_match > 0 else (1 if not musts else 0)
        if not (musts or shoulds or filters or must_nots):
            raise ValueError("boolean query should at least contain one inner query!")
        # boolean_query.rs:66-75 single-clause simplification
        if not must_nots and len(musts) + len(shoulds) + len(filters) == 1:
            if musts:
                return musts[0]
            if shoulds:
                return shoulds[0]
            return ConstantScoreQuery(filters[0], 0.0)
        # boolean_query.rs:76-79 pure negation
        if not (musts or shoulds or filters):
            musts.append(MatchAllDocsQuery())
        return BooleanQuery(musts, shoulds, filters, must_nots, msm)

    def __str__(self) -> str:
        def j(qs):
            return ", ".join(str(q) for q in qs)

        return (
            f"BooleanQuery(must: [{j(self.musts)}], should: [{j(self.shoulds)}], "
            f"filters: [{j(self.filters)}], must_not: [{j(self.must_nots)}], "
            f"match: {self.min_should_match})"
        )


@dataclass
class PhraseQuery(Query):
    field: str
    terms: list[str]
    positions: list[int]
    slop: int = 0

    @staticmethod
    def build(field: str, terms: list[str], slop: int = 0,
              positions: list[int] | None = None) -> "PhraseQuery":
        if len(terms) < 2:
            raise ValueError("phrase query terms should not be less than 2!")
        if slop < 0:
            raise ValueError(f"Slop must be >= 0, got {slop}")
        if positions is None:
            positions = list(range(len(terms)))
        if sorted(positions) != positions:
            raise ValueError("Positions should not go backwards")
        first = positions[0]
        positions = [p - first for p in positions]  # phrase_query.rs:103-108
        return PhraseQuery(field, list(terms), positions, slop)

    def __str__(self) -> str:
        ts = ", ".join(self.terms)
        return f"PhraseQuery(field: {self.field}, terms: [{ts}], slop: {self.slop})"


@dataclass
class BoostQuery(Query):
    query: Query
    boost: float

    @staticmethod
    def build(query: Query, boost: float) -> Query:
        # boost_query.rs:40-46
        if abs(boost - 1.0) <= 1.1920929e-07:
            return query
        return BoostQuery(query, boost)

    def __str__(self) -> str:
        return f"BoostQuery(query: {self.query}, boost: {_fmt(self.boost)})"


@dataclass
class ConstantScoreQuery(Query):
    query: Query
    boost: float = 1.0

    def __str__(self) -> str:
        return f"ConstantScoreQuery(query: {self.query}, boost: {_fmt(self.boost)})"


@dataclass
class MatchAllDocsQuery(Query):
    def __str__(self) -> str:
        return "MatchAllDocsQuery"


@dataclass
class DisjunctionMaxQuery(Query):
    disjuncts: list[Query]
    tie_breaker: float = 0.0

    def __str__(self) -> str:
        ds = ", ".join(str(q) for q in self.disjuncts)
        return f"DisjunctionMaxQuery(disjuncts: [{ds}], tie_breaker: {_fmt(self.tie_breaker)})"


@dataclass
class BoostingQuery(Query):
    """Positive query scores; docs also matching ``negative`` get their score
    multiplied by ``negative_boost`` (boosting_query.rs:29-60)."""

    positive: Query
    negative: Query
    negative_boost: float

    def __str__(self) -> str:
        return (
            f"BoostingQuery(positive: {self.positive}, negative: {self.negative}, "
            f"negative_boost: {_fmt(self.negative_boost)})"
        )


@dataclass
class MinScoreQuery(Query):
    """Keeps only docs whose score is strictly greater than ``min_score``
    (min_scorer.rs:21-79: ``matches() = origin.matches() && score > min``).
    The wrapped query is scored normally; the cutoff is a post-filter."""

    query: Query
    min_score: float

    def __str__(self) -> str:
        return f"MinScoreQuery(query: {self.query}, min_score: {_fmt(self.min_score)})"


@dataclass
class RangeQuery(Query):
    """Numeric/temporal range over a doc-values column — the DataFrame-native
    analogue of PointRangeQuery (point_range_query.rs:37-130). Bounds are
    inclusive; exclusive callers pre-nudge like the reference's factories."""

    column: str
    lower: object = None
    upper: object = None

    def __str__(self) -> str:
        return f"RangeQuery(column: {self.column}, lower: {self.lower}, upper: {self.upper})"


@dataclass
class MultiRangeQuery(Query):
    """Conjunction of per-column ranges — the multi-dimensional
    PointRangeQuery (bkd_writer.rs: up to 8 dims); each dim prunes via
    Parquet column stats, the conjunction is one scan."""

    ranges: list[tuple]  # (column, lower|None, upper|None)

    def __str__(self) -> str:
        rs = ", ".join(f"{c}:[{lo}, {hi}]" for c, lo, hi in self.ranges)
        return f"MultiRangeQuery({rs})"


@dataclass
class ExistsQuery(Query):
    """Docs having any value for a doc-values column (exists_query.rs:30-56)."""

    column: str

    def __str__(self) -> str:
        return f"ExistsQuery(column: {self.column})"


@dataclass
class FilterQuery(Query):
    """Wraps a query with an extra per-doc predicate applied after candidate
    generation (filter_query.rs:28-52 — FilterFunction analogue). The
    predicate is either a Spark Column expression over docmeta columns, or a
    pandas-batch callable ``fn(pdf) -> bool mask`` (run via an Arrow UDF)."""

    query: Query
    predicate: object  # pyspark Column or callable(pd.DataFrame)->mask

    def __str__(self) -> str:
        return f"FilterQuery(query: {self.query})"


# ---------------------------------------------------------------------------
# span queries (src/core/search/query/spans/)
# ---------------------------------------------------------------------------


class SpanQuery(Query):
    """Base for position-aware span queries (span.rs:64-70)."""


@dataclass
class SpanTermQuery(SpanQuery):
    """Spans = the term's positions, each of width 0 (span_term.rs)."""

    field: str
    term: str

    def __str__(self) -> str:
        return f"SpanTermQuery(field: {self.field}, term: {self.term})"


@dataclass
class SpanNearQuery(SpanQuery):
    """Sub-spans near each other (span_near.rs:94-215): ordered
    (non-overlapping, in clause order, Σ gaps <= slop) or unordered
    (max_end - min_start - Σ lengths <= slop). All clauses must share
    one field (span_near.rs:102-118)."""

    clauses: list[SpanQuery]
    slop: int = 0
    in_order: bool = True

    def __post_init__(self):
        if len(self.clauses) < 2:
            raise ValueError("SpanNearQuery needs at least 2 clauses")
        fields = {c.field for c in self.clauses if not isinstance(c, SpanGapQuery)}
        if len(fields) != 1:
            raise ValueError(f"span clauses must share one field: {fields}")
        if any(isinstance(c, SpanGapQuery) for c in self.clauses) \
                and not self.in_order:
            raise ValueError("span gap requires an ordered near")
        if isinstance(self.clauses[0], SpanGapQuery):
            raise ValueError("span gap cannot be the first clause")

    @property
    def field(self) -> str:
        for c in self.clauses:
            if not isinstance(c, SpanGapQuery):
                return c.field
        raise ValueError("no non-gap clause")

    def __str__(self) -> str:
        cs = ", ".join(str(c) for c in self.clauses)
        return (f"SpanNearQuery(clauses: [{cs}], slop: {self.slop},"
                f" in_order: {self.in_order})")


@dataclass
class SpanOrQuery(SpanQuery):
    """Positional union of sub-spans (span_or.rs)."""

    clauses: list[SpanQuery]

    def __post_init__(self):
        if not self.clauses:
            raise ValueError("SpanOrQuery needs at least 1 clause")
        if len({c.field for c in self.clauses}) != 1:
            raise ValueError("span clauses must share one field")

    @property
    def field(self) -> str:
        return self.clauses[0].field

    def __str__(self) -> str:
        cs = ", ".join(str(c) for c in self.clauses)
        return f"SpanOrQuery(clauses: [{cs}])"


@dataclass
class SpanGapQuery(SpanQuery):
    """A virtual in-order clause consuming ``width`` positions
    (span_near.rs:855-900)."""

    field: str
    width: int

    def __str__(self) -> str:
        return f"SpanGapQuery(field: {self.field}, width: {self.width})"


@dataclass
class SpanBoostQuery(SpanQuery):
    """Counterpart of BoostQuery for spans (span_boost.rs:38-60): wraps a
    span query and multiplies the boost flowing into the span tree's
    similarity weight (``normalize``'s ``b = boost * self.boost``,
    span_boost.rs:290-291). Matching is untouched; nested inside another
    span query it is a scoring no-op, exactly like the reference (inner
    span weights are built with ``needs_scores=false``,
    span_boost.rs:70-76)."""

    query: SpanQuery
    boost: float = 1.0

    @property
    def field(self) -> str:
        return self.query.field

    def __str__(self) -> str:
        return f"SpanBoostQuery(query: {self.query}, boost: {self.boost})"


def span_spec(q: SpanQuery, ti_of: dict) -> tuple:
    """Compile a span query tree to the kernel spec (spans.py), mapping
    terms through ``ti_of``."""
    if isinstance(q, SpanBoostQuery):
        return span_spec(q.query, ti_of)  # boost never affects matching
    if isinstance(q, SpanTermQuery):
        return ("term", ti_of[q.term])
    if isinstance(q, SpanOrQuery):
        return ("or", [span_spec(c, ti_of) for c in q.clauses])
    if isinstance(q, SpanGapQuery):
        return ("gap", q.width)
    if isinstance(q, SpanNearQuery):
        return ("near", [span_spec(c, ti_of) for c in q.clauses],
                q.slop, q.in_order)
    raise TypeError(f"not a span query: {type(q)}")


def span_terms(q: SpanQuery) -> list[str]:
    """Distinct terms of a span tree in depth-first order (the order the
    combined idf weight is f32-accumulated in; SpanWeight term extraction)."""
    if isinstance(q, SpanBoostQuery):
        return span_terms(q.query)
    if isinstance(q, SpanTermQuery):
        return [q.term]
    if isinstance(q, (SpanOrQuery, SpanNearQuery)):
        seen: list[str] = []
        for c in q.clauses:
            for t in span_terms(c):
                if t not in seen:
                    seen.append(t)
        return seen
    if isinstance(q, SpanGapQuery):
        return []
    raise TypeError(f"not a span query: {type(q)}")


# ---------------------------------------------------------------------------
# query-string parser (query_string.rs:28-250)
# ---------------------------------------------------------------------------


class QueryStringQueryBuilder:
    def __init__(
        self,
        query_string: str,
        fields: list[tuple[str, float]],
        min_should_match: int = 0,
        boost: float = 1.0,
    ) -> None:
        self.query_string = query_string
        self.fields = fields
        self.min_should_match = min_should_match
        self.boost = boost

    def build(self) -> Query:
        q = self._parse_query(iter(self.query_string), None)
        if q is None:
            raise ValueError("empty query string!")
        return q

    def _parse_query(self, chars, end_char: str | None) -> Query | None:
        musts: list[Query] = []
        shoulds: list[Query] = []
        is_option = True
        for ch in chars:
            if ch == "+":
                is_option = False
            elif ch == "|":
                is_option = True
            elif ch == "(":
                sub = self._parse_query(chars, ")")
                if sub is not None:
                    (shoulds if is_option else musts).append(sub)
            elif ch == '"':
                term_chars: list[str] = []
                for c in chars:
                    if c == '"':
                        break
                    term_chars.append(c)
                nxt = next(chars, None)
                if nxt in ("^", "~"):
                    term_chars.append(nxt)
                    for c in chars:
                        if c == " ":
                            break
                        term_chars.append(c)
                if term_chars:
                    q = self._build_field_query("".join(term_chars))
                    (shoulds if is_option else musts).append(q)
                is_option = True
            elif ch == " ":
                is_option = True
            elif ch == ")":
                if end_char != ")":
                    raise ValueError("parenthesis not match!")
                break
            else:
                term_chars = [ch]
                should_return = False
                for c in chars:
                    if c == " ":
                        break
                    if c == ")":
                        if end_char != ")":
                            raise ValueError("parenthesis not match!")
                        should_return = True
                        break
                    term_chars.append(c)
                if term_chars:
                    q = self._build_field_query("".join(term_chars))
                    (shoulds if is_option else musts).append(q)
                is_option = True
                if should_return:
                    break
        if len(musts) + len(shoulds) == 1:
            return musts[0] if musts else shoulds[0]
        return BooleanQuery.build(musts, shoulds, [], [], self.min_should_match)

    def _build_field_query(self, term_boost: str) -> Query:
        if "~" in term_boost:
            queries = self._field_phrase_query(term_boost)
        else:
            queries = self._field_term_query(term_boost)
        if len(queries) == 1:
            return queries[0]
        return BooleanQuery.build([], queries, [], [], self.min_should_match)

    def _field_term_query(self, query: str) -> list[Query]:
        if "^" in query:
            i = query.index("^")
            term, boost = query[:i], float(query[i + 1:])
        else:
            term, boost = query, 1.0
        if term.startswith('"'):
            # query_string.rs:207-210 — byte-length based strip of quotes
            nbytes = len(term.encode("utf-8"))
            term = term[1:][: max(nbytes - 2, 0)]
        return [TermQuery(f, term, fb * boost) for (f, fb) in self.fields]

    def _field_phrase_query(self, query: str) -> list[Query]:
        idx = query.index("~")
        t, slop_str = query[:idx], query[idx + 1:]
        slop = int(slop_str)
        term_strs = t.split()
        if len(term_strs) < 2:
            raise ValueError("phrase query terms size must not small than 2")
        return [
            BoostQuery.build(PhraseQuery.build(f, term_strs, slop), fb)
            for (f, fb) in self.fields
        ]
