"""SortField missing-value semantics (round-3 VERDICT missing #1).

Reference: sort_field.rs:28-110 (SortFieldMissingValue), field_comparator
.rs:124-367 (NumericDocValuesComparator substitutes the configured
missing value; unset numeric missing reads the doc-values default 0).
"""

import pytest
from pyspark.sql import functions as F

from rucene_spark.build import IndexWriter
from rucene_spark.query import MatchAllDocsQuery, SortField
from rucene_spark.search import IndexSearcher


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    rows = [
        # (doc_id, text, pop nullable long, tag nullable string)
        (0, "common a", 5, "m"),
        (1, "common b", None, "a"),
        (2, "common c", -3, None),
        (3, "common d", 9, "z"),
        (4, "common e", None, None),
        (5, "common f", 1, "k"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, pop long, tag string")
    d = str(tmp_path_factory.mktemp("sortfield_idx"))
    IndexWriter(spark, d, n_segments=2, key_col="doc_id",
                partitioner="range").build(df)
    return d


def _ids(df):
    return [r["doc_id"] for r in df.collect()]


def test_numeric_missing_defaults_to_zero(spark, idx):
    s = IndexSearcher(spark, idx)
    got = _ids(s.search_sorted(MatchAllDocsQuery(), [SortField("pop")], 6))
    # substituted 0 for docs 1 and 4: -3 < 0(=1) < 0(=4) < 1 < 5 < 9
    assert got == [2, 1, 4, 5, 0, 3]
    got_r = _ids(s.search_sorted(
        MatchAllDocsQuery(), [SortField("pop", reverse=True)], 6))
    assert got_r == [3, 0, 5, 1, 4, 2]


def test_numeric_explicit_missing_value(spark, idx):
    s = IndexSearcher(spark, idx)
    # missing treated as +1000: sorts above every real value
    got = _ids(s.search_sorted(
        MatchAllDocsQuery(), [SortField("pop", missing_value=1000)], 6))
    assert got == [2, 5, 0, 3, 1, 4]
    # missing as -1000: below every real value
    got = _ids(s.search_sorted(
        MatchAllDocsQuery(), [SortField("pop", missing_value=-1000)], 6))
    assert got == [1, 4, 2, 5, 0, 3]


def test_string_first_last(spark, idx):
    s = IndexSearcher(spark, idx)
    got = _ids(s.search_sorted(MatchAllDocsQuery(), [SortField("tag")], 6))
    assert got == [2, 4, 1, 5, 0, 3]          # missing first (default)
    got = _ids(s.search_sorted(
        MatchAllDocsQuery(), [SortField("tag", missing_value="last")], 6))
    assert got == [1, 5, 0, 3, 2, 4]          # missing last
    # reverse: "first" = lowest value, so it lands at the END descending
    got = _ids(s.search_sorted(
        MatchAllDocsQuery(), [SortField("tag", reverse=True)], 6))
    assert got == [3, 0, 5, 1, 2, 4]
    got = _ids(s.search_sorted(
        MatchAllDocsQuery(),
        [SortField("tag", reverse=True, missing_value="last")], 6))
    assert got == [2, 4, 3, 0, 5, 1]


def test_sort_field_errors(spark, idx):
    s = IndexSearcher(spark, idx)
    with pytest.raises(ValueError, match="unknown sort field"):
        s.search_sorted(MatchAllDocsQuery(), [SortField("nope")], 3)
    with pytest.raises(ValueError, match="first.*last|'first' or 'last'"):
        s.search_sorted(
            MatchAllDocsQuery(), [SortField("tag", missing_value="mid")], 3)


def test_mixed_columns_and_sort_fields(spark, idx):
    s = IndexSearcher(spark, idx)
    got = _ids(s.search_sorted(
        MatchAllDocsQuery(),
        [SortField("tag", missing_value="last"), F.desc("pop")], 6))
    assert got[0] == 1  # tag 'a' first; nulls last
