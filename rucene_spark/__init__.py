"""rucene_spark — a PySpark-native inverted-index build + BM25 top-k query
engine with the query semantics of zhihu/rucene (a Rust port of Lucene 6.2.1).

Not a port: segments are Parquet tables built by Arrow UDFs, the terms hash is
a Spark shuffle, scorer trees dissolve into joins/aggregations, and the top-k
collector is ``TakeOrderedAndProject``. See SURVEY.md for the full mapping.
"""

__version__ = "0.1.0"
