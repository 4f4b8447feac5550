import shutil
import tempfile

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("rucene-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture()
def tmp_index():
    d = tempfile.mkdtemp(prefix="rucene_idx_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# shared fuzz helpers (test_engine_parity, test_merged_fuzz)
# ---------------------------------------------------------------------------


def corpus_query_material(corpus):
    """(vocab, bigrams) for random query trees: head/mid/tail-df terms from
    the corpus plus guaranteed misses, and real adjacent-token bigrams."""
    from collections import Counter

    toks = [t for text in corpus["text"].head(60) for t in text.split(" ")]
    by_freq = [t for t, _ in Counter(toks).most_common()]
    vocab = (by_freq[:5] + by_freq[len(by_freq) // 2:len(by_freq) // 2 + 10]
             + by_freq[-10:] + ["zz_missing_a", "zz_missing_b"])
    bigrams = []
    for text in corpus["text"].head(30):
        ts = text.split(" ")
        for i in range(0, min(len(ts) - 1, 8)):
            bigrams.append((ts[i], ts[i + 1]))
    return vocab, bigrams


def random_query_tree(rng, vocab, bigrams, depth=0):
    """One random query tree: terms (incl. misses), exact/sloppy phrases
    over real and fake bigrams, spans, dismax/boost/constant wrappers and
    nested booleans with msm/filters/must_nots."""
    from rucene_spark.query import (BooleanQuery, BoostQuery,
                                    ConstantScoreQuery, DisjunctionMaxQuery,
                                    PhraseQuery, SpanNearQuery, SpanTermQuery,
                                    TermQuery)

    r = rng.random()
    if depth >= 2 or r < 0.30:
        return TermQuery("text", vocab[int(rng.integers(len(vocab)))])
    if r < 0.45:
        a, b = bigrams[int(rng.integers(len(bigrams)))]
        terms = [a, b]
        if rng.random() < 0.2:
            terms.append(vocab[int(rng.integers(len(vocab)))])
        return PhraseQuery.build("text", terms, slop=int(rng.integers(0, 3)))
    if r < 0.55:
        a, b = bigrams[int(rng.integers(len(bigrams)))]
        return SpanNearQuery(
            [SpanTermQuery("text", a), SpanTermQuery("text", b)],
            slop=int(rng.integers(0, 4)),
            in_order=bool(rng.random() < 0.5))
    if r < 0.63:
        subs = [random_query_tree(rng, vocab, bigrams, depth + 1)
                for _ in range(2 + int(rng.integers(2)))]
        return DisjunctionMaxQuery(subs, float(rng.random() * 0.5))
    if r < 0.69:
        return ConstantScoreQuery(
            random_query_tree(rng, vocab, bigrams, depth + 1),
            float(1 + rng.random()))
    if r < 0.75:
        return BoostQuery(random_query_tree(rng, vocab, bigrams, depth + 1),
                          float(0.5 + rng.random()))
    musts = [random_query_tree(rng, vocab, bigrams, depth + 1)
             for _ in range(int(rng.integers(0, 3)))]
    shoulds = [random_query_tree(rng, vocab, bigrams, depth + 1)
               for _ in range(int(rng.integers(0, 3)))]
    must_nots = [random_query_tree(rng, vocab, bigrams, depth + 1)
                 for _ in range(int(rng.integers(0, 2)))]
    filters = [random_query_tree(rng, vocab, bigrams, depth + 1)
               for _ in range(int(rng.integers(0, 2)))]
    if not (musts or shoulds or filters):
        shoulds = [random_query_tree(rng, vocab, bigrams, depth + 1)]
    msm = (int(rng.integers(0, len(shoulds) + 1))
           if shoulds and not musts else 0)
    return BooleanQuery.build(musts, shoulds, filters, must_nots,
                              min_should_match=msm)
