"""Semantic checks for the training-data pipeline operators (the DuckDB
value-identity gate lives in tools/check_oracle.py; these assert the
*meaning* on corpora with known duplicates/similarities)."""

import pytest

from rucene_spark import ann, dedup, multimodal, textops


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, base),
        (1, base),                                       # exact dup of 0
        (2, base.replace("lazy", "sleepy")),             # near dup
        (3, "completely different content about spark engines and indexes"),
        (4, "the quick brown fox jumps over the lazy cat again and again"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(docs):
    rows = {r["doc_id"]: r for r in dedup.exact_dedup(docs).collect()}
    assert rows[0]["canonical_id"] == 0 and rows[0]["group_size"] == 2
    assert rows[1]["canonical_id"] == 0 and rows[1]["group_size"] == 2
    assert rows[3]["group_size"] == 1


def test_minhash_identical_docs_share_signature(docs):
    sig = {r["doc_id"]: tuple(r[f"mh_{i}"] for i in range(8))
           for r in dedup.minhash_signatures(docs).collect()}
    assert sig[0] == sig[1]
    assert sig[0] != sig[3]


def test_minhash_candidates_rank_near_dups_first(docs):
    pairs = dedup.minhash_candidates(docs, limit=10).collect()
    assert pairs, "duplicate docs must collide in at least one band"
    top = pairs[0]
    assert (top["doc_a"], top["doc_b"]) == (0, 1)
    assert top["jaccard"] == 1.0


def test_ngram_jaccard_ordering(docs):
    pairs = dedup.ngram_jaccard_topk(docs, limit=10).collect()
    ranked = [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in pairs]
    assert ranked[0][:2] == (0, 1) and ranked[0][2] == 1.0
    j = {(a, b): v for a, b, v in ranked}
    # near-dup (one word changed) scores below exact but above unrelated
    assert 0.3 < j.get((0, 2), 0) < 1.0
    assert (0, 3) not in j or j[(0, 3)] < j[(0, 2)]


def test_simhash_identical_zero_hamming(docs):
    sig = {r["doc_id"]: r["simhash"]
           for r in dedup.simhash_signatures(docs).collect()}
    assert sig[0] == sig[1]
    pairs = dedup.simhash_near_pairs(docs, max_hamming=60, limit=10).collect()
    ham = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs}
    assert ham.get((0, 1)) == 0
    near = ham.get((0, 2))
    assert near is not None and near <= ham.get((0, 3), 61)


def test_token_stats_and_fingerprint_order_sensitivity(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "gamma beta alpha"), (2, "alpha beta gamma")],
        "doc_id long, text string",
    )
    ts = {r["doc_id"]: r for r in textops.token_stats(df).collect()}
    assert ts[0]["n_tokens"] == 3
    assert ts[0]["n_subwords"] == 2 + 1 + 2  # ceil(5/4)+ceil(4/4)+ceil(5/4)
    fp = {r["doc_id"]: r["fp"] for r in textops.fingerprints(df).collect()}
    assert fp[0] == fp[2]
    assert fp[0] != fp[1]  # order-sensitive


def test_lang_id_heuristic(spark):
    df = spark.createDataFrame(
        [(0, "the cat sat of the mat and it is a cat"),
         (1, "der hund und die katze das ist ein hund"),
         (2, "搜索 索引 查询 分词")],
        "doc_id long, text string",
    )
    pred = {r["doc_id"]: r["pred_lang"] for r in textops.lang_id(df).collect()}
    assert pred == {0: "en", 1: "de", 2: "zh"}


@pytest.fixture(scope="module")
def emb(spark):
    import numpy as np
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(40, 64)).astype("float32")
    vecs[1] = vecs[0] + rng.normal(scale=0.01, size=64).astype("float32")
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ann_bruteforce_finds_planted_neighbor(emb):
    top = ann.ann_bruteforce(emb, 0, k=3).collect()
    assert top[0]["vec_id"] == 1
    assert top[0]["cosine"] > 0.99


def test_ann_lsh_subset_of_bruteforce_order(emb):
    brute = [r["vec_id"] for r in ann.ann_bruteforce(emb, 0, k=40).collect()]
    lsh = ann.ann_lsh(emb, 0, k=40).collect()
    lsh_ids = [r["vec_id"] for r in lsh]
    # LSH results are a subset, in the same relative cosine order
    assert set(lsh_ids) <= set(brute)
    assert lsh_ids == [v for v in brute if v in set(lsh_ids)]
    # the planted near-identical vector lands in the query's bucket
    assert 1 in lsh_ids


def test_lsh_buckets_deterministic(emb):
    b1 = {r["vec_id"]: r["bucket"] for r in ann.lsh_buckets(emb).collect()}
    b2 = {r["vec_id"]: r["bucket"] for r in ann.lsh_buckets(emb).collect()}
    assert b1 == b2
    assert b1[0] == b1[1]  # near-identical vectors share the bucket


def test_multimodal_stub_and_plumbing(spark):
    df = spark.createDataFrame([(0, "PNGx hello world")],
                               "doc_id long, text string")
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"\x89PNG")
    row = multimodal.extract_metadata(df).collect()[0]
    assert row["n_bytes"] == 16
    assert row["magic"] == "PNGx"
    assert row["fake_width"] == ord("P")
    assert row["fake_height"] == ord("N")


# ---------------------------------------------------------------------------
# scale guards: blocking must stay sub-quadratic under skewed keys
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def skewed_docs(spark):
    """120 docs all sharing one hot 3-gram ('alpha beta gamma'), plus two
    true near-dup pairs that also share RARE shingles."""
    rows = []
    for i in range(120):
        rows.append((i, f"alpha beta gamma unique{i}a unique{i}b unique{i}c"))
    # near-dup pairs: share long rare tails
    rows.append((200, "alpha beta gamma shared tail one two three four"))
    rows.append((201, "alpha beta gamma shared tail one two three five"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _blocked_pair_count(sh, spark, cap):
    from pyspark.sql import functions as F
    rare = (sh.groupBy("sh").agg(F.count("*").alias("df"))
            .where(F.col("df") <= cap).select("sh"))
    blocked = sh.join(rare, "sh")
    return (
        blocked.select(F.col("doc_id").alias("a"), "sh")
        .join(blocked.select(F.col("doc_id").alias("b"), "sh"), "sh")
        .where(F.col("a") < F.col("b"))
        .select("a", "b").distinct().count()
    )


def test_ngram_blocking_df_cap_is_subquadratic(spark, skewed_docs):
    """The hot shingle alone would emit ~n²/2 candidate pairs; with the df
    cap the candidate count collapses to the rare-key pairs, and the true
    near-dup pair still surfaces (it shares rare shingles too)."""
    sh = dedup._shingles(skewed_docs)
    n = skewed_docs.count()
    uncapped = _blocked_pair_count(sh, spark, 10**9)
    capped = _blocked_pair_count(sh, spark, 50)
    assert uncapped >= n * (n - 1) // 2  # the hot key goes quadratic
    assert capped < 10 * n               # sub-quadratic after the cap

    pairs = dedup.ngram_jaccard_topk(skewed_docs, limit=5,
                                     shingle_df_cap=50).collect()
    assert (pairs[0]["doc_a"], pairs[0]["doc_b"]) == (200, 201)
    # jaccard is computed on ALL shingles (verification is uncapped)
    assert pairs[0]["jaccard"] > 0.5


def test_minhash_band_bucket_cap(spark, skewed_docs):
    """Degenerate band buckets are dropped; docs colliding through their
    selective bands still pair up."""
    pairs = dedup.minhash_candidates(skewed_docs, limit=5,
                                     bucket_cap=60).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (200, 201) in got


def test_ann_nplanes_and_bucket_cap(spark):
    """n_planes scales the bucket space; the near-dup bucket cap drops
    degenerate buckets instead of going quadratic."""
    import numpy as np
    rng = np.random.default_rng(3)
    # 60 vectors in ONE direction cluster (same bucket) + 20 spread out
    base = rng.normal(size=64)
    rows = []
    for i in range(60):
        v = base + rng.normal(scale=0.01, size=64)
        rows.append((i, [float(x) for x in v]))
    for i in range(60, 80):
        rows.append((i, [float(x) for x in rng.normal(size=64)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    b8 = ann.lsh_buckets(df).collect()
    b12 = ann.lsh_buckets(df, n_planes=12).collect()
    assert max(r["bucket"] for r in b8) < 256
    assert max(r["bucket"] for r in b12) >= 256  # wider signature space

    # cluster bucket (>=60 members) is dropped by the cap → few/no pairs
    capped = ann.embedding_neardup(df, limit=1000, bucket_cap=50).collect()
    uncapped = ann.embedding_neardup(df, limit=10000,
                                     bucket_cap=10**9).collect()
    assert len(uncapped) >= 60 * 59 // 2
    assert len(capped) < 60 * 59 // 2


def test_ann_multiprobe_recall(spark):
    """Multi-probe widens the probe set: results are a superset of the
    single-bucket probe and recall vs brute force never decreases."""
    import numpy as np
    rng = np.random.default_rng(4)
    rows = [(i, [float(x) for x in rng.normal(size=64)]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    brute = {r["vec_id"] for r in ann.ann_bruteforce(df, 0, k=10).collect()}
    single = {r["vec_id"] for r in ann.ann_lsh(df, 0, k=10).collect()}
    probed = {r["vec_id"] for r in
              ann.ann_lsh(df, 0, k=10, multiprobe=2).collect()}
    assert len(probed & brute) >= len(single & brute)
    assert len(probed) >= len(single)


# ---------------------------------------------------------------------------
# duplicate-cluster resolution (connected components)
# ---------------------------------------------------------------------------


def test_dedup_clusters_transitive(spark):
    """A~B and B~C (but A and C more distant) must land in ONE cluster:
    connected components, not pairwise grouping."""
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (0, base),
        (1, base.replace("juliet", "kilo")),     # near dup of 0
        (2, base.replace("juliet", "kilo").replace("alpha", "zulu")),  # near 1
        (3, "totally unrelated words about spark clusters and parquet files"),
        (4, base),                               # exact dup of 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           dedup.dedup_clusters(df, threshold=0.5).collect()}
    assert len(out) == 5                      # every doc appears exactly once
    assert out[0]["cluster_id"] == 0 and out[4]["cluster_id"] == 0
    assert out[1]["cluster_id"] == 0 and out[2]["cluster_id"] == 0
    assert out[3]["cluster_id"] == 3 and out[3]["cluster_size"] == 1
    assert out[0]["cluster_size"] == 4
    assert out[0]["is_canonical"] == 1 and out[1]["is_canonical"] == 0
    # exactly one canonical per cluster
    canon = [r for r in out.values() if r["is_canonical"] == 1]
    assert {c["cluster_id"] for c in canon} == {0, 3}


def test_dedup_clusters_chain_converges(spark):
    """A chain a0~a1~a2~a3 (each adjacent pair near-dup) converges to one
    component even though the ends share little — exercises >1 label
    propagation round."""
    words = ("w%d " * 12).strip()
    texts = []
    vocab = [f"t{i}" for i in range(16)]
    for s in range(4):                     # doc s uses vocab[s : s+12]
        texts.append((s, " ".join(vocab[s:s + 12])))
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = {r["doc_id"]: r["cluster_id"] for r in
           dedup.dedup_clusters(df, threshold=0.4).collect()}
    assert set(out.values()) == {0}


# ---------------------------------------------------------------------------
# IVF ANN
# ---------------------------------------------------------------------------


def test_ivf_assign_covers_all_and_is_deterministic(emb):
    a1 = {r["vec_id"]: r["cell"] for r in ann.ivf_assign(emb).collect()}
    a2 = {r["vec_id"]: r["cell"] for r in ann.ivf_assign(emb).collect()}
    assert a1 == a2
    assert len(a1) == 40
    assert a1[0] == a1[1]            # near-identical vectors share the cell
    cells = set(a1.values())
    assert 1 < len(cells) <= 8       # quantizer actually partitions


def test_ann_ivf_subset_of_bruteforce_order(emb):
    brute = [r["vec_id"] for r in ann.ann_bruteforce(emb, 0, k=40).collect()]
    ivf = [r["vec_id"] for r in ann.ann_ivf(emb, 0, k=40).collect()]
    assert set(ivf) <= set(brute)
    assert ivf == [v for v in brute if v in set(ivf)]
    assert 1 in ivf                  # planted neighbor shares the query cell


def test_ann_ivf_nprobe_recall_monotone(emb):
    brute = {r["vec_id"] for r in ann.ann_bruteforce(emb, 0, k=10).collect()}
    r1 = {r["vec_id"] for r in ann.ann_ivf(emb, 0, k=10, nprobe=1).collect()}
    r4 = {r["vec_id"] for r in ann.ann_ivf(emb, 0, k=10, nprobe=4).collect()}
    r8 = {r["vec_id"] for r in ann.ann_ivf(emb, 0, k=10, nprobe=8).collect()}
    assert len(r4 & brute) >= len(r1 & brute)
    assert r8 == brute               # probing every cell = exact


# ---------------------------------------------------------------------------
# clean-corpus composition
# ---------------------------------------------------------------------------


def test_clean_corpus_composition(spark):
    from rucene_spark.pipeline import clean_corpus
    good = ("the and is in to of a for on with this that " * 8).strip()
    rows = [
        (0, good),                                  # survives
        (1, good),                                  # exact dup -> dropped
        (2, good + " extra"),                       # near dup of 0 -> dropped
        (3, "der die und ist das ein nicht mit " * 8),   # german -> dropped
        (4, "x"),                                   # low quality -> dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = clean_corpus(df).collect()
    assert [r["doc_id"] for r in kept] == [0]
    assert kept[0]["pred_lang"] == "en"
