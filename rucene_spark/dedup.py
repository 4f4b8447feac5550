"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, and n-gram Jaccard similarity self-join.

Beyond the reference's scope (rucene is a search library); these are the
curation ops a 10^12-doc webtext corpus needs before indexing. Scale notes:

* exact dedup: one hash-groupBy on md5(text) — canonical doc is a
  min-aggregation; raw text never shuffles twice;
* MinHash: shingle → md5-based 31-bit hash → k permutation mins, all JVM
  expressions over an exploded (doc, shingle) frame; the LSH bucket join
  groups by (band, signature) so a bucket's cost is candidate-pair-sized,
  never corpus-sized;
* SimHash: (token, tf) × 60 bit positions → per-bit weighted sign sums —
  plain groupBy aggregations, skew-free by construction;
* pair verification computes exact Jaccard only on LSH candidates; the
  exhaustive n-gram variant blocks on shared shingles (the inverted-index
  trick for similarity self-joins — pairs sharing no shingle never meet).

Every operator has a value-identical DuckDB oracle (same md5-derived
hashes, same permutation constants) defined alongside, so the driver's
correctness gate checks the *values*, not just shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textops import MERSENNE31, h31, h31_sql, h60, h60_sql

# fixed permutation constants (a, b) for MinHash — primes, shared with SQL
MINHASH_PERMS = [
    (334213, 921577), (574237, 329081), (741103, 513239), (989191, 764951),
    (122497, 440213), (663893, 287117), (851981, 602477), (415391, 993149),
]
N_BANDS = 4        # bands of 2 rows over the 8 permutations
SHINGLE_K = 3
SIMHASH_BITS = 60  # our portable hash is 60-bit

#: Blocking-key frequency caps — the 100-TB guards. A stopword shingle
#: ("of the and") that appears in f docs makes its blocking key cost
#: O(f²) pairs; capping key frequency keeps the candidate set
#: sub-quadratic while near-dup pairs (which share RARE keys too) still
#: meet. Both caps are mirrored into the DuckDB oracles, so gate results
#: stay value-identical by construction.
SHINGLE_DF_CAP = 200     # drop blocking shingles with df > cap
BAND_BUCKET_CAP = 200    # drop LSH band buckets larger than cap


def _shingles(df: DataFrame) -> DataFrame:
    """Distinct word-3-gram shingles per doc → (doc_id, sh)."""
    return (
        df.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, greatest(size(split(text, ' ')) - {SHINGLE_K - 1}, 1)),"
                    f" i -> concat_ws(' ', slice(split(text, ' '), i, {SHINGLE_K})))"
                )
            ).alias("sh"),
        )
        .where(F.size(F.split(F.col("sh"), " ")) == SHINGLE_K)
        .distinct()
    )


_SHINGLES_SQL = f"""
  SELECT DISTINCT doc_id,
         unnest([ concat(parts[i], ' ', parts[i+1], ' ', parts[i+2])
                  for i in range(1, len(parts) - 1) ]) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS parts FROM documents)
  WHERE len(parts) >= {SHINGLE_K}
"""


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame) -> DataFrame:
    """(doc_id, canonical_id, group_size): canonical = min doc_id sharing
    the same content hash. One shuffle on md5(text)."""
    hashed = df.select("doc_id", F.md5("text").alias("_h"))
    groups = hashed.groupBy("_h").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count("*").alias("group_size"),
    )
    return (
        hashed.join(groups, "_h")
        .select("doc_id", "canonical_id", "group_size")
        .orderBy("doc_id")
    )


EXACT_DEDUP_SQL = """
WITH h AS (SELECT doc_id, md5(text) AS hh FROM documents),
g AS (SELECT hh, min(doc_id) AS canonical_id, count(*) AS group_size
      FROM h GROUP BY hh)
SELECT doc_id, canonical_id, group_size
FROM h JOIN g USING (hh) ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# MinHash signatures + LSH candidate pairs
# ---------------------------------------------------------------------------


def minhash_signatures(df: DataFrame) -> DataFrame:
    """(doc_id, mh_0..mh_7): k-permutation MinHash over word-3-gram shingles."""
    sh = _shingles(df).withColumn("_h", h31(F.col("sh")))
    aggs = [
        F.min((F.lit(a) * F.col("_h") + F.lit(b)) % MERSENNE31).alias(f"mh_{i}")
        for i, (a, b) in enumerate(MINHASH_PERMS)
    ]
    return sh.groupBy("doc_id").agg(*aggs).orderBy("doc_id")


def _minhash_sig_core_sql() -> str:
    mins = ", ".join(
        f"min(({a} * hh + {b}) % {MERSENNE31}) AS mh_{i}"
        for i, (a, b) in enumerate(MINHASH_PERMS)
    )
    return f"""
WITH sh AS ({_SHINGLES_SQL}),
hs AS (SELECT doc_id, {h31_sql('sh')} AS hh FROM sh),
sig AS (SELECT doc_id, {mins} FROM hs GROUP BY doc_id)
"""


MINHASH_SIG_SQL = _minhash_sig_core_sql() + "SELECT * FROM sig ORDER BY doc_id"


def _bands(sig: DataFrame) -> DataFrame:
    return sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.concat_ws(":", F.col(f"mh_{2 * i}"), F.col(f"mh_{2 * i + 1}"))
                    .alias("sig"),
                )
                for i in range(N_BANDS)
            ])
        ).alias("b"),
    ).select("doc_id", "b.band", "b.sig")


def _pair_jaccard(pairs: DataFrame, sh: DataFrame,
                  limit: int | None) -> DataFrame:
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        pairs.join(sh.select(F.col("doc_id").alias("doc_a"), "sh"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "sh"), ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("_i"))
    )
    scored = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"),
                                F.col("n").alias("_na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("n").alias("_nb")), "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(F.col("_i") / (F.col("_na") + F.col("_nb") - F.col("_i")), 6)
            .alias("jaccard"),
        )
    )
    if limit is None:
        return scored
    return scored.orderBy(F.desc("jaccard"), "doc_a", "doc_b").limit(limit)


def _lsh_pairs(df: DataFrame, bucket_cap: int) -> DataFrame:
    """Distinct LSH candidate pairs (doc_a < doc_b), degenerate band
    buckets (> bucket_cap members) dropped."""
    bands = _bands(minhash_signatures(df))
    small = (bands.groupBy("band", "sig")
             .agg(F.count("*").alias("_bs"))
             .where(F.col("_bs") <= bucket_cap)
             .select("band", "sig"))
    bands = bands.join(small, ["band", "sig"])
    return (
        bands.alias("a").join(bands.alias("b"), ["band", "sig"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_candidates(df: DataFrame, limit: int = 20,
                       bucket_cap: int = BAND_BUCKET_CAP) -> DataFrame:
    """LSH candidate pairs (4 bands × 2 rows) verified with exact shingle
    Jaccard; top ``limit`` by (jaccard desc, doc_a, doc_b). A degenerate
    band signature shared by b docs would emit b² candidates — buckets
    larger than ``bucket_cap`` are dropped (their members still meet
    through their other, selective bands)."""
    return _pair_jaccard(_lsh_pairs(df, bucket_cap), _shingles(df), limit)


def _bands_sql() -> str:
    band_ids = ", ".join(str(i) for i in range(N_BANDS))
    sigs = ", ".join(
        f"concat(mh_{2 * i}, ':', mh_{2 * i + 1})" for i in range(N_BANDS)
    )
    return f"""
bands AS (
  SELECT doc_id, unnest([{band_ids}]) AS band, unnest([{sigs}]) AS bsig
  FROM sig)
"""


_PAIR_JACCARD_SQL = """
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS i
  FROM pairs p
  JOIN sh sa ON sa.doc_id = p.doc_a
  JOIN sh sb ON sb.doc_id = p.doc_b AND sb.sh = sa.sh
  GROUP BY p.doc_a, p.doc_b)
SELECT doc_a, doc_b,
       round(i / (na.n + nb.n - i), 6) AS jaccard
FROM inter
JOIN sizes na ON na.doc_id = doc_a
JOIN sizes nb ON nb.doc_id = doc_b
ORDER BY jaccard DESC, doc_a, doc_b
LIMIT {limit}
"""


def minhash_candidates_sql(limit: int = 20,
                           bucket_cap: int = BAND_BUCKET_CAP) -> str:
    return (
        _minhash_sig_core_sql()
        + ", " + _bands_sql()
        + f""", smallb AS (
  SELECT band, bsig FROM bands GROUP BY band, bsig
  HAVING count(*) <= {bucket_cap}),
cbands AS (SELECT bands.* FROM bands JOIN smallb USING (band, bsig)),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM cbands a JOIN cbands b ON a.band = b.band AND a.bsig = b.bsig
  WHERE a.doc_id < b.doc_id),
"""
        + _PAIR_JACCARD_SQL.format(limit=limit)
    )


# ---------------------------------------------------------------------------
# exhaustive n-gram Jaccard self-join (shingle-blocked)
# ---------------------------------------------------------------------------


def ngram_jaccard_topk(df: DataFrame, limit: int = 20,
                       shingle_df_cap: int = SHINGLE_DF_CAP) -> DataFrame:
    """Top pairs by exact word-3-gram Jaccard; the self-join is blocked on
    shared shingles (pairs with intersection 0 never materialize).
    Blocking keys with df > ``shingle_df_cap`` are dropped — one stopword
    shingle shared by f docs would otherwise emit f² pairs; true
    near-dups also share selective shingles, so they still meet. The
    Jaccard VERIFICATION uses all shingles, only blocking is capped."""
    sh = _shingles(df)
    rare = (sh.groupBy("sh").agg(F.count("*").alias("_df"))
            .where(F.col("_df") <= shingle_df_cap).select("sh"))
    blocked = sh.join(rare, "sh")
    pairs = (
        blocked.select(F.col("doc_id").alias("doc_a"), "sh")
        .join(blocked.select(F.col("doc_id").alias("doc_b"), "sh"), "sh")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _pair_jaccard(pairs, sh, limit)


def ngram_jaccard_sql(limit: int = 20,
                      shingle_df_cap: int = SHINGLE_DF_CAP) -> str:
    return (
        f"WITH sh AS ({_SHINGLES_SQL}),\n"
        + f"""rare AS (
  SELECT sh FROM sh GROUP BY sh HAVING count(*) <= {shingle_df_cap}),
blocked AS (SELECT sh.* FROM sh JOIN rare USING (sh)),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM blocked a JOIN blocked b ON a.sh = b.sh
  WHERE a.doc_id < b.doc_id),
"""
        + _PAIR_JACCARD_SQL.format(limit=limit)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signatures(df: DataFrame) -> DataFrame:
    """(doc_id, simhash): 60-bit tf-weighted SimHash — per bit, the sign of
    Σ ±tf over tokens (+ if the token hash has the bit set)."""
    tok = (
        df.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
        .withColumn("_h", h60(F.col("tok")))
    )
    bits = tok.select(
        "doc_id", "_h", "tf",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("bit"),
    )
    signed = bits.withColumn(
        "_s",
        F.when(F.expr("((_h >> bit) & 1) = 1"), F.col("tf"))
        .otherwise(-F.col("tf")),
    )
    per_bit = signed.groupBy("doc_id", "bit").agg(F.sum("_s").alias("s"))
    return (
        per_bit.select(
            "doc_id",
            F.when(F.col("s") > 0, F.expr("shiftleft(1L, bit)"))
            .otherwise(F.lit(0)).alias("_v"),
        )
        .groupBy("doc_id").agg(F.sum("_v").alias("simhash"))
        .orderBy("doc_id")
    )


SIMHASH_SIG_SQL = f"""
WITH tok AS (
  SELECT doc_id, tok, count(*) AS tf,
         {h60_sql('tok')} AS hh
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY doc_id, tok),
bits AS (
  SELECT doc_id, hh, tf, unnest(range(0, {SIMHASH_BITS})) AS bit FROM tok),
per_bit AS (
  SELECT doc_id, bit,
         sum(CASE WHEN ((hh >> bit) & 1) = 1 THEN tf ELSE -tf END) AS s
  FROM bits GROUP BY doc_id, bit)
SELECT doc_id,
       sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT
         AS simhash
FROM per_bit GROUP BY doc_id ORDER BY doc_id
"""


def simhash_near_pairs(df: DataFrame, max_hamming: int = 16,
                       limit: int = 20) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, blocked on 4×15-bit
    chunks (a pair within hamming ≤ 3 per chunk-pigeonhole shares ≥1 exact
    chunk; wider distances are best-effort, like production simhash dedup)."""
    sig = simhash_signatures(df)
    chunks = sig.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("chunk"),
                     F.expr(f"(simhash >> {15 * i}) & 32767").alias("cv"))
            for i in range(4)
        ])).alias("c"),
    ).select("doc_id", "simhash", "c.chunk", "c.cv")
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(b, ["chunk", "cv"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
    return pairs.orderBy("hamming", "doc_a", "doc_b").limit(limit)


def simhash_near_pairs_sql(max_hamming: int = 16, limit: int = 20) -> str:
    chunk_ids = ", ".join(str(i) for i in range(4))
    chunk_vals = ", ".join(f"(simhash >> {15 * i}) & 32767" for i in range(4))
    base = SIMHASH_SIG_SQL.strip()
    assert base.endswith("ORDER BY doc_id")
    base = base[: -len(" ORDER BY doc_id")]
    return f"""
WITH sigs AS ({base}),
chunks AS (
  SELECT doc_id, simhash,
         unnest([{chunk_ids}]) AS chunk,
         unnest([{chunk_vals}]) AS cv
  FROM sigs)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM chunks a JOIN chunks b ON a.chunk = b.chunk AND a.cv = b.cv
WHERE a.doc_id < b.doc_id
  AND bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
ORDER BY hamming, doc_a, doc_b
LIMIT {limit}
"""


# ---------------------------------------------------------------------------
# duplicate-cluster resolution (connected components over near-dup pairs)
# ---------------------------------------------------------------------------

#: default verification threshold for an edge in the duplicate graph
CLUSTER_JACCARD = 0.5


def neardup_pairs(df: DataFrame, threshold: float = CLUSTER_JACCARD,
                  bucket_cap: int = BAND_BUCKET_CAP) -> DataFrame:
    """ALL verified near-dup pairs (doc_a < doc_b, exact shingle Jaccard
    >= threshold), found through LSH blocking — the edge set of the
    duplicate graph. No top-k: downstream clustering needs every edge."""
    j = _pair_jaccard(_lsh_pairs(df, bucket_cap), _shingles(df), limit=None)
    return j.where(F.col("jaccard") >= threshold).select("doc_a", "doc_b")


def dedup_clusters(df: DataFrame, threshold: float = CLUSTER_JACCARD,
                   bucket_cap: int = BAND_BUCKET_CAP,
                   max_iters: int = 25) -> DataFrame:
    """(doc_id, cluster_id, cluster_size, is_canonical): duplicate-cluster
    resolution — connected components over the verified near-dup pair
    graph. ``cluster_id`` = min doc_id in the component (the canonical
    survivor a curation pipeline keeps); singletons are their own cluster.

    Distributed min-label propagation: every round each node takes the min
    label among itself and its LSH-graph neighbors — one broadcast-free
    shuffle join + one groupBy per round, converging in O(component
    diameter) rounds (duplicate components are near-cliques, so 2–4 rounds
    in practice; big-data CC algorithms like large-star/small-star cut the
    bound to O(log n) but pay more per round). Convergence is detected
    from Σ label, which is strictly decreasing until fixpoint (each node's
    label is monotone non-increasing) — one metadata-sized agg per round,
    no per-node diff join. Labels are localCheckpoint'ed every round so
    the plan/lineage stays O(1) in rounds at 100-TB scale.
    """
    one_way = neardup_pairs(df, threshold, bucket_cap)
    edges = one_way.selectExpr("doc_a AS src", "doc_b AS dst").union(
        one_way.selectExpr("doc_b AS src", "doc_a AS dst")).localCheckpoint()
    labels = df.select(F.col("doc_id").alias("node"),
                       F.col("doc_id").alias("label"))
    prev = labels.agg(F.sum("label")).first()[0]
    for _ in range(max_iters):
        msgs = (edges.join(labels.withColumnRenamed("node", "src"), "src")
                .select(F.col("dst").alias("node"), "label"))
        labels = (labels.union(msgs).groupBy("node")
                  .agg(F.min("label").alias("label"))).localCheckpoint()
        cur = labels.agg(F.sum("label")).first()[0]
        if cur == prev:
            break
        prev = cur
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return (
        labels.join(sizes, "label")
        .select(F.col("node").alias("doc_id"),
                F.col("label").alias("cluster_id"),
                "cluster_size",
                (F.col("node") == F.col("label")).cast("int")
                .alias("is_canonical"))
        .orderBy("doc_id")
    )


def dedup_clusters_sql(threshold: float = CLUSTER_JACCARD,
                       bucket_cap: int = BAND_BUCKET_CAP) -> str:
    """Recursive-CTE oracle: min reachable doc_id over the same verified
    edge set (edges are symmetric, so min-over-reachable = component min)."""
    core = _minhash_sig_core_sql().replace("WITH sh", "WITH RECURSIVE sh", 1)
    return (
        core
        + ", " + _bands_sql()
        + f""", smallb AS (
  SELECT band, bsig FROM bands GROUP BY band, bsig
  HAVING count(*) <= {bucket_cap}),
cbands AS (SELECT bands.* FROM bands JOIN smallb USING (band, bsig)),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM cbands a JOIN cbands b ON a.band = b.band AND a.bsig = b.bsig
  WHERE a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS i
  FROM pairs p
  JOIN sh sa ON sa.doc_id = p.doc_a
  JOIN sh sb ON sb.doc_id = p.doc_b AND sb.sh = sa.sh
  GROUP BY p.doc_a, p.doc_b),
vpairs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes na ON na.doc_id = doc_a
  JOIN sizes nb ON nb.doc_id = doc_b
  WHERE round(i / (na.n + nb.n - i), 6) >= {threshold}),
edges AS (SELECT doc_a AS s, doc_b AS d FROM vpairs
          UNION ALL SELECT doc_b, doc_a FROM vpairs),
walk(node, lab) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.d, w.lab FROM walk w JOIN edges e ON e.s = w.node),
lab AS (SELECT node AS doc_id, min(lab) AS cluster_id
        FROM walk GROUP BY node),
sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab
       GROUP BY cluster_id)
SELECT doc_id, cluster_id, cluster_size,
       CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END AS is_canonical
FROM lab JOIN sz USING (cluster_id) ORDER BY doc_id
"""
    )
