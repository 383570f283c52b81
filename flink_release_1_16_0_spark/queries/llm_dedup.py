"""Deduplication queries over the documents/embeddings corpus.

Exercises operators.dedup end-to-end: exact hash dedup, MinHash+LSH
near-dup with Jaccard verification, SimHash bucketing, n-gram Jaccard
pairs, and embedding-cosine near-dup. The MD5-based hashing makes every
stage (signatures, banding, candidate join, verify) reproducible in
DuckDB, so the full pipelines — not just the final counts — are
oracle-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_release_1_16_0_spark.catalog import load_table
from flink_release_1_16_0_spark.operators import dedup as D
from flink_release_1_16_0_spark.operators import similarity as S
from flink_release_1_16_0_spark.operators.text import shingles, sql_shingles
from flink_release_1_16_0_spark.queries import register

# --------------------------------------------------------------------------
# quadratic-baseline guard
# --------------------------------------------------------------------------

#: row bound above which the all-pairs exact-verify baselines refuse to
#: run: n rows is n^2/2 comparisons — 200k rows is already 2e10 pairs,
#: far past what an exact-verify slice should ever be
QUADRATIC_ROW_BOUND = 200_000

ALLOW_QUADRATIC_CONF = "spark.llm.dedup.allow-quadratic"


def _guard_quadratic(spark: SparkSession, df: DataFrame, what: str) -> DataFrame:
    """The all-pairs queries below are exact-verify BASELINES over keyed
    slices — the adjudication twin of the banded/bucketed production
    paths (MinHash-LSH, SimHash, IVF), never a 100 TB path themselves.
    Pointing one at an unsliced corpus is the one quadratic anti-pattern
    a user could still trip, so inputs beyond :data:`QUADRATIC_ROW_BOUND`
    rows are refused unless the session sets
    ``spark.llm.dedup.allow-quadratic=true`` (round-10 review item)."""
    if (
        spark.conf.get(ALLOW_QUADRATIC_CONF, "false").strip().lower()
        in ("true", "1")
    ):
        return df
    # limit-capped count: the guard only needs to know whether the input
    # EXCEEDS the bound, so cap the probe at bound+1 rows — a full
    # count() here would itself scan the whole corpus before refusing
    # (the one thing this guard exists to prevent). Round-13
    # optimization round.
    n = df.limit(QUADRATIC_ROW_BOUND + 1).count()
    if n > QUADRATIC_ROW_BOUND:
        raise ValueError(
            f"{what}: input exceeds {QUADRATIC_ROW_BOUND} rows; this is "
            "an O(n^2) exact-verify baseline meant for keyed slices — use "
            "the banded/bucketed production twin (dedup_minhash_lsh / "
            "similarity_*), or set "
            f"'{ALLOW_QUADRATIC_CONF}'='true' to override"
        )
    return df


# --------------------------------------------------------------------------
# exact dedup: normalized-text hash groupBy, keep lowest doc_id
# --------------------------------------------------------------------------

_EXACT_ORACLE = """
SELECT md5(lower(trim(text))) AS text_hash,
       MIN(doc_id) AS keeper_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
"""


@register("dedup_exact", _EXACT_ORACLE, tags=("llm", "dedup"))
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(
        F.md5(F.lower(F.trim(F.col("text")))).alias("text_hash")
    ).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


# --------------------------------------------------------------------------
# MinHash + LSH near-dup: band join -> candidates -> exact Jaccard verify
# --------------------------------------------------------------------------

_NUM_HASHES, _BANDS, _K = 6, 6, 3
_JACCARD_MIN = 0.5

# hashed-shingle fast path: one md5 per shingle -> 60-bit content hash,
# then integer minhash permutations — both steps exactly mirrored here
# (operators/dedup.py hashed_shingles / signature_from_hashes)
_SQL_HSH = D.sql_hashed_shingles(sql_shingles("text", _K))

_MINHASH_ORACLE = f"""
WITH sigs AS (
  SELECT doc_id, {D.sql_signature_from_hashes(_SQL_HSH, _NUM_HASHES)} AS sig,
         {_SQL_HSH} AS sh
  FROM documents
), banded AS (
  SELECT doc_id, sh, i AS band_idx, sig[i + 1] AS band_key
  FROM sigs, generate_series(0, {_BANDS - 1}) AS g(i)
  WHERE sig[i + 1] IS NOT NULL
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
), verified AS (
  SELECT id_a, id_b, {D.sql_jaccard('sa.sh', 'sb.sh')} AS jaccard
  FROM cand
  JOIN sigs sa ON sa.doc_id = id_a
  JOIN sigs sb ON sb.doc_id = id_b
)
SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= {_JACCARD_MIN}
"""


def _minhash_lsh(spark: SparkSession, sf_dir: str, strategy: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # one shared hashed-shingle stage feeds both banding and the verify
    # join (integer arrays: ~5x smaller exchanges than shingle strings).
    # persist=True materializes the signature table once — the in-job
    # equivalent of the intermediate parquet write a 100 TB pipeline
    # would do — so banding + both verify sides share a single
    # tokenize+hash pass instead of re-running it per consumer.
    # distinct=True dedups each document's shingles once here instead
    # of once per candidate pair in the verifier (MinHash signatures
    # are multiset-invariant, so banding is unchanged).
    sh = D.shingle_table(docs, k=_K, hashed=True, persist=True, distinct=True)
    pairs = D.lsh_candidate_pairs(
        num_hashes=_NUM_HASHES,
        bands=_BANDS,
        k=_K,
        strategy=strategy,
        shingle_df=sh,
    )
    # Exact length prune BEFORE the verify joins attach the shingle
    # arrays (round-14, measured 13.2 -> 6.4 s at sf1): for distinct
    # sets, jaccard <= min(|A|,|B|)/max(|A|,|B|), so a pair whose size
    # ratio is under the threshold can never verify. The comparison is
    # integer arithmetic on the threshold's exact rational form — no
    # float boundary can misclassify a pair — and the pruned pairs
    # carry only (id, size), not the arrays.
    # as_integer_ratio = the exact rational of the stored double, so
    # the prune boundary coincides bit-for-bit with the final
    # `jaccard >= threshold` double compare; DECIMAL(38,0) keeps the
    # cross-multiplication exact for any ratio (denominators reach
    # 2^52) without int64 overflow.
    num, den = _JACCARD_MIN.as_integer_ratio()
    sizes = sh.selectExpr("__id", "size(__sh) AS __n")
    pruned = (
        pairs.join(sizes.selectExpr("__id AS id_a", "__n AS na"), "id_a")
        .join(sizes.selectExpr("__id AS id_b", "__n AS nb"), "id_b")
        .where(
            f"CAST({den} AS DECIMAL(38,0)) * least(na, nb)"
            f" >= CAST({num} AS DECIMAL(38,0)) * greatest(na, nb)"
        )
        .select("id_a", "id_b")
    )
    a = sh.selectExpr("__id AS id_a", "__sh AS sh_a")
    b = sh.selectExpr("__id AS id_b", "__sh AS sh_b")
    return (
        pruned.join(a, "id_a")
        .join(b, "id_b")
        .selectExpr(
            "id_a",
            "id_b",
            f"{D.spark_sql_jaccard_on_distinct('sh_a', 'sh_b')} AS jaccard",
        )
        .where(f"jaccard >= {_JACCARD_MIN}")
    )


@register("dedup_minhash_lsh", _MINHASH_ORACLE, tags=("llm", "dedup"), bench=True)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bucket strategy: groupBy band key + in-array pair generation —
    # one scan of the signature table, no self-join. Fastest measured at
    # bench scale AND the shape that survives a 100 TB corpus.
    return _minhash_lsh(spark, sf_dir, "bucket")


@register("dedup_minhash_lsh_join", _MINHASH_ORACLE, tags=("llm", "dedup"))
def dedup_minhash_lsh_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # band self equi-join alternative (AQE broadcasts one side at small
    # scale); same oracle as the bucket path
    return _minhash_lsh(spark, sf_dir, "join")


# --------------------------------------------------------------------------
# SimHash signatures + duplicate buckets
# --------------------------------------------------------------------------

_SIMHASH_ORACLE = f"""
WITH sigs AS (
  SELECT doc_id, {D.sql_simhash32('text', _K)} AS simhash
  FROM documents
  WHERE doc_id % 3 = 0
)
SELECT simhash, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
FROM sigs
GROUP BY simhash
"""


@register("dedup_simhash", _SIMHASH_ORACLE, tags=("llm", "dedup"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    # Same exchange idiom as shingle_table: the simhash stage is
    # CPU-bound, and a small single-file corpus otherwise arrives as one
    # input split — the heavy higher-order-function signature work would
    # serialize in a single task (18s -> ~2s at sf0.01). At 100 TB the
    # exchange balances skewed document sizes across executors.
    par = spark.sparkContext.defaultParallelism
    return (
        docs.repartition(par, F.col("doc_id"))
        .select("doc_id", D.simhash32(F.col("text"), _K).alias("simhash"))
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc"))
    )


# --------------------------------------------------------------------------
# n-gram Jaccard similarity pairs on a keyed slice (all-pairs verify path)
# --------------------------------------------------------------------------

_NGRAM_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, {sql_shingles('text', 2)} AS s
  FROM documents WHERE doc_id % 10 = 0
)
SELECT id_a, id_b, jaccard FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         {D.sql_jaccard('a.s', 'b.s')} AS jaccard
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
) WHERE jaccard >= 0.02
"""


@register("dedup_ngram_jaccard", _NGRAM_ORACLE, tags=("llm", "dedup"))
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _guard_quadratic(
        spark,
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0),
        "dedup_ngram_jaccard",
    )
    sh = docs.select("doc_id", shingles(F.col("text"), 2).alias("s"))
    # The theta join (id_a < id_b) plans as a broadcast nested-loop whose
    # parallelism is the STREAMED side's partition count — a small
    # single-file slice arrives as 1-2 input splits, serializing the
    # entire O(n^2/2) jaccard work in one task (the round-10 sf1 sweep
    # found it: >1 h on one core at sf1). Repartitioning the streamed
    # side spreads the pair space across every executor; the broadcast
    # side stays a single copy per executor either way.
    par = spark.sparkContext.defaultParallelism
    a = sh.repartition(par, F.col("doc_id")).select(
        F.col("doc_id").alias("id_a"), F.col("s").alias("s_a")
    )
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("s").alias("s_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", D.jaccard(F.col("s_a"), F.col("s_b")).alias("jaccard"))
        .filter(F.col("jaccard") >= 0.02)
    )


# --------------------------------------------------------------------------
# embedding-cosine near-dup pairs (rounded scores, deterministic fold)
# --------------------------------------------------------------------------

_COS_THRESHOLD = 0.3

_COSDUP_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 4 = 0)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND({S.sql_cosine('a.embedding', 'b.embedding')}, 6) AS score
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE ROUND({S.sql_cosine('a.embedding', 'b.embedding')}, 6) >= {_COS_THRESHOLD}
"""


@register("dedup_embedding_cosine", _COSDUP_ORACLE, tags=("llm", "dedup", "similarity"))
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _guard_quadratic(
        spark,
        load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 4 == 0),
        "dedup_embedding_cosine",
    )
    # same streamed-side repartition as dedup_ngram_jaccard: the theta
    # join's nested-loop parallelism is the left side's split count
    par = spark.sparkContext.defaultParallelism
    a = emb.repartition(par, F.col("vec_id")).select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("e_a")
    )
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("e_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(S.cosine(F.col("e_a"), F.col("e_b")), 6).alias("score"),
        )
        .filter(F.col("score") >= _COS_THRESHOLD)
    )


# --------------------------------------------------------------------------
# Near-dup CLUSTERING: connected components over the verified LSH pair
# graph, one representative (min doc_id) per cluster, singletons kept.
# The step a training-data pipeline runs after pair generation —
# a<->b<->c must collapse to one keeper even though (a,c) never shared
# a band. Spark side: Pregel-style min-label propagation
# (operators/dedup.connected_components); oracle: recursive-CTE
# transitive closure — identical (node, component) fixpoint.
# --------------------------------------------------------------------------

_CLUSTER_ORACLE = f"""
WITH cc AS (
{D.sql_connected_components(_MINHASH_ORACLE)}
), assigned AS (
  SELECT d.doc_id, COALESCE(cc.component, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN cc ON cc.node = d.doc_id
)
SELECT a.doc_id, a.cluster_id, s.cluster_size,
       a.doc_id = a.cluster_id AS is_keeper
FROM assigned a
JOIN (
  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM assigned GROUP BY cluster_id
) s USING (cluster_id)
"""


@register("dedup_cluster_assign", _CLUSTER_ORACLE, tags=("llm", "dedup", "graph"))
def dedup_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup_minhash_lsh(spark, sf_dir)
    cc = D.connected_components(pairs)
    assigned = docs.join(cc, docs.doc_id == cc.node, "left").select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
    )
    sizes = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return assigned.join(sizes, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_keeper"),
    )


# --------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023): semantic dedup restricted to trained
# k-means clusters — the scalable alternative to all-pairs embedding
# dedup. Cluster the corpus with the deterministic-Lloyd quantizer
# (k=32 so cells stay small), then mark a vector as a duplicate iff a
# LOWER-ID vector in the SAME cell has cosine >= 0.93; dup_of = the
# smallest such id (deterministic keeper). All-pairs work is bounded
# per cell (the SemDeDup point: O(sum cell^2), never O(corpus^2));
# the join key is the cell id, so the corpus shuffles once.
# --------------------------------------------------------------------------

# T sits inside the fixture's actual similarity range (max pairwise
# cosine ~0.46 in the synthetic embeddings) so the gate verifies real
# matches, not a vacuous empty result
_SEMDEDUP_K, _SEMDEDUP_T = 32, 0.36

_SEMDEDUP_ORACLE = f"""
WITH {S.sql_kmeans_corpus(_SEMDEDUP_K, 1, 64)},
pairs AS (
  SELECT b.vec_id, b.cell, a.vec_id AS cand,
         ROUND({S.sql_cosine('a.embedding', 'b.embedding')}, 6) AS sim
  FROM afinal a JOIN afinal b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
)
SELECT vec_id, cell, MIN(cand) AS dup_of,
       MAX(CASE WHEN cand = m THEN sim END) AS sim
FROM (
  SELECT *, MIN(cand) OVER (PARTITION BY vec_id) AS m
  FROM pairs WHERE sim >= {_SEMDEDUP_T}
)
GROUP BY vec_id, cell
"""


@register("dedup_semdedup", _SEMDEDUP_ORACLE, tags=("llm", "dedup", "similarity"))
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = S.kmeans_cells(emb, k=_SEMDEDUP_K, iters=1, dim=64)
    corpus = S.assign_cells(emb, cents).persist()
    a = corpus.select(
        F.col("vec_id").alias("cand"), F.col("embedding").alias("e_a"), "cell"
    )
    b = corpus.select("vec_id", F.col("embedding").alias("e_b"), "cell")
    pairs = (
        a.join(b, ["cell"])
        .filter(F.col("cand") < F.col("vec_id"))
        .select(
            "vec_id",
            "cell",
            "cand",
            F.round(S.cosine(F.col("e_a"), F.col("e_b")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= _SEMDEDUP_T)
    )
    w = Window.partitionBy("vec_id")
    return (
        pairs.withColumn("m", F.min("cand").over(w))
        .groupBy("vec_id", "cell")
        .agg(
            F.min("cand").alias("dup_of"),
            F.max(F.when(F.col("cand") == F.col("m"), F.col("sim"))).alias("sim"),
        )
    )
