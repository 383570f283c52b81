"""Similarity-search queries over the embeddings table.

Exercises operators.similarity: exact brute-force cosine top-k (the
baseline every ANN is measured against) and the IVF cell-restricted
variant (the scale path: probe only the query's coarse cell). Scores
are rounded before ranking so ordering is engine-stable; ties break on
neighbor id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_release_1_16_0_spark.catalog import load_table
from flink_release_1_16_0_spark.operators import similarity as S
from flink_release_1_16_0_spark.queries import register

_QUERY_MOD = 100  # vec_id % 100 == 0 -> query set


def _queries_df(emb: DataFrame) -> DataFrame:
    return emb.filter(F.col("vec_id") % _QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding"),
        F.col("label"),
    )


_BRUTE_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec
  FROM embeddings WHERE vec_id % {_QUERY_MOD} = 0
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ROUND({S.sql_cosine('e.embedding', 'q.qvec')}, 6) AS score
  FROM embeddings e JOIN q ON e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, score, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 10
"""


@register("similarity_brute_force_topk", _BRUTE_ORACLE, tags=("llm", "similarity"), bench=True)
def similarity_brute_force_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries_df(emb)
    return S.brute_force_topk(emb, q, k=10)


_IVF_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec, label AS qcell
  FROM embeddings WHERE vec_id % {_QUERY_MOD} = 0
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ROUND({S.sql_cosine('e.embedding', 'q.qvec')}, 6) AS score
  FROM embeddings e JOIN q ON e.label = q.qcell AND e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, score, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
"""


@register("similarity_ivf_topk", _IVF_ORACLE, tags=("llm", "similarity"))
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries_df(emb)
    return S.ivf_topk(emb, q, k=5)


# --------------------------------------------------------------------------
# IVF with a TRAINED coarse quantizer: deterministic Lloyd k-means
# (fixed init = k lowest-id vectors, 2 unrolled iterations, exact
# decimal-grid centroid means) -> assign corpus -> probe the query's
# trained cell. The full train+assign+search pipeline is hash-gated
# against a DuckDB oracle that unrolls the same iterations as CTEs.
# --------------------------------------------------------------------------

_KMEANS_K, _KMEANS_ITERS, _DIM = 8, 2, 64

_IVF_KMEANS_ORACLE = f"""
WITH {S.sql_kmeans_corpus(_KMEANS_K, _KMEANS_ITERS, _DIM)},
q AS (
  SELECT vec_id AS query_id, embedding AS qvec, cell AS qcell
  FROM afinal WHERE vec_id % {_QUERY_MOD} = 0
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ROUND({S.sql_cosine('e.embedding', 'q.qvec')}, 6) AS score
  FROM afinal e JOIN q ON e.cell = q.qcell AND e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, score, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
"""


@register("similarity_ivf_kmeans_topk", _IVF_KMEANS_ORACLE, tags=("llm", "similarity"))
def similarity_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = S.kmeans_cells(emb, k=_KMEANS_K, iters=_KMEANS_ITERS, dim=_DIM)
    # the assigned corpus feeds BOTH probe sides (query slice + corpus);
    # without a persist the whole unrolled Lloyd chain (2 iterations x
    # crossJoin-argmin) re-executes once per consumer — at any scale the
    # assignment is the thing you materialize once
    corpus = S.assign_cells(emb, cents).persist()
    q = corpus.filter(F.col("vec_id") % _QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "embedding", "cell"
    )
    return S.ivf_topk(corpus, q, cell_col="cell", k=5)


# --------------------------------------------------------------------------
# centroid statistics per cell (the "train the quantizer" step of IVF,
# expressed as a groupBy over vector components)
# --------------------------------------------------------------------------

_CENTROID_ORACLE = """
SELECT label,
       COUNT(*) AS n_vectors,
       CAST(SUM(CAST(ROUND(CAST(embedding[1] AS DOUBLE), 6) AS DECIMAL(38,6))) AS DOUBLE)
         / COUNT(*) AS mean_dim0,
       CAST(SUM(CAST(ROUND(CAST(embedding[2] AS DOUBLE), 6) AS DECIMAL(38,6))) AS DOUBLE)
         / COUNT(*) AS mean_dim1
FROM embeddings
GROUP BY label
"""


@register("similarity_cell_stats", _CENTROID_ORACLE, tags=("llm", "similarity"))
def similarity_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")

    def exact_mean(pos: int):
        rounded = F.round(F.element_at("embedding", pos).cast("double"), 6)
        return (
            F.sum(rounded.cast("DECIMAL(38,6)")).cast("double") / F.count(F.lit(1))
        ).cast("double")

    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        exact_mean(1).alias("mean_dim0"),
        exact_mean(2).alias("mean_dim1"),
    )


# --------------------------------------------------------------------------
# Random-hyperplane LSH ANN (Charikar SimHash for cosine): bucket =
# sign bits of P fixed hyperplane projections, probe = equi-join on the
# bucket. Third ANN tier next to brute-force (exact baseline) and IVF
# (trained cells); needs no quantizer, so it is the drop-in for a fresh
# 100 TB corpus. Hyperplanes are md5-derived literals embedded on both
# engines, making bucket assignment and ranking hash-gateable.
# --------------------------------------------------------------------------

_NUM_PLANES = 6
_PLANES = S.random_hyperplanes(_NUM_PLANES, 64)

_HP_LSH_ORACLE = f"""
WITH b AS (
  SELECT vec_id, embedding,
         {S.sql_hyperplane_bucket('embedding', _PLANES)} AS bucket
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, embedding AS qvec, bucket AS qbucket
  FROM b WHERE vec_id % {_QUERY_MOD} = 0
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ROUND({S.sql_cosine('e.embedding', 'q.qvec')}, 6) AS score
  FROM b e JOIN q ON e.bucket = q.qbucket AND e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, score, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
"""


@register("similarity_hyperplane_lsh_topk", _HP_LSH_ORACLE, tags=("llm", "similarity"))
def similarity_hyperplane_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries_df(emb)
    return S.hyperplane_lsh_topk(emb, q, _PLANES, k=5)


# --------------------------------------------------------------------------
# ANN quality evaluation: recall@5 of the hyperplane-LSH tier against
# the exact brute-force top-5 — the metric every production ANN index
# is tuned by, computed fully inside the engine (no collect; the two
# top-k pipelines join on (query, neighbor) and reduce per query).
# --------------------------------------------------------------------------

_RECALL_K = 5

_RECALL_ORACLE = f"""
WITH b AS (
  SELECT vec_id, embedding,
         {S.sql_hyperplane_bucket('embedding', _PLANES)} AS bucket
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, embedding AS qvec, bucket AS qbucket
  FROM b WHERE vec_id % {_QUERY_MOD} = 0
), exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY ROUND({S.sql_cosine('e.embedding', 'q.qvec')}, 6) DESC,
                      e.vec_id) AS rank
    FROM embeddings e JOIN q ON e.vec_id <> q.query_id
  ) WHERE rank <= {_RECALL_K}
), approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY ROUND({S.sql_cosine('e.embedding', 'q.qvec')}, 6) DESC,
                      e.vec_id) AS rank
    FROM b e JOIN q ON e.bucket = q.qbucket AND e.vec_id <> q.query_id
  ) WHERE rank <= {_RECALL_K}
)
SELECT x.query_id,
       CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits,
       CAST(COUNT(a.neighbor_id) AS DOUBLE) / {_RECALL_K} AS recall
FROM exact x
LEFT JOIN approx a
  ON a.query_id = x.query_id AND a.neighbor_id = x.neighbor_id
GROUP BY x.query_id
"""


@register("similarity_lsh_recall", _RECALL_ORACLE, tags=("llm", "similarity"))
def similarity_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries_df(emb)
    exact = S.brute_force_topk(emb, q, k=_RECALL_K).select("query_id", "neighbor_id")
    approx = S.hyperplane_lsh_topk(emb, q, _PLANES, k=_RECALL_K).select(
        F.col("query_id").alias("a_query_id"),
        F.col("neighbor_id").alias("a_neighbor_id"),
    )
    return (
        exact.join(
            approx,
            (F.col("query_id") == F.col("a_query_id"))
            & (F.col("neighbor_id") == F.col("a_neighbor_id")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("a_neighbor_id").alias("n_hits"),
            (F.count("a_neighbor_id").cast("double") / _RECALL_K).alias("recall"),
        )
    )


# --------------------------------------------------------------------------
# int8 scalar quantization of embeddings: per-vector absmax scale,
# q = round(v / scale * 127) — the standard 4x storage/bandwidth
# reduction for ANN indexes. Reported per vector: the scale, the
# quantized-dot self-check, and the max reconstruction error — all
# pure per-row array arithmetic (zero shuffle), with the rounding
# arithmetic identical on both engines (absmax ratios of the fixture's
# doubles, ROUND on the 9-grid).
# --------------------------------------------------------------------------

_QUANT_ORACLE = """
WITH e AS (
  -- FLOAT[] -> DOUBLE[] first: Spark promotes float arithmetic to
  -- double, DuckDB stays single-precision — cast so both engines do
  -- identical double IEEE arithmetic
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding
  FROM embeddings WHERE vec_id % 40 = 0
), q AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, v -> abs(v))) AS scale
  FROM e
), quant AS (
  SELECT vec_id, scale,
         list_transform(embedding, v -> CAST(ROUND(v / scale * 127) AS BIGINT))
           AS q8,
         embedding
  FROM q WHERE scale > 0
)
SELECT vec_id,
       scale AS scale_r,
       CAST(list_max(list_transform(q8, x -> abs(x))) AS BIGINT) AS q_absmax,
       list_max(list_transform(range(len(q8)),
             i -> abs(embedding[i + 1] - q8[i + 1] * scale / 127)))
         AS max_err
FROM quant
"""


@register("similarity_int8_quantization", _QUANT_ORACLE, tags=("llm", "similarity"))
def similarity_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 40 == 0)
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )
    scale = F.array_max(F.transform("embedding", lambda v: F.abs(v)))
    with_scale = emb.select("vec_id", "embedding", scale.alias("scale")).filter(
        F.col("scale") > 0
    )
    q8 = F.transform(
        "embedding",
        lambda v: F.round(v / F.col("scale") * 127).cast("bigint"),
    )
    quant = with_scale.select("vec_id", "embedding", "scale", q8.alias("q8"))
    err = F.array_max(
        F.zip_with(
            "embedding",
            "q8",
            lambda v, x: F.abs(v - x * F.col("scale") / 127),
        )
    )
    # no ROUND on the outputs: err/scale are not on any decimal grid, so
    # rounding re-opens the cross-engine half-tie hazard; the raw doubles
    # come from identical IEEE operation sequences and compare exactly
    return quant.select(
        "vec_id",
        F.col("scale").alias("scale_r"),
        F.array_max(F.transform("q8", lambda x: F.abs(x))).alias("q_absmax"),
        err.alias("max_err"),
    )


# --------------------------------------------------------------------------
# Quantized top-k: brute-force search over the int8 vectors with
# INTEGER dot products — the memory-bandwidth-bound ANN serving path
# (4x smaller vectors, exact bigint arithmetic so the ranking is
# engine-exact with zero float hazards). Same broadcast-probe shape as
# the exact tier: corpus never shuffles.
# --------------------------------------------------------------------------

_QTOPK_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
), q8 AS (
  SELECT vec_id,
         list_transform(embedding,
             v -> CAST(ROUND(v / list_max(list_transform(embedding, x -> abs(x)))
                             * 127) AS BIGINT)) AS qv
  FROM e
), probes AS (
  SELECT vec_id AS query_id, qv AS pq FROM q8 WHERE vec_id % {_QUERY_MOD} = 0
), scored AS (
  SELECT p.query_id, c.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(len(c.qv)),
              i -> c.qv[i + 1] * p.pq[i + 1])) AS BIGINT) AS iscore
  FROM q8 c JOIN probes p ON c.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, iscore, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY iscore DESC, neighbor_id) AS BIGINT) AS rank
  FROM scored
) WHERE rank <= 5
"""


@register("similarity_quantized_topk", _QTOPK_ORACLE, tags=("llm", "similarity"))
def similarity_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    scale = F.array_max(F.transform("embedding", lambda v: F.abs(v)))
    q8 = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda v: F.round(v / scale * 127).cast("bigint")
        ).alias("qv"),
    )
    probes = q8.filter(F.col("vec_id") % _QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("pq")
    )
    scored = (
        q8.join(F.broadcast(probes), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.aggregate(
                F.zip_with("qv", "pq", lambda a, b: a * b),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias("iscore"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("iscore").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w).cast("bigint")).filter(
        F.col("rank") <= 5
    )


# --------------------------------------------------------------------------
# Product quantization ANN (Jégou et al. 2011): train m=4 sub-vector
# codebooks (deterministic Lloyd, same device as the IVF quantizer),
# encode the corpus to 4 byte codes, search by asymmetric distance
# (query stays float, corpus contributes only its codes -> centroid
# lookups). The memory-bound serving tier: at 100 TB the float vectors
# never leave the scan that encodes them; search touches a table 64x
# narrower. Whole pipeline hash-gated: subspace distances fold in index
# order, sum in subspace order, round(6) before ranking.
# --------------------------------------------------------------------------

_PQ_M, _PQ_SUB, _PQ_K, _PQ_ITERS = 4, 16, 16, 1


def _pq_adist_sql() -> str:
    terms = " + ".join(
        S.sql_sq_l2(
            f"q.qvec[{j * _PQ_SUB + 1}:{(j + 1) * _PQ_SUB}]", f"b{j}.centroid"
        )
        for j in range(_PQ_M)
    )
    return f"ROUND({terms}, 6)"


_PQ_ORACLE = f"""
WITH {S.sql_pq_corpus(_PQ_M, _PQ_SUB, _PQ_K, _PQ_ITERS)},
q AS (
  SELECT vec_id AS query_id, embedding AS qvec
  FROM embeddings WHERE vec_id % {_QUERY_MOD} = 0
), scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, {_pq_adist_sql()} AS adist
  FROM codes c
  JOIN q ON c.vec_id <> q.query_id
  {' '.join(f'JOIN s{j}c{_PQ_ITERS} b{j} ON b{j}.cell = c.code{j}' for j in range(_PQ_M))}
)
SELECT query_id, neighbor_id, adist, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY adist ASC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
"""


@register("similarity_pq_topk", _PQ_ORACLE, tags=("llm", "similarity"))
def similarity_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    books = S.pq_codebooks(emb, m=_PQ_M, sub=_PQ_SUB, kcents=_PQ_K, iters=_PQ_ITERS)
    codes = S.pq_encode(emb, books, sub=_PQ_SUB)
    q = emb.filter(F.col("vec_id") % _QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.pq_topk(emb, q, books, codes, sub=_PQ_SUB, k=5)
