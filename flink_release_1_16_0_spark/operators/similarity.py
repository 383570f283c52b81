"""Similarity search over embedding columns (array<float>).

Two paths, both pure Catalyst (zip_with/aggregate fold — JVM-side, no
Python in the hot loop):

- **brute-force cosine top-k**: broadcast the query vectors, compute
  cosine against every row, TakeOrderedAndProject per query. At 100 TB
  this is the exact-baseline: one scan, no shuffle of the corpus (the
  top-k is partial-aggregated map-side by Spark's window/orderBy+limit
  or a groupBy(min-heap) — here per-query row_number).
- **IVF-style cell-restricted search**: the corpus is pre-bucketed by a
  coarse quantizer (the driver's `label` column plays the trained
  centroid assignment); search only the query's cell -> the join key
  becomes (cell), shuffling only matching cells. With c cells this cuts
  compared pairs by ~c; the plan is an equi-join Catalyst can shuffle
  or broadcast adaptively.

Dot products fold left-to-right in index order in both Spark
(`aggregate`) and DuckDB (`list_sum`/`list_dot_product` oracle twins) —
with float32 inputs widened to float64 the result is bit-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flink_release_1_16_0_spark.operators._sqlq import q_ident as _q


def dot(a: Column, b: Column) -> Column:
    """Sum of elementwise products, folded in index order (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def spark_sql_dot(a: str, b: str) -> str:
    """Spark-SQL-text twin of :func:`dot` — same expression tree (one
    JVM parse instead of ~10 py4j calls per use; round-13 optimization
    round)."""
    return (
        f"aggregate(zip_with({a}, {b},"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " 0.0D, (acc, v) -> acc + v)"
    )


def sql_dot(a: str, b: str) -> str:
    """DuckDB twin of :func:`dot` (list_zip + sequential list_sum)."""
    return (
        f"list_sum(list_transform(list_zip({a}, {b}),"
        f" p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    )


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / (sqrt({sql_dot(a, a)}) * sqrt({sql_dot(b, b)})))"


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    round_scale: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    `queries` is expected to be small (it is broadcast); result columns:
    (query_id, neighbor_id, score, rank). Scores are rounded to
    `round_scale` decimals before ranking so the ordering (and the
    oracle comparison) is immune to last-ulp noise; ties break on
    neighbor id.
    """
    # Precompute each side's norm ONCE per row (below the join, so the
    # per-pair expression is one dot product + one multiply-divide
    # instead of three dot products). The float values are bit-identical
    # to inlining norm() per pair — same operands, same ops — so the
    # oracle comparison is unaffected. The explicit repartition both
    # parallelizes the CPU-bound scoring stage (AQE's byte-based
    # coalescing would fold a small single-file corpus into one task)
    # and pins the norm projection behind an exchange. Construction is
    # SQL-text based (see spark_sql_dot) — the plan is unchanged.
    # Round-13 optimization round: the exchange is now CONDITIONAL
    # (a many-split 100 TB corpus already scans wide — re-shuffling it
    # for "parallelism" would move the whole corpus once for nothing)
    # and HASH-keyed on the id (round-robin pays a map-side
    # sortBeforeRepartition of every row; hash of a data column needs
    # none and is deterministic under task retry).
    par = corpus.sparkSession.sparkContext.defaultParallelism
    idq, vecq = _q(id_col), _q(vec_col)
    # partition-count probe on the INPUT, not the norm projection: a
    # projection never changes partitioning, and .rdd on the (cached)
    # input relation reuses its lazy RDD (~0.4 ms) while a fresh
    # projected plan pays full analysis+planning (~109 ms of
    # driver-side build per bench run — round-14 measurement)
    narrow = corpus.rdd.getNumPartitions() < par
    c = corpus.selectExpr(
        idq,
        vecq,
        f"SQRT({spark_sql_dot(vecq, vecq)}) AS __cnorm",
    )
    if narrow:
        c = c.repartition(par, F.col(id_col))
    q = queries.selectExpr(
        f"{_q(query_id_col)} AS __qid",
        f"{vecq} AS __qvec",
        f"SQRT({spark_sql_dot(vecq, vecq)}) AS __qnorm",
    )
    scored = c.join(F.broadcast(q), F.col(id_col) != F.col("__qid")).selectExpr(
        "__qid AS query_id",
        f"{idq} AS neighbor_id",
        f"ROUND({spark_sql_dot(vecq, '__qvec')}"
        f" / (__cnorm * __qnorm), {round_scale}) AS score",
    )
    return scored.selectExpr(
        "*",
        "row_number() OVER (PARTITION BY query_id"
        " ORDER BY score DESC, neighbor_id ASC) AS rank",
    ).where(f"rank <= {k}")


def sql_sq_l2(a: str, b: str) -> str:
    """DuckDB twin of the squared-L2 fold used by :func:`assign_cells`."""
    return (
        f"list_sum(list_transform(list_zip({a}, {b}),"
        f" p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
        f" * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"
    )


def assign_cells(
    emb: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment (the IVF coarse quantizer apply).

    ``cents`` is (cell, centroid array<double>) and is broadcast; the
    squared-L2 distance folds in index order so it is bit-identical to
    the DuckDB oracle twin. Ties break on cell id. One shuffle (the
    per-vector argmin); at 1000 executors the centroid table rides the
    broadcast, the corpus never moves.
    """
    d = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.col("centroid"),
            lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy(id_col).orderBy("__dist", "cell")
    return (
        emb.crossJoin(F.broadcast(cents))
        .withColumn("__dist", d)
        .withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") == 1)
        .drop("__dist", "__rnk", "centroid")
    )


def kmeans_cells(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Deterministic Lloyd training for the IVF coarse quantizer.

    Engine-portable by construction (the point is an *oracle-checkable*
    trained quantizer, unlike MLlib's sampled/seeded KMeans):

    - init = the ``k`` lowest-id vectors (no randomness);
    - a fixed number of unrolled iterations (no convergence test);
    - centroid recompute sums per-element values rounded to 6 decimals
      as DECIMAL(38,6) — exact in any accumulation order — then divides
      as double/double, so both engines produce bit-identical centroids.

    Each iteration is one broadcast join (assignment) + one groupBy of
    ``dim`` decimal sums (recompute): 2×iters shuffles total, corpus
    scanned per iteration — the standard distributed Lloyd shape (at
    100 TB you train on a sample; the plan is identical).

    Returns (cell, centroid array<double>).
    """
    w = Window.orderBy(id_col)
    cents = (
        emb.orderBy(id_col)
        .limit(k)
        .select(
            (F.row_number().over(w) - 1).alias("cell"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
                "centroid"
            ),
        )
    )
    for _ in range(iters):
        assigned = assign_cells(emb, cents, id_col=id_col, vec_col=vec_col)
        mean_cols = [
            (
                F.sum(
                    F.round(F.element_at(vec_col, i + 1).cast("double"), 6).cast(
                        "decimal(38,6)"
                    )
                ).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias(f"__c{i}")
            for i in range(dim)
        ]
        cents = (
            assigned.groupBy("cell")
            .agg(*mean_cols)
            .select(
                "cell",
                F.array(*[F.col(f"__c{i}") for i in range(dim)]).alias("centroid"),
            )
        )
    return cents


def sql_kmeans_corpus(k: int = 8, iters: int = 2, dim: int = 64) -> str:
    """DuckDB CTE chain mirroring kmeans_cells + final assign_cells:
    returns SQL whose last CTE ``afinal`` is (vec_id, embedding, cell).
    """
    init = (
        "c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell,"
        " CAST(embedding AS DOUBLE[]) AS centroid"
        f" FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {k}))"
    )
    ctes = [init]

    def assign(name: str, cents: str) -> str:
        return (
            f"{name} AS (SELECT vec_id, embedding, cell FROM ("
            " SELECT e.vec_id, e.embedding, c.cell,"
            " ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY "
            f"{sql_sq_l2('e.embedding', 'c.centroid')}, c.cell) AS rnk"
            f" FROM embeddings e CROSS JOIN {cents} c) WHERE rnk = 1)"
        )

    for t in range(1, iters + 1):
        ctes.append(assign(f"a{t}", f"c{t - 1}"))
        means = ", ".join(
            f"CAST(SUM(CAST(ROUND(CAST(embedding[{i + 1}] AS DOUBLE), 6)"
            " AS DECIMAL(38,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)"
            for i in range(dim)
        )
        ctes.append(
            f"c{t} AS (SELECT cell, [{means}] AS centroid FROM a{t} GROUP BY cell)"
        )
    ctes.append(assign("afinal", f"c{iters}"))
    return ",\n".join(ctes)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    round_scale: int = 6,
) -> DataFrame:
    """Approximate top-k: search only the query's coarse cell.

    The equi-join on the cell id is the IVF probe (nprobe=1); Catalyst
    broadcasts the small query side and prunes every non-matching cell
    partition.
    """
    # same per-side norm precompute as brute_force_topk (identical
    # float values, oracle unaffected); the parallelizing exchange is
    # conditional + hash-keyed exactly like brute_force_topk's (a
    # many-split 100 TB corpus is already wide — round-14, extending
    # the round-13 fix per the r13 advisor)
    par = corpus.sparkSession.sparkContext.defaultParallelism
    # probe partitions on the input (see brute_force_topk)
    narrow = corpus.rdd.getNumPartitions() < par
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        F.col(cell_col),
        norm(F.col(vec_col)).alias("__cnorm"),
    )
    if narrow:
        c = c.repartition(par, F.col(id_col))
    q = queries.select(
        F.col(query_id_col).alias("__qid"),
        F.col(vec_col).alias("__qvec"),
        F.col(cell_col).alias("__qcell"),
        norm(F.col(vec_col)).alias("__qnorm"),
    )
    scored = c.join(
        F.broadcast(q),
        (F.col(cell_col) == F.col("__qcell")) & (F.col(id_col) != F.col("__qid")),
    ).select(
        F.col("__qid").alias("query_id"),
        F.col(id_col).alias("neighbor_id"),
        F.round(
            dot(F.col(vec_col), F.col("__qvec"))
            / (F.col("__cnorm") * F.col("__qnorm")),
            round_scale,
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# --------------------------------------------------------------------------
# Random-hyperplane LSH (SimHash-for-embeddings): the third ANN tier.
# sign(dot(v, h_i)) over P fixed hyperplanes -> a P-bit bucket id; the
# probe is then an equi-join on the bucket, like IVF but needing no
# trained quantizer (the classic Charikar'02 construction the
# reference-era systems use for cosine LSH). Hyperplane coordinates are
# derived from md5 in PYTHON once and embedded as literals on both
# engines, so bucket assignment is bit-identical cross-engine.
# --------------------------------------------------------------------------


def random_hyperplanes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1)^dim.

    Each coordinate is md5("hp_{i}_{j}") -> first 32 bits -> x/2^31 - 1:
    integer parse and power-of-two division are exact, so the doubles
    round-trip identically through repr() into SQL text.
    """
    import hashlib

    return [
        [
            int(hashlib.md5(f"hp_{i}_{j}".encode()).hexdigest()[:8], 16)
            / float(1 << 31)
            - 1.0
            for j in range(dim)
        ]
        for i in range(num_planes)
    ]


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """P-bit bucket id: bit i set iff dot(vec, plane_i) > 0."""
    bucket = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(v) for v in p])
        bucket = bucket + F.when(
            dot(vec, plane) > 0, F.lit(1 << i).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
    return bucket


def _sql_list_literal(values: list[float]) -> str:
    return "[" + ", ".join(repr(v) for v in values) + "]"


def sql_hyperplane_bucket(vec_expr: str, planes: list[list[float]]) -> str:
    """DuckDB twin of :func:`hyperplane_bucket`."""
    terms = " + ".join(
        f"CASE WHEN {sql_dot(vec_expr, _sql_list_literal(p))} > 0 "
        f"THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for i, p in enumerate(planes)
    )
    return f"({terms})"


def hyperplane_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    round_scale: int = 6,
) -> DataFrame:
    """Approximate top-k restricted to the query's LSH bucket.

    Same physical shape as :func:`ivf_topk`: bucket assignment is a
    scan-side projection (P dot products, no shuffle), the probe is a
    broadcast equi-join on the bucket id, and the per-query top-k is a
    bounded window. At 100 TB the corpus bucket column would be
    precomputed at ingest; nothing downstream changes.
    """
    # conditional hash-keyed exchange, same rationale as ivf_topk;
    # partition probe on the input (see brute_force_topk)
    par = corpus.sparkSession.sparkContext.defaultParallelism
    narrow = corpus.rdd.getNumPartitions() < par
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_bucket(F.col(vec_col), planes).alias("__bucket"),
        norm(F.col(vec_col)).alias("__cnorm"),
    )
    if narrow:
        c = c.repartition(par, F.col(id_col))
    q = queries.select(
        F.col(query_id_col).alias("__qid"),
        F.col(vec_col).alias("__qvec"),
        hyperplane_bucket(F.col(vec_col), planes).alias("__qbucket"),
        norm(F.col(vec_col)).alias("__qnorm"),
    )
    scored = c.join(
        F.broadcast(q),
        (F.col("__bucket") == F.col("__qbucket")) & (F.col(id_col) != F.col("__qid")),
    ).select(
        F.col("__qid").alias("query_id"),
        F.col(id_col).alias("neighbor_id"),
        F.round(
            dot(F.col(vec_col), F.col("__qvec"))
            / (F.col("__cnorm") * F.col("__qnorm")),
            round_scale,
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# Product quantization (PQ): sub-vector codebooks + asymmetric distance
# ---------------------------------------------------------------------------


def pq_codebooks(
    emb: DataFrame,
    m: int = 4,
    sub: int = 16,
    kcents: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[DataFrame]:
    """Train ``m`` per-subspace codebooks (Jégou et al. 2011 product
    quantization — the memory-bound ANN serving tier: a D-dim float
    vector compresses to m byte codes).

    Each subspace j covers dims [j*sub, (j+1)*sub); its codebook is the
    same deterministic Lloyd training as the IVF coarse quantizer
    (:func:`kmeans_cells` — fixed lowest-id init, unrolled iterations,
    decimal-grid means), so the whole train->encode->search pipeline is
    cross-engine hash-gateable. Returns one (cell, centroid) DataFrame
    per subspace.
    """
    books = []
    for j in range(m):
        subemb = emb.select(
            F.col(id_col), F.slice(F.col(vec_col), j * sub + 1, sub).alias("embedding")
        )
        # each codebook is consumed twice (encode + ADC lookup) and costs
        # a corpus scan to train — persist the k-row result so the Lloyd
        # chain runs once per subspace
        books.append(
            kmeans_cells(subemb, k=kcents, iters=iters, id_col=id_col, dim=sub)
            .persist()
        )
    return books


def pq_encode(
    emb: DataFrame,
    books: list[DataFrame],
    sub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector as m nearest-centroid codes (one broadcast
    argmin per subspace; the corpus never shuffles on anything but the
    per-vector window, and at scale the codebooks ride the broadcast)."""
    codes = emb.select(id_col)
    for j, book in enumerate(books):
        subemb = emb.select(
            F.col(id_col), F.slice(F.col(vec_col), j * sub + 1, sub).alias("embedding")
        )
        a = assign_cells(subemb, book, id_col=id_col)
        codes = codes.join(
            a.select(F.col(id_col), F.col("cell").alias(f"code{j}")), id_col
        )
    return codes


def pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    books: list[DataFrame],
    codes: DataFrame,
    sub: int = 16,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_scale: int = 6,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: the query stays a float vector,
    each corpus vector is its m codes, and the approximate distance is
    the sum of exact subspace distances query->assigned-centroid. The
    scan side touches only the byte codes; centroid tables and the
    query set broadcast — the plan shape that serves ANN over a corpus
    too large to hold float vectors in memory.

    Distances fold per subspace in index order and sum in subspace
    order, then round to ``round_scale`` before ranking (ascending,
    ties on neighbor id) — bit-identical to the DuckDB twin.
    """
    q = queries.select(
        F.col(query_id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
    )
    scored = codes.crossJoin(F.broadcast(q)).filter(F.col(id_col) != F.col("__qid"))
    dist = F.lit(0.0)
    for j, book in enumerate(books):
        scored = scored.join(
            F.broadcast(
                book.select(
                    F.col("cell").alias(f"code{j}"),
                    F.col("centroid").alias(f"__cent{j}"),
                )
            ),
            f"code{j}",
        )
        d = F.aggregate(
            F.zip_with(
                F.slice(F.col("__qvec"), j * sub + 1, sub),
                F.col(f"__cent{j}"),
                lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        scored = scored.withColumn(f"__d{j}", d)
        dist = dist + F.col(f"__d{j}")
    scored = scored.select(
        F.col("__qid").alias("query_id"),
        F.col(id_col).alias("neighbor_id"),
        F.round(dist, round_scale).alias("adist"),
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def sql_pq_corpus(m: int = 4, sub: int = 16, kcents: int = 16, iters: int = 1) -> str:
    """DuckDB CTE chain mirroring pq_codebooks + pq_encode: per-subspace
    sliced source, unrolled Lloyd chain, final code table ``codes``
    (vec_id, code0..code{m-1}) plus centroid CTEs ``s{j}c{iters}``."""
    ctes = []
    for j in range(m):
        lo, hi = j * sub + 1, (j + 1) * sub
        ctes.append(
            f"s{j} AS (SELECT vec_id, embedding[{lo}:{hi}] AS embedding"
            " FROM embeddings)"
        )
        ctes.append(
            f"s{j}c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell,"
            " CAST(embedding AS DOUBLE[]) AS centroid"
            f" FROM (SELECT * FROM s{j} ORDER BY vec_id LIMIT {kcents}))"
        )

        def assign(name: str, cents: str) -> str:
            return (
                f"{name} AS (SELECT vec_id, embedding, cell FROM ("
                " SELECT e.vec_id, e.embedding, c.cell,"
                " ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY "
                f"{sql_sq_l2('e.embedding', 'c.centroid')}, c.cell) AS rnk"
                f" FROM s{j} e CROSS JOIN {cents} c) WHERE rnk = 1)"
            )

        for t in range(1, iters + 1):
            ctes.append(assign(f"s{j}a{t}", f"s{j}c{t - 1}"))
            means = ", ".join(
                f"CAST(SUM(CAST(ROUND(CAST(embedding[{i + 1}] AS DOUBLE), 6)"
                " AS DECIMAL(38,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)"
                for i in range(sub)
            )
            ctes.append(
                f"s{j}c{t} AS (SELECT cell, [{means}] AS centroid"
                f" FROM s{j}a{t} GROUP BY cell)"
            )
        ctes.append(assign(f"s{j}af", f"s{j}c{iters}"))
    joins = " ".join(f"JOIN s{j}af USING (vec_id)" for j in range(1, m))
    code_cols = ", ".join(f"s{j}af.cell AS code{j}" for j in range(m))
    ctes.append(
        f"codes AS (SELECT vec_id, {code_cols} FROM s0af {joins})"
        if m > 1
        else "codes AS (SELECT vec_id, s0af.cell AS code0 FROM s0af)"
    )
    return ",\n".join(ctes)
