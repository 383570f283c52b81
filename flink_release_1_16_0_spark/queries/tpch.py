"""TPC-H-shape relational queries over the driver star schema.

These exercise the batch scan->filter->project->agg->join->sort pipeline
the reference covers with its batch ExecNodes (BatchExecCalc,
BatchExec(Hash|Sort)Aggregate, BatchExec(HashJoin|SortMergeJoin),
BatchExecSort/SortLimit — SURVEY.md sections 2.1-2.4, 2.6). On Spark all
of them are native Catalyst plans; the queries are declared via the
DataFrame API and Catalyst handles pushdown, partial aggregation, and
join-strategy selection (broadcast for the small dims).

Column set is adapted to the driver's schema (FIXTURES.md section A).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_release_1_16_0_spark.catalog import load_table, register_tables
from flink_release_1_16_0_spark.queries import register
from flink_release_1_16_0_spark.queries._util import (
    broadcast_if_small,
    dsum,
    spread_scan,
    sql_davg,
    sql_dsum,
)

# --------------------------------------------------------------------------
# Q1 pricing summary (flagship: Calc + hash agg + sort)
# --------------------------------------------------------------------------

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum('l_quantity')} AS sum_qty,
  {sql_dsum('l_extendedprice')} AS sum_base_price,
  {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
  {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
  {sql_davg('l_quantity')} AS avg_qty,
  {sql_davg('l_extendedprice')} AS avg_price,
  {sql_davg('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# Spark-side SQL text: the same decimal-grid aggregation the Column
# form built (sql_dsum/sql_davg above are the DuckDB twins; these are
# the Spark spellings — CAST(.. AS DECIMAL) rounds HALF_UP in both the
# Column and the SQL form, so plans and results are identical). Text
# construction costs one JVM parse instead of ~9 py4j-built aggregate
# Columns per invocation: build time 0.15 s -> 0.02 s (round-13
# optimization round).
def _spark_dsum(expr: str, scale: int = 2) -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(38,{scale})))"
        " AS DECIMAL(38,2)) AS DOUBLE)"
    )


def _spark_davg(expr: str, scale: int = 2) -> str:
    return f"CAST({_spark_dsum(expr, scale)} / COUNT({expr}) AS DOUBLE)"


_Q1_SPARK_SQL = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {_spark_dsum('l_quantity')} AS sum_qty,
  {_spark_dsum('l_extendedprice')} AS sum_base_price,
  {_spark_dsum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
  {_spark_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
  {_spark_davg('l_quantity')} AS avg_qty,
  {_spark_davg('l_extendedprice')} AS avg_price,
  {_spark_davg('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM {{src}}
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", _Q1_ORACLE, tags=("agg", "calc"), bench=True)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 8 accumulators fuse into the scan stage as partial agg; spread a
    # single-split scan so they run at full width (no-op on real
    # corpora: the hint branch is taken only when the scan has fewer
    # splits than the session parallelism). Hash-spread on a projected
    # column skips the round-robin exchange's map-side sort (see
    # spread_scan); the numbered hint derives from defaultParallelism,
    # never a constant. Measured 0.97 s -> 0.37 s at sf0.1 across the
    # round-13 optimization steps (hash spread + SQL-text build).
    register_tables(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    par = spark.sparkContext.defaultParallelism
    if li.rdd.getNumPartitions() < par:
        src = (
            f"(SELECT /*+ REPARTITION({par}, l_extendedprice) */ *"
            " FROM lineitem) lineitem"
        )
    else:
        src = "lineitem"
    return spark.sql(_Q1_SPARK_SQL.format(src=src))


# --------------------------------------------------------------------------
# Q3 shipping priority (3-way join + agg + top-k)
# --------------------------------------------------------------------------

_Q3_ORACLE = f"""
SELECT
  l_orderkey,
  {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
  o_orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-03-15'
  AND l_shipdate  > TIMESTAMP '1997-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", _Q3_ORACLE, tags=("join", "agg", "limit"), bench=True)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp")
    )
    # lineitem is the streamed side of the broadcast-join chain; a
    # single-split scan would run every probe serially in one task, so
    # hash-spread it (no-op on a many-split corpus; see spread_scan).
    # The customer x orders side carries a size-gated broadcast hint:
    # size-estimate planning otherwise picks the 600k-row lineitem as
    # the BUILD side — collecting and hashing the fact table every run —
    # and streams the ~15k-row dimension product through it. Measured
    # 0.79 s -> 0.47 s at sf0.1 (round-13 optimization round). The hint
    # is gated on the base tables' size estimates (round-14): orders
    # grows with the corpus, and past the broadcast threshold the
    # planner must keep its shuffle-join fallbacks (see
    # broadcast_if_small).
    li = spread_scan(
        load_table(spark, sf_dir, "lineitem"), key="l_orderkey"
    ).filter(F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp"))
    co = broadcast_if_small(
        cust.join(orders, cust.c_custkey == orders.o_custkey),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
    )
    return (
        li.join(co, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


# --------------------------------------------------------------------------
# Q5 local supplier volume (6-way join; dims broadcast)
# --------------------------------------------------------------------------

_Q5_ORACLE = f"""
SELECT
  n_name,
  {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


@register("q5_local_supplier", _Q5_ORACLE, tags=("join", "agg"), bench=True)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    # same shape as q3: stream the (conditionally hash-spread) fact,
    # size-gated broadcast hint on the customer x orders side —
    # size-estimate planning otherwise builds the broadcast from the
    # 600k-row lineitem. Measured 0.76 s -> 0.51 s at sf0.1 (round-13
    # optimization round); gate added round-14 (see broadcast_if_small).
    li = spread_scan(load_table(spark, sf_dir, "lineitem"), key="l_orderkey")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    co = broadcast_if_small(
        cust.join(orders, cust.c_custkey == orders.o_custkey),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
    )
    return (
        li.join(co, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            # supplier scales with SF (unlike nation/region): gate its
            # hint too (the stat is memoized on the cached relation)
            broadcast_if_small(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q10 returned items (join + agg + top-k with total order)
# --------------------------------------------------------------------------

_Q10_ORACLE = f"""
SELECT
  c_custkey,
  c_name,
  {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
  CAST(c_acctbal AS DOUBLE) AS c_acctbal,
  n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-10-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", _Q10_ORACLE, tags=("join", "agg", "limit"))
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    # q3-twin shape (round-13 optimization round): stream the
    # (conditionally spread) fact, size-gated broadcast hint on the
    # customer x orders side — size estimates otherwise pick the raw
    # lineitem scan as the broadcast build side. Gate added round-14
    # (see broadcast_if_small).
    li = spread_scan(
        load_table(spark, sf_dir, "lineitem"), key="l_orderkey"
    ).filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    co = broadcast_if_small(
        cust.join(orders, cust.c_custkey == orders.o_custkey),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
    )
    return (
        li.join(co, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


# --------------------------------------------------------------------------
# Q6 forecast revenue change (pure Calc + global agg, pushdown showcase)
# --------------------------------------------------------------------------

_Q6_ORACLE = f"""
SELECT {sql_dsum('l_extendedprice * l_discount', 4)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", _Q6_ORACLE, tags=("calc", "agg"), bench=True)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q18 large volume customer (agg subquery + semi filter via join)
# --------------------------------------------------------------------------

_Q18_ORACLE = f"""
SELECT
  c_name, c_custkey, o_orderkey, o_orderdate,
  CAST(o_totalprice AS DOUBLE) AS o_totalprice,
  {sql_dsum('l_quantity')} AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(38,4))) > 150
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@register("q18_large_volume", _Q18_ORACLE, tags=("join", "agg", "subquery"))
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("DECIMAL(38,4)")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(
            big.withColumnRenamed("l_orderkey", "big_orderkey"),
            F.col("o_orderkey") == F.col("big_orderkey"),
            "left_semi",
        )
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )
