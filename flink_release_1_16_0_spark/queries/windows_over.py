"""OVER-window (analytic) coverage (SURVEY.md sections 2.5, 2.6).

Reference: batch over-agg with the full frame matrix — ROWS/RANGE x
UNBOUNDED/k PRECEDING/FOLLOWING + offset frames (BatchExecOverAggregate
.java; RT/over/frame/{RowSliding,RowUnboundedPreceding,
RowUnboundedFollowing,RangeSliding,RangeUnboundedPreceding,
RangeUnboundedFollowing,Unbounded,Offset}OverFrame.java), the ranking
function set (RANK/DENSE_RANK/ROW_NUMBER/CUME_DIST/PERCENT_RANK/NTILE/
LEAD/LAG — .../aggfunctions/{Rank,DenseRank,RowNumber,CumeDist,
PercentRank,NTILE,LeadLag}AggFunction.java), streaming TopN
(RT/rank/AbstractTopNFunction.java applied as ROW_NUMBER <= N), and
deduplication keep-first/keep-last (RT/deduplicate/*Function.java).

Spark covers the whole matrix natively with
`Window.partitionBy().orderBy().rowsBetween()/rangeBetween()`; the
batch TopN and dedup operators are the canonical window-function
rewrites (ROW_NUMBER = 1 / <= N then filter), which is exactly how the
reference plans them in batch mode. Every ORDER BY carries a unique
tiebreaker so ROW_NUMBER/frames are total-ordered and deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_release_1_16_0_spark.catalog import load_table
from flink_release_1_16_0_spark.queries import register

# --------------------------------------------------------------------------
# ranking family: RANK / DENSE_RANK / ROW_NUMBER / PERCENT_RANK / CUME_DIST
# / NTILE in one pass over orders partitioned by priority
# --------------------------------------------------------------------------

_RANKING_ORACLE = """
SELECT
  o_orderkey,
  o_orderpriority,
  RANK()         OVER w AS rnk,
  DENSE_RANK()   OVER w AS drnk,
  ROW_NUMBER()   OVER w AS rn,
  CAST(PERCENT_RANK() OVER w AS DOUBLE) AS prnk,
  CAST(CUME_DIST()    OVER w AS DOUBLE) AS cdist,
  NTILE(7)       OVER w AS tile
FROM orders
WHERE o_orderkey % 11 = 0
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
"""


@register("over_ranking_family", _RANKING_ORACLE, tags=("over",))
def over_ranking_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(7).over(w).alias("tile"),
    )


# --------------------------------------------------------------------------
# LEAD / LAG offset frames (LeadLagAggFunction; OffsetOverFrame.java)
# --------------------------------------------------------------------------

_LEADLAG_ORACLE = """
SELECT
  user_id,
  event_id,
  LAG(event_type)        OVER w AS prev_type,
  LEAD(event_type)       OVER w AS next_type,
  LAG(event_type, 2, 'none') OVER w AS prev2_type,
  CAST(epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS BIGINT) AS gap_us
FROM events
WHERE user_id % 10 = 3
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register("over_lead_lag", _LEADLAG_ORACLE, tags=("over", "time"))
def over_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 3)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = (F.unix_timestamp("ts") * 1_000_000 + F.date_format("ts", "SSSSSS").cast("long"))
    return ev.select(
        "user_id",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.lag("event_type", 2, "none").over(w).alias("prev2_type"),
        (ts_us - F.lag(ts_us).over(w)).cast("bigint").alias("gap_us"),
    )


# --------------------------------------------------------------------------
# ROWS sliding frame: moving sum/avg over k PRECEDING .. CURRENT
# (RowSlidingOverFrame.java)
# --------------------------------------------------------------------------

_ROWS_SLIDING_ORACLE = """
SELECT
  user_id,
  event_id,
  CAST(SUM(CAST(value AS DECIMAL(38,2))) OVER w AS DOUBLE) AS moving_sum5,
  COUNT(*) OVER w AS n_in_frame
FROM events
WHERE user_id % 10 = 4
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""


@register("over_rows_sliding", _ROWS_SLIDING_ORACLE, tags=("over",))
def over_rows_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 4)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("DECIMAL(38,2)")).over(w).cast("double").alias("moving_sum5"),
        F.count(F.lit(1)).over(w).alias("n_in_frame"),
    )


# --------------------------------------------------------------------------
# ROWS unbounded preceding (running total) + unbounded following
# (RowUnbounded{Preceding,Following}OverFrame.java)
# --------------------------------------------------------------------------

_ROWS_UNBOUNDED_ORACLE = """
SELECT
  user_id,
  event_id,
  CAST(SUM(CAST(value AS DECIMAL(38,2))) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum,
  CAST(SUM(CAST(value AS DECIMAL(38,2))) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS DOUBLE) AS remaining_sum
FROM events
WHERE user_id % 10 = 5
"""


@register("over_rows_unbounded", _ROWS_UNBOUNDED_ORACLE, tags=("over",))
def over_rows_unbounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 5)
    order = [F.asc("ts"), F.asc("event_id")]
    dec = F.col("value").cast("DECIMAL(38,2)")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rem = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(dec).over(w_run).cast("double").alias("running_sum"),
        F.sum(dec).over(w_rem).cast("double").alias("remaining_sum"),
    )


# --------------------------------------------------------------------------
# RANGE frame over a numeric key (RangeSlidingOverFrame.java):
# all orders within +/-1000.00 of the current total price.
# The range key is cast to an exact decimal so frame membership is not
# subject to double rounding on either engine.
# --------------------------------------------------------------------------

_RANGE_SLIDING_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  COUNT(*) OVER w AS peers_within_1k
FROM orders
WHERE o_custkey % 50 = 7
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY CAST(o_totalprice AS DECIMAL(18,2))
             RANGE BETWEEN 1000.00 PRECEDING AND 1000.00 FOLLOWING)
"""


@register("over_range_sliding", _RANGE_SLIDING_ORACLE, tags=("over",))
def over_range_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 7)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.expr(
            """COUNT(*) OVER (PARTITION BY o_orderpriority
               ORDER BY CAST(o_totalprice AS DECIMAL(18,2))
               RANGE BETWEEN 1000.00 PRECEDING AND 1000.00 FOLLOWING)"""
        ).alias("peers_within_1k"),
    )


# --------------------------------------------------------------------------
# RANGE unbounded preceding: cumulative distribution by value with ties
# collapsing into the same frame edge (RangeUnboundedPrecedingOverFrame)
# --------------------------------------------------------------------------

_RANGE_UNBOUNDED_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) OVER (
    PARTITION BY l_orderkey ORDER BY CAST(l_quantity AS DECIMAL(18,2))
    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS qty_cum_range
FROM lineitem
WHERE l_orderkey % 101 = 0
"""


@register("over_range_unbounded", _RANGE_UNBOUNDED_ORACLE, tags=("over",))
def over_range_unbounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 101 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            """CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) OVER (
                 PARTITION BY l_orderkey ORDER BY CAST(l_quantity AS DECIMAL(18,2))
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)"""
        ).alias("qty_cum_range"),
    )


# --------------------------------------------------------------------------
# first_value / last_value / nth_value over a full frame
# --------------------------------------------------------------------------

_FIRST_LAST_ORACLE = """
SELECT DISTINCT
  o_custkey,
  FIRST_VALUE(o_orderkey) OVER w AS first_order,
  LAST_VALUE(o_orderkey)  OVER w AS last_order,
  NTH_VALUE(o_orderkey, 2) OVER w AS second_order
FROM orders
WHERE o_custkey % 25 = 1
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


@register("over_first_last_nth", _FIRST_LAST_ORACLE, tags=("over",))
def over_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 25 == 1)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    ).distinct()


# --------------------------------------------------------------------------
# TopN per group = ROW_NUMBER() <= N then filter — the batch plan of the
# reference's streaming TopN (StreamExecRank / AbstractTopNFunction)
# --------------------------------------------------------------------------

_TOPN_ORACLE = """
SELECT c_nationkey, c_custkey, c_acctbal, rn
FROM (
  SELECT c_nationkey, c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
)
WHERE rn <= 3
"""


@register("rank_topn_per_group", _TOPN_ORACLE, tags=("rank", "over"))
def rank_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# Deduplication keep-first / keep-last per key (RT/deduplicate/
# {ProcTimeDeduplicateKeepFirstRow,RowTimeDeduplicate}Function.java):
# first and last event per user by event time.
# --------------------------------------------------------------------------

_DEDUP_FIRST_ORACLE = """
SELECT user_id, event_id, event_type, ts
FROM (
  SELECT user_id, event_id, event_type, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
WHERE rn = 1
"""


@register("dedup_keep_first", _DEDUP_FIRST_ORACLE, tags=("dedup", "over"))
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        ev.select("user_id", "event_id", "event_type", "ts", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


_DEDUP_LAST_ORACLE = """
SELECT user_id, event_id, event_type, ts
FROM (
  SELECT user_id, event_id, event_type, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
"""


@register("dedup_keep_last", _DEDUP_LAST_ORACLE, tags=("dedup", "over"))
def dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.select("user_id", "event_id", "event_type", "ts", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# --------------------------------------------------------------------------
# RANGE frame over event TIME (the reference's rowtime-bounded over-agg,
# RowTimeRangeBoundedPrecedingFunction.java:296): per user, rolling
# count/sum over the preceding hour. Both engines order by epoch
# seconds so the interval frame is an exact integer RANGE.
# --------------------------------------------------------------------------

_RANGE_TIME_ORACLE = """
SELECT user_id, event_id,
       COUNT(*) OVER w AS events_last_hour,
       CAST(SUM(CAST(value AS DECIMAL(38,2))) OVER w AS DOUBLE) AS value_last_hour
FROM (SELECT user_id, event_id, value,
             CAST(epoch(ts) AS BIGINT) AS epoch_s
      FROM events WHERE user_id % 20 = 3)
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


@register("over_range_time_interval", _RANGE_TIME_ORACLE, tags=("over", "time"))
def over_range_time_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 20 == 3)
    base = ev.select(
        "user_id",
        "event_id",
        "value",
        F.unix_timestamp("ts").alias("epoch_s"),
    )
    return base.select(
        "user_id",
        "event_id",
        F.expr(
            """COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_s
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)"""
        ).alias("events_last_hour"),
        F.expr(
            """CAST(SUM(CAST(value AS DECIMAL(38,2))) OVER (
               PARTITION BY user_id ORDER BY epoch_s
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE)"""
        ).alias("value_last_hour"),
    )


# --------------------------------------------------------------------------
# FIRST_VALUE / LAST_VALUE / LEAD with IGNORE NULLS (the null-skipping
# analytic variants, FlinkSqlOperatorTable FIRST_VALUE/LAST_VALUE —
# Flink's functions skip NULLs like the SQL-standard IGNORE NULLS).
# A NULL-bearing column is synthesized deterministically so both
# engines see identical gaps.
# --------------------------------------------------------------------------

_IGNORE_NULLS_ORACLE = """
WITH src AS (
  SELECT o_custkey, o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL
              ELSE o_orderkey END AS maybe_key
  FROM orders WHERE o_custkey % 25 = 1
)
SELECT o_custkey, o_orderkey,
       LAST_VALUE(maybe_key IGNORE NULLS) OVER w AS last_nonnull,
       FIRST_VALUE(maybe_key IGNORE NULLS) OVER w2 AS first_nonnull
FROM src
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       w2 AS (PARTITION BY o_custkey ORDER BY o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


@register("over_ignore_nulls", _IGNORE_NULLS_ORACLE, tags=("over",))
def over_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 25 == 1)
    src = orders.select(
        "o_custkey",
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, None)
        .otherwise(F.col("o_orderkey"))
        .alias("maybe_key"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w2 = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return src.select(
        "o_custkey",
        "o_orderkey",
        F.last("maybe_key", ignorenulls=True).over(w).alias("last_nonnull"),
        F.first("maybe_key", ignorenulls=True).over(w2).alias("first_nonnull"),
    )


# --------------------------------------------------------------------------
# RANK-mode TopN (RankType.java:30 RANK vs ROW_NUMBER; the reference's
# TopN supports both): ties share a rank, so "top 3" can emit more than
# 3 rows per group. Balances are on a cents grid, so tie groups are
# engine-identical.
# --------------------------------------------------------------------------

_TOPN_RANK_MODE_ORACLE = """
SELECT c_nationkey, c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal, rnk
FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         CAST(RANK() OVER (PARTITION BY c_nationkey
                           ORDER BY c_acctbal DESC) AS INT) AS rnk
  FROM customer
)
WHERE rnk <= 3
"""


@register("rank_topn_rank_mode", _TOPN_RANK_MODE_ORACLE, tags=("rank", "topn"))
def rank_topn_rank_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"))
    return (
        cust.select(
            "c_nationkey",
            "c_custkey",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            F.rank().over(w).cast("int").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )
