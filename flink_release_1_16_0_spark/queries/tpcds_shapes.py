"""TPC-DS-shape coverage queries.

The reference's second end-to-end correctness gate is the 103-query
TPC-DS suite (flink-end-to-end-tests/flink-tpcds-test/, golden
answer_set/, SURVEY.md section 5.4). The driver fixtures are TPC-H-ish,
so these adapt the *query shapes* that distinguish TPC-DS from TPC-H —
correlated scalar subqueries (decorrelation), EXISTS/NOT EXISTS
semi/anti rewrites, CASE channel pivots, ROLLUP + window-rank over
grouping levels, month-series window deltas, multi-channel UNION —
onto the driver star schema. Each runs through ``spark.sql`` so the
whole Catalyst subquery-rewrite pipeline is exercised (the reference
runs these through Calcite's subquery_rewrite/decorrelate programs,
FlinkStreamProgram.scala:47-113).

Determinism: double aggregates go through the DECIMAL grid
(queries/_util.py); threshold comparisons against averages are
cross-multiplied into exact integer-scaled decimal arithmetic so no
row ever sits on a floating-point boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_release_1_16_0_spark.catalog import load_table
from flink_release_1_16_0_spark.queries import register


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


# --------------------------------------------------------------------------
# Correlated scalar subqueries (TPC-DS q1/q30 shape): customers whose
# balance exceeds 1.2x their nation's average. The 1.2*avg comparison is
# cross-multiplied (5*bal*cnt > 6*sum, all DECIMAL-exact) so both
# engines decide every row identically. Exercises Catalyst's
# decorrelation (reference: FlinkDecorrelateProgram).
# --------------------------------------------------------------------------

_DS_CORRELATED = """
SELECT c.c_custkey, c.c_name, c.c_acctbal
FROM customer c
WHERE CAST(c.c_acctbal AS DECIMAL(38,2)) * 5
        * (SELECT COUNT(*) FROM customer c2
           WHERE c2.c_nationkey = c.c_nationkey)
      > 6 * (SELECT SUM(CAST(c2.c_acctbal AS DECIMAL(38,2))) FROM customer c2
             WHERE c2.c_nationkey = c.c_nationkey)
"""


@register("ds_correlated_scalar_subquery", _DS_CORRELATED, tags=("tpcds", "subquery"))
def ds_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer")
    return spark.sql(_DS_CORRELATED)


# --------------------------------------------------------------------------
# EXISTS + NOT EXISTS (TPC-DS q10/q35 shape) -> semi-join + anti-join
# rewrite (reference: TABLE_SUBQUERY_RULES, FlinkStreamProgram.scala:47).
# --------------------------------------------------------------------------

_DS_EXISTS = """
SELECT c.c_custkey, c.c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'F')
"""


@register("ds_exists_not_exists", _DS_EXISTS, tags=("tpcds", "subquery"))
def ds_exists_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_DS_EXISTS)


# --------------------------------------------------------------------------
# Uncorrelated scalar subquery threshold (TPC-DS q23 "above average"
# shape), again cross-multiplied into exact decimal arithmetic.
# --------------------------------------------------------------------------

_DS_ABOVE_AVG = """
SELECT o_orderpriority, COUNT(*) AS n_above
FROM orders
WHERE CAST(o_totalprice AS DECIMAL(38,2)) * (SELECT COUNT(*) FROM orders)
      > (SELECT SUM(CAST(o_totalprice AS DECIMAL(38,2))) FROM orders)
GROUP BY o_orderpriority
"""

_DS_ABOVE_AVG_ORACLE = _DS_ABOVE_AVG.replace(
    "COUNT(*) AS n_above", "CAST(COUNT(*) AS BIGINT) AS n_above"
)


@register("ds_above_average_threshold", _DS_ABOVE_AVG_ORACLE, tags=("tpcds", "subquery"))
def ds_above_average_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(_DS_ABOVE_AVG)


# --------------------------------------------------------------------------
# CASE channel pivot (TPC-DS q62/q66 shape): one pass over orders,
# priorities pivoted to columns. DECIMAL-grid sums keep the pivot exact.
# --------------------------------------------------------------------------

_DS_PIVOT = """
SELECT o_orderstatus,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                     THEN CAST(o_totalprice AS DECIMAL(38,2)) END) AS DOUBLE) AS urgent_rev,
       CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'
                     THEN CAST(o_totalprice AS DECIMAL(38,2)) END) AS DOUBLE) AS high_rev,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN CAST(o_totalprice AS DECIMAL(38,2)) END) AS DOUBLE) AS other_rev,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
"""

_DS_PIVOT_ORACLE = _DS_PIVOT.replace(
    "COUNT(*) AS n_orders", "CAST(COUNT(*) AS BIGINT) AS n_orders"
)


@register("ds_case_channel_pivot", _DS_PIVOT_ORACLE, tags=("tpcds", "pivot"))
def ds_case_channel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(_DS_PIVOT)


# --------------------------------------------------------------------------
# ROLLUP + rank within grouping level (TPC-DS q36 shape): revenue
# rolled up over (returnflag, linestatus), RANK() partitioned by the
# grouping level. The rank orders by the exact DECIMAL sum (cast to
# double only for output) so tie-breaks are cross-engine identical.
# --------------------------------------------------------------------------

_DS_ROLLUP_RANK = """
WITH agg AS (
  SELECT l_returnflag, l_linestatus,
         GROUPING(l_returnflag) + GROUPING(l_linestatus) AS lochierarchy,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS rev_exact
  FROM lineitem
  GROUP BY ROLLUP(l_returnflag, l_linestatus)
)
SELECT l_returnflag, l_linestatus,
       CAST(lochierarchy AS INT) AS lochierarchy,
       CAST(rev_exact AS DOUBLE) AS revenue,
       CAST(RANK() OVER (PARTITION BY lochierarchy ORDER BY rev_exact DESC) AS INT)
           AS rank_in_level
FROM agg
"""


@register("ds_rollup_rank_in_level", _DS_ROLLUP_RANK, tags=("tpcds", "rollup", "window"))
def ds_rollup_rank_in_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_DS_ROLLUP_RANK)


# --------------------------------------------------------------------------
# Month-series window delta (TPC-DS q47/q57 shape): brand x month
# revenue with the previous/next month's revenue alongside (LAG/LEAD
# move exact values — no cross-engine float accumulation).
# --------------------------------------------------------------------------

_DS_MONTH_DELTA = """
WITH m AS (
  SELECT p.p_brand,
         substring(CAST(date_trunc('month', l.l_shipdate) AS VARCHAR(19)), 1, 7) AS mon,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) AS revenue
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand, date_trunc('month', l.l_shipdate)
)
SELECT p_brand, mon, revenue,
       LAG(revenue) OVER w AS prev_rev,
       LEAD(revenue) OVER w AS next_rev
FROM m
WINDOW w AS (PARTITION BY p_brand ORDER BY mon)
"""


@register("ds_month_series_delta", _DS_MONTH_DELTA, tags=("tpcds", "window"))
def ds_month_series_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_DS_MONTH_DELTA)


# --------------------------------------------------------------------------
# Multi-channel UNION ALL then re-aggregate (TPC-DS q71 shape): two
# discount "channels" unioned, then summed per channel x returnflag.
# --------------------------------------------------------------------------

_DS_CHANNELS = """
WITH channels AS (
  SELECT 'discounted' AS channel, l_returnflag,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4)) AS rev
  FROM lineitem WHERE l_discount >= 0.05
  UNION ALL
  SELECT 'full_price' AS channel, l_returnflag,
         CAST(l_extendedprice AS DECIMAL(38,4)) AS rev
  FROM lineitem WHERE l_discount < 0.05
)
SELECT channel, l_returnflag,
       CAST(SUM(rev) AS DOUBLE) AS revenue, COUNT(*) AS n_items
FROM channels
GROUP BY channel, l_returnflag
"""

_DS_CHANNELS_ORACLE = _DS_CHANNELS.replace(
    "COUNT(*) AS n_items", "CAST(COUNT(*) AS BIGINT) AS n_items"
)


@register("ds_union_channels", _DS_CHANNELS_ORACLE, tags=("tpcds", "setop"))
def ds_union_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_DS_CHANNELS)


# --------------------------------------------------------------------------
# GROUP + HAVING band (TPC-DS q34 shape): customers whose order count
# falls inside a band, joined back for detail.
# --------------------------------------------------------------------------

_DS_HAVING_BAND = """
SELECT c.c_custkey, c.c_mktsegment, o.cnt AS order_count
FROM customer c
JOIN (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY o_custkey
  HAVING COUNT(*) BETWEEN 8 AND 12
) o ON c.c_custkey = o.o_custkey
"""


@register("ds_having_band", _DS_HAVING_BAND, tags=("tpcds", "agg"))
def ds_having_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_DS_HAVING_BAND)


# --------------------------------------------------------------------------
# Time-band CASE counting in one pass (TPC-DS q88 shape): eight shipdate
# year-quarter buckets counted in a single scan.
# --------------------------------------------------------------------------

_DS_TIME_BANDS = """
SELECT
  COUNT(CASE WHEN y = 1995 AND q = 1 THEN 1 END) AS y95q1,
  COUNT(CASE WHEN y = 1995 AND q = 2 THEN 1 END) AS y95q2,
  COUNT(CASE WHEN y = 1995 AND q = 3 THEN 1 END) AS y95q3,
  COUNT(CASE WHEN y = 1995 AND q = 4 THEN 1 END) AS y95q4,
  COUNT(CASE WHEN y = 1996 AND q = 1 THEN 1 END) AS y96q1,
  COUNT(CASE WHEN y = 1996 AND q = 2 THEN 1 END) AS y96q2,
  COUNT(CASE WHEN y = 1996 AND q = 3 THEN 1 END) AS y96q3,
  COUNT(CASE WHEN y = 1996 AND q = 4 THEN 1 END) AS y96q4
FROM (
  SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS y,
         CAST(EXTRACT(QUARTER FROM l_shipdate) AS INT) AS q
  FROM lineitem
)
"""


@register("ds_time_band_counts", _DS_TIME_BANDS, tags=("tpcds", "pivot"))
def ds_time_band_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_DS_TIME_BANDS)


# --------------------------------------------------------------------------
# IN over a subquery + anti condition (TPC-DS q45/q95 shape): suppliers
# of high-discount lines that never shipped a low-discount line.
# --------------------------------------------------------------------------

# The NOT IN side is a structural key slice: at every scale factor each
# supplier has lines in all discount bands (a discount-band NOT IN is
# vacuously empty), so the anti condition excludes a keyed subset
# instead, keeping the q45/q95 IN + NOT IN decorrelation shape with a
# scale-stable nonzero result.
_DS_IN_SUBQUERY = """
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (SELECT l_suppkey FROM lineitem WHERE l_discount >= 0.09)
  AND s.s_suppkey NOT IN (SELECT l_suppkey FROM lineitem WHERE l_suppkey % 3 = 0)
"""

# Spark-side twin: the NOT IN spelled as NOT EXISTS. Spark compiles a
# NOT IN subquery to a null-aware anti join, whose ONLY physical
# strategies broadcast the subquery side (BroadcastHashJoin-NAAJ or
# BroadcastNestedLoopJoin) — at 100 TB that broadcast of a fact slice
# hard-fails. NOT EXISTS compiles to a plain left-anti join that
# degrades to sort-merge past the broadcast threshold (round-14; pinned
# by test_semi_anti_fact_broadcast_degrades). Equivalence: the NOT IN
# subquery's own predicate (l_suppkey % 3 = 0) rejects NULL keys, and
# the outer s_suppkey already passed an IN, so neither side can produce
# the NULL that distinguishes NOT IN from NOT EXISTS — the ORACLE text
# keeps the original NOT IN, so every oracle run re-proves this.
_DS_IN_SUBQUERY_SPARK = """
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (SELECT l_suppkey FROM lineitem WHERE l_discount >= 0.09)
  AND NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_suppkey = s.s_suppkey AND l.l_suppkey % 3 = 0)
"""


@register("ds_in_not_in_subquery", _DS_IN_SUBQUERY, tags=("tpcds", "subquery"))
def ds_in_not_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(_DS_IN_SUBQUERY_SPARK)


# --------------------------------------------------------------------------
# Ratio-to-report / windowed share (TPC-DS q36 shape): revenue share of
# each linestatus within its returnflag via SUM OVER on the aggregate,
# plus a rank on the exact decimal value. Shares divide two exact
# decimals as doubles, so both engines produce bit-identical ratios.
# --------------------------------------------------------------------------

_DS_RATIO_TO_REPORT = """
WITH rev AS (
  SELECT l_returnflag, l_linestatus,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS r
  FROM lineitem
  GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
       CAST(r AS DOUBLE) AS revenue,
       CAST(r AS DOUBLE)
         / CAST(SUM(r) OVER (PARTITION BY l_returnflag) AS DOUBLE) AS share,
       CAST(RANK() OVER (PARTITION BY l_returnflag ORDER BY r DESC) AS BIGINT)
         AS rk
FROM rev
"""


@register("ds_ratio_to_report", _DS_RATIO_TO_REPORT, tags=("tpcds", "window"))
def ds_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_DS_RATIO_TO_REPORT)


# --------------------------------------------------------------------------
# Year-over-year growth via self-join of yearly aggregates (TPC-DS
# q74/q75 shape): per-segment yearly revenue joined to the prior year,
# keeping segments that grew. The growth predicate cross-multiplies
# exact decimals (cur > prior, both DECIMAL) — no float boundary.
# --------------------------------------------------------------------------

_DS_YOY_GROWTH = """
WITH yearly AS (
  SELECT c.c_mktsegment,
         CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS yr,
         SUM(CAST(o.o_totalprice AS DECIMAL(38,2))) AS rev
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, EXTRACT(YEAR FROM o.o_orderdate)
)
SELECT cur.c_mktsegment, cur.yr,
       CAST(cur.rev AS DOUBLE) AS rev,
       CAST(prior.rev AS DOUBLE) AS prev_rev,
       CAST(cur.rev AS DOUBLE) / CAST(prior.rev AS DOUBLE) AS growth
FROM yearly cur
JOIN yearly prior
  ON cur.c_mktsegment = prior.c_mktsegment AND cur.yr = prior.yr + 1
WHERE cur.rev > prior.rev
"""


@register("ds_yoy_growth", _DS_YOY_GROWTH, tags=("tpcds", "join", "window"))
def ds_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(_DS_YOY_GROWTH)


# --------------------------------------------------------------------------
# Cross-channel INTERSECT of entity sets (TPC-DS q38 shape): customers
# active in both an early and a late order window, counted after the
# set intersection.
# --------------------------------------------------------------------------

_DS_CHANNEL_INTERSECT = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_both
FROM (
  SELECT o_custkey FROM orders
  WHERE EXTRACT(YEAR FROM o_orderdate) <= 1993
  INTERSECT
  SELECT o_custkey FROM orders
  WHERE EXTRACT(YEAR FROM o_orderdate) >= 1997
)
"""


@register("ds_channel_intersect", _DS_CHANNEL_INTERSECT, tags=("tpcds", "setop"))
def ds_channel_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(_DS_CHANNEL_INTERSECT)


# --------------------------------------------------------------------------
# Ratio-to-report window over aggregates (TPC-DS q36 shape): segment
# revenue as a share of its nation's total — SUM OVER of a SUM, the
# two-level aggregate+window plan. Both sums are DECIMAL-exact; the
# final share is one double division of identical inputs.
# --------------------------------------------------------------------------

_DS_RATIO_TO_TOTAL = """
SELECT n_name, c_mktsegment,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE)
         / CAST(SUM(SUM(CAST(o_totalprice AS DECIMAL(38,2))))
                  OVER (PARTITION BY n_name) AS DOUBLE) AS share
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name, c_mktsegment
"""


@register("ds_ratio_to_total", _DS_RATIO_TO_TOTAL, tags=("tpcds", "window", "agg"))
def ds_ratio_to_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "customer", "nation")
    return spark.sql(_DS_RATIO_TO_TOTAL)


# --------------------------------------------------------------------------
# Two-band count ratio (TPC-DS q90 am/pm shape) over the events table:
# integer counts, one exact double division.
# --------------------------------------------------------------------------

_DS_AM_PM = """
SELECT CAST(SUM(CASE WHEN EXTRACT(HOUR FROM ts) < 12 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(SUM(CASE WHEN EXTRACT(HOUR FROM ts) >= 12 THEN 1 ELSE 0 END) AS DOUBLE)
         AS am_pm_ratio
FROM events WHERE event_type = 'purchase'
"""


@register("ds_am_pm_ratio", _DS_AM_PM, tags=("tpcds", "agg"))
def ds_am_pm_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "events")
    return spark.sql(_DS_AM_PM)


# --------------------------------------------------------------------------
# Frequent-buyer cohort (TPC-DS q23 shape): a HAVING-filtered grouped
# subquery defines the cohort, the outer query re-joins and
# re-aggregates it.
# --------------------------------------------------------------------------

_DS_FREQUENT_BUYERS = """
SELECT c.c_custkey, c.c_name, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total_spend
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
WHERE c.c_custkey IN (
  SELECT o_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 20
)
GROUP BY c.c_custkey, c.c_name
"""


@register("ds_frequent_buyers", _DS_FREQUENT_BUYERS, tags=("tpcds", "subquery", "agg"))
def ds_frequent_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_DS_FREQUENT_BUYERS)


# --------------------------------------------------------------------------
# GROUPING() level detection inside ROLLUP (TPC-DS q27/q36 shape): the
# lochierarchy expression distinguishing detail/subtotal/grand-total
# rows, computed identically on both engines.
# --------------------------------------------------------------------------

_DS_GROUPING_LEVEL = """
SELECT COALESCE(n_name, 'ALL') AS nation,
       COALESCE(c_mktsegment, 'ALL') AS segment,
       CAST(GROUPING(n_name) * 2 + GROUPING(c_mktsegment) AS INT) AS lochierarchy,
       CAST(COUNT(*) AS BIGINT) AS n
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, c_mktsegment)
"""


@register("ds_grouping_level", _DS_GROUPING_LEVEL, tags=("tpcds", "rollup"))
def ds_grouping_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "nation")
    return spark.sql(_DS_GROUPING_LEVEL)


# --------------------------------------------------------------------------
# Multi-channel COUNT(DISTINCT) pivot (TPC-DS q35/q69 shape): distinct
# entity counts per channel computed in one pass over the fact table.
# --------------------------------------------------------------------------

_DS_DISTINCT_CHANNELS = """
SELECT o_orderstatus,
       CAST(COUNT(DISTINCT CASE WHEN o_orderpriority = '1-URGENT'
                                THEN o_custkey END) AS BIGINT) AS urgent_custs,
       CAST(COUNT(DISTINCT CASE WHEN o_orderpriority = '5-LOW'
                                THEN o_custkey END) AS BIGINT) AS low_custs,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS all_custs
FROM orders
GROUP BY o_orderstatus
"""


@register("ds_distinct_channels", _DS_DISTINCT_CHANNELS, tags=("tpcds", "agg"))
def ds_distinct_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(_DS_DISTINCT_CHANNELS)


# --------------------------------------------------------------------------
# Year-over-year cohort retention (TPC-DS q11/q74 customer-activity
# shape): customers active in consecutive years, retention counted per
# base year via a self-join of per-(customer, year) activity.
# --------------------------------------------------------------------------

_DS_RETENTION = """
WITH activity AS (
  SELECT DISTINCT o_custkey, EXTRACT(YEAR FROM o_orderdate) AS yr
  FROM orders
)
SELECT a.yr AS base_year,
       CAST(COUNT(*) AS BIGINT) AS active,
       CAST(COUNT(b.o_custkey) AS BIGINT) AS retained
FROM activity a
LEFT JOIN activity b
  ON b.o_custkey = a.o_custkey AND b.yr = a.yr + 1
GROUP BY a.yr
"""


@register("ds_cohort_retention", _DS_RETENTION, tags=("tpcds", "join", "agg"))
def ds_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(_DS_RETENTION)


# --------------------------------------------------------------------------
# Best/worst rank join-back (TPC-DS q44 shape): rank parts by exact
# average revenue, then join the top-10 ascending and descending ranks
# back to the part names in one row per rank position.
# --------------------------------------------------------------------------

_DS_RANK_JOIN_BACK = """
WITH perf AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE)
           / COUNT(*) AS avg_rev
  FROM lineitem GROUP BY l_partkey
), ranked AS (
  SELECT l_partkey, avg_rev,
         ROW_NUMBER() OVER (ORDER BY avg_rev DESC, l_partkey) AS best_rn,
         ROW_NUMBER() OVER (ORDER BY avg_rev ASC, l_partkey) AS worst_rn
  FROM perf
)
SELECT b.best_rn AS rnk, pb.p_name AS best_part, pw.p_name AS worst_part
FROM ranked b
JOIN ranked w ON w.worst_rn = b.best_rn
JOIN part pb ON pb.p_partkey = b.l_partkey
JOIN part pw ON pw.p_partkey = w.l_partkey
WHERE b.best_rn <= 10
"""


@register("ds_rank_join_back", _DS_RANK_JOIN_BACK, tags=("tpcds", "window", "join"))
def ds_rank_join_back(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_DS_RANK_JOIN_BACK)


# --------------------------------------------------------------------------
# Channel-share HAVING filter (TPC-DS q90-adjacent ratio shape):
# customers whose urgent-priority spend exceeds half their total spend —
# the ratio comparison is cross-multiplied into DECIMAL-exact terms.
# --------------------------------------------------------------------------

_DS_CHANNEL_SHARE = """
SELECT o_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                     THEN CAST(o_totalprice AS DECIMAL(38,2))
                     ELSE CAST(0 AS DECIMAL(38,2)) END) AS DOUBLE) AS urgent_spend
FROM orders
GROUP BY o_custkey
HAVING SUM(CASE WHEN o_orderpriority = '1-URGENT'
                THEN CAST(o_totalprice AS DECIMAL(38,2))
                ELSE CAST(0 AS DECIMAL(38,2)) END) * 2
       > SUM(CAST(o_totalprice AS DECIMAL(38,2)))
"""


@register("ds_channel_share", _DS_CHANNEL_SHARE, tags=("tpcds", "agg"))
def ds_channel_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(_DS_CHANNEL_SHARE)
