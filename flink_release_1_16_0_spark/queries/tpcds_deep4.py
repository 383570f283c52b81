"""Deep TPC-DS-shape coverage, round five — the named archetype tail.

Round-11's verdict (VERDICT.md next-round item 5) named the remaining
un-archetyped shapes of the reference's 103-query TPC-DS gate
(flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/query/): q88's
multi-band count pivot (eight self-filtered count cells in one row),
q14's cross-channel INTERSECT feeding the sales scan, q31's
quarter-over-quarter share-growth chain compared across channels,
q66's per-mode monthly bucket pivot, and the q11/q74 customer
year-pair ratio with the NULLIF zero-denominator guard. This module
adds those plus the q9/q38/q62/q99/q33/q41/q45/q74 families around
them, re-expressed on the driver's TPC-H-ish star schema under the
repo's cross-engine determinism rules: money in DECIMAL(38,2) cents,
ratio comparisons CROSS-MULTIPLIED in integers with explicit
zero-denominator guards (the NULLIF semantics), counts CAST to BIGINT,
calendar arithmetic on EXTRACT integer math, unique tiebreakers before
every LIMIT. Channels are orderkey/suppkey residue classes (one fact
table in the fixture; the residue split preserves the join/agg SHAPE).

Orders span 1995-01..2001-08; year-pair queries use 1996/1997.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_release_1_16_0_spark.queries import register
from flink_release_1_16_0_spark.queries.tpcds_shapes import _views

_CENTS = "CAST(CAST(l_extendedprice AS DECIMAL(38,2)) * 100 AS BIGINT)"
_OCENTS = "CAST(CAST(o_totalprice AS DECIMAL(38,2)) * 100 AS BIGINT)"


# --------------------------------------------------------------------------
# q88: the multi-band count pivot — eight independently-filtered count
# cells assembled into ONE row (the reference cross-joins eight scalar
# aggregates; scalar subqueries are the same plan shape and both
# engines produce the single-row pivot).
# --------------------------------------------------------------------------

_DS_HOUR_BAND_COUNT_PIVOT = """
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
    WHERE l_quantity BETWEEN 1 AND 6 AND l_linestatus = 'O') AS b1,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
    WHERE l_quantity BETWEEN 7 AND 12 AND l_linestatus = 'O') AS b2,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
    WHERE l_quantity BETWEEN 13 AND 18 AND l_linestatus = 'O') AS b3,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
    WHERE l_quantity BETWEEN 19 AND 24 AND l_linestatus = 'O') AS b4,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
    WHERE l_quantity BETWEEN 25 AND 30 AND l_linestatus = 'O') AS b5,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
    WHERE l_quantity BETWEEN 31 AND 36 AND l_linestatus = 'O') AS b6,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
    WHERE l_quantity BETWEEN 37 AND 42 AND l_linestatus = 'O') AS b7,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
    WHERE l_quantity BETWEEN 43 AND 50 AND l_linestatus = 'O') AS b8
"""


@register(
    "ds_hour_band_count_pivot",
    _DS_HOUR_BAND_COUNT_PIVOT,
    tags=("tpcds", "pivot", "subquery"),
)
def ds_hour_band_count_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_DS_HOUR_BAND_COUNT_PIVOT)


# --------------------------------------------------------------------------
# q14: the cross-channel INTERSECT — items sold through ALL THREE
# channels feed the per-channel sales aggregate (the reference builds
# cross_items via a 3-way INTERSECT and semi-joins the fact scan).
# --------------------------------------------------------------------------

_DS_CROSS_CHANNEL_INTERSECT_SALES = f"""
WITH cross_items AS (
  SELECT l_partkey FROM lineitem WHERE l_suppkey % 3 = 0
  INTERSECT
  SELECT l_partkey FROM lineitem WHERE l_suppkey % 3 = 1
  INTERSECT
  SELECT l_partkey FROM lineitem WHERE l_suppkey % 3 = 2
)
SELECT CAST(l_suppkey % 3 AS BIGINT) AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_sales,
       CAST(SUM({_CENTS}) AS BIGINT) AS cents
FROM lineitem
WHERE l_partkey IN (SELECT l_partkey FROM cross_items)
GROUP BY l_suppkey % 3
ORDER BY channel
"""


@register(
    "ds_cross_channel_intersect_sales",
    _DS_CROSS_CHANNEL_INTERSECT_SALES,
    tags=("tpcds", "setop", "semijoin"),
)
def ds_cross_channel_intersect_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_DS_CROSS_CHANNEL_INTERSECT_SALES)


# --------------------------------------------------------------------------
# q31: the share-growth chain — per nation, Q1->Q2 1996 sales in two
# channels; keep nations where the web channel grew FASTER than the
# store channel. Growth ratios compare cross-multiplied with positive
# Q1 guards (the reference divides; zero denominators fall out of its
# > comparison exactly like these guards).
# --------------------------------------------------------------------------

_DS_REGION_SHARE_GROWTH_CHAIN = f"""
WITH sales AS (
  SELECT c.c_nationkey AS nk,
         EXTRACT(QUARTER FROM o.o_orderdate) AS q,
         o.o_orderkey % 2 AS ch,
         CAST(SUM({_OCENTS}) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE EXTRACT(YEAR FROM o.o_orderdate) = 1996
    AND EXTRACT(QUARTER FROM o.o_orderdate) IN (1, 2)
  GROUP BY c.c_nationkey, EXTRACT(QUARTER FROM o.o_orderdate),
           o.o_orderkey % 2
)
SELECT ss1.nk,
       ss1.cents AS store_q1, ss2.cents AS store_q2,
       ws1.cents AS web_q1, ws2.cents AS web_q2
FROM sales ss1
JOIN sales ss2 ON ss2.nk = ss1.nk AND ss2.q = 2 AND ss2.ch = 0
JOIN sales ws1 ON ws1.nk = ss1.nk AND ws1.q = 1 AND ws1.ch = 1
JOIN sales ws2 ON ws2.nk = ss1.nk AND ws2.q = 2 AND ws2.ch = 1
WHERE ss1.q = 1 AND ss1.ch = 0
  AND ss1.cents > 0 AND ws1.cents > 0
  AND CAST(ws2.cents AS DECIMAL(38,0)) * ss1.cents
      > CAST(ss2.cents AS DECIMAL(38,0)) * ws1.cents
ORDER BY ss1.nk
"""


@register(
    "ds_region_share_growth_chain",
    _DS_REGION_SHARE_GROWTH_CHAIN,
    tags=("tpcds", "cte", "join", "ratio"),
)
def ds_region_share_growth_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(_DS_REGION_SHARE_GROWTH_CHAIN)


# --------------------------------------------------------------------------
# q66: the per-mode monthly bucket pivot — 6 months x 2 "ship modes"
# (returnflag classes) of 1996 shipping, one SUM(CASE) cell per bucket
# per supplier nation (the reference pivots 12 months x 2 carriers per
# warehouse).
# --------------------------------------------------------------------------


def _m_cell(month: int, flag: str, alias: str) -> str:
    return (
        f"CAST(SUM(CASE WHEN EXTRACT(MONTH FROM l.l_shipdate) = {month} "
        f"AND l.l_returnflag = '{flag}' THEN {_CENTS.replace('l_extendedprice', 'l.l_extendedprice')} "
        f"ELSE 0 END) AS BIGINT) AS {alias}"
    )


_DS_SHIPMODE_MONTHLY_PIVOT = f"""
SELECT s.s_nationkey AS nk,
  {", ".join(_m_cell(m, "N", f"n_m{m}") for m in range(1, 7))},
  {", ".join(_m_cell(m, "R", f"r_m{m}") for m in range(1, 7))}
FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE EXTRACT(YEAR FROM l.l_shipdate) = 1996
GROUP BY s.s_nationkey
ORDER BY nk
"""


@register(
    "ds_shipmode_monthly_pivot",
    _DS_SHIPMODE_MONTHLY_PIVOT,
    tags=("tpcds", "pivot", "calendar"),
)
def ds_shipmode_monthly_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(_DS_SHIPMODE_MONTHLY_PIVOT)


# --------------------------------------------------------------------------
# q11/q74: the customer year-pair ratio with the NULLIF guard —
# customers whose web-channel 1996->1997 growth beats their
# store-channel growth. The reference's CASE WHEN total > 0 THEN
# ratio ELSE NULL END makes a zero first-year total an automatic
# exclusion; the cross-multiplied form carries the same guards.
# --------------------------------------------------------------------------

_DS_YEAR_PAIR_RATIO_NULLIF = f"""
WITH yt AS (
  SELECT o_custkey AS ck,
         EXTRACT(YEAR FROM o_orderdate) AS yr,
         o_orderkey % 2 AS ch,
         CAST(SUM({_OCENTS}) AS BIGINT) AS total
  FROM orders
  WHERE EXTRACT(YEAR FROM o_orderdate) IN (1996, 1997)
  GROUP BY o_custkey, EXTRACT(YEAR FROM o_orderdate), o_orderkey % 2
)
SELECT s96.ck,
       s96.total AS store96, s97.total AS store97,
       w96.total AS web96, w97.total AS web97
FROM yt s96
JOIN yt s97 ON s97.ck = s96.ck AND s97.yr = 1997 AND s97.ch = 0
JOIN yt w96 ON w96.ck = s96.ck AND w96.yr = 1996 AND w96.ch = 1
JOIN yt w97 ON w97.ck = s96.ck AND w97.yr = 1997 AND w97.ch = 1
WHERE s96.yr = 1996 AND s96.ch = 0
  AND s96.total > 0 AND w96.total > 0
  AND w97.total * s96.total > s97.total * w96.total
ORDER BY s96.ck
"""


@register(
    "ds_year_pair_ratio_nullif",
    _DS_YEAR_PAIR_RATIO_NULLIF,
    tags=("tpcds", "cte", "join", "ratio"),
)
def ds_year_pair_ratio_nullif(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(_DS_YEAR_PAIR_RATIO_NULLIF)


# --------------------------------------------------------------------------
# q74: the same year-pair chain on a DIFFERENT aggregate (the reference
# uses MAX-based year totals where q11 uses SUM) — pins that the chain
# shape holds for non-additive aggregates too.
# --------------------------------------------------------------------------

_DS_YEAR_PAIR_MAX_RATIO = f"""
WITH yt AS (
  SELECT o_custkey AS ck,
         EXTRACT(YEAR FROM o_orderdate) AS yr,
         o_orderkey % 2 AS ch,
         CAST(MAX({_OCENTS}) AS BIGINT) AS total
  FROM orders
  WHERE EXTRACT(YEAR FROM o_orderdate) IN (1996, 1997)
  GROUP BY o_custkey, EXTRACT(YEAR FROM o_orderdate), o_orderkey % 2
)
SELECT s96.ck,
       s96.total AS store96, s97.total AS store97,
       w96.total AS web96, w97.total AS web97
FROM yt s96
JOIN yt s97 ON s97.ck = s96.ck AND s97.yr = 1997 AND s97.ch = 0
JOIN yt w96 ON w96.ck = s96.ck AND w96.yr = 1996 AND w96.ch = 1
JOIN yt w97 ON w97.ck = s96.ck AND w97.yr = 1997 AND w97.ch = 1
WHERE s96.yr = 1996 AND s96.ch = 0
  AND s96.total > 0 AND w96.total > 0
  AND w97.total * s96.total > s97.total * w96.total
ORDER BY s96.ck
"""


@register(
    "ds_year_pair_max_ratio",
    _DS_YEAR_PAIR_MAX_RATIO,
    tags=("tpcds", "cte", "join", "ratio"),
)
def ds_year_pair_max_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(_DS_YEAR_PAIR_MAX_RATIO)


# --------------------------------------------------------------------------
# q9: bucketed CASE over scalar subqueries — each bucket cell CHOOSES
# between two scalar aggregates based on a third count (the reference's
# CASE WHEN count > threshold THEN avg1 ELSE avg2; sums stay exact).
# --------------------------------------------------------------------------


def _bucket_cell(lo: int, hi: int, alias: str) -> str:
    return f"""
  CASE WHEN (SELECT COUNT(*) FROM lineitem
             WHERE l_quantity BETWEEN {lo} AND {hi}) > 400
       THEN (SELECT CAST(SUM({_CENTS}) AS BIGINT) FROM lineitem
             WHERE l_quantity BETWEEN {lo} AND {hi} AND l_returnflag = 'N')
       ELSE (SELECT CAST(SUM({_CENTS}) AS BIGINT) FROM lineitem
             WHERE l_quantity BETWEEN {lo} AND {hi} AND l_returnflag = 'R')
  END AS {alias}"""


_DS_BUCKET_CASE_SCALARS = f"""
SELECT
  {",".join(_bucket_cell(1 + 10 * i, 10 + 10 * i, f"bucket{i + 1}") for i in range(5))}
"""


@register(
    "ds_bucket_case_scalars",
    _DS_BUCKET_CASE_SCALARS,
    tags=("tpcds", "subquery", "pivot"),
)
def ds_bucket_case_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_DS_BUCKET_CASE_SCALARS)


# --------------------------------------------------------------------------
# q38: count of identities present in ALL THREE channels (INTERSECT of
# customer keys, then one count).
# --------------------------------------------------------------------------

_DS_CUSTOMER_THREE_CHANNEL_INTERSECT = """
SELECT CAST(COUNT(*) AS BIGINT) AS hot_customers FROM (
  SELECT o_custkey FROM orders WHERE o_orderkey % 3 = 0
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderkey % 3 = 1
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderkey % 3 = 2
) t
"""


@register(
    "ds_customer_three_channel_intersect",
    _DS_CUSTOMER_THREE_CHANNEL_INTERSECT,
    tags=("tpcds", "setop"),
)
def ds_customer_three_channel_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(_DS_CUSTOMER_THREE_CHANNEL_INTERSECT)


# --------------------------------------------------------------------------
# q62: shipping-delay buckets per "mode" (returnflag class) — the delay
# is month-granular EXTRACT integer math (no engine-specific date
# subtraction), bucketed into <=1, 2, 3, 4+ months.
# --------------------------------------------------------------------------

_DELAY = (
    "(EXTRACT(YEAR FROM l.l_shipdate) * 12 + EXTRACT(MONTH FROM l.l_shipdate))"
    " - (EXTRACT(YEAR FROM o.o_orderdate) * 12 + EXTRACT(MONTH FROM o.o_orderdate))"
)

_DS_MODE_DELAY_BUCKETS = f"""
SELECT l.l_returnflag AS mode,
  CAST(SUM(CASE WHEN {_DELAY} <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS m1,
  CAST(SUM(CASE WHEN {_DELAY} = 2 THEN 1 ELSE 0 END) AS BIGINT) AS m2,
  CAST(SUM(CASE WHEN {_DELAY} = 3 THEN 1 ELSE 0 END) AS BIGINT) AS m3,
  CAST(SUM(CASE WHEN {_DELAY} >= 4 THEN 1 ELSE 0 END) AS BIGINT) AS m4plus
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY l.l_returnflag
ORDER BY mode
"""


@register(
    "ds_mode_delay_buckets",
    _DS_MODE_DELAY_BUCKETS,
    tags=("tpcds", "agg", "calendar"),
)
def ds_mode_delay_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "orders")
    return spark.sql(_DS_MODE_DELAY_BUCKETS)


# --------------------------------------------------------------------------
# q99: the same delay buckets keyed by ORDER month (1996) — the
# calendar-dimension variant of q62.
# --------------------------------------------------------------------------

_DS_MONTH_DELAY_BUCKETS = f"""
SELECT CAST(EXTRACT(MONTH FROM o.o_orderdate) AS BIGINT) AS order_month,
  CAST(SUM(CASE WHEN {_DELAY} <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS m1,
  CAST(SUM(CASE WHEN {_DELAY} = 2 THEN 1 ELSE 0 END) AS BIGINT) AS m2,
  CAST(SUM(CASE WHEN {_DELAY} = 3 THEN 1 ELSE 0 END) AS BIGINT) AS m3,
  CAST(SUM(CASE WHEN {_DELAY} >= 4 THEN 1 ELSE 0 END) AS BIGINT) AS m4plus
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE EXTRACT(YEAR FROM o.o_orderdate) = 1996
GROUP BY EXTRACT(MONTH FROM o.o_orderdate)
ORDER BY order_month
"""


@register(
    "ds_month_delay_buckets",
    _DS_MONTH_DELAY_BUCKETS,
    tags=("tpcds", "agg", "calendar"),
)
def ds_month_delay_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "orders")
    return spark.sql(_DS_MONTH_DELAY_BUCKETS)


# --------------------------------------------------------------------------
# q33: per-brand totals unioned across three channels then re-aggregated
# (the reference's UNION ALL of per-channel manufacturer aggregates).
# --------------------------------------------------------------------------

_DS_BRAND_CHANNEL_UNION_AGG = f"""
WITH per_channel AS (
  SELECT p.p_brand AS brand, CAST(SUM({_CENTS.replace('l_extendedprice', 'l.l_extendedprice')}) AS BIGINT) AS cents
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_suppkey % 3 = 0 GROUP BY p.p_brand
  UNION ALL
  SELECT p.p_brand, CAST(SUM({_CENTS.replace('l_extendedprice', 'l.l_extendedprice')}) AS BIGINT)
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_suppkey % 3 = 1 GROUP BY p.p_brand
  UNION ALL
  SELECT p.p_brand, CAST(SUM({_CENTS.replace('l_extendedprice', 'l.l_extendedprice')}) AS BIGINT)
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_suppkey % 3 = 2 GROUP BY p.p_brand
)
SELECT brand, CAST(SUM(cents) AS BIGINT) AS total_cents
FROM per_channel
GROUP BY brand
ORDER BY total_cents DESC, brand
LIMIT 50
"""


@register(
    "ds_brand_channel_union_agg",
    _DS_BRAND_CHANNEL_UNION_AGG,
    tags=("tpcds", "setop", "agg"),
)
def ds_brand_channel_union_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_DS_BRAND_CHANNEL_UNION_AGG)


# --------------------------------------------------------------------------
# q41: DISTINCT attribute projection under a nested OR attribute filter
# (the reference's deeply-nested manufacturer filter).
# --------------------------------------------------------------------------

_DS_DISTINCT_OR_ATTRIBUTE_PARTS = """
SELECT DISTINCT p_name
FROM part
WHERE p_size BETWEEN 2 AND 20
  AND ((p_type IN ('ECONOMY', 'STANDARD') AND p_retailprice < 910)
       OR (p_type IN ('LARGE', 'PROMO') AND p_retailprice >= 915)
       OR (p_type = 'SMALL' AND p_size <= 5))
ORDER BY p_name
LIMIT 100
"""


@register(
    "ds_distinct_or_attribute_parts",
    _DS_DISTINCT_OR_ATTRIBUTE_PARTS,
    tags=("tpcds", "filter"),
)
def ds_distinct_or_attribute_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "part")
    return spark.sql(_DS_DISTINCT_OR_ATTRIBUTE_PARTS)


# --------------------------------------------------------------------------
# q45/q15: geography OR membership-subquery disjunction — planned the
# way Calcite/Flink lower OR-EXISTS: a left join whose null-test is one
# arm of the disjunction (a literal IN-subquery inside OR is the one
# spot Spark's subquery rewriting rejects; the reference's planner does
# this same outer-join lowering).
# --------------------------------------------------------------------------

_DS_GEO_OR_MEMBERSHIP_SALES = f"""
WITH hot AS (
  SELECT c_custkey FROM customer WHERE c_acctbal > 9000
)
SELECT c.c_nationkey AS nk,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM({_OCENTS.replace('o_totalprice', 'o.o_totalprice')}) AS BIGINT) AS cents
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
LEFT JOIN hot h ON h.c_custkey = c.c_custkey
WHERE c.c_nationkey IN (1, 3, 5, 7) OR h.c_custkey IS NOT NULL
GROUP BY c.c_nationkey
ORDER BY nk
"""


@register(
    "ds_geo_or_membership_sales",
    _DS_GEO_OR_MEMBERSHIP_SALES,
    tags=("tpcds", "join", "subquery"),
)
def ds_geo_or_membership_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(_DS_GEO_OR_MEMBERSHIP_SALES)
