"""Deep TPC-DS-shape coverage, round two.

The reference's TPC-DS gate runs 103 queries with golden answers
(flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/query/, comparator
utils/TpcdsResultComparator.java:53). ``tpcds_shapes.py`` covered the
first band of distinctive shapes; this module ports the remaining
archetypes the 103-query suite stresses that the first band only
sampled — deep multi-CTE chains referenced several times (q4/q11),
EXCEPT chains and multi-column INTERSECT counts (q87/q38), grouping-
level window ranks (q36/q86), cumulative-series crossovers via FULL
OUTER JOIN (q51), moving-average deviation windows (q47/q57),
scalar-subquery report rows (q88), three-channel union re-aggregation
(q33/q56/q60), exact variance filters (q17), and OR-of-EXISTS
decorrelation (q10/q35) — all re-expressed on the driver's TPC-H-ish
star schema and DuckDB-oracle-gated with the repo's determinism rules
(DECIMAL grid for money, cross-multiplied ratio comparisons, BIGINT
count casts).

Orders span 1995-01..2001-08 in the driver fixture; the year-pair
queries use 1996/1997 (both complete years at every SF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_release_1_16_0_spark.queries import register
from flink_release_1_16_0_spark.queries.tpcds_shapes import _views

# --------------------------------------------------------------------------
# q4/q11: one CTE referenced four times — per-customer per-year totals on
# two "channels" (orders = store, lineitem revenue = web), keep customers
# whose web growth ratio beats their store growth ratio. The ratio
# comparison is cross-multiplied into DECIMAL-exact products.
# --------------------------------------------------------------------------

_DS_YEAR_TOTAL_RATIO = """
WITH year_total AS (
  SELECT o_custkey AS custkey, EXTRACT(YEAR FROM o_orderdate) AS yr,
         'store' AS channel,
         SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS total
  FROM orders
  GROUP BY o_custkey, EXTRACT(YEAR FROM o_orderdate)
  UNION ALL
  SELECT o.o_custkey, EXTRACT(YEAR FROM o.o_orderdate),
         'web',
         SUM(CAST(l.l_extendedprice AS DECIMAL(38,2)))
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_custkey, EXTRACT(YEAR FROM o.o_orderdate)
)
SELECT s1.custkey,
       CAST(s1.total AS DOUBLE) AS store_prev,
       CAST(s2.total AS DOUBLE) AS store_cur,
       CAST(w1.total AS DOUBLE) AS web_prev,
       CAST(w2.total AS DOUBLE) AS web_cur
FROM year_total s1
JOIN year_total s2 ON s2.custkey = s1.custkey AND s2.channel = 'store' AND s2.yr = 1997
JOIN year_total w1 ON w1.custkey = s1.custkey AND w1.channel = 'web'   AND w1.yr = 1996
JOIN year_total w2 ON w2.custkey = s1.custkey AND w2.channel = 'web'   AND w2.yr = 1997
WHERE s1.channel = 'store' AND s1.yr = 1996
  AND w2.total * s1.total > s2.total * w1.total
"""


@register("ds_year_total_ratio", _DS_YEAR_TOTAL_RATIO, tags=("tpcds", "cte", "join"))
def ds_year_total_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_DS_YEAR_TOTAL_RATIO)


# --------------------------------------------------------------------------
# q87: chained EXCEPT of three channel key-sets, counted.
# --------------------------------------------------------------------------

_DS_EXCEPT_CHAIN = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_remaining FROM (
  SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
  EXCEPT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
  EXCEPT
  SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
) t
"""


@register("ds_except_chain_count", _DS_EXCEPT_CHAIN, tags=("tpcds", "setop"))
def ds_except_chain_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(_DS_EXCEPT_CHAIN)


# --------------------------------------------------------------------------
# q38: multi-column INTERSECT (customer, year) across two channels,
# wrapped in a count.
# --------------------------------------------------------------------------

_DS_INTERSECT_MULTICOL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_hot FROM (
  SELECT DISTINCT o_custkey AS k, EXTRACT(YEAR FROM o_orderdate) AS yr
  FROM orders WHERE o_orderstatus = 'F'
  INTERSECT
  SELECT DISTINCT o_custkey, EXTRACT(YEAR FROM o_orderdate)
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
) t
"""


@register("ds_intersect_multicol_count", _DS_INTERSECT_MULTICOL, tags=("tpcds", "setop"))
def ds_intersect_multicol_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(_DS_INTERSECT_MULTICOL)


# --------------------------------------------------------------------------
# q36/q86: ROLLUP with a window rank PARTITIONED BY the grouping level
# (GROUPING() arithmetic inside the window's partition key) — the
# "lochierarchy" pattern. The rank order carries a tiebreaker so it is
# total.
# --------------------------------------------------------------------------

_DS_LOCHIERARCHY_RANK = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) + GROUPING(o_orderpriority) AS BIGINT) AS lvl,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS revenue,
       RANK() OVER (
         PARTITION BY GROUPING(o_orderstatus) + GROUPING(o_orderpriority),
                      CASE WHEN GROUPING(o_orderpriority) = 1
                           THEN o_orderstatus END
         ORDER BY SUM(CAST(o_totalprice AS DECIMAL(38,2))) DESC,
                  COALESCE(o_orderpriority, ''), COALESCE(o_orderstatus, '')
       ) AS rnk
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


@register("ds_lochierarchy_rank", _DS_LOCHIERARCHY_RANK, tags=("tpcds", "rollup", "window"))
def ds_lochierarchy_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(_DS_LOCHIERARCHY_RANK)


# --------------------------------------------------------------------------
# q51: two cumulative monthly series FULL OUTER JOINed on (key, month),
# kept where one channel's running total has overtaken the other's.
# --------------------------------------------------------------------------

_DS_CUMULATIVE_CROSSOVER = """
WITH s AS (
  SELECT o_orderpriority AS k,
         substring(CAST(date_trunc('month', o_orderdate) AS VARCHAR(19)), 1, 7) AS mon,
         SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS amt
  FROM orders WHERE o_orderstatus = 'F'
  GROUP BY o_orderpriority, date_trunc('month', o_orderdate)
), w AS (
  SELECT o_orderpriority AS k,
         substring(CAST(date_trunc('month', o_orderdate) AS VARCHAR(19)), 1, 7) AS mon,
         SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS amt
  FROM orders WHERE o_orderstatus = 'O'
  GROUP BY o_orderpriority, date_trunc('month', o_orderdate)
), scum AS (
  SELECT k, mon, SUM(amt) OVER (PARTITION BY k ORDER BY mon) AS cum FROM s
), wcum AS (
  SELECT k, mon, SUM(amt) OVER (PARTITION BY k ORDER BY mon) AS cum FROM w
)
SELECT COALESCE(scum.k, wcum.k) AS k,
       COALESCE(scum.mon, wcum.mon) AS mon,
       CAST(scum.cum AS DOUBLE) AS store_cum,
       CAST(wcum.cum AS DOUBLE) AS web_cum
FROM scum FULL OUTER JOIN wcum ON wcum.k = scum.k AND wcum.mon = scum.mon
WHERE wcum.cum > scum.cum
"""


@register("ds_cumulative_crossover", _DS_CUMULATIVE_CROSSOVER, tags=("tpcds", "window", "join"))
def ds_cumulative_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(_DS_CUMULATIVE_CROSSOVER)


# --------------------------------------------------------------------------
# q47/q57: monthly series vs the partition average — keep months whose
# deviation from the yearly mean exceeds 10%, with LAG/LEAD context. The
# deviation test |v*n - total| * 10 > total is the cross-multiplied form
# of |v - avg| / avg > 0.1, all DECIMAL-exact.
# --------------------------------------------------------------------------

_DS_MOVING_AVG_DEVIATION = """
WITH m AS (
  SELECT o_orderpriority AS k, EXTRACT(YEAR FROM o_orderdate) AS yr,
         substring(CAST(date_trunc('month', o_orderdate) AS VARCHAR(19)), 1, 7) AS mon,
         SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS v
  FROM orders
  GROUP BY o_orderpriority, EXTRACT(YEAR FROM o_orderdate),
           date_trunc('month', o_orderdate)
), ext AS (
  SELECT k, yr, mon, v,
         SUM(v)   OVER (PARTITION BY k, yr) AS yr_total,
         COUNT(*) OVER (PARTITION BY k, yr) AS yr_months,
         LAG(v)  OVER (PARTITION BY k ORDER BY mon) AS prev_v,
         LEAD(v) OVER (PARTITION BY k ORDER BY mon) AS next_v
  FROM m
)
SELECT k, mon, CAST(v AS DOUBLE) AS v,
       CAST(prev_v AS DOUBLE) AS prev_v, CAST(next_v AS DOUBLE) AS next_v
FROM ext
WHERE ABS(v * yr_months - yr_total) * 10 > yr_total
"""


@register("ds_moving_avg_deviation", _DS_MOVING_AVG_DEVIATION, tags=("tpcds", "window"))
def ds_moving_avg_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(_DS_MOVING_AVG_DEVIATION)


# --------------------------------------------------------------------------
# q34/q73: basket-size HAVING band, joined back to the customer name.
# --------------------------------------------------------------------------

_DS_BASKET_JOINBACK = """
WITH baskets AS (
  SELECT o.o_orderkey, o.o_custkey, COUNT(*) AS n_lines
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_custkey
  HAVING COUNT(*) BETWEEN 6 AND 7
)
SELECT c.c_name, b.o_orderkey, CAST(b.n_lines AS BIGINT) AS n_lines
FROM baskets b JOIN customer c ON c.c_custkey = b.o_custkey
"""


@register("ds_basket_size_joinback", _DS_BASKET_JOINBACK, tags=("tpcds", "agg", "join"))
def ds_basket_size_joinback(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "lineitem", "customer")
    return spark.sql(_DS_BASKET_JOINBACK)


# --------------------------------------------------------------------------
# q58: channel parity — keys whose two channel revenues are within 10%
# of each other, both directions cross-multiplied.
# --------------------------------------------------------------------------

_DS_CHANNEL_PARITY = """
WITH f AS (
  SELECT o_orderpriority AS k, SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS rev
  FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority
), o AS (
  SELECT o_orderpriority AS k, SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS rev
  FROM orders WHERE o_orderstatus = 'O' GROUP BY o_orderpriority
)
SELECT f.k, CAST(f.rev AS DOUBLE) AS f_rev, CAST(o.rev AS DOUBLE) AS o_rev
FROM f JOIN o ON o.k = f.k
WHERE f.rev * 10 <= o.rev * 11
  AND o.rev * 10 <= f.rev * 11
"""


@register("ds_channel_parity", _DS_CHANNEL_PARITY, tags=("tpcds", "join", "agg"))
def ds_channel_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(_DS_CHANNEL_PARITY)


# --------------------------------------------------------------------------
# q93: net revenue after returns — per-line CASE on the return flag with
# exact DECIMAL discount arithmetic, rolled up per customer.
# --------------------------------------------------------------------------

_DS_NET_AFTER_RETURNS = """
SELECT o.o_custkey,
       CAST(SUM(CASE WHEN l.l_returnflag = 'R'
                     THEN CAST(0 AS DECIMAL(38,4))
                     ELSE CAST(l.l_extendedprice AS DECIMAL(19,2))
                          * (CAST(1 AS DECIMAL(19,2)) - CAST(l.l_discount AS DECIMAL(19,2)))
                END) AS DOUBLE) AS net_revenue,
       CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_custkey
HAVING SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) > 3
"""


@register("ds_net_after_returns", _DS_NET_AFTER_RETURNS, tags=("tpcds", "agg"))
def ds_net_after_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_DS_NET_AFTER_RETURNS)


# --------------------------------------------------------------------------
# q88: eight independent scalar-subquery counts as ONE report row
# (time-band census over the event stream).
# --------------------------------------------------------------------------

_DS_MULTI_COUNT_ROW = """
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM events WHERE EXTRACT(HOUR FROM ts) < 3)  AS h0,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM events WHERE EXTRACT(HOUR FROM ts) BETWEEN 3 AND 5)   AS h3,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM events WHERE EXTRACT(HOUR FROM ts) BETWEEN 6 AND 8)   AS h6,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM events WHERE EXTRACT(HOUR FROM ts) BETWEEN 9 AND 11)  AS h9,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM events WHERE EXTRACT(HOUR FROM ts) BETWEEN 12 AND 14) AS h12,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM events WHERE EXTRACT(HOUR FROM ts) BETWEEN 15 AND 17) AS h15,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM events WHERE EXTRACT(HOUR FROM ts) BETWEEN 18 AND 20) AS h18,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM events WHERE EXTRACT(HOUR FROM ts) > 20) AS h21
"""


@register("ds_multi_count_row", _DS_MULTI_COUNT_ROW, tags=("tpcds", "subquery"))
def ds_multi_count_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "events")
    return spark.sql(_DS_MULTI_COUNT_ROW)


# --------------------------------------------------------------------------
# q33/q56/q60: three channel CTEs with different predicates, UNION ALL,
# re-aggregated per nation.
# --------------------------------------------------------------------------

_DS_THREE_CHANNEL_UNION = """
WITH ch1 AS (
  SELECT c.c_nationkey AS nk, SUM(CAST(o.o_totalprice AS DECIMAL(38,2))) AS rev
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE o.o_orderpriority = '1-URGENT' GROUP BY c.c_nationkey
), ch2 AS (
  SELECT c.c_nationkey, SUM(CAST(o.o_totalprice AS DECIMAL(38,2)))
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE o.o_orderstatus = 'F' GROUP BY c.c_nationkey
), ch3 AS (
  SELECT c.c_nationkey, SUM(CAST(o.o_totalprice AS DECIMAL(38,2)))
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE EXTRACT(YEAR FROM o.o_orderdate) = 1997 GROUP BY c.c_nationkey
)
SELECT n.n_name, CAST(SUM(u.rev) AS DOUBLE) AS total_rev
FROM (SELECT * FROM ch1 UNION ALL SELECT * FROM ch2 UNION ALL SELECT * FROM ch3) u
JOIN nation n ON n.n_nationkey = u.nk
GROUP BY n.n_name
"""


@register("ds_three_channel_union_sum", _DS_THREE_CHANNEL_UNION, tags=("tpcds", "setop", "agg"))
def ds_three_channel_union_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "customer", "nation")
    return spark.sql(_DS_THREE_CHANNEL_UNION)


# --------------------------------------------------------------------------
# q17: coefficient-of-variation filter in exact integer-scaled form —
# n*Σx² - (Σx)² is the (n²-scaled) variance, compared cross-multiplied
# against the mean so no float ever decides a row.
# --------------------------------------------------------------------------

_DS_QUANTITY_VARIANCE = """
SELECT p.p_brand,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sum_qty,
       CAST(COUNT(*) * SUM(CAST(l.l_quantity AS DECIMAL(18,2)) * CAST(l.l_quantity AS DECIMAL(18,2)))
            - SUM(CAST(l.l_quantity AS DECIMAL(18,2))) * SUM(CAST(l.l_quantity AS DECIMAL(18,2)))
            AS DOUBLE) AS var_scaled
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY p.p_brand
HAVING COUNT(*) * SUM(CAST(l.l_quantity AS DECIMAL(18,2)) * CAST(l.l_quantity AS DECIMAL(18,2)))
       - SUM(CAST(l.l_quantity AS DECIMAL(18,2))) * SUM(CAST(l.l_quantity AS DECIMAL(18,2)))
       > SUM(CAST(l.l_quantity AS DECIMAL(18,2))) * SUM(CAST(l.l_quantity AS DECIMAL(18,2))) / 4
"""


@register("ds_quantity_variance", _DS_QUANTITY_VARIANCE, tags=("tpcds", "agg"))
def ds_quantity_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_DS_QUANTITY_VARIANCE)


# --------------------------------------------------------------------------
# q78: LEFT JOIN ... IS NULL anti shape (distinct from NOT EXISTS):
# orders with no returned line, counted per year.
# --------------------------------------------------------------------------

_DS_UNRETURNED_SHARE = """
SELECT EXTRACT(YEAR FROM o.o_orderdate) AS yr,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN r.l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
FROM orders o
LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R') r
  ON r.l_orderkey = o.o_orderkey
GROUP BY EXTRACT(YEAR FROM o.o_orderdate)
"""


@register("ds_unreturned_share", _DS_UNRETURNED_SHARE, tags=("tpcds", "join", "agg"))
def ds_unreturned_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_DS_UNRETURNED_SHARE)


# --------------------------------------------------------------------------
# q8/q14: IN over a nested aggregate whose HAVING carries its own scalar
# subquery (customers ordering more often than twice the global mean,
# cross-multiplied).
# --------------------------------------------------------------------------

_DS_IN_NESTED_AGG = """
SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_heavy
FROM customer c
WHERE c.c_custkey IN (
  SELECT o_custkey FROM orders
  GROUP BY o_custkey
  HAVING COUNT(*) * (SELECT COUNT(DISTINCT o_custkey) FROM orders)
         > 2 * (SELECT COUNT(*) FROM orders)
)
GROUP BY c.c_mktsegment
"""


@register("ds_in_nested_agg", _DS_IN_NESTED_AGG, tags=("tpcds", "subquery", "agg"))
def ds_in_nested_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_DS_IN_NESTED_AGG)


# --------------------------------------------------------------------------
# q10/q35: OR of two correlated EXISTS (decorrelation under
# disjunction), grouped census over the qualifying customers.
# --------------------------------------------------------------------------

_DS_EXISTS_DISJUNCTION = """
SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_active
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
   OR EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderstatus = 'P')
GROUP BY c.c_mktsegment
"""


@register("ds_exists_disjunction", _DS_EXISTS_DISJUNCTION, tags=("tpcds", "subquery"))
def ds_exists_disjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_DS_EXISTS_DISJUNCTION)


# --------------------------------------------------------------------------
# q61: promotional-share report row — two aggregates of the same fact
# table at different filters, emitted side by side in one row.
# --------------------------------------------------------------------------

_DS_PROMO_SHARE = """
SELECT
  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE)
   FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS promo_rev,
  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE)
   FROM orders) AS total_rev
"""


@register("ds_promo_share", _DS_PROMO_SHARE, tags=("tpcds", "subquery"))
def ds_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(_DS_PROMO_SHARE)


# --------------------------------------------------------------------------
# q31: share-growth comparison across consecutive quarters on two
# levels (nation vs region), joined on the period seam — keeps nations
# whose Q-over-Q growth beats their region's, cross-multiplied.
# --------------------------------------------------------------------------

_DS_SHARE_GROWTH = """
WITH nat AS (
  SELECT c.c_nationkey AS nk, EXTRACT(QUARTER FROM o.o_orderdate) AS q,
         SUM(CAST(o.o_totalprice AS DECIMAL(38,2))) AS rev
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE EXTRACT(YEAR FROM o.o_orderdate) = 1997
  GROUP BY c.c_nationkey, EXTRACT(QUARTER FROM o.o_orderdate)
), reg AS (
  SELECT n.n_regionkey AS rk, EXTRACT(QUARTER FROM o.o_orderdate) AS q,
         SUM(CAST(o.o_totalprice AS DECIMAL(38,2))) AS rev
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  WHERE EXTRACT(YEAR FROM o.o_orderdate) = 1997
  GROUP BY n.n_regionkey, EXTRACT(QUARTER FROM o.o_orderdate)
)
SELECT nn.n_name,
       CAST(n1.rev AS DOUBLE) AS nat_q1, CAST(n2.rev AS DOUBLE) AS nat_q2,
       CAST(r1.rev AS DOUBLE) AS reg_q1, CAST(r2.rev AS DOUBLE) AS reg_q2
FROM nat n1
JOIN nat n2 ON n2.nk = n1.nk AND n1.q = 1 AND n2.q = 2
JOIN nation nn ON nn.n_nationkey = n1.nk
JOIN reg r1 ON r1.rk = nn.n_regionkey AND r1.q = 1
JOIN reg r2 ON r2.rk = nn.n_regionkey AND r2.q = 2
WHERE n2.rev * r1.rev > r2.rev * n1.rev
"""


@register("ds_share_growth", _DS_SHARE_GROWTH, tags=("tpcds", "cte", "join"))
def ds_share_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "customer", "nation")
    return spark.sql(_DS_SHARE_GROWTH)
