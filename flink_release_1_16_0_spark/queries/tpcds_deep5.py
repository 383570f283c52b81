"""Deep TPC-DS-shape coverage, round six — the named rollup/inventory
archetypes (VERDICT r12 item 7).

Adapted from the reference's TPC-DS gate
(flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/query/): q22's
4-level ROLLUP hierarchy average, q18's multi-measure demographic
ROLLUP, q67's giant rollup + per-category RANK, q21's
inventory-before/after ratio band, and q39's per-(warehouse,item,
month) coefficient-of-variation self-join across consecutive months —
re-expressed on the driver's TPC-H-ish star schema under the repo's
cross-engine determinism rules: averages are carried as exact
(sum-in-cents, count) pairs instead of dividing (the reference's AVG
outputs — division re-derivable downstream), ratio-band and
cov-threshold comparisons are CROSS-MULTIPLIED into exact integer
inequalities (stddev/mean > 1 <=> n*(n*Sxx - Sx^2) > (n-1)*Sx^2 on
integer quantities — no float STDDEV crosses the engine boundary),
and rank ties are real RANK ties (identical exact inputs rank
identically in both engines).

"Inventory" maps onto lineitem quantities: warehouse = the supplier's
nation, item = part, month = l_shipdate month.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_release_1_16_0_spark.queries import register
from flink_release_1_16_0_spark.queries.tpcds_shapes import _views

_CENTS = "CAST(CAST(l_extendedprice AS DECIMAL(38,2)) * 100 AS BIGINT)"
_QTY = "CAST(l_quantity AS BIGINT)"


# --------------------------------------------------------------------------
# q22: quantity-on-hand over a ROLLUP of the full product hierarchy
# (product_name, brand, class, category) -> (p_name omitted for fan-in:
# mfgr-brand-type), each level carrying the exact (sum, count) pair of
# the AVG the reference emits.
# --------------------------------------------------------------------------

_DS_QOH_ROLLUP_HIERARCHY = f"""
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(SUM({_QTY}) AS BIGINT) AS qty_sum,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
GROUP BY ROLLUP(p.p_brand, p.p_type, p.p_size)
"""


@register(
    "ds_qoh_rollup_hierarchy",
    _DS_QOH_ROLLUP_HIERARCHY,
    tags=("tpcds", "rollup"),
)
def ds_qoh_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_DS_QOH_ROLLUP_HIERARCHY)


# --------------------------------------------------------------------------
# q18: multi-measure averages over a ROLLUP of item x geography
# hierarchy with IN-list dimension filters (bill-demographics female/
# Unknown -> mktsegment filter; birth months -> order months).
# --------------------------------------------------------------------------

_DS_DEMOGRAPHIC_ROLLUP_AVGS = f"""
SELECT p.p_brand, n.n_name, c.c_mktsegment,
       CAST(SUM({_QTY}) AS BIGINT) AS qty_sum,
       CAST(SUM({_CENTS}) AS BIGINT) AS price_cents,
       CAST(SUM(CAST(CAST(c.c_acctbal AS DECIMAL(38,2)) * 100 AS BIGINT)) AS BIGINT)
         AS bal_cents,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN part p ON p.p_partkey = l.l_partkey
WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
  AND EXTRACT(MONTH FROM o.o_orderdate) IN (1, 2, 6, 8, 9, 12)
  AND EXTRACT(YEAR FROM o.o_orderdate) = 1997
  AND n.n_name IN ('NATION_1', 'NATION_3', 'NATION_5', 'NATION_8',
                   'NATION_13', 'NATION_21')
GROUP BY ROLLUP(p.p_brand, n.n_name, c.c_mktsegment)
"""


@register(
    "ds_demographic_rollup_avgs",
    _DS_DEMOGRAPHIC_ROLLUP_AVGS,
    tags=("tpcds", "rollup", "join"),
)
def ds_demographic_rollup_avgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "orders", "customer", "nation", "part")
    return spark.sql(_DS_DEMOGRAPHIC_ROLLUP_AVGS)


# --------------------------------------------------------------------------
# q67: the giant hierarchy x time ROLLUP feeding a per-category RANK
# over total sales — rank ties are exact-decimal ties, in-range rows
# selected by rk, not LIMIT.
# --------------------------------------------------------------------------

_DS_ROLLUP_RANK_TOP = f"""
WITH dw1 AS (
  SELECT p.p_brand, p.p_type,
         CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS yr,
         CAST(EXTRACT(MONTH FROM l.l_shipdate) AS BIGINT) AS moy,
         CAST(SUM({_CENTS}) AS BIGINT) AS sumsales
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
  GROUP BY ROLLUP(p.p_brand, p.p_type, EXTRACT(YEAR FROM l.l_shipdate),
                  EXTRACT(MONTH FROM l.l_shipdate))
)
SELECT * FROM (
  SELECT p_brand, p_type, yr, moy, sumsales,
         CAST(RANK() OVER (PARTITION BY p_brand ORDER BY sumsales DESC)
              AS BIGINT) AS rk
  FROM dw1
) dw2
WHERE rk <= 5
"""


@register(
    "ds_rollup_rank_top",
    _DS_ROLLUP_RANK_TOP,
    tags=("tpcds", "rollup", "window"),
)
def ds_rollup_rank_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_DS_ROLLUP_RANK_TOP)


# --------------------------------------------------------------------------
# q21: inventory before/after a pivot date per (warehouse, item) with
# the 2/3 <= after/before <= 3/2 ratio band CROSS-MULTIPLIED into
# exact integer inequalities (before > 0 is the reference's CASE
# guard).
# --------------------------------------------------------------------------

_DS_INVENTORY_RATIO_BAND = f"""
SELECT * FROM (
  SELECT n.n_name AS warehouse, p.p_brand AS item,
         CAST(SUM(CASE WHEN l.l_shipdate < DATE '1996-06-15'
                       THEN {_QTY} ELSE 0 END) AS BIGINT) AS inv_before,
         CAST(SUM(CASE WHEN l.l_shipdate >= DATE '1996-06-15'
                       THEN {_QTY} ELSE 0 END) AS BIGINT) AS inv_after
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_retailprice BETWEEN 900 AND 1200
    AND l.l_shipdate BETWEEN DATE '1996-05-16' AND DATE '1996-07-15'
  GROUP BY n.n_name, p.p_brand
) x
WHERE inv_before > 0
  AND 3 * inv_after >= 2 * inv_before
  AND 2 * inv_after <= 3 * inv_before
"""


@register(
    "ds_inventory_ratio_band",
    _DS_INVENTORY_RATIO_BAND,
    tags=("tpcds", "join", "pivot"),
)
def ds_inventory_ratio_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "supplier", "nation", "part")
    return spark.sql(_DS_INVENTORY_RATIO_BAND)


# --------------------------------------------------------------------------
# q39: per-(warehouse, item, month) demand variability — the
# stdev/mean threshold HAVING filter as an exact integer inequality:
# 2*stdev > mean <=> 4*n*(n*Sxx - Sx^2) > (n-1)*Sx^2 (sample variance
# cross-multiplied against mean^2; quantities are integers so every
# term is exact; the reference's cov > 1 never fires on the fixture's
# uniform quantity grid, so the threshold is halved to keep the
# flagged set non-vacuous) — then the month-m x month-m+1 self-join of
# flagged pairs.
# --------------------------------------------------------------------------

_DS_INVENTORY_COV_PAIR = f"""
WITH inv AS (
  SELECT s.s_nationkey AS wh,
         CAST(l.l_partkey % 50 AS BIGINT) AS item,
         CAST(EXTRACT(MONTH FROM l.l_shipdate) AS BIGINT) AS moy,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM({_QTY}) AS BIGINT) AS sx,
         CAST(SUM({_QTY} * {_QTY}) AS BIGINT) AS sxx
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE EXTRACT(MONTH FROM l.l_shipdate) IN (3, 4)
  GROUP BY s.s_nationkey, l.l_partkey % 50, EXTRACT(MONTH FROM l.l_shipdate)
  HAVING COUNT(*) > 1
     AND 4 * COUNT(*) * (COUNT(*) * SUM({_QTY} * {_QTY}) - SUM({_QTY}) * SUM({_QTY}))
         > (COUNT(*) - 1) * SUM({_QTY}) * SUM({_QTY})
)
SELECT i1.wh AS wh, i1.item AS item,
       i1.n AS n1, i1.sx AS sx1, i1.sxx AS sxx1,
       i2.n AS n2, i2.sx AS sx2, i2.sxx AS sxx2
FROM inv i1
JOIN inv i2 ON i1.item = i2.item AND i1.wh = i2.wh
WHERE i1.moy = 3 AND i2.moy = 4
"""


@register(
    "ds_inventory_cov_pair",
    _DS_INVENTORY_COV_PAIR,
    tags=("tpcds", "join", "agg"),
)
def ds_inventory_cov_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(_DS_INVENTORY_COV_PAIR)
