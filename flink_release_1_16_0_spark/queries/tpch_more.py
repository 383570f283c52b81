"""Further TPC-H-shape queries: subquery decorrelation coverage.

The reference's subquery_rewrite / decorrelate optimizer phases
(FlinkStreamProgram.scala:47-72 TABLE_SUBQUERY_RULES, batch
FlinkDecorrelateProgram — SURVEY.md section 4.1) turn IN/EXISTS into
semi-joins and correlated scalar subqueries into aggregating joins.
Catalyst has the same rewrites (RewriteCorrelatedScalarSubquery,
RewritePredicateSubquery); these queries pin them end-to-end with
TPC-H Q7/Q14/Q17/Q19/Q22 shapes adapted to the driver schema (which
has no partsupp table and no l_commitdate/l_receiptdate columns).

Spark-side subqueries are written in spark.sql() over registered temp
views — the SQL surface of the engine (TableEnvironmentImpl.executeSql
equivalent) — so this module also covers the SQL entry path, not just
the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_release_1_16_0_spark.catalog import register_tables
from flink_release_1_16_0_spark.queries import register
from flink_release_1_16_0_spark.queries._util import sql_davg, sql_dsum

# --------------------------------------------------------------------------
# Q7-shape: volume shipping between two nations (join graph + CASE agg)
# --------------------------------------------------------------------------

_Q7_SQL = f"""
SELECT
  supp_nation, cust_nation, l_year,
  {sql_dsum('volume', 4)} AS revenue
FROM (
  SELECT
    n1.n_name AS supp_nation,
    n2.n_name AS cust_nation,
    EXTRACT(YEAR FROM l_shipdate) AS l_year,
    l_extendedprice * (1 - l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register("q7_volume_shipping", _Q7_SQL, tags=("join", "agg", "sql"))
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_Q7_SQL)


# --------------------------------------------------------------------------
# Q14-shape: promo revenue share (conditional aggregation over a join)
# --------------------------------------------------------------------------

_Q14_SQL = f"""
SELECT
  100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO'
        THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4)) ELSE 0 END) AS DOUBLE)
    / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE)
    AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate <  TIMESTAMP '1996-10-01'
"""


@register("q14_promo_effect", _Q14_SQL, tags=("join", "agg", "sql"))
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_Q14_SQL)


# --------------------------------------------------------------------------
# Q17-shape: small-quantity-order revenue (correlated scalar subquery ->
# decorrelated into an aggregating join)
# --------------------------------------------------------------------------

_Q17_SQL = f"""
SELECT {sql_dsum('l_extendedprice')} AS total_price
FROM lineitem l1
JOIN part ON p_partkey = l1.l_partkey
WHERE p_brand = 'Brand#13'
  AND l1.l_quantity < (
    SELECT 0.5 * AVG(l2.l_quantity)
    FROM lineitem l2
    WHERE l2.l_partkey = l1.l_partkey
  )
"""


@register("q17_small_quantity", _Q17_SQL, tags=("join", "subquery", "sql"))
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_Q17_SQL)


# --------------------------------------------------------------------------
# Q19-shape: discounted revenue with OR-of-ANDs predicate (tests
# predicate normalization + join with disjunctive condition)
# --------------------------------------------------------------------------

_Q19_SQL = f"""
SELECT {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE
  (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
   AND l_quantity >= 5 AND l_quantity <= 35)
  OR
  (p_brand = 'Brand#7' AND p_size BETWEEN 10 AND 30
   AND l_quantity >= 10 AND l_quantity <= 40)
  OR
  (p_brand = 'Brand#20' AND p_size BETWEEN 20 AND 50
   AND l_quantity >= 15 AND l_quantity <= 45)
"""


@register("q19_disjunctive_join", _Q19_SQL, tags=("join", "calc", "sql"))
def q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_Q19_SQL)


# --------------------------------------------------------------------------
# Q22-shape: global-avg scalar subquery + NOT EXISTS anti join
# --------------------------------------------------------------------------

_Q22_SQL = f"""
SELECT
  c_mktsegment,
  COUNT(*) AS numcust,
  {sql_dsum('c_acctbal')} AS totacctbal
FROM customer c
WHERE c_acctbal > (
    SELECT {sql_davg('c_acctbal')} FROM customer WHERE c_acctbal > 0.00
  )
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000)
GROUP BY c_mktsegment
"""


@register("q22_global_sales_opportunity", _Q22_SQL, tags=("agg", "subquery", "sql"))
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_Q22_SQL)


# --------------------------------------------------------------------------
# Q15-shape: top supplier by revenue (agg view + scalar-subquery max)
# --------------------------------------------------------------------------

_Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@register("q15_top_supplier", _Q15_SQL, tags=("agg", "subquery", "sql"))
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_Q15_SQL)
