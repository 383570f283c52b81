"""Set-operation coverage (SURVEY.md section 2.7).

Reference: UNION ALL (CommonExecUnion.java, RT/multipleinput/
UnionStreamOperator.java); UNION distinct rewritten to union-all +
distinct agg; INTERSECT [ALL] / EXCEPT [ALL] rewritten to joins/agg
(RewriteIntersectAllRule — FlinkStreamRuleSets.scala:296,
FlinkBatchRuleSets.scala:303 — and RewriteMinusAllRule, which expand
into $REPLICATE_ROWS$1 over min/diff counts).

Spark has all six natively (`union`, `distinct`, `intersect`,
`intersectAll`, `exceptAll`, `subtract`) with the same multiset
semantics, so each query below pins one operator against the ANSI
equivalent in DuckDB. Inputs are keyed slices of the star schema chosen
so both duplicate rows and one-sided rows exist (multiset semantics
actually observable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_release_1_16_0_spark.catalog import load_table
from flink_release_1_16_0_spark.queries import register

# Two overlapping multisets over (c_nationkey, c_mktsegment):
# slice A = custkey % 5 in (0,1), slice B = custkey % 5 in (1,2).
# Projecting to a low-cardinality pair produces plenty of duplicates,
# which is what distinguishes ALL from DISTINCT semantics.

_A_SQL = "SELECT c_nationkey, c_mktsegment FROM customer WHERE c_custkey % 5 IN (0, 1)"
_B_SQL = "SELECT c_nationkey, c_mktsegment FROM customer WHERE c_custkey % 5 IN (1, 2)"


def _slices(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter((F.col("c_custkey") % 5).isin(0, 1)).select(
        "c_nationkey", "c_mktsegment"
    )
    b = cust.filter((F.col("c_custkey") % 5).isin(1, 2)).select(
        "c_nationkey", "c_mktsegment"
    )
    return a, b


_UNION_ALL_ORACLE = f"""
SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
FROM (({_A_SQL}) UNION ALL ({_B_SQL}))
GROUP BY c_nationkey, c_mktsegment
"""


@register("setop_union_all", _UNION_ALL_ORACLE, tags=("setop",))
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _slices(spark, sf_dir)
    return (
        a.unionAll(b)
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_UNION_ORACLE = f"({_A_SQL}) UNION ({_B_SQL})"


@register("setop_union_distinct", _UNION_ORACLE, tags=("setop",))
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _slices(spark, sf_dir)
    return a.union(b).distinct()


_INTERSECT_ORACLE = f"({_A_SQL}) INTERSECT ({_B_SQL})"


@register("setop_intersect", _INTERSECT_ORACLE, tags=("setop",))
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _slices(spark, sf_dir)
    return a.intersect(b)


# INTERSECT ALL keeps min(multiplicity) copies per row — compare via
# group-count (the driver hash is on rows, and duplicate rows are fine,
# but group-count makes failures readable).
_INTERSECT_ALL_ORACLE = f"""
SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
FROM (({_A_SQL}) INTERSECT ALL ({_B_SQL}))
GROUP BY c_nationkey, c_mktsegment
"""


@register("setop_intersect_all", _INTERSECT_ALL_ORACLE, tags=("setop",))
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _slices(spark, sf_dir)
    return (
        a.intersectAll(b)
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# EXCEPT projects the key itself: the low-cardinality pair projection
# saturates on both sides at every scale factor (A EXCEPT B would be
# vacuously empty), while keyed slices differ structurally — the result
# is exactly the %5==0 customers, nonzero at any scale.
_EXCEPT_A = "SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 5 IN (0, 1)"
_EXCEPT_B = "SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 5 IN (1, 2)"
_EXCEPT_ORACLE = f"({_EXCEPT_A}) EXCEPT ({_EXCEPT_B})"


@register("setop_except", _EXCEPT_ORACLE, tags=("setop",))
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter((F.col("c_custkey") % 5).isin(0, 1)).select(
        "c_custkey", "c_mktsegment"
    )
    b = cust.filter((F.col("c_custkey") % 5).isin(1, 2)).select(
        "c_custkey", "c_mktsegment"
    )
    return a.subtract(b)


_EXCEPT_ALL_ORACLE = f"""
SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
FROM (({_A_SQL}) EXCEPT ALL ({_B_SQL}))
GROUP BY c_nationkey, c_mktsegment
"""


@register("setop_except_all", _EXCEPT_ALL_ORACLE, tags=("setop",))
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _slices(spark, sf_dir)
    return (
        a.exceptAll(b)
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
