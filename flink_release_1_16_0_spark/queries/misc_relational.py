"""Remaining relational coverage: Values source, sort with null
ordering, limit/offset, nested JSON structs.

Reference anchors: ValuesInputFormat.java / BatchExecValues (inline
literal rows), SortOperator.java + SortLimitOperator.java (SURVEY.md
section 2.6 — null direction is part of the sort spec), and the JSON
function family (SqlJsonUtils.java).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_release_1_16_0_spark.catalog import load_table
from flink_release_1_16_0_spark.queries import register

# --------------------------------------------------------------------------
# Values source: inline literal rows (the reference's VALUES clause)
# --------------------------------------------------------------------------

_VALUES_ORACLE = """
SELECT * FROM (VALUES
  (1, 'a', 1.5),
  (2, 'b', 2.5),
  (3, NULL, NULL)
) AS t(id, s, v)
"""


@register("values_inline", _VALUES_ORACLE, tags=("source", "values"))
def values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, None, None)], "id int, s string, v double"
    )


# --------------------------------------------------------------------------
# sort with explicit null ordering (nulls first / nulls last)
# --------------------------------------------------------------------------

_SORT_NULLS_ORACLE = """
SELECT c_custkey, seg_or_null,
       ROW_NUMBER() OVER (ORDER BY seg_or_null ASC NULLS FIRST, c_custkey) AS rn_nf,
       ROW_NUMBER() OVER (ORDER BY seg_or_null DESC NULLS LAST, c_custkey) AS rn_nl
FROM (
  SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null
  FROM customer WHERE c_custkey % 40 = 0
)
"""


@register("sort_null_ordering", _SORT_NULLS_ORACLE, tags=("sort",))
def sort_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 40 == 0)
    base = cust.select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_or_null"),
    )
    w_nf = Window.orderBy(F.asc_nulls_first("seg_or_null"), F.asc("c_custkey"))
    w_nl = Window.orderBy(F.desc_nulls_last("seg_or_null"), F.asc("c_custkey"))
    return base.select(
        "c_custkey",
        "seg_or_null",
        F.row_number().over(w_nf).alias("rn_nf"),
        F.row_number().over(w_nl).alias("rn_nl"),
    )


# --------------------------------------------------------------------------
# limit + offset over a total order (SortLimitOperator with offset)
# --------------------------------------------------------------------------

_OFFSET_ORACLE = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 15 OFFSET 10
"""


@register("sort_limit_offset", _OFFSET_ORACLE, tags=("sort", "limit"))
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(10)
        .limit(15)
        .select("o_orderkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# nested JSON: construct a nested document, extract typed fields back
# --------------------------------------------------------------------------

_JSON_NESTED_ORACLE = """
WITH built AS (
  SELECT event_id,
         TO_JSON({'user': {'id': user_id, 'seg': event_type},
                  'vals': [value, value * 2]}) :: VARCHAR AS doc
  FROM events WHERE event_id % 41 = 0
)
SELECT event_id,
       CAST(doc->>'$.user.id' AS BIGINT) AS uid,
       doc->>'$.user.seg'                AS seg,
       CAST(doc->>'$.vals[1]' AS DOUBLE) AS second_val
FROM built
"""


@register("func_json_nested", _JSON_NESTED_ORACLE, tags=("function", "json"))
def func_json_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 41 == 0)
    built = ev.select(
        "event_id",
        F.to_json(
            F.struct(
                F.struct(
                    F.col("user_id").alias("id"), F.col("event_type").alias("seg")
                ).alias("user"),
                F.array(F.col("value"), F.col("value") * 2).alias("vals"),
            )
        ).alias("doc"),
    )
    return built.select(
        "event_id",
        F.get_json_object("doc", "$.user.id").cast("bigint").alias("uid"),
        F.get_json_object("doc", "$.user.seg").alias("seg"),
        F.get_json_object("doc", "$.vals[1]").cast("double").alias("second_val"),
    )
