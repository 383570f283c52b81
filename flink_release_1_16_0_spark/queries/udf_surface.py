"""UDF/UDAF/UDTAG surface coverage (SURVEY.md section 2.10).

Reference: ScalarFunction.java:93 -> pandas_udf; AggregateFunction.java
:193 -> GROUPED_AGG pandas_udf; TableAggregateFunction.java:157 (UDTAG,
emits multiple rows per group) -> applyInPandas. In the reference,
Python UDFs run through a Beam harness; here Python is the host
language, so the entire harness collapses to Arrow-batched pandas
functions — these queries pin that the Arrow path produces results
identical to the SQL semantics (each has a plain-SQL DuckDB oracle).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from flink_release_1_16_0_spark.catalog import load_table
from flink_release_1_16_0_spark.queries import register

# --------------------------------------------------------------------------
# scalar pandas UDF (ScalarFunction): deterministic integer arithmetic
# so the Arrow round-trip is exactly reproducible in SQL
# --------------------------------------------------------------------------

_SCALAR_UDF_ORACLE = """
SELECT o_orderkey,
       (o_orderkey * 31 + LENGTH(o_orderpriority)) % 1000 AS fingerprint
FROM orders
WHERE o_orderkey % 43 = 0
"""


@register("udf_pandas_scalar", _SCALAR_UDF_ORACLE, tags=("udf",))
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("bigint")
    def fingerprint(key: pd.Series, prio: pd.Series) -> pd.Series:
        return (key * 31 + prio.str.len()) % 1000

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 43 == 0)
    return orders.select(
        "o_orderkey",
        fingerprint(F.col("o_orderkey"), F.col("o_orderpriority")).alias("fingerprint"),
    )


# --------------------------------------------------------------------------
# grouped-agg pandas UDF (AggregateFunction): exact integer-cent sum
# --------------------------------------------------------------------------

_GROUPED_UDF_ORACLE = """
SELECT event_type,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
FROM events
GROUP BY event_type
"""


@register("udf_pandas_grouped_agg", _GROUPED_UDF_ORACLE, tags=("udf", "agg"))
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("double")
    def cent_sum(v: pd.Series) -> float:
        return float((v * 100).round().astype("int64").sum()) / 100.0

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(cent_sum(F.col("value")).alias("total"))


# --------------------------------------------------------------------------
# table aggregate (UDTAG, TableAggregateFunction: top-2 per group
# emitting multiple rows) via applyInPandas — the reference's
# GroupTableAggFunction example is exactly top-N emission
# --------------------------------------------------------------------------

_UDTAG_ORACLE = """
SELECT c_nationkey, c_custkey, c_acctbal FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
) WHERE rn <= 2
"""


@register("udtag_table_agg_top2", _UDTAG_ORACLE, tags=("udf", "agg"))
def udtag_table_agg_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    def top2(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.sort_values(
            ["c_acctbal", "c_custkey"], ascending=[False, True], kind="mergesort"
        ).head(2)[["c_nationkey", "c_custkey", "c_acctbal"]]

    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_custkey", "c_acctbal"
    )
    return cust.groupBy("c_nationkey").applyInPandas(
        top2, schema="c_nationkey int, c_custkey bigint, c_acctbal double"
    )


# --------------------------------------------------------------------------
# encoding functions (TO_BASE64/FROM_BASE64/HEX, section 2.8 leftovers)
# --------------------------------------------------------------------------

_ENCODING_ORACLE = """
SELECT c_custkey,
       base64(encode(c_mktsegment))            AS seg_b64,
       decode(from_base64(base64(encode(c_name)))) AS name_roundtrip,
       hex(c_custkey)                          AS key_hex,
       bin(c_custkey % 64)                     AS key_bin
FROM customer
WHERE c_custkey % 47 = 0
"""


@register("func_encoding", _ENCODING_ORACLE, tags=("function", "string"))
def func_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 47 == 0)
    return cust.select(
        "c_custkey",
        F.base64(F.encode("c_mktsegment", "UTF-8")).alias("seg_b64"),
        F.unbase64(F.base64(F.encode("c_name", "UTF-8"))).cast("string").alias(
            "name_roundtrip"
        ),
        F.hex(F.col("c_custkey")).alias("key_hex"),
        F.bin(F.col("c_custkey") % 64).alias("key_bin"),
    )


# --------------------------------------------------------------------------
# Python UDTF (TableFunction.java:136 — the direct analogue: a
# user-defined function emitting 0..n rows per input row, applied
# laterally). pyspark's @udtf + LATERAL join; oracle = string_split
# with index arithmetic (DuckDB has no WITH ORDINALITY).
# --------------------------------------------------------------------------

_UDTF_ORACLE = """
SELECT n_nationkey,
       CAST(p.idx AS INT) AS pos,
       p.entry AS word
FROM (
  SELECT n_nationkey,
         unnest(list_transform(string_split(n_name, ' '),
                               (w, i) -> {'entry': w, 'idx': i - 1})) AS p
  FROM nation
)
WHERE p.entry <> ''
"""


@register("udtf_split_words", _UDTF_ORACLE, tags=("udf", "udtf"))
def udtf_split_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, word string")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate((text or "").split(" ")):
                if w:
                    yield i, w

    spark.udtf.register("split_words", SplitWords)
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_udtf_src")
    return spark.sql(
        """
        SELECT n_nationkey, s.pos, s.word
        FROM nation_udtf_src, LATERAL split_words(n_name) s
        """
    )
