"""HLL sketch semantics (operators/hll.py).

Mirrors the reference's ApproxCountDistinct tests
(BatchApproxCountDistinctAggFunctions.java:55): the estimate must land
within the sketch's theoretical error band (~1.04/sqrt(256) = 6.5%),
and merging partitions must be order-independent (max-register merge).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_release_1_16_0_spark.catalog import load_table
from flink_release_1_16_0_spark.operators.hll import hll_count_distinct


def test_hll_estimate_within_error_band(spark, sf_correct):
    li = load_table(spark, sf_correct, "lineitem")
    est = hll_count_distinct(li, ["l_returnflag"], "l_partkey", "approx")
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact")
    )
    rows = est.join(exact, "l_returnflag").collect()
    assert len(rows) == 3
    for r in rows:
        rel_err = abs(r["approx"] - r["exact"]) / r["exact"]
        assert rel_err < 0.07, (r["l_returnflag"], r["approx"], r["exact"])


def test_hll_partition_order_invariant(spark, sf_correct):
    li = load_table(spark, sf_correct, "lineitem")
    a = hll_count_distinct(li, ["l_returnflag"], "l_partkey", "approx")
    b = hll_count_distinct(
        li.repartition(13, "l_suppkey"), ["l_returnflag"], "l_partkey", "approx"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_hll_small_range_linear_counting(spark):
    # 5 distinct values in 256 buckets -> small-range branch (z0 > 0,
    # raw <= 2.5m) must kick in and still be ~exact.
    df = spark.createDataFrame(
        [(1, v) for v in ["a", "b", "c", "d", "e"] * 10], "g int, v string"
    )
    [row] = hll_count_distinct(df, ["g"], "v", "approx").collect()
    assert abs(row["approx"] - 5) <= 1


def test_native_approx_count_distinct_sane(spark, sf_correct):
    # The native HLL++ (same family as the reference's) stays exercised.
    li = load_table(spark, sf_correct, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx"),
            F.countDistinct("l_partkey").alias("exact"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r["approx"] - r["exact"]) / r["exact"] < 0.1
