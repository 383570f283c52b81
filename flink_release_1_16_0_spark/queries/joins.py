"""Join-type matrix (SURVEY.md section 2.3).

Reference coverage: FlinkJoinType INNER/LEFT/RIGHT/FULL/SEMI/ANTI
(RT/join/FlinkJoinType.java, StreamingSemiAntiJoinOperator.java), batch
hash/sort-merge/nested-loop strategies (HashJoinOperator.java:67,
SortMergeJoinOperator.java, BatchExecNestedLoopJoin.java), interval join
(RT/join/interval/TimeIntervalJoin.java:51), and the temporal/as-of join
(RT/join/temporal/TemporalRowTimeJoinOperator.java:78).

On Spark the first three strategies are Catalyst's own (broadcast-hash /
shuffled-hash / sort-merge / broadcast-nested-loop picked by the
planner + AQE); the semantics queries below pin the *join type* matrix.
The as-of join is the one operator Spark lacks — implemented in
``operators.asof`` as a union + window scan (single shuffle, no range
explosion — scales to skewed keys far better than a theta join).

To exercise unmatched rows on both sides deterministically, the outer
joins use keyed slices of customer/orders (custkey mod filters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_release_1_16_0_spark.catalog import load_table
from flink_release_1_16_0_spark.operators.asof import asof_join
from flink_release_1_16_0_spark.queries import register
from flink_release_1_16_0_spark.queries._util import dsum, sql_dsum

# --------------------------------------------------------------------------
# inner equi-join
# --------------------------------------------------------------------------

_INNER_ORACLE = f"""
SELECT o_orderpriority,
       COUNT(*) AS n,
       {sql_dsum('o_totalprice')} AS total
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'MACHINERY'
GROUP BY o_orderpriority
"""


@register("join_inner", _INNER_ORACLE, tags=("join",))
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY"
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total"))
    )


# --------------------------------------------------------------------------
# left outer join (customers with no qualifying orders -> NULL side)
# --------------------------------------------------------------------------

_LEFT_ORACLE = f"""
SELECT c_custkey,
       COUNT(o_orderkey) AS n_orders,
       {sql_dsum('o_totalprice')} AS total
FROM customer
LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F') o
  ON c_custkey = o.o_custkey
GROUP BY c_custkey
"""


@register("join_left_outer", _LEFT_ORACLE, tags=("join",))
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"), dsum("o_totalprice").alias("total"))
    )


# --------------------------------------------------------------------------
# right outer join
# --------------------------------------------------------------------------

_RIGHT_ORACLE = """
SELECT o_orderkey, c_name
FROM (SELECT * FROM customer WHERE c_custkey % 3 = 0) c
RIGHT JOIN orders ON c.c_custkey = o_custkey
WHERE o_orderkey % 7 = 0
"""


@register("join_right_outer", _RIGHT_ORACLE, tags=("join",))
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 3 == 0)
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "right")
        .select("o_orderkey", "c_name")
    )


# --------------------------------------------------------------------------
# full outer join (mismatches on both sides via mod slices)
# --------------------------------------------------------------------------

_FULL_ORACLE = """
SELECT a.c_custkey AS k_even, b.c_custkey AS k_div3, a.c_name AS name_even, b.c_acctbal AS bal_div3
FROM (SELECT * FROM customer WHERE c_custkey % 2 = 0) a
FULL JOIN (SELECT * FROM customer WHERE c_custkey % 3 = 0) b
  ON a.c_custkey = b.c_custkey
"""


@register("join_full_outer", _FULL_ORACLE, tags=("join",))
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_custkey") % 2 == 0).alias("a")
    b = cust.filter(F.col("c_custkey") % 3 == 0).alias("b")
    return a.join(b, F.col("a.c_custkey") == F.col("b.c_custkey"), "full").select(
        F.col("a.c_custkey").alias("k_even"),
        F.col("b.c_custkey").alias("k_div3"),
        F.col("a.c_name").alias("name_even"),
        F.col("b.c_acctbal").alias("bal_div3"),
    )


# --------------------------------------------------------------------------
# left semi join (EXISTS)
# --------------------------------------------------------------------------

_SEMI_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
)
"""


@register("join_semi", _SEMI_ORACLE, tags=("join", "subquery"))
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# left anti join (NOT EXISTS)
# --------------------------------------------------------------------------

_ANTI_ORACLE = """
SELECT c_custkey, c_mktsegment FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000
)
"""


@register("join_anti", _ANTI_ORACLE, tags=("join", "subquery"))
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_mktsegment")


# --------------------------------------------------------------------------
# theta (non-equi) join -> BroadcastNestedLoopJoin
# --------------------------------------------------------------------------

_THETA_ORACLE = """
SELECT n1.n_name AS nation_a, n2.n_name AS nation_b
FROM nation n1 JOIN nation n2
  ON n1.n_nationkey < n2.n_nationkey AND n1.n_regionkey = n2.n_regionkey
"""


@register("join_theta", _THETA_ORACLE, tags=("join",))
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    n1, n2 = nation.alias("n1"), nation.alias("n2")
    return n1.join(
        n2,
        (F.col("n1.n_nationkey") < F.col("n2.n_nationkey"))
        & (F.col("n1.n_regionkey") == F.col("n2.n_regionkey")),
    ).select(F.col("n1.n_name").alias("nation_a"), F.col("n2.n_name").alias("nation_b"))


# --------------------------------------------------------------------------
# cross join
# --------------------------------------------------------------------------

_CROSS_ORACLE = """
SELECT r_name, n_name FROM region CROSS JOIN nation
"""


@register("join_cross", _CROSS_ORACLE, tags=("join",))
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select("r_name", "n_name")


# --------------------------------------------------------------------------
# interval join (batch analog of RT/join/interval/TimeIntervalJoin.java:51):
# purchase joined to the same user's events within [-10min, 0] of it
# --------------------------------------------------------------------------

_INTERVAL_ORACLE = """
SELECT p.event_id AS purchase_id, e.event_id AS prior_event_id, e.event_type AS prior_type
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN events e
  ON p.user_id = e.user_id
 AND e.ts >= p.ts - INTERVAL 10 MINUTE
 AND e.ts < p.ts
"""


@register("join_interval", _INTERVAL_ORACLE, tags=("join", "time"))
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").alias("p")
    e = ev.alias("e")
    return (
        p.join(
            e,
            (F.col("p.user_id") == F.col("e.user_id"))
            & (F.col("e.ts") >= F.col("p.ts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("e.ts") < F.col("p.ts")),
        )
        .select(
            F.col("p.event_id").alias("purchase_id"),
            F.col("e.event_id").alias("prior_event_id"),
            F.col("e.event_type").alias("prior_type"),
        )
    )


# --------------------------------------------------------------------------
# as-of / temporal join (TemporalRowTimeJoinOperator semantics): each
# purchase picks the latest click by the same user at or before it.
# DuckDB has native ASOF JOIN as the oracle.
# --------------------------------------------------------------------------

_ASOF_ORACLE = """
SELECT p.event_id, p.user_id, c.event_id AS click_id, c.ts AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts <= p.ts
"""


@register("join_asof", _ASOF_ORACLE, tags=("join", "time"), bench=True)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SQL-text input construction (where/selectExpr): one JVM parse per
    # step instead of a py4j round-trip per Column node — measured
    # ~102 -> ~56-79 ms of driver-side build per run at sf0.1,
    # result-identical (round-14; same rationale as the r13 SQL-text
    # twins inside asof_join itself)
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where("event_type = 'purchase'").selectExpr(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where("event_type = 'click'").selectExpr(
        "user_id", "ts", "event_id AS click_id"
    )
    return asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=("click_id",),
    ).selectExpr("event_id", "user_id", "click_id", "__asof_ts AS click_ts")


# --------------------------------------------------------------------------
# Skew-salted join (the explicit fallback when AQE skew-splitting can't
# help): lineitem (orderkey-skewed in the worst case) against orders
# with the join key salted 8 ways. Salting only re-partitions, so the
# oracle is the plain join — identical rows prove the rewrite is
# semantics-preserving.
# --------------------------------------------------------------------------

_SALTED_ORACLE = f"""
SELECT l_orderkey, l_linenumber, o_orderpriority,
       {sql_dsum('l_extendedprice')} AS price_sum
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderstatus = 'O'
GROUP BY l_orderkey, l_linenumber, o_orderpriority
"""


@register("join_skew_salted", _SALTED_ORACLE, tags=("join", "skew"))
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_release_1_16_0_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    ).select("o_orderkey", "o_orderpriority")
    joined = salted_join(
        li,
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        on="l_orderkey",
        salt_by="l_linenumber",
        factor=8,
    )
    return joined.groupBy("l_orderkey", "l_linenumber", "o_orderpriority").agg(
        dsum("l_extendedprice").alias("price_sum")
    )
