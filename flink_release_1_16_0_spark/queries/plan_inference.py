"""Changelog-mode inference queries (SURVEY.md §4.1 — the one rewrite
with no Catalyst equivalent).

Each query declares an operator DAG over a derived changelog of
``orders``, runs ``plans.changelog_inference.infer`` to let the pass
inject the encoding operators (UpsertToRetract / DropUpdateBefore), and
executes the lowered plan. The oracles express the *ground truth* the
encoding must preserve — latest-version-per-key semantics — so a wrong
injection (e.g. aggregating an upsert log without expanding
retractions) hash-mismatches immediately.

Upsert log used here (+I/+U/-D, no -U — the shape an upsert-kafka
source delivers, UpsertKafkaDynamicTableFactory.java):
- +I for every order at orderdate;
- +U at +30d for finished ('F') orders, price bumped 10%;
- -D at +60d for orderkey % 50 == 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_release_1_16_0_spark.catalog import load_table
from flink_release_1_16_0_spark.plans import changelog_inference as P
from flink_release_1_16_0_spark.queries import register
from flink_release_1_16_0_spark.queries.changelog_queries import (
    _LOG_SQL,
    _bumped_price,
    _orders_changelog,
)
from flink_release_1_16_0_spark.streaming import changelog as C

_UPSERT_LOG_SQL = """
  SELECT '+I' AS __rowkind, o_orderdate AS ts, 0 AS seq,
         o_orderkey, o_orderpriority, o_totalprice
  FROM orders
  UNION ALL
  SELECT '+U', o_orderdate + INTERVAL 30 DAY, 2,
         o_orderkey, o_orderpriority,
         CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * 1.1, 2) AS DOUBLE)
  FROM orders WHERE o_orderstatus = 'F'
  UNION ALL
  SELECT '-D', o_orderdate + INTERVAL 60 DAY, 3,
         o_orderkey, o_orderpriority,
         CASE WHEN o_orderstatus = 'F'
              THEN CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * 1.1, 2) AS DOUBLE)
              ELSE o_totalprice END
  FROM orders WHERE o_orderkey % 50 = 0
"""


def _orders_upsert_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.lit(C.INSERT).alias(C.ROWKIND),
        F.col("o_orderdate").alias("ts"),
        F.lit(0).alias("seq"),
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
    )
    upd = o.filter(F.col("o_orderstatus") == "F").select(
        F.lit(C.UPDATE_AFTER).alias(C.ROWKIND),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("ts"),
        F.lit(2).alias("seq"),
        "o_orderkey",
        "o_orderpriority",
        _bumped_price().alias("o_totalprice"),
    )
    deleted = o.filter(F.col("o_orderkey") % 50 == 0).select(
        F.lit(C.DELETE).alias(C.ROWKIND),
        (F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("ts"),
        F.lit(3).alias("seq"),
        "o_orderkey",
        "o_orderpriority",
        F.when(F.col("o_orderstatus") == "F", _bumped_price())
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    return base.unionByName(upd).unionByName(deleted)


# --------------------------------------------------------------------------
# upsert source -> GroupAgg -> retract sink:
# the pass must inject UpsertToRetract under the agg, else the signed
# aggregation double-counts every update. Ground truth = aggregate of
# the normalized current state.
# --------------------------------------------------------------------------

_UPSERT_AGG_ORACLE = f"""
WITH ulog AS ({_UPSERT_LOG_SQL}),
cur AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                 ORDER BY ts DESC, seq DESC) AS rn
    FROM ulog
  ) WHERE rn = 1 AND __rowkind IN ('+I', '+U')
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS net_total
FROM cur
GROUP BY o_orderpriority
"""


@register(
    "plan_infer_upsert_agg",
    _UPSERT_AGG_ORACLE,
    tags=("changelog", "plan", "agg"),
)
def plan_infer_upsert_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = P.Source(
        df=_orders_upsert_log(spark, sf_dir),
        mode="upsert",
        key=("o_orderkey",),
        ts_col="ts",
        seq_col="seq",
    )
    agg = P.GroupAgg(
        input=src,
        keys=("o_orderpriority",),
        sum_cols={"net_total": F.col("o_totalprice").cast("decimal(38,2)")},
    )
    plan = P.infer(P.Sink(input=agg, mode="retract"))
    # the pass must have planned the ChangelogNormalize expansion
    assert isinstance(plan.input.input, P.UpsertToRetract)
    return P.execute(plan).withColumn(
        "net_total", F.col("net_total").cast("double")
    )


# --------------------------------------------------------------------------
# retract source -> Calc (key-preserving) -> upsert sink:
# ONLY_UPDATE_AFTER suffices, so the pass plans a DropUpdateBefore and
# the sink materializes the latest version per key.
# --------------------------------------------------------------------------

_DROP_UB_ORACLE = f"""
WITH log AS ({_LOG_SQL}),
filtered AS (
  SELECT * FROM log WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
)
SELECT o_orderkey, o_orderpriority, o_totalprice
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                               ORDER BY ts DESC, seq DESC) AS rn
  FROM filtered
) WHERE rn = 1 AND __rowkind IN ('+I', '+U')
"""


@register(
    "plan_infer_drop_update_before",
    _DROP_UB_ORACLE,
    tags=("changelog", "plan"),
)
def plan_infer_drop_update_before(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    src = P.Source(
        df=_orders_changelog(spark, sf_dir),
        mode="retract",
        key=("o_orderkey",),
        ts_col="ts",
        seq_col="seq",
    )
    calc = P.Calc(
        input=src,
        predicate=F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
        project=("o_orderkey", "o_orderpriority", "o_totalprice"),
    )
    plan = P.infer(P.Sink(input=calc, mode="upsert", key=("o_orderkey",)))
    # the requirement downgraded to ONLY_UPDATE_AFTER at the source
    assert isinstance(plan.input.input, P.DropUpdateBefore)
    return P.execute(plan)
