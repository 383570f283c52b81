"""Type-system coverage (SURVEY.md section 1.2): DECIMAL precision/
scale propagation, intervals, nested ROW/ARRAY/MAP shapes.

Reference: the logical type lattice (LogicalTypeRoot.java) and the
batch DecimalITCase — exact decimal arithmetic with the SQL standard's
precision/scale inference. Decimal results are emitted as strings so
the cross-engine compare is on the exact decimal rendering, not on a
float round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_release_1_16_0_spark.catalog import load_table
from flink_release_1_16_0_spark.queries import register

# --------------------------------------------------------------------------
# decimal arithmetic: +, *, /, SUM/AVG with scale propagation
# --------------------------------------------------------------------------

_DECIMAL_ORACLE = """
WITH d AS (
  SELECT o_orderkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         CAST(0.07 AS DECIMAL(3,2)) AS rate
  FROM orders WHERE o_orderkey % 53 = 0
)
SELECT o_orderkey,
       CAST(price + CAST(1.50 AS DECIMAL(3,2)) AS VARCHAR)      AS plus_s,
       CAST(CAST(price * rate AS DECIMAL(24,4)) AS VARCHAR)     AS tax_s,
       CAST(CAST(price / 3 AS DECIMAL(24,6)) AS VARCHAR)        AS third_s,
       CAST(CAST(ROUND(price, 0) AS DECIMAL(10,0)) AS VARCHAR)  AS rounded_s
FROM d
"""


@register("types_decimal_arithmetic", _DECIMAL_ORACLE, tags=("types", "decimal"))
def types_decimal_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 53 == 0)
    price = F.col("o_totalprice").cast("decimal(18,2)")
    rate = F.lit("0.07").cast("decimal(3,2)")
    return orders.select(
        "o_orderkey",
        (price + F.lit("1.50").cast("decimal(3,2)")).cast("string").alias("plus_s"),
        (price * rate).cast("decimal(24,4)").cast("string").alias("tax_s"),
        (price / 3).cast("decimal(24,6)").cast("string").alias("third_s"),
        F.round(price, 0).cast("decimal(10,0)").cast("string").alias("rounded_s"),
    )


# --------------------------------------------------------------------------
# decimal aggregation: SUM keeps exactness at scale, AVG at widened scale
# --------------------------------------------------------------------------

_DECIMAL_AGG_ORACLE = """
SELECT o_orderpriority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS sum_s,
       CAST(CAST(AVG(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(22,6)) AS VARCHAR) AS avg_s,
       CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS min_s,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS max_s
FROM orders
GROUP BY o_orderpriority
"""


@register("types_decimal_agg", _DECIMAL_AGG_ORACLE, tags=("types", "decimal", "agg"))
def types_decimal_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_totalprice").cast("decimal(18,2)")
    return orders.groupBy("o_orderpriority").agg(
        F.sum(d).cast("string").alias("sum_s"),
        F.avg(d).cast("decimal(22,6)").cast("string").alias("avg_s"),
        F.min(d).cast("string").alias("min_s"),
        F.max(d).cast("string").alias("max_s"),
    )


# --------------------------------------------------------------------------
# interval arithmetic (YEAR-MONTH / DAY-SECOND intervals in expressions)
# --------------------------------------------------------------------------

_INTERVAL_ORACLE = """
SELECT event_id,
       ts + INTERVAL 2 MONTH            AS plus_2mo,
       ts - INTERVAL 36 HOUR            AS minus_36h,
       ts + INTERVAL 1 DAY + INTERVAL 12 HOUR + INTERVAL 30 MINUTE AS plus_daytime,
       CAST(DATE_DIFF('second', ts, ts + INTERVAL 90 MINUTE) AS BIGINT) AS diff_s
FROM events WHERE event_id % 61 = 0
"""


@register("types_interval_arithmetic", _INTERVAL_ORACLE, tags=("types", "time"))
def types_interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 61 == 0)
    ts = F.col("ts")
    return ev.select(
        "event_id",
        (ts + F.expr("INTERVAL 2 MONTHS")).alias("plus_2mo"),
        (ts - F.expr("INTERVAL 36 HOURS")).alias("minus_36h"),
        (ts + F.expr("INTERVAL '1 12:30:00' DAY TO SECOND")).alias("plus_daytime"),
        F.expr("timestampdiff(SECOND, ts, ts + INTERVAL 90 MINUTES)")
        .cast("bigint")
        .alias("diff_s"),
    )


# --------------------------------------------------------------------------
# TIME-of-day type (SURVEY.md section 1.2: Flink TIME(p) -> integer
# millis-of-day, TimeType in LogicalTypeRoot.java). The engine carries
# TIME as millis-since-midnight computed from the timestamp, with
# component extraction, formatting, modular TIME arithmetic, and a
# time-of-day range predicate.
# --------------------------------------------------------------------------

_TIME_ORACLE = """
WITH t AS (
  SELECT event_id, ts,
         DATE_DIFF('millisecond', date_trunc('day', ts), ts) AS time_ms
  FROM events WHERE event_id % 37 = 0
)
SELECT event_id,
       CAST(time_ms AS BIGINT) AS time_millis,
       CAST(hour(ts) AS INT) AS hh,
       CAST(minute(ts) AS INT) AS mi,
       CAST(second(ts) AS INT) AS ss,
       strftime(ts, '%H:%M:%S') AS hhmmss,
       CAST((time_ms + 90 * 60 * 1000) % 86400000 AS BIGINT) AS plus_90m_millis,
       time_ms >= 9 * 3600000 AND time_ms < 17 * 3600000 AS in_business_hours
FROM t
"""


@register("types_time_of_day", _TIME_ORACLE, tags=("types", "time"))
def types_time_of_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 37 == 0)
    time_ms = F.expr("(unix_micros(ts) - unix_micros(date_trunc('DAY', ts))) div 1000")
    return ev.select(
        "event_id",
        time_ms.cast("bigint").alias("time_millis"),
        F.hour("ts").alias("hh"),
        F.minute("ts").alias("mi"),
        F.second("ts").alias("ss"),
        F.date_format("ts", "HH:mm:ss").alias("hhmmss"),
        ((time_ms + 90 * 60 * 1000) % 86400000)
        .cast("bigint")
        .alias("plus_90m_millis"),
        ((time_ms >= 9 * 3600000) & (time_ms < 17 * 3600000)).alias(
            "in_business_hours"
        ),
    )


# --------------------------------------------------------------------------
# nested ROW / ARRAY-of-ROW / MAP access chains
# --------------------------------------------------------------------------

_NESTED_ORACLE = """
SELECT n_nationkey,
       {'k': n_nationkey, 'inner': {'name': n_name, 'r': n_regionkey}}.inner.name AS deep_name,
       [{'a': n_nationkey}, {'a': n_regionkey}][2].a AS second_a,
       MAP(['x'], [[n_nationkey, n_regionkey]])['x'][1][2] AS map_arr_elem
FROM nation
"""


@register("types_nested_access", _NESTED_ORACLE, tags=("types", "collection"))
def types_nested_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load_table(spark, sf_dir, "nation")
    k, r = F.col("n_nationkey"), F.col("n_regionkey")
    deep = F.struct(
        k.alias("k"),
        F.struct(F.col("n_name").alias("name"), r.alias("r")).alias("inner"),
    )
    arr_of_row = F.array(F.struct(k.alias("a")), F.struct(r.alias("a")))
    map_arr = F.create_map(F.lit("x"), F.array(k, r))
    return nat.select(
        "n_nationkey",
        deep.getField("inner").getField("name").alias("deep_name"),
        arr_of_row.getItem(1).getField("a").alias("second_a"),
        map_arr.getItem("x").getItem(1).alias("map_arr_elem"),
    )
