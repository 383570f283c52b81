"""Event-time window aggregation coverage (SURVEY.md sections 2.4, 2.6).

Reference: group-window and TVF window aggs — TUMBLE / HOP / CUMULATE
slicing (RT/window/slicing/SliceAssigners.java:134 tumble, :192 hop,
:281 cumulate; SlicingWindowAggOperatorBuilder.java), SESSION with merge
(RT/window/assigners/SessionWindowAssigner.java:36,
AggregateWindowOperator.java), window join
(RT/join/window/WindowJoinOperator.java:66), window TopN / dedup
(RT/rank/window/WindowRankOperatorBuilder.java,
RT/deduplicate/window/RowTimeWindowDeduplicateOperatorBuilder.java).

These are the *batch* (insert-only) semantics of those operators over
the driver's `events` table — identical group definitions to the
streaming forms in `streaming_queries` (stream-table duality is the
correctness argument; SURVEY.md section 5). Spark natives used:
`window()`, `session_window()` (both usable in batch groupBy), and an
explode-based CUMULATE (Spark has no native cumulate; union of growing
slices per SliceAssigners.java:281 semantics).

Window starts are epoch-aligned in both engines (Spark `window()`
origin 1970-01-01 UTC with a UTC session; DuckDB oracle buckets via
epoch_us arithmetic + make_timestamp), so bounds are bit-comparable.
All sums run on events.value's 2-decimal grid via DECIMAL(38,2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_release_1_16_0_spark.catalog import load_table
from flink_release_1_16_0_spark.queries import register
from flink_release_1_16_0_spark.queries._util import dsum, sql_dsum

_US = 1_000_000

# --------------------------------------------------------------------------
# TUMBLE: 5-minute fixed windows per event_type
# --------------------------------------------------------------------------

_TUMBLE_ORACLE = f"""
SELECT
  make_timestamp((epoch_us(ts) // {5 * 60 * _US}) * {5 * 60 * _US}) AS win_start,
  event_type,
  COUNT(*) AS n,
  {sql_dsum('value')} AS total
FROM events
GROUP BY 1, 2
"""


@register("window_tumble", _TUMBLE_ORACLE, tags=("window", "time"), bench=True)
def window_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    # (spread_scan measured a net loss here: the events file is small
    # enough that the exchange costs more than the fused partial agg)
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "total")
    )


# --------------------------------------------------------------------------
# HOP (sliding): 15-minute windows sliding every 5 minutes — each event
# lands in size/slide = 3 windows (SliceAssigners.java:192)
# --------------------------------------------------------------------------

_HOP_ORACLE = f"""
SELECT
  make_timestamp((epoch_us(ts) // {5 * 60 * _US}) * {5 * 60 * _US} - i * {5 * 60 * _US})
    AS win_start,
  COUNT(*) AS n,
  {sql_dsum('value')} AS total
FROM events, generate_series(0, 2) AS g(i)
GROUP BY 1
"""


@register("window_hop", _HOP_ORACLE, tags=("window", "time"))
def window_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "15 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total"))
        .select(F.col("w.start").alias("win_start"), "n", "total")
    )


# --------------------------------------------------------------------------
# CUMULATE: 1-hour max window growing in 15-minute steps
# (SliceAssigners.java:281): an event at t belongs to every window
# [hour_start, hour_start + j*15min) whose end is after t.
# Spark has no native cumulate -> explode over the growing ends.
# --------------------------------------------------------------------------

_CUMULATE_ORACLE = f"""
SELECT
  make_timestamp((epoch_us(ts) // {3600 * _US}) * {3600 * _US}) AS win_start,
  make_timestamp((epoch_us(ts) // {3600 * _US}) * {3600 * _US} + j * {15 * 60 * _US})
    AS win_end,
  COUNT(*) AS n,
  {sql_dsum('value')} AS total
FROM events, generate_series(1, 4) AS g(j)
WHERE epoch_us(ts) < (epoch_us(ts) // {3600 * _US}) * {3600 * _US} + j * {15 * 60 * _US}
GROUP BY 1, 2
"""


@register("window_cumulate", _CUMULATE_ORACLE, tags=("window", "time"))
def window_cumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hour_start_us = (F.unix_micros("ts") / (3600 * _US)).cast("bigint") * (3600 * _US)
    with_slices = (
        ev.withColumn("win_start_us", hour_start_us)
        .withColumn("j", F.explode(F.array(*[F.lit(j).cast("bigint") for j in (1, 2, 3, 4)])))
        .withColumn("win_end_us", F.col("win_start_us") + F.col("j") * F.lit(15 * 60 * _US).cast("bigint"))
        .filter(F.unix_micros("ts") < F.col("win_end_us"))
    )
    return (
        with_slices.groupBy("win_start_us", "win_end_us")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total"))
        .select(
            F.timestamp_micros(F.col("win_start_us")).alias("win_start"),
            F.timestamp_micros(F.col("win_end_us")).alias("win_end"),
            "n",
            "total",
        )
    )


# --------------------------------------------------------------------------
# SESSION: per-user sessions with a 10-minute inactivity gap
# (SessionWindowAssigner.java:36 with merging). Oracle = gaps-and-islands.
# Spark session_window().end = last_ts + gap, mirrored in the oracle.
# --------------------------------------------------------------------------

_SESSION_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 10 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT *, SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 10 MINUTE AS session_end,
       COUNT(*) AS n,
       {sql_dsum('value')} AS total
FROM numbered
GROUP BY user_id, session_id
"""


@register("window_session", _SESSION_ORACLE, tags=("window", "time"))
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n",
            "total",
        )
    )


# --------------------------------------------------------------------------
# window join (WindowJoinOperator.java:66): clicks joined to purchases in
# the same 15-minute tumbling window for the same user
# --------------------------------------------------------------------------

_WJOIN_ORACLE = f"""
WITH b AS (
  SELECT *, make_timestamp((epoch_us(ts) // {15 * 60 * _US}) * {15 * 60 * _US}) AS win
  FROM events
)
SELECT c.win AS win_start, c.user_id,
       c.event_id AS click_id, p.event_id AS purchase_id
FROM (SELECT * FROM b WHERE event_type = 'click') c
JOIN (SELECT * FROM b WHERE event_type = 'purchase') p
  ON c.win = p.win AND c.user_id = p.user_id
"""


@register("window_join", _WJOIN_ORACLE, tags=("window", "join", "time"))
def window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "win", F.window("ts", "15 minutes")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("win"), "user_id", F.col("event_id").alias("click_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("win").alias("p_win"),
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
    )
    return (
        clicks.join(
            purchases,
            (F.col("win") == F.col("p_win")) & (F.col("user_id") == F.col("p_user_id")),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "user_id",
            "click_id",
            "purchase_id",
        )
    )


# --------------------------------------------------------------------------
# window TopN (WindowRankOperatorBuilder): top-2 events by value per
# 30-minute window and event_type
# --------------------------------------------------------------------------

_WTOPN_ORACLE = f"""
SELECT win_start, event_type, event_id, value, rn
FROM (
  SELECT make_timestamp((epoch_us(ts) // {30 * 60 * _US}) * {30 * 60 * _US}) AS win_start,
         event_type, event_id, value,
         ROW_NUMBER() OVER (
           PARTITION BY (epoch_us(ts) // {30 * 60 * _US}), event_type
           ORDER BY value DESC, event_id) AS rn
  FROM events
)
WHERE rn <= 2
"""


@register("window_topn", _WTOPN_ORACLE, tags=("window", "rank", "time"))
def window_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").withColumn(
        "win_start", F.window("ts", "30 minutes").getField("start")
    )
    w = W.partitionBy("win_start", "event_type").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    return (
        ev.select(
            "win_start", "event_type", "event_id", "value",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 2)
    )


# --------------------------------------------------------------------------
# window dedup (RowTimeWindowDeduplicateOperatorBuilder): first event per
# (user, 1-hour window)
# --------------------------------------------------------------------------

_WDEDUP_ORACLE = f"""
SELECT win_start, user_id, event_id, ts
FROM (
  SELECT make_timestamp((epoch_us(ts) // {3600 * _US}) * {3600 * _US}) AS win_start,
         user_id, event_id, ts,
         ROW_NUMBER() OVER (
           PARTITION BY (epoch_us(ts) // {3600 * _US}), user_id
           ORDER BY ts, event_id) AS rn
  FROM events
)
WHERE rn = 1
"""


@register("window_dedup", _WDEDUP_ORACLE, tags=("window", "dedup", "time"))
def window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").withColumn(
        "win_start", F.window("ts", "1 hour").getField("start")
    )
    w = W.partitionBy("win_start", "user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        ev.select("win_start", "user_id", "event_id", "ts", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# --------------------------------------------------------------------------
# TUMBLE with an alignment offset (Flink TUMBLE(ts, size, offset) /
# TumblingWindowAssigner.withOffset) — windows align to epoch+offset,
# Spark's window(ts, size, size, startTime). Oracle shifts the epoch
# before bucketing and shifts back.
# --------------------------------------------------------------------------

_OFFSET_US = 7 * 60 * _US  # 7-minute alignment offset

_TUMBLE_OFFSET_ORACLE = f"""
SELECT
  make_timestamp(((epoch_us(ts) - {_OFFSET_US}) // {15 * 60 * _US})
                 * {15 * 60 * _US} + {_OFFSET_US}) AS win_start,
  COUNT(*) AS n,
  {sql_dsum('value')} AS total
FROM events
GROUP BY 1
"""


@register("window_tumble_offset", _TUMBLE_OFFSET_ORACLE, tags=("window", "time"))
def window_tumble_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "15 minutes", "15 minutes", "7 minutes").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total"))
        .select(F.col("w.start").alias("win_start"), "n", "total")
    )


# --------------------------------------------------------------------------
# Count windows (CountTumblingWindowAssigner / CountSlidingWindowAssigner,
# RT/window/assigners — the row-count duals of the time windows).
# Tumbling: consecutive groups of N rows per key in (ts, id) order.
# Sliding: a window of the trailing N rows fires every S rows.
# Both lower to rank arithmetic / window frames — pure Catalyst.
# --------------------------------------------------------------------------

_COUNT_TUMBLE_ORACLE = f"""
WITH seq AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id, CAST((rn - 1) // 10 AS BIGINT) AS win_id,
       CAST(COUNT(*) AS BIGINT) AS n, {sql_dsum('value')} AS total
FROM seq
GROUP BY user_id, (rn - 1) // 10
"""


@register("window_count_tumble", _COUNT_TUMBLE_ORACLE, tags=("window", "count"))
def window_count_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "value", F.row_number().over(w).alias("rn")
    ).withColumn("win_id", ((F.col("rn") - 1) / 10).cast("bigint"))
    return seq.groupBy("user_id", "win_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"), dsum("value").alias("total")
    )


_COUNT_SLIDE_ORACLE = """
WITH seq AS (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER w AS rn,
         CAST(COUNT(*) OVER (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
              AS BIGINT) AS trailing_n,
         CAST(SUM(CAST(value AS DECIMAL(38,2)))
                OVER (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
              AS DOUBLE) AS trailing_total
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id AS fire_id, trailing_n, trailing_total
FROM seq WHERE rn % 5 = 0
"""


@register("window_count_slide", _COUNT_SLIDE_ORACLE, tags=("window", "count"))
def window_count_slide(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(-19, 0)
    seq = ev.select(
        "user_id",
        "event_id",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wf).cast("bigint").alias("trailing_n"),
        F.sum(F.col("value").cast("decimal(38,2)"))
        .over(wf)
        .cast("double")
        .alias("trailing_total"),
    )
    return seq.filter(F.col("rn") % 5 == 0).select(
        "user_id", F.col("event_id").alias("fire_id"), "trailing_n", "trailing_total"
    )
