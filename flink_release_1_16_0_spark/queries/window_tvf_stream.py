"""Streaming window-TVF aggregate queries (slice-shared operator).

End-to-end Structured Streaming runs of
:func:`flink_release_1_16_0_spark.streaming.window_tvf.streaming_window_tvf_agg`
— the reference's StreamExecWindowAggregate over SliceAssigners.java
(tumble offset / hop slicing / cumulate shared-slice merge), semantics
pinned row-exactly against WindowAggregateITCase.scala in
tests/test_window_agg_itcase.py.

Replay convention: one data batch (watermark 0 — nothing fires, no
late rows), then the availableNow timeout batch fires every window
whose end passed the final watermark (max ts - 10 min) at the
isWindowFired boundary wm >= end - 1. The DuckDB oracles therefore
gate on ``HAVING win_end_ms - 1 <= wm_ms`` — the exact firing set.

SUM over doubles crosses the engines as exact decimal on the events
grid (value: 4 decimals — see queries/_util.py): the operator
accumulates Decimal and emits its string; the query rescales to an
e4-integer BIGINT, the oracle sums DECIMAL(38,4) to the same integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType

from flink_release_1_16_0_spark.queries import register
from flink_release_1_16_0_spark.streaming.core import replay_stream, run_to_table
from flink_release_1_16_0_spark.streaming.window_tvf import streaming_window_tvf_agg

_H = 3600 * 1000  # one hour in ms

_WM = "SELECT (epoch_us(MAX(ts)) // 1000) - 600000 AS wm_ms FROM events"


def _stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        replay_stream(spark, sf_dir, "events")
        .withWatermark("ts", "10 minutes")
        .select("ts", "event_type", "value", "user_id")
    )


_AGGS = [
    ("n", "count_star", None, LongType()),
    ("sum_s", "sum", "value", StringType()),
    ("max_v", "max", "value", DoubleType()),
    ("du", "count_distinct", "user_id", LongType()),
]


def _project(res: DataFrame) -> DataFrame:
    return res.select(
        "event_type",
        F.col("window_start").alias("win_start"),
        F.col("window_end").alias("win_end"),
        "n",
        (F.col("sum_s").cast("decimal(38,4)") * 10000)
        .cast("bigint")
        .alias("total_e4"),
        "max_v",
        "du",
    )


_SQL_AGGS = """
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(value AS DECIMAL(38,4))) * 10000 AS BIGINT) AS total_e4,
  MAX(value) AS max_v,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS du
"""

# --------------------------------------------------------------------------
# HOP via slice sharing (size 6h, slide 3h: two windows per row, state
# one accumulator per 3h slice — SliceAssigners.HoppingSliceAssigner)
# --------------------------------------------------------------------------

_HOP_ORACLE = f"""
WITH wm AS ({_WM}),
w AS (
  SELECT event_type, user_id, value,
         ((epoch_us(ts) // 1000) // {3 * _H}) * {3 * _H} - k.k * {3 * _H} AS ws_ms
  FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS k) k
)
SELECT event_type,
  make_timestamp(ws_ms * 1000) AS win_start,
  make_timestamp((ws_ms + {6 * _H}) * 1000) AS win_end,
  {_SQL_AGGS}
FROM w, wm
GROUP BY event_type, ws_ms, wm_ms
HAVING ws_ms + {6 * _H} - 1 <= wm_ms
"""


@register(
    "stream_window_tvf_hop",
    _HOP_ORACLE,
    tags=("streaming", "window", "tvf", "time"),
    bench=True,
)
def stream_window_tvf_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = streaming_window_tvf_agg(
        _stream(spark, sf_dir),
        keys=["event_type"],
        ts_col="ts",
        aggs=_AGGS,
        kind="hop",
        size_ms=6 * _H,
        slide_ms=3 * _H,
    )
    return _project(run_to_table(out, "append"))


# --------------------------------------------------------------------------
# CUMULATE (step 2h, max 6h: growing windows share the first slice's
# accumulator — SliceAssigners.CumulativeSliceAssigner.mergeSlices)
# --------------------------------------------------------------------------

_CUMULATE_ORACLE = f"""
WITH wm AS ({_WM}),
w AS (
  SELECT event_type, user_id, value,
         ((epoch_us(ts) // 1000) // {6 * _H}) * {6 * _H} AS ws_ms,
         ((epoch_us(ts) // 1000) // {6 * _H}) * {6 * _H} + k.k * {2 * _H} AS we_ms,
         (epoch_us(ts) // 1000) AS ts_ms
  FROM events CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS k) k
)
SELECT event_type,
  make_timestamp(ws_ms * 1000) AS win_start,
  make_timestamp(we_ms * 1000) AS win_end,
  {_SQL_AGGS}
FROM w, wm
WHERE ts_ms < we_ms
GROUP BY event_type, ws_ms, we_ms, wm_ms
HAVING we_ms - 1 <= wm_ms
"""


@register(
    "stream_window_tvf_cumulate",
    _CUMULATE_ORACLE,
    tags=("streaming", "window", "tvf", "time"),
)
def stream_window_tvf_cumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = streaming_window_tvf_agg(
        _stream(spark, sf_dir),
        keys=["event_type"],
        ts_col="ts",
        aggs=_AGGS,
        kind="cumulate",
        size_ms=6 * _H,
        step_ms=2 * _H,
    )
    return _project(run_to_table(out, "append"))


# --------------------------------------------------------------------------
# TUMBLE with OFFSET (size 4h, offset 90min —
# TimeWindow.getWindowStartWithOffset; Spark's native window() has an
# offset arg but not the isWindowFired boundary or this firing set)
# --------------------------------------------------------------------------

_OFF = 90 * 60 * 1000

_TUMBLE_OFFSET_ORACLE = f"""
WITH wm AS ({_WM}),
w AS (
  SELECT event_type, user_id, value,
         (((epoch_us(ts) // 1000) - {_OFF}) // {4 * _H}) * {4 * _H} + {_OFF} AS ws_ms
  FROM events
)
SELECT event_type,
  make_timestamp(ws_ms * 1000) AS win_start,
  make_timestamp((ws_ms + {4 * _H}) * 1000) AS win_end,
  {_SQL_AGGS}
FROM w, wm
GROUP BY event_type, ws_ms, wm_ms
HAVING ws_ms + {4 * _H} - 1 <= wm_ms
"""


@register(
    "stream_window_tvf_tumble_offset",
    _TUMBLE_OFFSET_ORACLE,
    tags=("streaming", "window", "tvf", "time"),
)
def stream_window_tvf_tumble_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = streaming_window_tvf_agg(
        _stream(spark, sf_dir),
        keys=["event_type"],
        ts_col="ts",
        aggs=_AGGS,
        kind="tumble",
        size_ms=4 * _H,
        offset_ms=_OFF,
    )
    return _project(run_to_table(out, "append"))


# --------------------------------------------------------------------------
# Window TopN (StreamExecWindowRank / WindowRankOperatorBuilder): top 2
# rows per (hop window, event_type) by value, ties by event_id —
# conformance pinned in tests/test_window_rank_itcase.py
# --------------------------------------------------------------------------

_WTOPN_ORACLE = f"""
WITH wm AS ({_WM}),
w AS (
  SELECT event_id, event_type, value,
         ((epoch_us(ts) // 1000) // {3 * _H}) * {3 * _H} - k.k * {3 * _H} AS ws_ms
  FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS k) k
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY event_type, ws_ms ORDER BY value DESC, event_id) AS rn
  FROM w
)
SELECT event_type,
  make_timestamp(ws_ms * 1000) AS win_start,
  make_timestamp((ws_ms + {6 * _H}) * 1000) AS win_end,
  event_id, value, CAST(rn AS BIGINT) AS rownum
FROM r, wm
WHERE rn <= 2 AND ws_ms + {6 * _H} - 1 <= wm_ms
"""


@register(
    "stream_window_tvf_topn",
    _WTOPN_ORACLE,
    tags=("streaming", "window", "tvf", "rank"),
)
def stream_window_tvf_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_release_1_16_0_spark.streaming.window_tvf import (
        streaming_window_tvf_topn,
    )

    ev = (
        replay_stream(spark, sf_dir, "events")
        .withWatermark("ts", "10 minutes")
        .select("ts", "event_type", "value", "event_id")
    )
    out = streaming_window_tvf_topn(
        ev,
        keys=["event_type"],
        ts_col="ts",
        order=[("value", True), ("event_id", False)],
        rank_end=2,
        kind="hop",
        size_ms=6 * _H,
        slide_ms=3 * _H,
        emit_rownum=True,
    )
    return run_to_table(out, "append").select(
        "event_type",
        F.col("window_start").alias("win_start"),
        F.col("window_end").alias("win_end"),
        "event_id",
        "value",
        "rownum",
    )


# --------------------------------------------------------------------------
# Window deduplicate keep-last (StreamExecWindowDeduplicate) over
# tumbling 4h windows per event_type; rank_end=1 ordered by (ts,
# event_id) DESC — the operator sorts the raw full-precision ts (only
# window ASSIGNMENT floors to ms), so the oracle orders on raw ts
# --------------------------------------------------------------------------

_WDEDUP_ORACLE = f"""
WITH wm AS ({_WM}),
w AS (
  SELECT event_id, event_type, ts,
         ((epoch_us(ts) // 1000) // {4 * _H}) * {4 * _H} AS ws_ms
  FROM events
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY event_type, ws_ms ORDER BY ts DESC, event_id DESC) AS rn
  FROM w
)
SELECT event_type,
  make_timestamp(ws_ms * 1000) AS win_start,
  make_timestamp((ws_ms + {4 * _H}) * 1000) AS win_end,
  event_id
FROM r, wm
WHERE rn = 1 AND ws_ms + {4 * _H} - 1 <= wm_ms
"""


@register(
    "stream_window_tvf_dedup_last",
    _WDEDUP_ORACLE,
    tags=("streaming", "window", "tvf", "dedup"),
)
def stream_window_tvf_dedup_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_release_1_16_0_spark.streaming.window_tvf import (
        streaming_window_tvf_topn,
    )

    ev = (
        replay_stream(spark, sf_dir, "events")
        .withWatermark("ts", "10 minutes")
        .select("ts", "event_type", "event_id")
    )
    out = streaming_window_tvf_topn(
        ev,
        keys=["event_type"],
        ts_col="ts",
        order=[("ts", True), ("event_id", True)],
        rank_end=1,
        kind="tumble",
        size_ms=4 * _H,
    )
    return run_to_table(out, "append").select(
        "event_type",
        F.col("window_start").alias("win_start"),
        F.col("window_end").alias("win_end"),
        "event_id",
    )


# --------------------------------------------------------------------------
# Window join (StreamExecWindowJoin / WindowJoinOperator): left-outer
# join of the even- and odd-event_id halves of the stream per (4h
# tumble window, event_type, user_id) — both sides buffer per window,
# one append emission at the isWindowFired boundary; null-padding for
# windows where a user has only even events. Conformance (full
# inner/left/right/full/semi/anti + null-safe + NOT IN matrix) pinned
# in tests/test_window_join_itcase.py.
# --------------------------------------------------------------------------

_WJOIN_ORACLE = f"""
WITH wm AS ({_WM}),
l AS (
  SELECT event_type, user_id, event_id AS lid, value AS lval,
         ((epoch_us(ts) // 1000) // {4 * _H}) * {4 * _H} AS ws_ms
  FROM events WHERE event_id % 2 = 0
),
r AS (
  SELECT event_type, user_id, event_id AS rid, value AS rval,
         ((epoch_us(ts) // 1000) // {4 * _H}) * {4 * _H} AS ws_ms
  FROM events WHERE event_id % 2 = 1
)
SELECT l.event_type, l.user_id,
  make_timestamp(l.ws_ms * 1000) AS win_start,
  make_timestamp((l.ws_ms + {4 * _H}) * 1000) AS win_end,
  lid, lval, rid, rval
FROM l LEFT JOIN r
  ON l.event_type = r.event_type AND l.user_id = r.user_id
 AND l.ws_ms = r.ws_ms, wm
WHERE l.ws_ms + {4 * _H} - 1 <= wm_ms
"""


@register(
    "stream_window_tvf_join",
    _WJOIN_ORACLE,
    tags=("streaming", "window", "tvf", "join"),
)
def stream_window_tvf_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_release_1_16_0_spark.streaming.window_tvf import (
        streaming_window_tvf_join,
    )

    ev = replay_stream(spark, sf_dir, "events").withWatermark("ts", "10 minutes")
    left = ev.filter(F.col("event_id") % 2 == 0).select(
        "ts",
        "event_type",
        "user_id",
        F.col("event_id").alias("lid"),
        F.col("value").alias("lval"),
    )
    right = ev.filter(F.col("event_id") % 2 == 1).select(
        "ts",
        "event_type",
        "user_id",
        F.col("event_id").alias("rid"),
        F.col("value").alias("rval"),
    )
    out = streaming_window_tvf_join(
        left,
        right,
        keys=["event_type", "user_id"],
        ts_col="ts",
        join_type="left",
        kind="tumble",
        size_ms=4 * _H,
    )
    return run_to_table(out, "append").select(
        "event_type",
        "user_id",
        F.col("window_start").alias("win_start"),
        F.col("window_end").alias("win_end"),
        "lid",
        "lval",
        "rid",
        "rval",
    )


# --------------------------------------------------------------------------
# SESSION group window with merging (SessionWindowAssigner +
# MergingWindowSet): 30-min-gap user sessions; out-of-order rows merge
# overlapping sessions, touching sessions stay apart. Conformance
# (merge bridging, SESSION_START/END/ROWTIME, distinct-agg merge)
# pinned in tests/test_group_window_itcase.py.
# --------------------------------------------------------------------------

_GAP = 30 * 60 * 1000

_SESSION_ORACLE = f"""
WITH wm AS ({_WM}),
b AS (
  SELECT user_id, value, (epoch_us(ts) // 1000) AS ts_ms FROM events
),
s AS (
  SELECT *, CASE WHEN ts_ms - LAG(ts_ms) OVER w >= {_GAP}
                   OR LAG(ts_ms) OVER w IS NULL THEN 1 ELSE 0 END AS ns
  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms)
),
g AS (
  SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts_ms
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM s
)
SELECT user_id,
  make_timestamp(MIN(ts_ms) * 1000) AS win_start,
  make_timestamp((MAX(ts_ms) + {_GAP}) * 1000) AS win_end,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(value AS DECIMAL(38,4))) * 10000 AS BIGINT) AS total_e4
FROM g, wm
GROUP BY user_id, sid, wm_ms
HAVING MAX(ts_ms) + {_GAP} - 1 <= wm_ms
"""


@register(
    "stream_session_window_merge",
    _SESSION_ORACLE,
    tags=("streaming", "window", "session", "time"),
)
def stream_session_window_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_release_1_16_0_spark.streaming.group_window import (
        streaming_group_window_agg,
    )
    from pyspark.sql.types import LongType, StringType

    ev = (
        replay_stream(spark, sf_dir, "events")
        .withWatermark("ts", "10 minutes")
        .select("ts", "user_id", "value")
    )
    out = streaming_group_window_agg(
        ev,
        keys=["user_id"],
        ts_col="ts",
        aggs=[
            ("n", "count_star", None, LongType()),
            ("sum_s", "sum", "value", StringType()),
        ],
        kind="session",
        gap_ms=_GAP,
    )
    return run_to_table(out, "update").select(
        "user_id",
        F.col("window_start").alias("win_start"),
        F.col("window_end").alias("win_end"),
        "n",
        (F.col("sum_s").cast("decimal(38,4)") * 10000)
        .cast("bigint")
        .alias("total_e4"),
    )


# --------------------------------------------------------------------------
# SLIDING group window with a slide that does NOT divide the size
# (5h size / 2h slide — SlidingWindowAssigner walks window starts, no
# slicing possible): rows near a 2h boundary fall in 3 windows, the
# rest in 2.
# --------------------------------------------------------------------------

_SLIDING_ORACLE = f"""
WITH wm AS ({_WM}),
w AS (
  SELECT event_type, value,
         ((epoch_us(ts) // 1000) // {2 * _H}) * {2 * _H} - k.k * {2 * _H} AS ws_ms,
         (epoch_us(ts) // 1000) AS ts_ms
  FROM events CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS k) k
)
SELECT event_type,
  make_timestamp(ws_ms * 1000) AS win_start,
  make_timestamp((ws_ms + {5 * _H}) * 1000) AS win_end,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(value AS DECIMAL(38,4))) * 10000 AS BIGINT) AS total_e4
FROM w, wm
WHERE ws_ms > ts_ms - {5 * _H}
GROUP BY event_type, ws_ms, wm_ms
HAVING ws_ms + {5 * _H} - 1 <= wm_ms
"""


@register(
    "stream_sliding_window_any_slide",
    _SLIDING_ORACLE,
    tags=("streaming", "window", "time"),
)
def stream_sliding_window_any_slide(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_release_1_16_0_spark.streaming.group_window import (
        streaming_group_window_agg,
    )
    from pyspark.sql.types import LongType, StringType

    ev = (
        replay_stream(spark, sf_dir, "events")
        .withWatermark("ts", "10 minutes")
        .select("ts", "event_type", "value")
    )
    out = streaming_group_window_agg(
        ev,
        keys=["event_type"],
        ts_col="ts",
        aggs=[
            ("n", "count_star", None, LongType()),
            ("sum_s", "sum", "value", StringType()),
        ],
        kind="sliding",
        size_ms=5 * _H,
        slide_ms=2 * _H,
    )
    return run_to_table(out, "update").select(
        "event_type",
        F.col("window_start").alias("win_start"),
        F.col("window_end").alias("win_end"),
        "n",
        (F.col("sum_s").cast("decimal(38,4)") * 10000)
        .cast("bigint")
        .alias("total_e4"),
    )


# --------------------------------------------------------------------------
# Generalized retracting multi-agg (GroupAggFunction + the WithRetract
# accumulator family): distinct aggregates over the stream — the
# changelog-input path (retraction netting, LISTAGG retract ordering)
# is pinned in tests/test_aggregate_itcase.py.
# --------------------------------------------------------------------------

_MULTI_AGG_ORACLE = """
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS cd,
  CAST(SUM(DISTINCT user_id) AS BIGINT) AS sd,
  CAST(SUM(DISTINCT user_id) // COUNT(DISTINCT user_id) AS BIGINT) AS ad,
  CAST(MAX(user_id) AS BIGINT) AS mx,
  CAST(MIN(user_id) AS BIGINT) AS mn
FROM events
GROUP BY event_type
"""


@register(
    "stream_multi_agg_distinct",
    _MULTI_AGG_ORACLE,
    tags=("streaming", "agg", "distinct"),
)
def stream_multi_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_release_1_16_0_spark.streaming.retract_agg import (
        streaming_retracting_multi_agg,
    )
    from pyspark.sql.types import LongType

    ev = replay_stream(spark, sf_dir, "events").select("event_type", "user_id")
    out = streaming_retracting_multi_agg(
        ev,
        keys=["event_type"],
        aggs=[
            ("n", "count_star", None, LongType()),
            ("cd", "count_distinct", "user_id", LongType()),
            ("sd", "sum_distinct_int", "user_id", LongType()),
            ("ad", "avg_distinct_int", "user_id", LongType()),
            ("mx", "max", "user_id", LongType()),
            ("mn", "min", "user_id", LongType()),
        ],
    )
    res = run_to_table(out, "update")
    # TestingRetractSink materialization: net each emitted row (+I/+U
    # add, -U/-D remove) and keep rows with net > 0 — correct even if
    # the replay splits into multiple micro-batches (a key's earlier +I
    # is netted out by the -U that precedes its later +U).
    vals = ["n", "cd", "sd", "ad", "mx", "mn"]
    sign = F.when(
        F.col("__rowkind").isin("+I", "+U"), F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        res.withColumn("__sign", sign)
        .groupBy("event_type", *vals)
        .agg(F.sum("__sign").alias("__net"))
        .filter(F.col("__net") > 0)
        .select("event_type", *vals)
    )


# --------------------------------------------------------------------------
# Split distinct aggregate at window scale (the reference's
# TABLE_OPTIMIZER_DISTINCT_AGG_SPLIT_ENABLED plan, conformance-pinned
# in tests/test_window_distinct_agg_itcase.py): shard the distinct key
# into hash buckets, window-aggregate per (key, bucket) — each group's
# state holds only its shard of the distinct set, the hot-key fix —
# then sum the disjoint partial COUNT(DISTINCT)s per (key, window).
# All shards of a window co-fire at the same watermark, so the final
# agg is a stateless per-micro-batch shuffle-agg (here the batch fold
# over the bounded replay's append-only stage-1 output).
# --------------------------------------------------------------------------

_SPLIT_DISTINCT_ORACLE = f"""
WITH wm AS ({_WM}),
w AS (
  SELECT event_type, user_id,
         ((epoch_us(ts) // 1000) // {3 * _H}) * {3 * _H} AS ws_ms
  FROM events
)
SELECT event_type,
  make_timestamp(ws_ms * 1000) AS win_start,
  make_timestamp((ws_ms + {3 * _H}) * 1000) AS win_end,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS du
FROM w, wm
GROUP BY event_type, ws_ms, wm_ms
HAVING ws_ms + {3 * _H} - 1 <= wm_ms
"""


@register(
    "stream_window_distinct_split_agg",
    _SPLIT_DISTINCT_ORACLE,
    tags=("streaming", "window", "tvf", "distinct"),
)
def stream_window_distinct_split_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        replay_stream(spark, sf_dir, "events")
        .withWatermark("ts", "10 minutes")
        .select(
            "ts",
            "event_type",
            "user_id",
            F.pmod(F.xxhash64("user_id"), F.lit(8)).alias("__b"),
        )
    )
    partial = streaming_window_tvf_agg(
        ev,
        keys=["event_type", "__b"],
        ts_col="ts",
        aggs=[
            ("pn", "count_star", None, LongType()),
            ("pdu", "count_distinct", "user_id", LongType()),
        ],
        kind="tumble",
        size_ms=3 * _H,
    )
    res = run_to_table(partial, "append")
    return (
        res.groupBy("event_type", "window_start", "window_end")
        .agg(F.sum("pn").alias("n"), F.sum("pdu").alias("du"))
        .select(
            "event_type",
            F.col("window_start").alias("win_start"),
            F.col("window_end").alias("win_end"),
            "n",
            "du",
        )
    )
