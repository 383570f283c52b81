"""Streaming replay harness: bounded-log -> stream -> materialized table.

The reference validates streaming operators by replaying deterministic
event logs and asserting the final sink contents (the *ITCase pattern,
SURVEY.md section 5). Spark equivalent: `readStream` over the driver's
parquet fixtures, `trigger(availableNow=True)` to drain the log through
the micro-batch engine, a memory sink to materialize, then return the
sink table as a regular DataFrame. Complete/update/append mode is the
caller's choice per operator (complete for unbounded-window aggs so the
final state is fully emitted; append for stateless calc and
stream-stream joins whose matches emit within the batch).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_release_1_16_0_spark.catalog import load_table, normalize_event_ts

_SINK_COUNTER = itertools.count()


def replay_stream(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table as a file-source stream (bounded replay).

    Schema comes from the batch reader; the events table's TIMESTAMP
    (NANOS) column arrives as bigint under the nanosAsLong conf and is
    converted exactly like the batch path (catalog.load_table), so the
    streaming and batch plans see identical types.
    """
    if name == "events":
        # Same defensive runtime conf as catalog.load_table: the events
        # fixture stores TIMESTAMP(NANOS), unreadable without this flag.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # The file stream source requires a directory; pathGlobFilter pins it
    # to this table's file within the shared fixture dir.
    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", f"{name}.parquet")
        .parquet(sf_dir)
    )
    if name == "events":
        # Same three-way normalization as the batch path (bigint /
        # timestamp_ntz / timestamp) so streaming and batch plans see
        # identical types; withWatermark rejects TIMESTAMP_NTZ outright.
        stream = normalize_event_ts(stream)
    return stream


def run_to_table(
    stream_df: DataFrame,
    output_mode: str = "append",
    timeout_sec: int | None = None,
) -> DataFrame:
    """Drain a bounded stream through the micro-batch engine.

    Runs with availableNow (process everything, then stop) into a
    memory sink and returns the materialized table. The timeout
    defaults to 300 s, overridable with SPARK_GRAFT_STREAM_TIMEOUT —
    the sf3 density sweeps legitimately exceed 300 s on the heaviest
    stateful replays (a timed-out drain surfaces as an EMPTY sink, a
    false ROWS mismatch rather than a hang). The returned
    DataFrame is a normal batch relation over the sink contents.
    """
    if timeout_sec is None:
        import os

        timeout_sec = int(os.environ.get("SPARK_GRAFT_STREAM_TIMEOUT", "300"))
    sink = f"__stream_sink_{next(_SINK_COUNTER)}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(sink)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(timeout_sec)
        # awaitTermination(timeout) returns a bool and does NOT re-raise
        # stream failures — surface them so a failed replay never
        # masquerades as an empty sink table
        exc = q.exception()
        if exc is not None:
            raise exc
        if not finished:
            # a timed-out drain would otherwise read as a truncated (or
            # empty) result — fail loudly instead
            raise TimeoutError(
                f"stream drain exceeded {timeout_sec}s "
                "(raise SPARK_GRAFT_STREAM_TIMEOUT to extend)"
            )
    finally:
        if q.isActive:
            q.stop()
    spark = stream_df.sparkSession
    return spark.table(sink)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical watermarked event stream (ts = event time)."""
    return replay_stream(spark, sf_dir, "events").withWatermark("ts", "10 minutes")


def batch_dual(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """The batch view of the same table (stream-table duality oracle)."""
    return load_table(spark, sf_dir, name)
