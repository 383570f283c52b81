"""Unit tests: CEP pattern matching, lookup join, multimodal plumbing,
and the streaming over-agg operator across micro-batches."""

from __future__ import annotations

import datetime as dt
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from flink_release_1_16_0_spark.operators.cep import (  # noqa: E402
    classify,
    match_fixed_pattern,
    match_regex_pattern,
)
from flink_release_1_16_0_spark.operators.lookup import lookup_join  # noqa: E402
from flink_release_1_16_0_spark.operators.multimodal import (  # noqa: E402
    extract_media_metadata,
    with_binary_payload,
)


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


@pytest.fixture(scope="module")
def actions(spark):
    rows = [
        # user 1: c c p  (one ccp match; c+p matches 'ccp')
        (1, 1, _ts(1), "click"),
        (1, 2, _ts(2), "click"),
        (1, 3, _ts(3), "purchase"),
        # user 2: c x c p (no ccp on consecutive rows; c+p matches 'cp')
        (2, 4, _ts(1), "click"),
        (2, 5, _ts(2), "view"),
        (2, 6, _ts(3), "click"),
        (2, 7, _ts(4), "purchase"),
        # user 3: p only (no matches)
        (3, 8, _ts(1), "purchase"),
    ]
    return spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, event_type string"
    )


def _sym():
    return classify(
        {"c": F.col("event_type") == "click", "p": F.col("event_type") == "purchase"}
    )


def test_fixed_pattern_consecutive_only(spark, actions):
    out = match_fixed_pattern(
        actions, ["user_id"], ["ts", "event_id"], _sym(), "ccp"
    ).collect()
    assert {(r["user_id"], r["event_id"]) for r in out} == {(1, 1)}


def test_regex_pattern_with_quantifier(spark, actions):
    out = match_regex_pattern(
        actions, ["user_id"], "ts", _sym(), "c+p", id_col="event_id"
    ).collect()
    got = {(r["user_id"], r["start_id"], r["end_id"]) for r in out}
    # user 1: clicks 1-2 then purchase 3; user 2: 'c-cp' -> match is c(6)p(7)
    assert got == {(1, 1, 3), (2, 6, 7)}


def test_regex_pattern_skips_past_last_row(spark):
    # ccpccp -> two non-overlapping matches
    rows = [(1, i, _ts(i), t) for i, t in enumerate(
        ["click", "click", "purchase", "click", "click", "purchase"], start=1)]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, event_type string"
    )
    out = match_regex_pattern(df, ["user_id"], "ts", _sym(), "c+p", id_col="event_id")
    assert out.count() == 2


def test_lookup_join_left_nulls(spark):
    fact = spark.createDataFrame([(1, 10), (2, 99)], "id bigint, k bigint")
    dim = spark.createDataFrame([(10, "a")], "dk bigint, v string")
    out = {r["id"]: r["v"] for r in lookup_join(fact, dim, on=[("k", "dk")]).collect()}
    assert out == {1: "a", 2: None}


def test_multimodal_metadata_deterministic(spark):
    docs = spark.createDataFrame([(1, "hello"), (2, "")], "doc_id bigint, text string")
    media = with_binary_payload(docs, "text", "doc_id")
    rows = {r["media_id"]: r for r in extract_media_metadata(media).collect()}
    assert rows[1]["byte_len"] == 5
    assert rows[1]["content_hash"] == "5d41402abc4b2a76b9719d911017c592"  # md5('hello')
    assert rows[2]["byte_len"] == 0
    assert rows[1]["fake_width"] == 5 % 640 + 16


def test_multimodal_real_decode_is_stubbed(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    media = with_binary_payload(docs, "text", "doc_id")
    with pytest.raises(Exception, match="NotImplementedError|not available"):
        extract_media_metadata(media, real_decode=True).collect()


def test_streaming_over_agg_multibatch(spark, sf_smoke, tmp_path_factory):
    """Running sums must be identical whether the log arrives in one
    batch or four (state carries the offsets)."""
    from flink_release_1_16_0_spark.catalog import load_table
    from flink_release_1_16_0_spark.streaming.core import run_to_table
    from flink_release_1_16_0_spark.streaming.stateful import (
        streaming_over_rows_unbounded,
    )

    path = str(tmp_path_factory.mktemp("over_chunks"))
    ev = load_table(spark, sf_smoke, "events").filter(F.col("user_id") % 10 == 1)
    sel = ev.select("user_id", "event_id", "ts", "value")
    # chunk by event-id quartile so batches respect time order per user
    m = sel.agg(F.max("event_id")).first()[0]
    sel.withColumn(
        "chunk", F.least(F.floor(F.col("event_id") / ((m + 1) / 4)), F.lit(3)).cast("int")
    ).repartition(1).write.partitionBy("chunk").mode("overwrite").parquet(path)

    stream = (
        spark.readStream.schema(sel.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )
    out = run_to_table(
        streaming_over_rows_unbounded(
            stream, ["user_id"], ["ts", "event_id"], "value", "event_id"
        ),
        "update",
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = sel.select(
        "user_id",
        "event_id",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("running_n"),
        (F.sum(F.round(F.col("value") * 100).cast("bigint")).over(w) / 100.0).alias(
            "running_sum"
        ),
    )
    got = {(r["user_id"], r["event_id"]): (r["running_n"], r["running_sum"]) for r in out.collect()}
    for r in want.collect():
        assert got[(r["user_id"], r["event_id"])] == (r["running_n"], r["running_sum"]), r
