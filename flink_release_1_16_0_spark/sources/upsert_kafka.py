"""upsert-kafka record composition — the value-format half, jar-free.

The reference's upsert-kafka connector (flink-connector-kafka/.../table/
UpsertKafkaDynamicTableFactory.java, serialization in
DynamicKafkaRecordSerializationSchema.java) encodes each changelog row
as a kafka record: the PRIMARY KEY columns through the key format, the
full row through the value format — and DELETE rows as **tombstones**
(key bytes, NULL value). On the source side a record with a NULL value
is a DELETE of its key; everything else is an upsert, normalized
downstream by ChangelogNormalize.

The kafka *transport* stays jar-gated in this environment
(sources/__init__.py probes for the DataSource); this module proves the
record composition itself over DataFrames of (key binary, value binary)
— the exact shape Spark's kafka reader/writer exchanges — for all three
structured value formats (json / avro / protobuf).

Scale shape: both directions are one narrow projection (JSON) or one
Arrow-batched pandas UDF (avro/protobuf) over the partition — no
shuffle, no state; composition with any transport preserves the
transport's partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from flink_release_1_16_0_spark.streaming.changelog import ROWKIND

_FORMATS = ("json", "csv", "avro", "protobuf")


def _encode(
    df: DataFrame,
    cols: Sequence[str],
    out_col: str,
    fmt: str,
    keep_cols: bool = False,
) -> DataFrame:
    """Encode ``cols`` into one binary ``out_col``. ``keep_cols=True``
    retains the source columns too (key encode happens before value
    encode, and the key columns are part of the value row)."""
    if fmt in ("json", "csv"):
        enc_col = F.to_json(F.struct(*cols)) if fmt == "json" else F.to_csv(
            F.struct(*cols)
        )
        keep = [c for c in df.columns if keep_cols or c not in cols]
        return df.select(*keep, enc_col.cast("binary").alias(out_col))
    if fmt == "avro":
        from flink_release_1_16_0_spark.sources.avro_format import (
            avro_encode_column,
        )

        enc = avro_encode_column
    elif fmt == "protobuf":
        from flink_release_1_16_0_spark.sources.protobuf_format import (
            protobuf_encode_column,
        )

        enc = protobuf_encode_column
    else:
        raise ValueError(
            f"unsupported upsert-kafka format {fmt!r} (use {_FORMATS})"
        )
    # keep_cols rides the codec itself so the encoded record's field
    # names stay the REAL column names on the wire
    return enc(df, cols=list(cols), out_col=out_col, keep_cols=keep_cols)


def _decode(df: DataFrame, col: str, schema: StructType, fmt: str) -> DataFrame:
    if fmt in ("json", "csv"):
        others = [c for c in df.columns if c != col]
        txt = F.col(col).cast("string")
        parsed = (
            F.from_json(txt, schema)
            if fmt == "json"
            else F.from_csv(txt, schema.simpleString())
        )
        dec = df.select(*others, parsed.alias("__j"))
        return dec.select(
            *others, *[F.col(f"__j.{f.name}") for f in schema.fields]
        )
    if fmt == "avro":
        from flink_release_1_16_0_spark.sources.avro_format import (
            avro_decode_column,
        )

        return avro_decode_column(df, col, schema)
    if fmt == "protobuf":
        from flink_release_1_16_0_spark.sources.protobuf_format import (
            protobuf_decode_column,
        )

        return protobuf_decode_column(df, col, schema)
    raise ValueError(f"unsupported upsert-kafka format {fmt!r} (use {_FORMATS})")


def changelog_to_upsert_kafka(
    df: DataFrame,
    key_cols: Sequence[str],
    fmt: str = "json",
    key_fmt: str | None = None,
) -> DataFrame:
    """Changelog rows -> (key binary, value binary) upsert-kafka
    records. ``-U`` rows are dropped (the planner hands upsert sinks
    ONLY_UPDATE_AFTER encoding — UpdateKindTrait.scala:65); ``-D`` rows
    become tombstones (NULL value, key bytes kept)."""
    if ROWKIND not in df.columns:
        raise ValueError(f"changelog input requires a {ROWKIND} column")
    df = df.filter(F.col(ROWKIND) != "-U")
    value_cols = [c for c in df.columns if c != ROWKIND]
    keyed = _encode(df, list(key_cols), "key", key_fmt or fmt, keep_cols=True)
    valued = _encode(keyed, value_cols, "__full_value", fmt)
    return valued.select(
        "key",
        F.when(F.col(ROWKIND) == "-D", F.lit(None).cast("binary"))
        .otherwise(F.col("__full_value"))
        .alias("value"),
    )


def upsert_kafka_to_changelog(
    df: DataFrame,
    key_schema: StructType,
    value_schema: StructType,
    fmt: str = "json",
    key_fmt: str | None = None,
) -> DataFrame:
    """(key binary, value binary) records -> changelog rows: NULL value
    = ``-D`` keyed by the key bytes (non-key columns NULL), anything
    else decodes through the value format as ``+U`` — the upsert stream
    ChangelogNormalize consumes (UpsertKafkaDynamicTableFactory's
    source side)."""
    key_names = {f.name for f in key_schema.fields}
    # transport metadata (offset/partition/timestamp — the columns the
    # reference exposes as kafka METADATA) passes through: downstream
    # ChangelogNormalize needs the ARRIVAL order, which lives in the
    # record metadata, not the decoded payload
    meta = [c for c in df.columns if c not in ("key", "value")]
    data = _decode(
        df.filter(F.col("value").isNotNull()).drop("key"),
        "value",
        value_schema,
        fmt,
    ).select(
        F.lit("+U").alias(ROWKIND),
        *meta,
        *[f.name for f in value_schema.fields],
    )
    tombs = _decode(
        df.filter(F.col("value").isNull()).drop("value"),
        "key",
        key_schema,
        key_fmt or fmt,
    ).select(
        F.lit("-D").alias(ROWKIND),
        *meta,
        *[
            F.col(f.name)
            if f.name in key_names
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in value_schema.fields
        ],
    )
    return data.unionByName(tombs)
