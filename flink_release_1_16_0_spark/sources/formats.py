"""Changelog-decoding formats (SURVEY.md section 2.1 formats row).

The reference pairs connectors with DecodingFormats; the changelog-
producing one that matters semantically is **debezium-json**
(flink-formats/flink-json/.../debezium/DebeziumJsonDecodingFormat.java):
each message carries a CDC envelope

    {"before": {...}|null, "after": {...}|null, "op": "c|r|u|d"}

and decodes to RowKind-tagged rows (RowKind.java:31-52):

    op c (create) / r (snapshot read) -> +I(after)
    op u (update)                     -> -U(before), +U(after)
    op d (delete)                     -> -D(before)

Here the decode is a pure Catalyst projection: one from_json of the
envelope, a 1-or-2 element array per message, one explode — no Python,
no shuffle; it scales as a map-side transform at any corpus size. The
result carries the engine's ``__rowkind`` column and feeds the
changelog algebra (streaming/changelog.py) directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_release_1_16_0_spark.streaming.changelog import (
    DELETE,
    INSERT,
    ROWKIND,
    UPDATE_AFTER,
    UPDATE_BEFORE,
)




def _schema_field_names(row_schema: str) -> list[str]:
    """Leading identifiers of a DDL struct body, honoring nested <> and
    () so parameterized types (DECIMAL(15,2), MAP<...>) don't split."""
    fields, depth, cur = [], 0, []
    for ch in row_schema:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            fields.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        fields.append("".join(cur))
    return [f.strip().split(None, 1)[0] for f in fields if f.strip()]


def debezium_json_to_changelog(
    df: DataFrame, value_col: str, row_schema: str
) -> DataFrame:
    """Decode a column of Debezium JSON envelopes into a changelog.

    ``row_schema`` is the payload row type as a Spark DDL struct body
    (e.g. ``"k BIGINT, v STRING"``). Output: payload columns +
    ``__rowkind``. Messages with an op the reference doesn't map (or
    null payload for their op) are dropped, matching the tolerant mode.
    """
    envelope = f"before STRUCT<{row_schema}>, after STRUCT<{row_schema}>, op STRING"
    parsed = df.select(F.from_json(F.col(value_col), envelope).alias("__env"))
    before, after, op = (
        F.col("__env.before"),
        F.col("__env.after"),
        F.col("__env.op"),
    )

    def tagged(kind: str, row):
        return F.struct(F.lit(kind).alias("kind"), row.alias("row"))

    pieces = (
        F.when(op == "u", F.array(tagged(UPDATE_BEFORE, before), tagged(UPDATE_AFTER, after)))
        .when(op == "d", F.array(tagged(DELETE, before)))
        .when(op.isin("c", "r"), F.array(tagged(INSERT, after)))
        .otherwise(F.array())
    )
    exploded = parsed.select(F.explode(pieces).alias("__p")).filter(
        F.col("__p.row").isNotNull()
    )
    return exploded.select(
        F.col("__p.kind").alias(ROWKIND), F.col("__p.row.*")
    )


def canal_json_to_changelog(
    df: DataFrame, value_col: str, row_schema: str
) -> DataFrame:
    """Decode Canal JSON batches into a changelog
    (flink-formats/flink-json/.../canal/CanalJsonDeserializationSchema.java).

    Envelope: ``{"data": [{...}, ...], "old": [{...}, ...]|null,
    "type": "INSERT|UPDATE|DELETE"}``. Mapping per element i:

        INSERT -> +I data[i]
        DELETE -> -D data[i]
        UPDATE -> -U patch(data[i], old[i]), +U data[i]

    where ``old[i]`` carries only the changed fields; the before-row is
    reconstructed by overlaying them on ``data[i]`` (field-null in old =
    unchanged — the same ambiguity the reference's decoder has between
    "missing" and "explicitly null").
    """
    fields = _schema_field_names(row_schema)
    envelope = (
        f"data ARRAY<STRUCT<{row_schema}>>, old ARRAY<STRUCT<{row_schema}>>,"
        " type STRING"
    )
    parsed = df.select(F.from_json(F.col(value_col), envelope).alias("__env"))
    data, old, typ = (
        F.col("__env.data"),
        F.col("__env.old"),
        F.col("__env.type"),
    )

    def tag(kind: str, row):
        return F.struct(F.lit(kind).alias("kind"), row.alias("row"))

    def patched(d, o):
        return F.struct(
            *[F.coalesce(o[f], d[f]).alias(f) for f in fields]
        )

    insert_rows = F.transform(data, lambda d: tag(INSERT, d))
    delete_rows = F.transform(data, lambda d: tag(DELETE, d))
    update_rows = F.flatten(
        F.zip_with(
            data,
            old,
            lambda d, o: F.array(tag(UPDATE_BEFORE, patched(d, o)), tag(UPDATE_AFTER, d)),
        )
    )
    pieces = (
        F.when(typ == "INSERT", insert_rows)
        .when(typ == "DELETE", delete_rows)
        .when(typ == "UPDATE", update_rows)
        .otherwise(F.array())
    )
    exploded = parsed.select(F.explode(pieces).alias("__p")).filter(
        F.col("__p.row").isNotNull()
    )
    return exploded.select(F.col("__p.kind").alias(ROWKIND), F.col("__p.row.*"))


def maxwell_json_to_changelog(
    df: DataFrame, value_col: str, row_schema: str
) -> DataFrame:
    """Decode Maxwell JSON events into a changelog
    (flink-formats/flink-json/.../maxwell/MaxwellJsonDeserializationSchema.java).

    Envelope: ``{"data": {...}, "old": {...}|null,
    "type": "insert|update|delete"}``. Mapping:

        insert -> +I data
        delete -> -D data
        update -> -U patch(data, old), +U data

    ``old`` carries only the changed fields (same overlay reconstruction
    as canal-json, same missing-vs-null ambiguity as the reference).
    """
    fields = _schema_field_names(row_schema)
    envelope = (
        f"data STRUCT<{row_schema}>, old STRUCT<{row_schema}>, type STRING"
    )
    parsed = df.select(F.from_json(F.col(value_col), envelope).alias("__env"))
    data, old, typ = (
        F.col("__env.data"),
        F.col("__env.old"),
        F.col("__env.type"),
    )

    def tag(kind: str, row):
        return F.struct(F.lit(kind).alias("kind"), row.alias("row"))

    before = F.struct(*[F.coalesce(old[f], data[f]).alias(f) for f in fields])
    pieces = (
        F.when(typ == "insert", F.array(tag(INSERT, data)))
        .when(typ == "delete", F.array(tag(DELETE, data)))
        .when(typ == "update", F.array(tag(UPDATE_BEFORE, before), tag(UPDATE_AFTER, data)))
        .otherwise(F.array())
    )
    exploded = parsed.select(F.explode(pieces).alias("__p")).filter(
        F.col("__p.row").isNotNull()
    )
    return exploded.select(F.col("__p.kind").alias(ROWKIND), F.col("__p.row.*"))


def ogg_json_to_changelog(
    df: DataFrame, value_col: str, row_schema: str
) -> DataFrame:
    """Decode Oracle GoldenGate JSON events into a changelog
    (flink-formats/flink-json/.../ogg/OggJsonDeserializationSchema.java).

    Envelope: ``{"before": {...}|null, "after": {...}|null,
    "op_type": "I|U|D"}``. Mapping:

        I -> +I after
        U -> -U before, +U after
        D -> -D before
    """
    envelope = (
        f"before STRUCT<{row_schema}>, after STRUCT<{row_schema}>, op_type STRING"
    )
    parsed = df.select(F.from_json(F.col(value_col), envelope).alias("__env"))
    before, after, op = (
        F.col("__env.before"),
        F.col("__env.after"),
        F.col("__env.op_type"),
    )

    def tag(kind: str, row):
        return F.struct(F.lit(kind).alias("kind"), row.alias("row"))

    pieces = (
        F.when(op == "U", F.array(tag(UPDATE_BEFORE, before), tag(UPDATE_AFTER, after)))
        .when(op == "D", F.array(tag(DELETE, before)))
        .when(op == "I", F.array(tag(INSERT, after)))
        .otherwise(F.array())
    )
    exploded = parsed.select(F.explode(pieces).alias("__p")).filter(
        F.col("__p.row").isNotNull()
    )
    return exploded.select(F.col("__p.kind").alias(ROWKIND), F.col("__p.row.*"))


# ---------------------------------------------------------------------------
# Changelog-ENCODING formats: the serialization side the reference pairs
# with sinks (flink-formats/flink-json/.../debezium/
# DebeziumJsonSerializationSchema.java, canal/CanalJsonSerializationSchema
# .java, maxwell/MaxwellJsonSerializationSchema.java,
# ogg/OggJsonSerializationSchema.java). The reference serializes each
# changelog row to ONE envelope — it does NOT re-pair -U/+U into a
# single update message: +I/+U -> create, -D/-U -> delete. Encoding is
# a pure Catalyst to_json projection (map-side, no shuffle, any scale);
# nulls are kept explicit so the envelopes match the reference's shape.
# ---------------------------------------------------------------------------

_KEEP_NULLS = {"ignoreNullFields": "false"}


def _payload(df: DataFrame):
    cols = [c for c in df.columns if c != ROWKIND]
    return F.struct(*[F.col(c) for c in cols]), cols


def changelog_to_debezium_json(df: DataFrame, value_col: str = "value") -> DataFrame:
    """+I/+U -> {"before": null, "after": row, "op": "c"};
    -D/-U -> {"before": row, "after": null, "op": "d"}."""
    row, _ = _payload(df)
    ins = F.col(ROWKIND).isin(INSERT, UPDATE_AFTER)
    env = F.struct(
        F.when(~ins, row).alias("before"),
        F.when(ins, row).alias("after"),
        F.when(ins, F.lit("c")).otherwise(F.lit("d")).alias("op"),
    )
    return df.select(F.to_json(env, _KEEP_NULLS).alias(value_col))


def changelog_to_canal_json(df: DataFrame, value_col: str = "value") -> DataFrame:
    """+I/+U -> {"data": [row], "old": null, "type": "INSERT"};
    -D/-U -> {"data": [row], "old": null, "type": "DELETE"}."""
    row, _ = _payload(df)
    ins = F.col(ROWKIND).isin(INSERT, UPDATE_AFTER)
    env = F.struct(
        F.array(row).alias("data"),
        F.expr("CAST(NULL AS STRING)").alias("old"),
        F.when(ins, F.lit("INSERT")).otherwise(F.lit("DELETE")).alias("type"),
    )
    return df.select(F.to_json(env, _KEEP_NULLS).alias(value_col))


def changelog_to_maxwell_json(df: DataFrame, value_col: str = "value") -> DataFrame:
    """+I/+U -> {"data": row, "old": null, "type": "insert"};
    -D/-U -> {"data": row, "old": null, "type": "delete"}."""
    row, _ = _payload(df)
    ins = F.col(ROWKIND).isin(INSERT, UPDATE_AFTER)
    env = F.struct(
        row.alias("data"),
        F.expr("CAST(NULL AS STRING)").alias("old"),
        F.when(ins, F.lit("insert")).otherwise(F.lit("delete")).alias("type"),
    )
    return df.select(F.to_json(env, _KEEP_NULLS).alias(value_col))


def changelog_to_ogg_json(df: DataFrame, value_col: str = "value") -> DataFrame:
    """+I/+U -> {"before": null, "after": row, "op_type": "I"};
    -D/-U -> {"before": row, "after": null, "op_type": "D"}."""
    row, _ = _payload(df)
    ins = F.col(ROWKIND).isin(INSERT, UPDATE_AFTER)
    env = F.struct(
        F.when(~ins, row).alias("before"),
        F.when(ins, row).alias("after"),
        F.when(ins, F.lit("I")).otherwise(F.lit("D")).alias("op_type"),
    )
    return df.select(F.to_json(env, _KEEP_NULLS).alias(value_col))
