"""protobuf format: wire-format codec pinned to the public spec's
canonical byte fixtures, roundtrips over the full type matrix, and the
Spark source/sink path (binaryFile + mapInPandas scan, per-partition
delimited sink). Reference counterpart: flink-formats/flink-protobuf
(PbFormatFactory.java, PbRowDataDeserializationSchema.java,
PbRowDataSerializationSchema.java)."""

from __future__ import annotations

import os
import tempfile

import pytest

from tests.conftest import retry_on_py4j_flake
from pyspark.sql.types import StructType

from flink_release_1_16_0_spark.sources.protobuf_format import (
    decode_delimited,
    decode_message,
    encode_delimited,
    encode_message,
    protobuf_source,
    write_protobuf,
)

pytestmark = pytest.mark.usefixtures("spark")


# ---------------------------------------------------------------------------
# spec fixtures (https://protobuf.dev/programming-guides/encoding/)
# ---------------------------------------------------------------------------


def test_spec_varint_150():
    # the spec's canonical example: message Test1 { int32 a = 1; } a=150
    # encodes to exactly 08 96 01
    st = StructType.fromDDL("a int")
    assert encode_message((150,), st) == bytes.fromhex("089601")
    assert decode_message(bytes.fromhex("089601"), st) == (150,)


def test_spec_string_testing():
    # message Test2 { string b = 2; } b="testing" -> 12 07 74 ... 67
    st = StructType.fromDDL("a int, b string")
    buf = bytes.fromhex("120774657374696e67")
    assert encode_message((0, "testing"), st) == buf  # a=0 is default: absent
    assert decode_message(buf, st) == (0, "testing")


def test_spec_nested_message():
    # message Test3 { Test1 c = 3; } with c.a=150 -> 1a 03 08 96 01
    inner = StructType.fromDDL("a int")
    st = StructType.fromDDL("x int, y string")
    st = st.add("c", inner)
    buf = bytes.fromhex("1a03089601")
    assert encode_message((0, "", (150,)), st) == buf
    assert decode_message(buf, st) == (0, "", (150,))


def test_spec_packed_repeated():
    # message Test5 { repeated int32 f = 4 [packed=true]; } f=[3,270,86942]
    # -> 22 06 03 8e 02 9e a7 05 (the spec's packed example, field 4)
    st = StructType.fromDDL("a int, b string, c int, f array<int>")
    buf = bytes.fromhex("2206038e029ea705")
    assert encode_message((0, "", 0, [3, 270, 86942]), st) == buf
    assert decode_message(buf, st) == (0, "", 0, [3, 270, 86942])


def test_negative_int64_ten_byte_varint():
    # int32/int64 negatives are 10-byte two's-complement varints
    st = StructType.fromDDL("a bigint")
    enc = encode_message((-2,), st)
    assert enc == bytes.fromhex("08feffffffffffffffff01")
    assert decode_message(enc, st) == (-2,)


def test_unknown_field_skipped():
    # forward compatibility: unknown field numbers skip by wire type
    st = StructType.fromDDL("a int")
    extra = bytes.fromhex("089601") + bytes.fromhex("120774657374696e67")
    assert decode_message(extra, st) == (150,)


def test_proto3_defaults_absent_and_materialized():
    st = StructType.fromDDL(
        "i int, l bigint, f float, d double, b boolean, s string, "
        "bin binary, arr array<bigint>, m map<string,bigint>"
    )
    enc = encode_message((0, 0, 0.0, 0.0, False, "", b"", [], {}), st)
    assert enc == b""  # every default value stays off the wire
    assert decode_message(b"", st) == (0, 0, 0.0, 0.0, False, "", b"", [], {})
    assert decode_message(b"", st, read_defaults=False) == (None,) * 9


def test_roundtrip_type_matrix():
    inner = StructType.fromDDL("x bigint, y string")
    st = StructType.fromDDL(
        "i int, l bigint, f float, d double, b boolean, s string, "
        "bin binary, arr_l array<bigint>, arr_s array<string>, "
        "m map<string,bigint>"
    ).add("nested", inner)
    row = (
        -123,
        1 << 60,
        0.5,
        3.25,
        True,
        "héllo",
        b"\x00\xff",
        [1, -2, 3],
        ["a", "", "c"],
        {"k1": 7, "k2": -9},
        (42, "inner"),
    )
    assert decode_message(encode_message(row, st), st) == row


def test_delimited_stream_roundtrip():
    st = StructType.fromDDL("a bigint, b string")
    rows = [(i, f"row-{i}") for i in range(100)]
    blob = encode_delimited(iter(rows), st)
    assert decode_delimited(blob, st) == rows


def test_ignore_parse_errors_stops_at_corruption():
    st = StructType.fromDDL("a bigint, b string")
    good = encode_delimited(iter([(1, "x"), (2, "y")]), st)
    corrupt = good + b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\xff\xff"
    with pytest.raises(Exception):
        decode_delimited(corrupt, st)
    assert decode_delimited(corrupt, st, ignore_parse_errors=True) == [
        (1, "x"),
        (2, "y"),
    ]


# ---------------------------------------------------------------------------
# Spark source/sink path
# ---------------------------------------------------------------------------


def test_spark_sink_source_roundtrip(spark):
    df = spark.range(0, 1000).selectExpr(
        "id AS k",
        "CAST(id AS STRING) AS name",
        "CAST(id AS DOUBLE) / 4 AS score",
        "id % 2 = 0 AS flag",
    )
    path = tempfile.mkdtemp(prefix="pb_roundtrip_")
    write_protobuf(df.repartition(4), path)
    assert len([f for f in os.listdir(path) if f.endswith(".pb")]) >= 1
    back = protobuf_source(spark, path, df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_ddl_protobuf_scan(spark):
    from flink_release_1_16_0_spark.table_env import TableEnvironment

    df = spark.range(0, 50).selectExpr("id AS k", "concat('n-', id) AS name")
    path = tempfile.mkdtemp(prefix="pb_ddl_")
    write_protobuf(df, path)
    tenv = TableEnvironment.create(spark)
    tenv.execute_sql(
        f"""
        CREATE TABLE pb_tbl (k BIGINT, name STRING)
        WITH ('connector' = 'filesystem', 'path' = '{path}',
              'format' = 'protobuf')
        """
    )
    got = tenv.sql_query(
        "SELECT k, name FROM pb_tbl WHERE k % 10 = 3"
    ).to_data_frame()
    assert sorted(map(tuple, got.collect())) == [
        (3, "n-3"),
        (13, "n-13"),
        (23, "n-23"),
        (33, "n-33"),
        (43, "n-43"),
    ]


def test_column_codec_roundtrip(spark):
    """protobuf as a VALUE format: encode columns to one binary column
    (the kafka-value sink shape), decode it back in place."""
    from flink_release_1_16_0_spark.sources.protobuf_format import (
        protobuf_decode_column,
        protobuf_encode_column,
    )

    df = spark.range(0, 200).selectExpr(
        "id AS topic_key",
        "id * 2 AS a",
        "concat('m-', id) AS b",
        "CAST(id AS DOUBLE) / 7 AS c",
    )
    wire = protobuf_encode_column(df, cols=["a", "b", "c"], out_col="value")
    assert set(wire.columns) == {"topic_key", "value"}
    back = protobuf_decode_column(
        wire, "value", StructType.fromDDL("a bigint, b string, c double")
    )
    assert sorted(map(tuple, back.select("topic_key", "a", "b", "c").collect())) == sorted(
        map(tuple, df.collect())
    )


@retry_on_py4j_flake
def test_column_codec_ignore_parse_errors(spark):
    from pyspark.sql import functions as F

    from flink_release_1_16_0_spark.sources.protobuf_format import (
        protobuf_decode_column,
        protobuf_encode_column,
    )

    df = spark.range(0, 5).selectExpr("id AS a", "concat('x', id) AS b")
    wire = protobuf_encode_column(df, out_col="value")
    poisoned = wire.union(
        spark.createDataFrame(
            [(bytearray(b"\x08"),)], "value binary"  # truncated varint field
        )
    )
    st = StructType.fromDDL("a bigint, b string")
    with pytest.raises(Exception):
        protobuf_decode_column(poisoned, "value", st).collect()
    ok = protobuf_decode_column(poisoned, "value", st, ignore_parse_errors=True)
    assert ok.count() == 5


def test_partitioned_ddl_roundtrip(spark, tmp_path):
    """PARTITIONED BY protobuf table: Hive-style col=val layout on
    write, partition-column reattachment + pruning-compatible dirs on
    read. Partition columns stay off the wire."""
    import os as _os

    from flink_release_1_16_0_spark.table_env import TableEnvironment

    d = tmp_path / "pb_part"
    tenv = TableEnvironment.create(spark)
    tenv.execute_sql(
        f"""
        CREATE TABLE pb_part (k BIGINT, name STRING, seg INT)
        PARTITIONED BY (seg)
        WITH ('connector' = 'filesystem', 'path' = '{d}',
              'format' = 'protobuf')
        """
    )
    spark.range(0, 40).selectExpr(
        "id AS k", "concat('n-', id) AS name", "CAST(id % 4 AS INT) AS seg"
    ).createOrReplaceTempView("pb_part_src")
    tenv.execute_sql("INSERT INTO pb_part SELECT * FROM pb_part_src")
    assert sorted(
        x for x in _os.listdir(d) if x.startswith("seg=")
    ) == ["seg=0", "seg=1", "seg=2", "seg=3"]
    got = tenv.sql_query(
        "SELECT k, name, seg FROM pb_part WHERE seg = 2"
    ).to_data_frame()
    assert sorted(map(tuple, got.collect())) == [
        (k, f"n-{k}", 2) for k in range(2, 40, 4)
    ]


# ---------------------------------------------------------------------------
# property-based roundtrips (beyond the reference's test strategy —
# SURVEY §5 notes it has none; the wire codec is pure Python, so
# hypothesis can hammer the full value domain cheaply)
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as hst

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False

if _HAS_HYPOTHESIS:
    _I64 = hst.integers(min_value=-(2**63), max_value=2**63 - 1)
    _ROW = hst.tuples(
        _I64,
        hst.text(max_size=40),
        hst.floats(allow_nan=False),
        hst.booleans(),
        hst.binary(max_size=40),
        hst.lists(_I64, max_size=10),
    )
    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        BooleanType,
        DoubleType,
        LongType,
        StringType,
        StructField,
    )

    # built without fromDDL: module-level collection has no Spark session
    _PB_ST = StructType(
        [
            StructField("a", LongType()),
            StructField("b", StringType()),
            StructField("c", DoubleType()),
            StructField("d", BooleanType()),
            StructField("e", BinaryType()),
            StructField("f", ArrayType(LongType())),
        ]
    )

    @settings(max_examples=300, deadline=None)
    @given(_ROW)
    def test_property_message_roundtrip(row):
        assert decode_message(encode_message(row, _PB_ST), _PB_ST) == row

    @settings(max_examples=100, deadline=None)
    @given(hst.lists(_ROW, max_size=20))
    def test_property_delimited_roundtrip(rows):
        assert decode_delimited(encode_delimited(iter(rows), _PB_ST), _PB_ST) == [
            tuple(r) for r in rows
        ]


def test_nan_double_roundtrips():
    """NaN is a legitimate IEEE-754 payload for double/float fields —
    the encoder must write its bits, not treat it as absent
    (regression: pd.isna skipped it, so NaN read back as 0.0/NULL)."""
    import math

    from flink_release_1_16_0_spark.sources.protobuf_format import (
        decode_message,
        encode_message,
    )

    st = StructType.fromDDL("a double, b float, c bigint")
    wire = encode_message((float("nan"), float("nan"), 7), st)
    a, b, c = decode_message(wire, st)
    assert math.isnan(a) and math.isnan(b) and c == 7
    # None still means absent for float fields
    wire2 = encode_message((None, None, 7), st)
    assert len(wire2) < len(wire)


@retry_on_py4j_flake
def test_null_payload_strict_raises(spark):
    """Strict mode (ignore_parse_errors=False) must surface a null
    payload (e.g. a kafka tombstone reaching a plain value decoder),
    not silently drop the row; only ignore_parse_errors=True drops."""
    from flink_release_1_16_0_spark.sources.protobuf_format import (
        protobuf_decode_column,
        protobuf_encode_column,
    )

    df = spark.range(0, 3).selectExpr("id AS a", "concat('x', id) AS b")
    wire = protobuf_encode_column(df, out_col="value").union(
        spark.createDataFrame([(None,)], "value binary")
    )
    st = StructType.fromDDL("a bigint, b string")
    with pytest.raises(Exception, match="null payload"):
        protobuf_decode_column(wire, "value", st).collect()
    ok = protobuf_decode_column(wire, "value", st, ignore_parse_errors=True)
    assert ok.count() == 3
