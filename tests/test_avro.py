"""Avro OCF reader validated against the JVM Avro reference impl.

avro-core ships on Spark's classpath (spark-avro, the DataSource
module, does not) — so the ground-truth files here are written by
org.apache.avro.generic.GenericDatumWriter through py4j, and the
pure-Python decoder (sources/avro_format.py) must reproduce them
exactly: primitives, nullable unions, arrays, enums, logical
timestamps, and the deflate codec.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from flink_release_1_16_0_spark.sources.avro_format import (  # noqa: E402
    avro_source,
    avro_to_spark_type,
    parse_ocf,
    read_schema,
)

_SCHEMA = """{
  "type": "record", "name": "Rec", "fields": [
    {"name": "id", "type": "long"},
    {"name": "name", "type": "string"},
    {"name": "score", "type": "double"},
    {"name": "flag", "type": "boolean"},
    {"name": "maybe", "type": ["null", "int"]},
    {"name": "tags", "type": {"type": "array", "items": "string"}},
    {"name": "color", "type": {"type": "enum", "name": "C",
                               "symbols": ["RED", "GREEN", "BLUE"]}},
    {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}}
  ]
}"""

_ROWS = [
    (1, "alpha", 1.5, True, 7, ["x", "y"], "RED", 1700000000000000),
    (2, "beta", -2.25, False, None, [], "BLUE", 1700000000123456),
    (3, "gamma", 0.0, True, -42, ["z"], "GREEN", 0),
]


def _write_jvm_avro(spark, path: str, codec: str | None = None) -> None:
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(_SCHEMA)
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    dfw = jvm.org.apache.avro.file.DataFileWriter(writer)
    if codec == "deflate":
        dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    dfw.create(schema, jvm.java.io.File(path))
    enum_schema = schema.getField("color").schema()
    for rid, name, score, flag, maybe, tags, color, ts in _ROWS:
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("id", rid)
        rec.put("name", name)
        rec.put("score", float(score))
        rec.put("flag", flag)
        rec.put("maybe", maybe)
        arr = jvm.java.util.ArrayList()
        for t in tags:
            arr.add(t)
        rec.put("tags", arr)
        rec.put(
            "color",
            jvm.org.apache.avro.generic.GenericData.EnumSymbol(enum_schema, color),
        )
        rec.put("ts", ts)
        dfw.append(rec)
    dfw.close()


@pytest.mark.parametrize("codec", [None, "deflate"])
def test_parse_ocf_matches_jvm_writer(spark, tmp_path, codec):
    p = str(tmp_path / f"jvm_{codec}.avro")
    _write_jvm_avro(spark, p, codec)
    with open(p, "rb") as fh:
        schema, rows = parse_ocf(fh.read())
    assert schema["name"] == "Rec"
    assert len(rows) == len(_ROWS)
    for got, want in zip(rows, _ROWS):
        rid, name, score, flag, maybe, tags, color, ts_us = want
        assert got[0] == rid and got[1] == name
        assert got[2] == score and got[3] is flag and got[4] == maybe
        assert got[5] == tags and got[6] == color
        assert got[7].value == ts_us * 1000  # pandas ns == avro µs * 1000


def test_avro_source_dataframe(spark, tmp_path):
    d = tmp_path / "tbl"
    d.mkdir()
    _write_jvm_avro(spark, str(d / "part-0.avro"))
    _write_jvm_avro(spark, str(d / "part-1.avro"), codec="deflate")
    df = avro_source(spark, str(d))
    assert dict(df.dtypes)["maybe"] == "int"
    assert dict(df.dtypes)["ts"] == "timestamp"
    rows = df.orderBy("id").collect()
    assert len(rows) == 2 * len(_ROWS)
    assert rows[0]["name"] == "alpha" and rows[0]["tags"] == ["x", "y"]
    assert rows[2]["maybe"] is None
    assert rows[4]["color"] == "GREEN"


def test_schema_discovery_and_type_mapping(spark, tmp_path):
    p = str(tmp_path / "one.avro")
    _write_jvm_avro(spark, p)
    schema = read_schema(p)
    st = avro_to_spark_type(schema)
    names = [f.name for f in st.fields]
    assert names == ["id", "name", "score", "flag", "maybe", "tags", "color", "ts"]


def test_avro_ddl_scan(spark, tmp_path):
    """CREATE TABLE ... WITH ('format'='avro') scans through the OCF
    reader (DDL schema is declarative; columns come from the file)."""
    from flink_release_1_16_0_spark.table_env import TableEnvironment

    d = tmp_path / "avro_ddl"
    d.mkdir()
    _write_jvm_avro(spark, str(d / "part-0.avro"))
    tenv = TableEnvironment.create(spark)
    tenv.execute_sql(
        f"""
        CREATE TABLE av (id BIGINT, name STRING) WITH (
          'connector' = 'filesystem', 'path' = '{d}', 'format' = 'avro')
        """
    )
    out = tenv.sql_query("SELECT id, name FROM av ORDER BY id").to_data_frame().collect()
    assert [(r["id"], r["name"]) for r in out][:2] == [(1, "alpha"), (2, "beta")]
