"""Pure-Python Avro Object Container File reader (the 'avro' format).

The environment ships no spark-avro DataSource module, so this format
was previously jar-gated. Avro's container framing and binary encoding
are small, fully-specified, and decodable with no library, so the
source side is implemented from the public specification
(https://avro.apache.org/docs/1.11.1/specification/): OCF magic +
metadata + sync-delimited blocks (null and deflate codecs), and the
binary encoding for the practical schema subset — primitives, records,
nullable unions, arrays, maps, enums, fixed, and the
date / timestamp-millis / timestamp-micros logical types.

Correctness is validated against the JVM Avro reference implementation
(avro-core ships on Spark's classpath even though spark-avro does
not): the tests write container files through
org.apache.avro.generic.GenericDatumWriter via py4j and assert this
decoder reproduces them (tests/test_avro.py).

Distribution shape: files arrive as (path, content) rows via Spark's
binaryFile source and decode inside mapInPandas — one task per file,
the same per-file parallelism as the reference's AvroInputFormat
(flink-formats/flink-avro/.../AvroInputFormat.java:66). OCF is
block-splittable in principle; per-file parallelism is the documented
trade-off here, so at corpus scale keep files shard-sized (the
standard guidance for container formats without a splitting reader).

The sink side stays unsupported (writing distributed avro without the
DataSource module would funnel through the driver); INSERT into an
avro table raises with that explanation.
"""

from __future__ import annotations

import glob
import json
import os
import struct
import zlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_MAGIC = b"Obj\x01"


class _Bin:
    """Cursor over Avro binary-encoded bytes."""

    def __init__(self, buf: bytes, pos: int = 0) -> None:
        self.buf = buf
        self.pos = pos

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return b

    def long(self) -> int:
        """Zigzag varint (int and long share the encoding)."""
        shift, acc = 0, 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def bytes_(self) -> bytes:
        return self.read(self.long())

    def string(self) -> str:
        return self.bytes_().decode("utf-8")


def _decode(schema: Any, r: _Bin) -> Any:
    """Decode one value of ``schema`` (parsed JSON) from the cursor."""
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return r.read(1) == b"\x01"
        if t in ("int", "long"):
            return r.long()
        if t == "float":
            return struct.unpack("<f", r.read(4))[0]
        if t == "double":
            return struct.unpack("<d", r.read(8))[0]
        if t == "bytes":
            return bytes(r.bytes_())
        if t == "string":
            return r.string()
        raise ValueError(f"unsupported avro type {t!r}")
    if isinstance(schema, list):  # union
        idx = r.long()
        return _decode(schema[idx], r)
    t = schema["type"]
    if t in ("null", "boolean", "int", "long", "float", "double", "bytes", "string"):
        val = _decode(t, r)
        lt = schema.get("logicalType")
        if lt == "date":
            return pd.Timestamp(val, unit="D").date()
        if lt == "timestamp-millis":
            return pd.Timestamp(val, unit="ms")
        if lt == "timestamp-micros":
            return pd.Timestamp(val, unit="us")
        return val
    if t == "record":
        return tuple(_decode(f["type"], r) for f in schema["fields"])
    if t == "enum":
        return schema["symbols"][r.long()]
    if t == "fixed":
        return bytes(r.read(schema["size"]))
    if t == "array":
        out = []
        while True:
            n = r.long()
            if n == 0:
                break
            if n < 0:  # block with byte size prefix
                n = -n
                r.long()
            for _ in range(n):
                out.append(_decode(schema["items"], r))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.long()
            for _ in range(n):
                k = r.string()
                out[k] = _decode(schema["values"], r)
        return out
    raise ValueError(f"unsupported avro type {t!r}")


def parse_ocf(content: bytes) -> tuple[dict, list[tuple]]:
    """Parse one Object Container File: (schema JSON, record tuples)."""
    r = _Bin(content)
    if r.read(4) != _MAGIC:
        raise ValueError("not an avro object container file (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.long()
        for _ in range(n):
            k = r.string()
            meta[k] = bytes(r.bytes_())
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = r.read(16)
    rows: list[tuple] = []
    while r.pos < len(r.buf):
        count = r.long()
        size = r.long()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        br = _Bin(block)
        for _ in range(count):
            rows.append(_decode(schema, br))
        if r.read(16) != sync:
            raise ValueError("avro block sync mismatch")
    return schema, rows


def avro_to_spark_type(schema: Any) -> DataType:
    """Translate the supported Avro schema subset to a Spark type."""
    prim = {
        "boolean": BooleanType(),
        "int": IntegerType(),
        "long": LongType(),
        "float": FloatType(),
        "double": DoubleType(),
        "bytes": BinaryType(),
        "string": StringType(),
    }
    if isinstance(schema, str):
        if schema in prim:
            return prim[schema]
        raise ValueError(f"unsupported avro type {schema!r}")
    if isinstance(schema, list):
        non_null = [s for s in schema if s != "null"]
        if len(non_null) != 1:
            raise ValueError("only nullable unions [null, T] are supported")
        return avro_to_spark_type(non_null[0])
    t = schema["type"]
    lt = schema.get("logicalType")
    if lt == "date":
        return DateType()
    if lt in ("timestamp-millis", "timestamp-micros"):
        return TimestampType()
    if t in prim:
        return prim[t]
    if t == "enum":
        return StringType()
    if t == "fixed":
        return BinaryType()
    if t == "array":
        return ArrayType(avro_to_spark_type(schema["items"]))
    if t == "map":
        return MapType(StringType(), avro_to_spark_type(schema["values"]))
    if t == "record":
        return StructType(
            [
                StructField(f["name"], avro_to_spark_type(f["type"]))
                for f in schema["fields"]
            ]
        )
    raise ValueError(f"unsupported avro type {t!r}")


def read_schema(path: str) -> dict:
    """Driver-side schema discovery: parse the header of one file."""
    files = sorted(glob.glob(os.path.join(path, "*.avro"))) if os.path.isdir(path) else [path]
    if not files:
        raise FileNotFoundError(f"no .avro files under {path}")
    with open(files[0], "rb") as fh:
        head = fh.read()
    r = _Bin(head)
    if r.read(4) != _MAGIC:
        raise ValueError(f"{files[0]}: not an avro container file")
    meta: dict = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.long()
        for _ in range(n):
            k = r.string()
            meta[k] = r.bytes_()
    return json.loads(meta["avro.schema"].decode())


def avro_source(spark: SparkSession, path: str) -> DataFrame:
    """Batch scan over avro container files at ``path``.

    Top-level schema must be a record; its fields become columns.
    """
    schema = read_schema(path)
    if schema.get("type") != "record":
        raise ValueError("top-level avro schema must be a record")
    spark_schema = avro_to_spark_type(schema)
    assert isinstance(spark_schema, StructType)
    cols = [f.name for f in spark_schema.fields]
    bf = spark.read.format("binaryFile")
    if os.path.isdir(path):
        bf = bf.option("pathGlobFilter", "*.avro")
    files = bf.load(path).select("content")

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for content in pdf["content"]:
                _, rows = parse_ocf(bytes(content))
                yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(decode, schema=spark_schema)
