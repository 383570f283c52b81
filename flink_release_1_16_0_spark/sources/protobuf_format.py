"""Pure-Python protobuf wire-format codec (the 'protobuf' format).

Counterpart of the reference's flink-formats/flink-protobuf
(PbFormatFactory.java, deserialize/PbRowDataDeserializationSchema.java,
serialize/PbRowDataSerializationSchema.java). The reference derives the
row layout from a compiled ``message-class-name`` on the classpath; this
environment has neither protoc nor a protobuf runtime, so — like the
avro reader (sources/avro_format.py) — the codec is implemented from
the public wire-format specification
(https://protobuf.dev/programming-guides/encoding/) and the row layout
comes from the table's DDL schema: column ``i`` (0-based) is protobuf
field number ``i + 1``, the way protoc assigns numbers to a message
whose fields are declared in column order. Both directions are
implemented, so the format matrix is read+write symmetric.

Supported type mapping (PbCodegenSimpleDeserializer.java's simple
types plus arrays/rows):

=============== ======================= =====================
Spark type      proto scalar            wire type
=============== ======================= =====================
int             int32 (varint)          0
bigint          int64 (varint)          0
boolean         bool (varint)           0
float           float                   5 (32-bit)
double          double                  1 (64-bit)
string          string                  2 (len-delimited)
binary          bytes                   2
struct          message                 2
array<scalar>   repeated (packed for    2 / per-element
                numeric, per-element
                for string/bytes/msg)
map<K, V>       map<K, V> (entry msgs)  2
=============== ======================= =====================

proto3 default-value semantics: a field equal to its default (0, "",
false, empty) is not put on the wire; on read, missing fields
materialize as the default when ``read-default-values`` is set (forced
true for proto3 in the reference, PbFormatOptions.READ_DEFAULT_VALUES)
and as NULL otherwise.

File framing: one ``.pb`` file is a sequence of varint-length-prefixed
messages (the standard ``writeDelimitedTo`` stream layout). Files
arrive via Spark's binaryFile source and decode in mapInPandas — one
task per file, the same per-file parallelism as the avro reader; at
corpus scale keep files shard-sized.

Correctness: tests/test_protobuf.py pins the spec's canonical byte
fixtures (``08 96 01`` = field 1, varint 150, etc.) and
encode->decode roundtrips over the full type matrix.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator, Sequence
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructType,
)

_WT_VARINT, _WT_I64, _WT_LEN, _WT_I32 = 0, 1, 2, 5


# ---------------------------------------------------------------------------
# varint / tag primitives
# ---------------------------------------------------------------------------


def _write_varint(out: bytearray, v: int) -> None:
    if v < 0:
        v += 1 << 64  # int32/int64 negatives are 10-byte two's complement
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint longer than 10 bytes")


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= 1 << 63 else v


def _wire_type(dt: DataType) -> int:
    if isinstance(dt, (IntegerType, LongType, BooleanType)):
        return _WT_VARINT
    if isinstance(dt, DoubleType):
        return _WT_I64
    if isinstance(dt, FloatType):
        return _WT_I32
    return _WT_LEN


def _is_default(dt: DataType, v: Any) -> bool:
    """proto3: default-valued fields are absent from the wire."""
    if isinstance(dt, (IntegerType, LongType)):
        return v == 0
    if isinstance(dt, BooleanType):
        return v is False
    if isinstance(dt, (FloatType, DoubleType)):
        return v == 0.0
    if isinstance(dt, StringType):
        return v == ""
    if isinstance(dt, BinaryType):
        return len(v) == 0
    if isinstance(dt, (ArrayType, MapType)):
        return len(v) == 0
    return False  # nested message: presence is explicit


def _default_value(dt: DataType) -> Any:
    if isinstance(dt, (IntegerType, LongType)):
        return 0
    if isinstance(dt, BooleanType):
        return False
    if isinstance(dt, (FloatType, DoubleType)):
        return 0.0
    if isinstance(dt, StringType):
        return ""
    if isinstance(dt, BinaryType):
        return b""
    if isinstance(dt, ArrayType):
        return []
    if isinstance(dt, MapType):
        return {}
    return None  # message fields have no default instance on read


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _encode_scalar(out: bytearray, dt: DataType, v: Any) -> None:
    if isinstance(dt, (IntegerType, LongType)):
        _write_varint(out, int(v))
    elif isinstance(dt, BooleanType):
        out.append(1 if v else 0)
    elif isinstance(dt, DoubleType):
        out += struct.pack("<d", float(v))
    elif isinstance(dt, FloatType):
        out += struct.pack("<f", float(v))
    elif isinstance(dt, StringType):
        b = str(v).encode("utf-8")
        _write_varint(out, len(b))
        out += b
    elif isinstance(dt, BinaryType):
        b = bytes(v)
        _write_varint(out, len(b))
        out += b
    elif isinstance(dt, StructType):
        b = encode_message(v, dt)
        _write_varint(out, len(b))
        out += b
    else:
        raise ValueError(f"unsupported protobuf scalar type {dt!r}")


def _tag(out: bytearray, field_no: int, wt: int) -> None:
    _write_varint(out, (field_no << 3) | wt)


def encode_message(row: Any, schema: StructType) -> bytes:
    """Encode one row (sequence/dict/Row) against ``schema``.

    Column i -> field number i+1. NULL and proto3-default values are
    omitted from the wire (PbRowDataSerializationSchema writes through
    the generated message builder, which does the same).
    """
    if isinstance(row, dict):
        values = [row.get(f.name) for f in schema.fields]
    else:
        values = list(row)
    out = bytearray()
    for i, f in enumerate(schema.fields):
        v = values[i]
        no = i + 1
        if v is None:
            continue
        if pd.api.types.is_scalar(v) and pd.isna(v):
            # NaN is a legitimate IEEE-754 payload for float/double
            # fields (the reference's generated-message serializer
            # preserves the bits); only non-float NA sentinels
            # (pd.NaT etc.) mean "absent".
            if not isinstance(f.dataType, (FloatType, DoubleType)):
                continue
        dt = f.dataType
        if isinstance(dt, ArrayType):
            elems = list(v)
            if not elems:
                continue
            et = dt.elementType
            if _wire_type(et) in (_WT_VARINT, _WT_I32, _WT_I64):
                # packed repeated (proto3 default for numerics)
                payload = bytearray()
                for e in elems:
                    _encode_scalar(payload, et, e)
                _tag(out, no, _WT_LEN)
                _write_varint(out, len(payload))
                out += payload
            else:
                for e in elems:
                    _tag(out, no, _WT_LEN)
                    # _encode_scalar writes the length prefix itself for
                    # string/bytes/message
                    _encode_scalar(out, et, e)
        elif isinstance(dt, MapType):
            items = v.items() if isinstance(v, dict) else list(v)
            entry = StructType().add("key", dt.keyType).add("value", dt.valueType)
            for k, mv in sorted(items):
                _tag(out, no, _WT_LEN)
                _encode_scalar(out, entry, (k, mv))
        elif _is_default(dt, v):
            continue
        else:
            _tag(out, no, _wire_type(dt))
            _encode_scalar(out, dt, v)
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _decode_scalar(dt: DataType, wt: int, buf: bytes, pos: int) -> tuple[Any, int]:
    if wt == _WT_VARINT:
        v, pos = _read_varint(buf, pos)
        if isinstance(dt, BooleanType):
            return bool(v), pos
        if isinstance(dt, IntegerType):
            v = _signed64(v)
            return int(v), pos
        return _signed64(v), pos
    if wt == _WT_I64:
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if wt == _WT_I32:
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if wt == _WT_LEN:
        n, pos = _read_varint(buf, pos)
        raw = buf[pos : pos + n]
        pos += n
        if isinstance(dt, StringType):
            return raw.decode("utf-8"), pos
        if isinstance(dt, BinaryType):
            return bytes(raw), pos
        if isinstance(dt, StructType):
            return decode_message(raw, dt, read_defaults=True), pos
        raise ValueError(f"length-delimited value for scalar type {dt!r}")
    raise ValueError(f"unsupported wire type {wt}")


def _skip(wt: int, buf: bytes, pos: int) -> int:
    if wt == _WT_VARINT:
        _, pos = _read_varint(buf, pos)
        return pos
    if wt == _WT_I64:
        return pos + 8
    if wt == _WT_I32:
        return pos + 4
    if wt == _WT_LEN:
        n, pos = _read_varint(buf, pos)
        return pos + n
    raise ValueError(f"cannot skip wire type {wt}")


def decode_message(
    buf: bytes, schema: StructType, read_defaults: bool = True
) -> tuple:
    """Decode one message against ``schema`` (field i+1 -> column i).

    Unknown field numbers are skipped by wire type (forward
    compatibility — same contract as the generated-code path in the
    reference). ``read_defaults`` materializes absent fields as proto3
    defaults; otherwise they stay None (PbFormatOptions
    READ_DEFAULT_VALUES).
    """
    fields = schema.fields
    values: list[Any] = [None] * len(fields)
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        no, wt = key >> 3, key & 0x7
        idx = no - 1
        if not 0 <= idx < len(fields):
            pos = _skip(wt, buf, pos)
            continue
        dt = fields[idx].dataType
        if isinstance(dt, ArrayType):
            et = dt.elementType
            ewt = _wire_type(et)
            if values[idx] is None:
                values[idx] = []
            if wt == _WT_LEN and ewt in (_WT_VARINT, _WT_I32, _WT_I64):
                n, pos = _read_varint(buf, pos)
                end = pos + n
                while pos < end:
                    v, pos = _decode_scalar(et, ewt, buf, pos)
                    values[idx].append(v)
            else:  # unpacked element (string/bytes/message, or proto2 writers)
                v, pos = _decode_scalar(et, wt, buf, pos)
                values[idx].append(v)
        elif isinstance(dt, MapType):
            entry = StructType().add("key", dt.keyType).add("value", dt.valueType)
            n, pos = _read_varint(buf, pos)
            k, v = decode_message(buf[pos : pos + n], entry, read_defaults=True)
            pos += n
            if values[idx] is None:
                values[idx] = {}
            values[idx][k] = v
        else:
            values[idx], pos = _decode_scalar(dt, wt, buf, pos)
    if read_defaults:
        for i, f in enumerate(fields):
            if values[i] is None:
                values[i] = _default_value(f.dataType)
    return tuple(values)


# ---------------------------------------------------------------------------
# delimited file framing + Spark source/sink
# ---------------------------------------------------------------------------


def encode_delimited(rows: Iterator[Any], schema: StructType) -> bytes:
    """writeDelimitedTo stream: varint length + message, repeated."""
    out = bytearray()
    for row in rows:
        msg = encode_message(row, schema)
        _write_varint(out, len(msg))
        out += msg
    return bytes(out)


def decode_delimited(
    content: bytes, schema: StructType, ignore_parse_errors: bool = False
) -> list[tuple]:
    rows: list[tuple] = []
    pos = 0
    while pos < len(content):
        try:
            n, pos2 = _read_varint(content, pos)
            msg = content[pos2 : pos2 + n]
            if len(msg) != n:
                raise ValueError("truncated message")
            rows.append(decode_message(msg, schema))
        except Exception:
            if not ignore_parse_errors:
                raise
            # a framing error is unrecoverable mid-stream: stop the file
            # (the reference's DeserializationSchema skips per-record
            # because Kafka frames records; a corrupt length prefix in a
            # byte stream loses sync — PbRowDataDeserializationSchema
            # returns null per record under ignore-parse-errors)
            break
        pos = pos2 + n
    return rows


def protobuf_source(
    spark: SparkSession,
    path: str,
    schema: StructType,
    ignore_parse_errors: bool = False,
    partition_cols: Sequence[str] = (),
    streaming: bool = False,
) -> DataFrame:
    """Batch or streaming scan over varint-delimited ``.pb`` files at
    ``path`` (the reference's format serves both modes).

    ``partition_cols`` name columns of ``schema`` that live in the
    Hive-style directory layout (``col=val/``) rather than on the wire
    — binaryFile's partition discovery supplies them, and field
    numbering covers only the wire columns (column i of the wire
    schema = field i+1).

    ``streaming=True`` rides Spark's file-stream listing (readStream
    binaryFile + per-micro-batch mapInPandas decode); the declared
    ``schema`` already supplies the row layout, so nothing else is
    needed.
    """
    from pyspark.sql import functions as F

    if streaming:
        from pyspark.sql.types import StructField

        bf_schema = StructType.fromDDL(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        for c in partition_cols:
            bf_schema = bf_schema.add(StructField(c, schema[c].dataType))
        bf = (
            spark.readStream.format("binaryFile")
            .schema(bf_schema)
            .option("pathGlobFilter", "*.pb")
        )
    else:
        bf = spark.read.format("binaryFile")
        if os.path.isdir(path):
            bf = bf.option("pathGlobFilter", "*.pb").option(
                "recursiveFileLookup", "false"
            )
    wire = StructType([f for f in schema.fields if f.name not in partition_cols])
    files = bf.load(path).select(
        "content",
        *[F.col(c).cast(schema[c].dataType).alias(c) for c in partition_cols],
    )
    wire_cols = [f.name for f in wire.fields]
    out_cols = [f.name for f in schema.fields]
    out_schema = StructType([schema[c] for c in out_cols])

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for i in range(len(pdf)):
                rows = decode_delimited(
                    bytes(pdf["content"].iloc[i]), wire, ignore_parse_errors
                )
                out = pd.DataFrame(rows, columns=wire_cols)
                for c in partition_cols:
                    out[c] = pdf[c].iloc[i]
                yield out[out_cols]

    return files.mapInPandas(decode, schema=out_schema)


def write_protobuf(
    df: DataFrame, path: str, partition_cols: Sequence[str] = ()
) -> None:
    """Distributed sink: one varint-delimited ``.pb`` file per Spark
    partition (PbRowDataSerializationSchema / the filesystem sink's
    per-subtask files). Encoding runs inside mapInPandas on the
    executors; only file bytes hit disk, nothing funnels through the
    driver. With ``partition_cols`` the layout is Hive-style
    (``col=val/part-*.pb``, values stringified — keep them path-safe)
    and those columns stay OFF the wire; the input is co-partitioned
    on them first so each task writes whole partition values.
    """
    schema = df.schema
    wire = StructType([f for f in schema.fields if f.name not in partition_cols])
    wire_cols = [f.name for f in wire.fields]
    os.makedirs(path, exist_ok=True)
    if partition_cols:
        from pyspark.sql import functions as F

        df = df.repartition(*[F.col(c) for c in partition_cols])

    def write_part(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import uuid

        buckets: dict[tuple, list[bytes]] = {}
        for pdf in it:
            if not len(pdf):
                continue
            if partition_cols:
                for pvals, sub in pdf.groupby(list(partition_cols), sort=False):
                    if not isinstance(pvals, tuple):
                        pvals = (pvals,)
                    chunk = encode_delimited(
                        (
                            tuple(r)
                            for r in sub[wire_cols].itertuples(
                                index=False, name=None
                            )
                        ),
                        wire,
                    )
                    buckets.setdefault(pvals, []).append(chunk)
            else:
                chunk = encode_delimited(
                    (tuple(r) for r in pdf.itertuples(index=False, name=None)),
                    wire,
                )
                buckets.setdefault((), []).append(chunk)
        for pvals, chunks in buckets.items():
            data = b"".join(chunks)
            if not data:
                continue
            sub_dir = os.path.join(
                path, *[f"{c}={v}" for c, v in zip(partition_cols, pvals)]
            )
            os.makedirs(sub_dir, exist_ok=True)
            with open(
                os.path.join(sub_dir, f"part-{uuid.uuid4().hex}.pb"), "wb"
            ) as fh:
                fh.write(data)
        return iter([pd.DataFrame({"files": pd.Series([1], dtype="int64")})])

    df.mapInPandas(write_part, schema="files bigint").count()


# ---------------------------------------------------------------------------
# column-level codec: protobuf as a VALUE FORMAT (the reference's main
# use — PbRowDataDeserializationSchema paired with the Kafka connector's
# value.format = 'protobuf'). Decodes/encodes a binary column in place,
# Arrow-batched via pandas UDFs; composes with any connector that
# exposes binary payloads (kafka value, raw BYTES files, ...).
# ---------------------------------------------------------------------------


def protobuf_decode_column(
    df: DataFrame,
    col: str,
    schema: StructType,
    ignore_parse_errors: bool = False,
) -> DataFrame:
    """Replace binary column ``col`` with the decoded message fields.

    Rows whose payload fails to parse are dropped under
    ``ignore_parse_errors`` (the reference returns null per record and
    the collector skips it), otherwise the task fails.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType, StructField

    # a struct whose fields are all null is NOT a null struct, so parse
    # success is carried as an explicit flag and filtered after
    out_type = StructType([*schema.fields, StructField("__pb_ok", BooleanType())])

    @pandas_udf(out_type)
    def _dec(s: pd.Series) -> pd.DataFrame:
        rows = []
        for raw in s:
            if raw is None:
                # strict mode surfaces null payloads (e.g. kafka
                # tombstones reaching a plain value decoder) the same
                # way it surfaces undecodable bytes; only
                # ignore_parse_errors=True drops them
                if not ignore_parse_errors:
                    raise ValueError(
                        "protobuf value format: null payload "
                        "(enable ignore_parse_errors to drop)"
                    )
                rows.append((*((None,) * len(schema.fields)), False))
                continue
            try:
                rows.append((*decode_message(bytes(raw), schema), True))
            except Exception:
                if not ignore_parse_errors:
                    raise
                rows.append((*((None,) * len(schema.fields)), False))
        return pd.DataFrame(
            rows, columns=[*[f.name for f in schema.fields], "__pb_ok"]
        )

    others = [c for c in df.columns if c != col]
    decoded = df.withColumn("__pb", _dec(F.col(col))).drop(col)
    decoded = decoded.filter(F.col("__pb.__pb_ok"))
    return decoded.select(
        *others, *[F.col(f"__pb.{f.name}") for f in schema.fields]
    )


def protobuf_encode_column(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    out_col: str = "value",
    keep_cols: bool = False,
) -> DataFrame:
    """Serialize ``cols`` (default: all columns) into one binary
    protobuf column — the sink-side value format
    (PbRowDataSerializationSchema). ``keep_cols=True`` retains the
    source columns beside the encoded one (key-format composition,
    where the key columns are also part of the value row)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    use = list(cols) if cols is not None else list(df.columns)
    msg_schema = StructType([df.schema[c] for c in use])

    @pandas_udf(BinaryType())
    def _enc(pdf: pd.DataFrame) -> pd.Series:
        return pd.Series(
            [
                encode_message(tuple(t), msg_schema)
                for t in pdf.itertuples(index=False, name=None)
            ],
            dtype=object,
        )

    others = list(df.columns) if keep_cols else [
        c for c in df.columns if c not in use
    ]
    return df.select(*others, _enc(F.struct(*use)).alias(out_col))
