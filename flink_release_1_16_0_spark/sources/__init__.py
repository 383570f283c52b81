"""Source connectors (SURVEY.md section 2.1).

The reference's ScanTableSource/LookupTableSource abilities
(SupportsFilterPushDown, SupportsProjectionPushDown, partition pruning,
limit pushdown — flink-table-common .../connector/source/abilities/)
are all native to Spark's DataSource V2, so a "connector" here is a
thin builder that standardizes options:

- **files** (parquet/csv/json/orc): batch `spark.read` and streaming
  `spark.readStream` over a directory — the FileSystemTableSource
  equivalent (partitioned layout, pruning, vectorized parquet/orc).
- **rate**: Spark's rate source — the datagen connector equivalent for
  throughput tests.
- **kafka**: builder for `spark.readStream.format("kafka")` —
  KafkaDynamicSource.java:80 equivalent. No broker exists in this
  container, so construction is gated: the builder validates options
  and returns the unstarted reader; tests exercise the option plumbing
  only.
- **values**: inline literal rows (ValuesInputFormat.java).

Upsert-kafka maps to kafka + streaming.changelog.changelog_normalize
(the reference plans exactly that: source + ChangelogNormalize).
"""

from __future__ import annotations

import os
import re
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession

_FILE_FORMATS = ("parquet", "csv", "json", "orc", "text", "avro", "protobuf")


def file_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    streaming: bool = False,
    partition_cols: Iterable[str] = (),
    **options: str,
) -> DataFrame:
    """FileSystemTableSource: batch or streaming scan over a path.

    Streaming file sources require an explicit schema (Spark contract);
    batch sources infer from footers/headers per format.
    ``partition_cols`` names Hive-style directory partition columns —
    only consulted by the jar-free avro/protobuf decoders (the native
    formats do their own partition discovery).
    """
    if fmt not in _FILE_FORMATS:
        raise ValueError(f"unsupported file format: {fmt}")
    if fmt == "avro":
        # no spark-avro DataSource in this environment; route through
        # the pure-Python OCF reader (sources/avro_format.py, validated
        # against the JVM avro-core writer). The decoder runs in
        # mapInPandas over binaryFile rows — batch, or a readStream
        # file listing (AvroInputFormat.java:66 serves both modes).
        from pyspark.sql.types import StructType

        from flink_release_1_16_0_spark.sources.avro_format import avro_source

        st = None
        if schema is not None:
            st = (
                schema
                if isinstance(schema, StructType)
                else StructType.fromDDL(schema)
            )
        if streaming and st is None:
            raise ValueError("streaming avro scans require an explicit schema")
        ptypes = None
        if partition_cols and st is not None:
            ptypes = {c: st[c].dataType for c in partition_cols}
        return avro_source(
            spark,
            path,
            partition_cols=ptypes,
            streaming=streaming,
            reader_schema=st,
        )
    if fmt == "protobuf":
        # jar-free wire-format decoder (sources/protobuf_format.py);
        # the DDL schema supplies the row layout (column i = field i+1)
        if schema is None:
            raise ValueError("'protobuf' format requires an explicit schema")
        from pyspark.sql.types import StructType

        from flink_release_1_16_0_spark.sources.protobuf_format import (
            protobuf_source,
        )

        st = schema if isinstance(schema, StructType) else StructType.fromDDL(schema)
        ignore = options.get("protobuf.ignore-parse-errors", "false") == "true"
        return protobuf_source(
            spark,
            path,
            st,
            ignore_parse_errors=ignore,
            partition_cols=list(partition_cols),
            streaming=streaming,
        )
    if streaming:
        if schema is None:
            raise ValueError("streaming file sources require an explicit schema")
        reader = spark.readStream.schema(schema)
        if os.path.isfile(path):
            # the streaming file source monitors directories; a
            # single-file table scans its parent filtered to that file
            reader = reader.option("pathGlobFilter", os.path.basename(path))
            path = os.path.dirname(path)
    else:
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
    return reader.format(fmt).options(**options).load(path)


def rate_source(
    spark: SparkSession, rows_per_second: int = 100, num_partitions: int = 1
) -> DataFrame:
    """Datagen-equivalent: monotonically increasing (timestamp, value)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .option("numPartitions", str(num_partitions))
        .load()
    )


def kafka_options_from_ddl(options: dict) -> dict:
    """Translate Flink Kafka DDL options to Spark kafka reader options.

    The option surface is KafkaConnectorOptions.java (TOPIC,
    TOPIC_PATTERN, PROPS_BOOTSTRAP_SERVERS, SCAN_STARTUP_MODE,
    SCAN_STARTUP_SPECIFIC_OFFSETS, SCAN_STARTUP_TIMESTAMP_MILLIS, and
    the ``properties.*`` passthrough that
    KafkaConnectorOptionsUtil.getKafkaProperties strips the prefix
    from). Pure mapping, no reader construction — unit-testable with no
    kafka jar in the environment. Mode mapping:

    - earliest-offset / latest-offset -> startingOffsets
    - timestamp -> startingTimestamp (ms, from
      scan.startup.timestamp-millis)
    - specific-offsets -> startingOffsets JSON
      (``partition:0,offset:42;partition:1,offset:300`` ->
      ``{"topic": {"0": 42, "1": 300}}``)
    - group-offsets -> startingOffsets=earliest (documented divergence:
      Spark's kafka source manages offsets in its own checkpoint, not
      the consumer group; first-run behavior falls back to earliest)
    """
    import json as _json

    opts = dict(options)
    out: dict[str, str] = {}
    servers = opts.pop("properties.bootstrap.servers", "")
    if not servers:
        raise ValueError("'properties.bootstrap.servers' is required")
    out["kafka.bootstrap.servers"] = servers
    topic = opts.pop("topic", None)
    pattern = opts.pop("topic-pattern", None)
    if (topic is None) == (pattern is None):
        raise ValueError("exactly one of 'topic' / 'topic-pattern' is required")
    if topic is not None:
        # Flink's TOPIC is a List<String> ('t1;t2'); Spark wants commas
        out["subscribe"] = ",".join(t for t in re.split(r"[;,]", topic) if t)
    else:
        out["subscribePattern"] = pattern
    mode = opts.pop("scan.startup.mode", "group-offsets")
    if mode == "earliest-offset":
        out["startingOffsets"] = "earliest"
    elif mode == "latest-offset":
        out["startingOffsets"] = "latest"
    elif mode == "group-offsets":
        out["startingOffsets"] = "earliest"
    elif mode == "timestamp":
        out["startingTimestamp"] = opts.pop("scan.startup.timestamp-millis")
    elif mode == "specific-offsets":
        if topic is None:
            raise ValueError("specific-offsets requires 'topic'")
        spec = opts.pop("scan.startup.specific-offsets")
        offsets: dict[str, int] = {}
        for item in spec.split(";"):
            m = re.fullmatch(
                r"\s*partition:\s*(\d+)\s*,\s*offset:\s*(\d+)\s*", item
            )
            if not m:
                raise ValueError(f"cannot parse specific-offsets item {item!r}")
            offsets[m.group(1)] = int(m.group(2))
        out["startingOffsets"] = _json.dumps(
            {t: offsets for t in out["subscribe"].split(",")}
        )
    else:
        raise ValueError(f"unsupported scan.startup.mode {mode!r}")
    for k in list(opts):
        if k.startswith("properties."):
            out["kafka." + k[len("properties.") :]] = opts.pop(k)
    return out


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str | Iterable[str],
    starting_offsets: str = "earliest",
    **options: str,
) -> DataFrame:
    """KafkaDynamicSource equivalent: an unstarted streaming reader.

    Output schema is Spark's fixed kafka relation (key/value binary,
    topic, partition, offset, timestamp); callers decode `value` with a
    format function (from_json/from_csv) exactly as the reference pairs
    a connector with a DecodingFormat. Option translation lives in
    :func:`kafka_options_from_ddl` so it stays testable without the
    kafka jar.
    """
    if not bootstrap_servers:
        raise ValueError("bootstrap_servers is required")
    topic_list = topics if isinstance(topics, str) else ",".join(topics)
    ddl_opts = {
        "properties.bootstrap.servers": bootstrap_servers,
        "topic": topic_list,
        "scan.startup.mode": {
            "earliest": "earliest-offset",
            "latest": "latest-offset",
        }.get(starting_offsets, "earliest-offset"),
    }
    reader_opts = kafka_options_from_ddl(ddl_opts)
    reader_opts.update(options)
    return spark.readStream.format("kafka").options(**reader_opts).load()


def values_source(
    spark: SparkSession, rows: list[tuple], schema: str
) -> DataFrame:
    """ValuesInputFormat: inline literal rows."""
    return spark.createDataFrame(rows, schema)


def compact_files(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: list[str] | None = None,
) -> int:
    """Filesystem sink compaction: rewrite a directory of small files
    into ~target-size files (FileSystemTableSink 'auto-compaction' /
    'compaction.file-size'; CompactOperator). The streaming file sink
    commits many small files per trigger; a periodic compaction pass
    keeps scan-side split counts (and namenode pressure) bounded —
    at 100 TB this runs per partition directory, and the rewrite is one
    coalesce-free repartition sized from the actual on-disk bytes.

    Returns the repartition width (files per partition directory when
    ``partition_cols`` is set). Commit protocol: the rewrite lands in a
    sibling temp dir, the old dir is renamed aside, the temp renamed
    in, then the old data deleted — readers only ever see a complete
    directory except for the instant between the two renames (a true
    atomic swap needs a metastore pointer flip, which is what the
    reference's compact coordinator provides); a crash mid-swap leaves
    the original intact under ``<path>__precompact_*`` for manual
    recovery.
    """
    import math
    import shutil
    import uuid as _uuid

    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if not f.startswith(("_", "."))
        )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.format(fmt).load(path)
    tag = _uuid.uuid4().hex[:8]
    tmp = f"{path.rstrip('/')}__compact_{tag}"
    if partition_cols:
        # co-partition by the partition columns so each output task
        # holds whole partition values — round-robin would write up to
        # n_files small files into EVERY partition directory
        shaped = df.repartition(n_files, *[F.col(c) for c in partition_cols])
        writer = shaped.write.format(fmt).mode("overwrite").partitionBy(
            *partition_cols
        )
    else:
        shaped = df.repartition(n_files)
        writer = shaped.write.format(fmt).mode("overwrite")
    writer.save(tmp)
    old = f"{path.rstrip('/')}__precompact_{tag}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files


def manifest_rewrite_files(
    spark: SparkSession,
    base: str,
    fmt: str = "parquet",
    target_file_bytes: int = 128 * 1024 * 1024,
    schema: str | None = None,
    partition_cols: list[str] | None = None,
    format_opts: dict | None = None,
) -> dict[str, int]:
    """DATA-file compaction under the manifest commit log — the
    table-format rewrite operation (Iceberg rewrite_data_files / Delta
    OPTIMIZE; the reference's CompactOperator role for its streaming
    sink). The rename-protocol path compacts by directory swap
    (:func:`compact_files`), which would rip files out from under a
    manifest reader — here the rewrite is a LOGICAL swap instead:

    1. read the LIVE files (manifest-resolved, so orphan and replaced
       generations are never re-compacted in) of every partition whose
       live file count exceeds its byte-derived target width;
    2. rewrite them into ~target-size files with globally-unique names
       landing in the final directories;
    3. publish ONE overwrite manifest declaring the new files live.

    Readers switch atomically at the manifest; the old generation stays
    on disk (invisible) until :func:`~flink_release_1_16_0_spark.sources
    .commit_protocol.manifest_vacuum_data` reclaims it past the grace.

    100 TB shape: ALL under-target partitions rewrite in ONE Spark job —
    hash-repartitioned on the partition columns so each partition's rows
    land in exactly one task and emerge as exactly one file (a
    per-partition job loop would serialize 10k driver-side jobs on a
    10k-partition table). Partitions whose live bytes exceed the target
    keep multiple files and rewrite in the rare per-partition fallback,
    sized ceil(bytes/target). Only partitions with more live files than
    their target width pay anything. Returns {partition_rel:
    new_file_count} for the rewritten partitions."""
    import warnings

    from flink_release_1_16_0_spark.sources.commit_protocol import (
        _COMMITS_DIR,
        _resolve,
    )

    pcols = list(partition_cols or [])
    commits = os.path.join(base, _COMMITS_DIR)
    if not os.path.isdir(commits):
        return {}
    # optimistic concurrency (Iceberg's rewrite-files validation): the
    # snapshot records the sequence it folded through; the publish
    # validates nothing conflicting (overwrite/replace/unknown) landed
    # in between and retries from a FRESH snapshot otherwise — without
    # it a user INSERT OVERWRITE inside the rewrite window would be
    # silently undone (the replaced generation resurrected). Merged
    # files adopted by an aborted attempt are unpublished orphans; the
    # data vacuum reclaims them past retention.
    for _attempt in range(3):
        live, snapshot_seq, _start = _resolve(commits)
        result = _rewrite_once(
            spark, base, fmt, target_file_bytes, schema, pcols,
            format_opts, live, snapshot_seq,
        )
        if result is not None:
            return result
    warnings.warn(
        "manifest rewrite kept conflicting with concurrent commits after "
        "3 attempts; skipped this round (the next COMPACT retries)",
        RuntimeWarning,
        stacklevel=2,
    )
    return {}


def _rewrite_once(
    spark, base, fmt, target_file_bytes, pcols_schema, pcols, format_opts,
    live, snapshot_seq,
) -> dict[str, int] | None:
    """One optimistic rewrite attempt against a resolved snapshot;
    None = publish conflicted (caller re-snapshots)."""
    import math
    import shutil as _sh
    import uuid as _uuid

    from pyspark.sql import functions as F

    from flink_release_1_16_0_spark.sources.commit_protocol import (
        RewriteConflict,
        _data_files,
        _publish_manifest,
    )

    schema = pcols_schema
    replaced: dict[str, list[str]] = {}  # exactly the files we read
    small: dict[str, list[str]] = {}  # merge-to-one-file candidates
    big: dict[str, tuple[list[str], int]] = {}  # oversized: n_out > 1
    for rel, names in live.items():
        if len(names) < 2:
            continue  # nothing to merge
        d = os.path.join(base, rel) if rel else base
        paths = [os.path.join(d, n) for n in sorted(names)]
        total = sum(os.path.getsize(p) for p in paths if os.path.exists(p))
        n_out = max(1, math.ceil(total / target_file_bytes))
        if n_out >= len(names):
            continue  # already at or under target width
        replaced[rel] = sorted(names)
        if n_out == 1:
            small[rel] = paths
        else:
            big[rel] = (paths, n_out)

    rewritten: dict[str, list[str]] = {}

    def _reader():
        r = spark.read.format(fmt).options(**(format_opts or {}))
        return r.schema(schema) if schema else r

    def _adopt(staging: str, rel: str) -> None:
        d = os.path.join(base, rel) if rel else base
        os.makedirs(d, exist_ok=True)
        names = sorted(_data_files(staging))
        for f in names:
            # Spark part-file names embed a task uuid: unique in d
            os.replace(os.path.join(staging, f), os.path.join(d, f))
        rewritten[rel] = names

    if small:
        staging = os.path.join(base, f".compact-{_uuid.uuid4().hex}")
        df = _reader().option("basePath", base).load(
            [p for paths in small.values() for p in paths]
        )
        if pcols:
            # one task per partition value -> one file per partition
            w = (
                df.repartition(*[F.col(c) for c in pcols])
                .write.format(fmt)
                .options(**(format_opts or {}))
                .partitionBy(*pcols)
            )
        else:
            w = (
                df.repartition(1)
                .write.format(fmt)
                .options(**(format_opts or {}))
            )
        w.mode("overwrite").save(staging)
        if pcols:
            # adopt exactly the victim partitions (hash-partitioned
            # write produced one leaf dir per value)
            for rel in small:
                leaf = os.path.join(staging, rel)
                if os.path.isdir(leaf):
                    _adopt(leaf, rel)
        else:
            _adopt(staging, "")
        _sh.rmtree(staging, ignore_errors=True)

    for rel, (paths, n_out) in big.items():
        d = os.path.join(base, rel) if rel else base
        staging = os.path.join(d, f".compact-{_uuid.uuid4().hex}")
        # oversized partitions read WITHOUT basePath (no partition
        # columns in the data files, none needed: one rel at a time)
        reader = spark.read.format(fmt).options(**(format_opts or {}))
        if schema:
            if pcols:
                # strip partition columns STRUCTURALLY: parse the DDL
                # and drop fields by name — a textual split(",") would
                # shred parameterized types (DECIMAL(10,2)) and nested
                # STRUCT/MAP fields whose inner names collide with a
                # partition column
                from pyspark.sql.types import StructType as _ST

                st = _ST.fromDDL(schema)
                pset = set(pcols)
                data_schema = _ST([f for f in st.fields if f.name not in pset])
                reader = reader.schema(data_schema)
            else:
                reader = reader.schema(schema)
        df = reader.load(paths)
        df.repartition(n_out).write.format(fmt).options(
            **(format_opts or {})
        ).mode("overwrite").save(staging)
        _adopt(staging, rel)
        _sh.rmtree(staging, ignore_errors=True)

    if rewritten:
        # delete+add, NOT a partition overwrite: the manifest removes
        # exactly the files this rewrite READ and adds their merged
        # replacements, so a concurrent APPEND keeps its files; ordering
        # against concurrent overwrites/replaces is handled by the
        # snapshot-conflict validation in _publish_manifest
        try:
            _publish_manifest(
                base,
                {
                    "replace": {rel: replaced[rel] for rel in rewritten},
                    "partitions": sorted(rewritten),
                    "files": rewritten,
                },
                snapshot_seq=snapshot_seq,
            )
        except RewriteConflict:
            return None
    return {rel: len(v) for rel, v in rewritten.items()}


def sequence_file_source(
    spark: SparkSession, path: str, key_col: str = "key", value_col: str = "value"
) -> DataFrame:
    """Hadoop SequenceFile source (flink-formats/flink-sequence-file;
    the reference reads Writable K/V pairs through its hadoop
    compatibility layer). Spark's Hadoop client converts the common
    Writables (Text/Long/Int/Double/BytesWritable) to Python values;
    the pair lands as a two-column DataFrame.

    Scale shape: sequence files are block-splittable and sc.sequenceFile
    preserves HDFS split parallelism — one task per split, no driver
    materialization."""
    rdd = spark.sparkContext.sequenceFile(path)
    return spark.createDataFrame(rdd).toDF(key_col, value_col)


def write_sequence_file(
    df: DataFrame, path: str, key_col: str, value_col: str
) -> None:
    """SequenceFile sink (SequenceFileWriterFactory.java:43 — the
    reference's bulk Writable writer for the streaming file sink).
    Partition-parallel saveAsSequenceFile of (key, value) pairs."""
    df.select(key_col, value_col).rdd.map(tuple).saveAsSequenceFile(path)
