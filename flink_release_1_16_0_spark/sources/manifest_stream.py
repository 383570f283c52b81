"""Incremental (streaming) scan over a manifest table's commit log.

The reference's filesystem connector supports CONTINUOUS reads: the
streaming source monitors the directory and emits each newly committed
file exactly once (FileSystemTableSource.java:83 streaming read +
ContinuousFileMonitoringFunction). Under this engine's manifest commit
protocol the equivalent — and strictly stronger — signal is the commit
LOG itself: every published ``manifest-<seq>.json`` names exactly the
files one atomic commit added, so tailing the log by sequence number
gives exactly-once file-level delivery with no directory diffing and no
mtime heuristics (the Delta/Iceberg incremental-read shape).

Spark-idiomatic lowering: a Python Data Source (pyspark 4
``DataSourceStreamReader``) whose OFFSET is the manifest sequence
number. Structured Streaming checkpoints the offset, so a crashed and
restarted query resumes at the committed sequence — exactly-once by
construction. Each micro-batch plans one input partition per manifest
(commits replay in order within a batch but files of independent
commits read in parallel across executors — at 100 TB the tail's cost
is the new data, never a re-listing of the table).

Semantics notes:

- The tail emits APPEND rows: each manifest's ``files`` (added files).
  Logical OVERWRITE/replace manifests also just add their new files —
  the reference's continuous file source has the same contract (new
  files only; it cannot retract). A downstream changelog consumer can
  compose :mod:`..streaming.changelog` on top.
- History folded into a checkpoint before the stream starts is not
  tailable (the manifests may be vacuumed); ``initialOffset`` is the
  newest checkpoint's folded sequence, i.e. the tail starts at "now
  minus the unfolded tail", exactly like Flink's monitoring source
  starting from the current directory state.
- A claimed-but-unreadable manifest younger than the publish lease
  makes the batch retry (it may still publish — skipping would lose
  its files); an old corpse is a withdrawn claim and is skipped, the
  same adjudication rule the batch resolver uses.
"""

from __future__ import annotations

import os
import time

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from flink_release_1_16_0_spark.sources.commit_protocol import (
    _COMMITS_DIR,
    _latest_checkpoint,
    _max_seq,
    _read_json,
    _tail_entries,
    DEAD_CLAIM_GRACE_S,
)

# how long partitions() polls for a mid-publish manifest body before
# giving up and failing the batch (see ManifestTailStreamReader)
MID_PUBLISH_POLL_S = 2.0


class _ManifestPartition(InputPartition):
    def __init__(self, paths: list[str]):
        self.paths = paths


class ManifestTailStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options: dict):
        self._base = options["path"]
        self._commits = os.path.join(self._base, _COMMITS_DIR)
        self._fields = [f.name for f in schema.fields]

    def initialOffset(self) -> dict:
        folded, _ = _latest_checkpoint(self._commits)
        return {"seq": folded}

    def latestOffset(self) -> dict:
        return {"seq": _max_seq(self._commits)}

    def partitions(self, start: dict, end: dict):
        parts = []
        for seq, fn in _tail_entries(self._commits, start["seq"], end["seq"]):
            full = os.path.join(self._commits, fn)
            body = _read_json(full)
            if body is None:
                # mid-publish claim: poll briefly for the body to land
                # (publishes are a rename away, so this almost always
                # resolves within a few hundred ms)
                deadline = time.time() + MID_PUBLISH_POLL_S
                while body is None and time.time() < deadline:
                    time.sleep(0.05)
                    body = _read_json(full)
            if body is None:
                try:
                    age = time.time() - os.path.getmtime(full)
                except OSError:
                    continue  # vanished: folded+vacuumed under us
                if age <= DEAD_CLAIM_GRACE_S:
                    # Still mid-publish after polling: fail the batch.
                    # NOTE a planner exception TERMINATES the Structured
                    # Streaming query (it is not an automatic micro-batch
                    # retry) — the query must be restarted, and the offset
                    # checkpoint makes that restart exactly-once. Skipping
                    # instead would silently lose this commit's files.
                    raise RuntimeError(
                        f"manifest seq {seq} is claimed but unreadable "
                        "(publish in flight); restart the query — the "
                        "offset checkpoint makes the restart exactly-once"
                    )
                continue  # aged corpse: withdrawn claim, permanent gap
            paths = [
                os.path.join(self._base, rel, name) if rel else
                os.path.join(self._base, name)
                for rel, names in body.get("files", {}).items()
                for name in sorted(names)
            ]
            if paths:
                parts.append(_ManifestPartition(paths))
        return parts or [_ManifestPartition([])]

    def read(self, partition: _ManifestPartition):
        import pyarrow.parquet as pq

        for path in partition.paths:
            table = pq.read_table(path)
            for row in table.to_pylist():
                yield tuple(row.get(c) for c in self._fields)

    def commit(self, end: dict) -> None:
        pass  # offsets are durable in the query checkpoint


class ManifestTailDataSource(DataSource):
    """``spark.readStream.format("manifest_tail").schema(ddl)
    .option("path", base).load()`` — the registration entry point."""

    @classmethod
    def name(cls) -> str:
        return "manifest_tail"

    def schema(self):
        ddl = self.options.get("schema")
        if not ddl:
            raise ValueError(
                "manifest_tail needs an explicit schema (pass "
                ".schema(ddl) or option 'schema')"
            )
        return ddl

    def streamReader(self, schema):
        return ManifestTailStreamReader(schema, self.options)


def register_manifest_tail(spark) -> None:
    """Idempotently register the data source on this session."""
    spark.dataSource.register(ManifestTailDataSource)


def manifest_tail_stream(spark, base: str, schema_ddl: str):
    """Streaming DataFrame tailing the manifest log at ``base``."""
    register_manifest_tail(spark)
    return (
        spark.readStream.format("manifest_tail")
        .schema(schema_ddl)
        .option("path", base)
        .load()
    )
