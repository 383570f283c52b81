"""Sink-side operators: constraint enforcement and upsert
materialization (SURVEY.md section 2.1).

Reference: CommonExecSink plans a ConstraintEnforcer.java ahead of every
sink (NOT NULL violations -> error or drop; CHAR/VARCHAR length ->
trim/pad or error) and a SinkUpsertMaterializer.java:62 when the
changelog's upsert key differs from the sink's primary key.

Spark mapping: the enforcer is an injected projection/filter (pure
Catalyst — a CASE WHEN per constrained column); the upsert materializer
is changelog_normalize + an overwrite/MERGE write per micro-batch
(foreachBatch at streaming time, a keyed overwrite in batch).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_release_1_16_0_spark.streaming.changelog import changelog_normalize


class ConstraintViolation(Exception):
    """Raised (executor-side surfaced as a Spark job failure) when a NOT
    NULL constraint is violated under error policy — the behavior of
    `table.exec.sink.not-null-enforcer=ERROR`."""


def enforce_constraints(
    df: DataFrame,
    not_null: Sequence[str] = (),
    char_limits: dict[str, int] | None = None,
    on_null: str = "error",
) -> DataFrame:
    """ConstraintEnforcer.java as a projection.

    - `not_null`: columns that must be non-null. Policy 'error' makes
      the job fail on violation (via ANSI null-division trick is NOT
      used — we use raise_error, Spark's sanctioned mechanism);
      'drop' filters violating rows (table.exec.sink.not-null-enforcer).
    - `char_limits`: column -> max length; longer strings are trimmed
      (CHAR length enforcement; the reference's 'trim' policy).
    """
    out = df
    if on_null not in ("error", "drop"):
        raise ValueError("on_null must be 'error' or 'drop'")
    if not_null:
        if on_null == "drop":
            for c in not_null:
                out = out.filter(F.col(c).isNotNull())
        else:
            for c in not_null:
                out = out.withColumn(
                    c,
                    F.when(
                        F.col(c).isNull(),
                        F.raise_error(
                            F.lit(f"NOT NULL constraint violated on column {c}")
                        ).cast(dict(df.dtypes)[c]),
                    ).otherwise(F.col(c)),
                )
    for c, limit in (char_limits or {}).items():
        out = out.withColumn(c, F.substring(F.col(c), 1, limit))
    return out


def upsert_materialize_to_path(
    changelog_df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    path: str,
    seq_col: str | None = None,
) -> None:
    """SinkUpsertMaterializer: write the normalized current state of a
    changelog to a parquet target (batch form; the streaming form runs
    this inside foreachBatch against a MERGE-capable sink)."""
    changelog_normalize(changelog_df, keys, ts_col, seq_col).write.mode(
        "overwrite"
    ).parquet(path)
