"""Changelog (+I/-U/+U/-D) algebra — the reference's RowKind model.

The reference models every table as a changelog of rows tagged with a
RowKind (flink-core/.../types/RowKind.java:31-52: +I INSERT, -U
UPDATE_BEFORE, +U UPDATE_AFTER, -D DELETE). Spark has no per-row kind,
so this engine encodes it as a `__rowkind` string column on changelog
DataFrames (SURVEY.md section 7.0) and implements the operators that
consume/produce it:

- `changelog_normalize`: collapse a keyed changelog into current state
  (StreamExecChangelogNormalize.java:156 — keep the latest +I/+U per
  key, drop keys whose latest op is -D). One window scan per key: a
  single shuffle, no driver-side state.
- `retracting_group_agg`: grouped aggregation over a changelog where
  -U/-D rows retract their contribution (GroupAggFunction.java:125-172
  semantics). Signed aggregation: each row contributes sign*value with
  sign=+1 for +I/+U and -1 for -U/-D; groups whose net row count is 0
  vanish (the reference's COUNT(*) emptiness tracking that triggers
  -D emission).
- `drop_update_before`: DropUpdateBeforeFunction.java — a filter.

All are plain Catalyst plans (window scan / signed hash agg): they
scale exactly like the equivalent insert-only operators at 100 TB —
the changelog dimension adds one tiny string column and a sign
multiply, no extra shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ROWKIND = "__rowkind"
INSERT = "+I"
UPDATE_BEFORE = "-U"
UPDATE_AFTER = "+U"
DELETE = "-D"

_ADDITIVE = (INSERT, UPDATE_AFTER)
_RETRACTIVE = (UPDATE_BEFORE, DELETE)


def sign(kind: Column | None = None) -> Column:
    """+1 for +I/+U, -1 for -U/-D (the accumulate/retract branch of
    GroupAggFunction.java:125-172)."""
    k = kind if kind is not None else F.col(ROWKIND)
    return F.when(k.isin(*_ADDITIVE), F.lit(1)).otherwise(F.lit(-1))


def drop_update_before(df: DataFrame) -> DataFrame:
    """DropUpdateBeforeFunction.java: strip -U rows for consumers that
    only need upsert semantics."""
    return df.filter(F.col(ROWKIND) != UPDATE_BEFORE)


def changelog_normalize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    seq_col: str | None = None,
) -> DataFrame:
    """Materialize the current state of a keyed changelog.

    Keeps, per key, the latest row by (ts, seq) whose kind is additive;
    keys whose latest row is a DELETE disappear. `seq_col` breaks ties
    for updates sharing a timestamp (within Flink this is arrival
    order; in a bounded log it must be explicit to be deterministic).
    Output drops the rowkind/ordering metadata — it is a normal table.
    """
    order = [F.desc(ts_col)] + ([F.desc(seq_col)] if seq_col else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & F.col(ROWKIND).isin(*_ADDITIVE))
        .drop("__rn", ROWKIND)
    )


def retracting_group_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_cols: dict[str, Column] | None = None,
    count_alias: str = "n",
) -> DataFrame:
    """Grouped agg over a changelog with retraction semantics.

    `sum_cols` maps output alias -> value Column; each is aggregated as
    SUM(sign * value). The net row count per group is emitted as
    `count_alias`, and groups with net count 0 are dropped — mirroring
    the reference's behavior of emitting a deletion when the count
    accumulator hits zero (GroupAggFunction.java:155-166).
    """
    s = sign()
    aggs = [F.sum(s).cast("bigint").alias(count_alias)]
    for alias, col in (sum_cols or {}).items():
        # sign is int: int * decimal stays decimal, so the SUM is exact
        # and order-independent when callers pass decimal-cast values.
        aggs.append(F.sum(s * col).alias(alias))
    return (
        df.groupBy(*group_cols)
        .agg(*aggs)
        .filter(F.col(count_alias) != 0)
    )


def to_changelog(df: DataFrame, kind: str = INSERT) -> DataFrame:
    """Tag an insert-only DataFrame as a changelog (+I rows)."""
    return df.withColumn(ROWKIND, F.lit(kind))


def net_multiplicity(df: DataFrame, m_col: str = "__m") -> DataFrame:
    """Collapse a changelog into distinct rows with net multiplicity.

    The multiset view of a changelog (the state a retract-stream
    consumer accumulates): each distinct payload row maps to
    SUM(sign) copies; rows whose net count is zero vanish. This is the
    materialization half of the reference's retract-stream algebra
    (RowKind.java semantics applied to a bag, not a keyed table).
    One hash aggregation — map-side partial combine applies.
    """
    payload = [c for c in df.columns if c != ROWKIND]
    return (
        df.groupBy(*payload)
        .agg(F.sum(sign()).cast("bigint").alias(m_col))
        .filter(F.col(m_col) != 0)
    )


def changelog_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    m_col: str = "__m",
) -> DataFrame:
    """Materialized inner equi-join of two bounded changelogs.

    The batch algebra of the reference's two-input streaming join
    (flink-table-runtime .../join/stream/StreamingJoinOperator.java:60):
    each side nets to (distinct row, multiplicity); the joined row's
    multiplicity is the product mL * mR — exactly the state a
    StreamingJoinOperator's downstream would converge to after draining
    both changelogs, independent of arrival interleaving.

    Plan: two hash aggs (map-side combined) + one shuffled equi-join on
    the key — no row multiplication beyond true matches, so the 100 TB
    cost profile equals a plain join of the materialized tables.
    """
    lnet = net_multiplicity(left, "__ml")
    rnet = net_multiplicity(right, "__mr")
    return (
        lnet.join(rnet, list(on))
        .withColumn(m_col, (F.col("__ml") * F.col("__mr")).cast("bigint"))
        .drop("__ml", "__mr")
    )
