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


def upsert_to_retract(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    seq_col: str,
) -> DataFrame:
    """Expand an upsert log (+I/+U/-D, no -U) into a full retract log.

    This is the delta-emission half of ChangelogNormalize
    (StreamExecChangelogNormalize.java:156): the reference keeps the
    previous row per key in state and, for every incoming upsert, emits
    the retraction of the prior version before the new one. The batch
    form consults "state" via one window pass per key — a single
    shuffle on the key, one lag(), one explode; no self-join.

    Emission per input row (ordered by (ts, seq) within the key):
    - additive row, prior live version exists: ``-U(prev)`` then
      ``+U(new)``;
    - additive row, no prior version: ``+I(new)``;
    - ``-D`` row: ``-D(prev)`` — the payload comes from state, as in the
      reference, where an upsert delete may carry only the key.

    ``seq_col`` is rewritten to ``2*seq + sub`` so the emitted -U
    orders strictly before its +U under the same (ts, seq) ordering.
    """
    payload = [c for c in df.columns if c not in (ROWKIND, ts_col, seq_col)]
    w = Window.partitionBy(*keys).orderBy(ts_col, seq_col)
    cur = F.struct(*[F.col(c) for c in payload])
    prev = F.lag(cur).over(w)
    prev_kind = F.lag(F.col(ROWKIND)).over(w)
    has_prev = prev_kind.isin(*_ADDITIVE)
    is_add = F.col(ROWKIND).isin(*_ADDITIVE)
    emit = (
        F.when(
            is_add & has_prev,
            F.array(
                F.struct(
                    F.lit(UPDATE_BEFORE).alias("kind"),
                    F.lit(0).alias("sub"),
                    prev.alias("payload"),
                ),
                F.struct(
                    F.lit(UPDATE_AFTER).alias("kind"),
                    F.lit(1).alias("sub"),
                    cur.alias("payload"),
                ),
            ),
        )
        .when(
            is_add,
            F.array(
                F.struct(
                    F.lit(INSERT).alias("kind"),
                    F.lit(1).alias("sub"),
                    cur.alias("payload"),
                )
            ),
        )
        .otherwise(
            F.array(
                F.struct(
                    F.lit(DELETE).alias("kind"),
                    F.lit(1).alias("sub"),
                    F.coalesce(F.when(has_prev, prev), cur).alias("payload"),
                )
            )
        )
    )
    # window pass first (lag needs a Window node), then the generator
    return (
        df.select(F.col(ts_col), F.col(seq_col), emit.alias("__emit"))
        .select(F.col(ts_col), F.col(seq_col), F.explode("__emit").alias("e"))
        .select(
            F.col("e.kind").alias(ROWKIND),
            F.col(ts_col),
            (F.col(seq_col).cast("bigint") * 2 + F.col("e.sub")).alias(seq_col),
            "e.payload.*",
        )
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
    how: str = "inner",
) -> DataFrame:
    """Materialized equi-join of two bounded changelogs
    (``how`` = inner | left | right | full).

    The batch algebra of the reference's two-input streaming join
    (flink-table-runtime .../join/stream/StreamingJoinOperator.java:60):
    each side nets to (distinct row, multiplicity); the joined row's
    multiplicity is the product mL * mR — exactly the state a
    StreamingJoinOperator's downstream would converge to after draining
    both changelogs, independent of arrival interleaving. Outer rows
    (no live match on the other side) keep their own multiplicity with
    null-padded opposite payloads — the converged view of the
    OuterJoinRecordStateView null-padding protocol.

    Plan: two hash aggs (map-side combined) + one shuffled equi-join on
    the key — no row multiplication beyond true matches, so the 100 TB
    cost profile equals a plain join of the materialized tables.
    """
    if how not in ("inner", "left", "right", "full"):
        raise ValueError(f"how must be inner|left|right|full, got {how!r}")
    lnet = net_multiplicity(left, "__ml")
    rnet = net_multiplicity(right, "__mr")
    joined = lnet.join(rnet, list(on), "outer" if how == "full" else how)
    m = (
        F.when(F.col("__ml").isNull(), F.col("__mr"))
        .when(F.col("__mr").isNull(), F.col("__ml"))
        .otherwise(F.col("__ml") * F.col("__mr"))
    )
    return joined.withColumn(m_col, m.cast("bigint")).drop("__ml", "__mr")
