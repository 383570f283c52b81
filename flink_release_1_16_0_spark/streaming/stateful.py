"""Custom stateful streaming operators via applyInPandasWithState.

These rebuild the reference's keyed-state operators that Structured
Streaming lacks natively (SURVEY.md section 7.0 "custom (real work)"):

- `streaming_dedup_keep_last` — keep the latest row per key across
  micro-batches (ProcTimeDeduplicateKeepLastRowFunction, reused by
  StreamExecChangelogNormalize.java:156). State: the current winner row.
- `streaming_topn` — per-key top-N by a sort column, maintained across
  batches (AbstractTopNFunction.java / AppendOnlyTopNFunction). State:
  the current top-N heap, re-emitted per batch.
- `streaming_retracting_agg` — unbounded group agg that emits the
  -U/+U changelog on every change (GroupAggFunction.java:125-172).
  State: the accumulators (count, sum).

Design notes for scale: state lives in Spark's checkpointed state store
partitioned by the grouping key (same layout as Flink's keyed RocksDB
state); each operator touches only its key group per batch, so the 100
TB story is identical to Flink's — state size bounded by key
cardinality x state-per-key, not input size. GroupStateTimeout gives
the state-TTL semantics of `table.exec.state.ttl`
(KeyedProcessFunctionWithCleanupState.java).

The emitted changelog uses the `__rowkind` encoding from
streaming.changelog (RowKind.java:31-52).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

from flink_release_1_16_0_spark.streaming.changelog import (
    DELETE,
    INSERT,
    ROWKIND,
    UPDATE_AFTER,
    UPDATE_BEFORE,
)


def _schema_with_rowkind(schema: StructType) -> StructType:
    from pyspark.sql.types import StringType, StructField

    return StructType([StructField(ROWKIND, StringType()), *schema.fields])


def streaming_dedup_keep_last(
    stream: DataFrame,
    keys: Sequence[str],
    order_col: str,
) -> DataFrame:
    """Latest row per key, maintained across micro-batches.

    Emits, per batch and changed key, the current winner. Downstream
    sinks overwrite by key (upsert materialization — the
    SinkUpsertMaterializer.java:62 pattern is the sink's MERGE).
    """
    out_schema = stream.schema
    cols = [f.name for f in out_schema.fields]
    state_schema = out_schema

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        best: pd.DataFrame | None = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            top = pdf.sort_values(order_col, kind="mergesort").tail(1)
            best = top if best is None else (
                pd.concat([best, top]).sort_values(order_col, kind="mergesort").tail(1)
            )
        if best is None:
            return
        if state.exists:
            prev = pd.DataFrame([state.get], columns=cols)
            merged = pd.concat([prev, best]).sort_values(order_col, kind="mergesort").tail(1)
        else:
            merged = best
        state.update(tuple(merged.iloc[0][c] for c in cols))
        yield merged[cols]

    return stream.groupBy(*keys).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_topn(
    stream: DataFrame,
    keys: Sequence[str],
    order_col: str,
    n: int,
    ascending: bool = False,
) -> DataFrame:
    """Per-key top-N maintained across batches (AppendOnlyTopNFunction).

    Re-emits the key's full current top-N whenever it changes; the sink
    replaces the key's previous top-N (update semantics, the batch dual
    of the reference's retract stream).
    """
    out_schema = stream.schema
    cols = [f.name for f in out_schema.fields]
    from pyspark.sql.types import ArrayType, StructField, StructType as ST

    state_schema = ST([StructField("rows", ArrayType(out_schema))])

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batches = [pdf for pdf in pdfs if len(pdf)]
        if not batches:
            return
        new = pd.concat(batches, ignore_index=True)
        if state.exists:
            (rows,) = state.get
            prev = pd.DataFrame([tuple(r) for r in rows], columns=cols)
            new = pd.concat([prev, new], ignore_index=True)
        top = (
            new.sort_values(order_col, ascending=ascending, kind="mergesort")
            .head(n)
            .reset_index(drop=True)
        )
        state.update(([tuple(r) for r in top.itertuples(index=False)],))
        yield top[cols]

    return stream.groupBy(*keys).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_retracting_agg(
    stream: DataFrame,
    keys: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Unbounded SUM/COUNT per key emitting a -U/+U changelog.

    Mirrors GroupAggFunction.java:125-172: first batch for a key emits
    +I; later changes emit the UPDATE_BEFORE (prior accumulator) and
    UPDATE_AFTER (new accumulator); a key whose count returns to zero
    would emit -D (reachable only with changelog inputs).
    """
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType as ST,
    )

    key_fields = [stream.schema[k] for k in keys]
    out_schema = ST(
        [
            StructField(ROWKIND, StringType()),
            *key_fields,
            StructField("n", LongType()),
            StructField("total", DoubleType()),
        ]
    )
    state_schema = ST(
        [StructField("n", LongType()), StructField("total", DoubleType())]
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        add_n, add_total = 0, 0.0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            add_n += len(pdf)
            add_total += float(pdf[value_col].sum())
        if add_n == 0:
            return
        rows = []
        if state.exists:
            n0, t0 = state.get
            rows.append((UPDATE_BEFORE, *key, n0, t0))
            n1, t1 = n0 + add_n, t0 + add_total
            rows.append((UPDATE_AFTER, *key, n1, t1))
        else:
            n1, t1 = add_n, add_total
            rows.append((INSERT, *key, n1, t1))
        if n1 == 0:
            rows.append((DELETE, *key, 0, 0.0))
            state.remove()
        else:
            state.update((n1, t1))
        yield pd.DataFrame(rows, columns=[ROWKIND, *keys, "n", "total"])

    return stream.groupBy(*keys).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_over_rows_unbounded(
    stream: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Streaming OVER aggregation: per-row running count/sum per key
    across micro-batches (StreamExecOverAggregate /
    RowTimeRowsUnboundedPrecedingFunction — SURVEY.md section 2.5).

    Spark has no streaming window functions; this is the keyed-state
    rebuild: state carries (n, cents) forward, each batch is sorted by
    the event-time order columns and emitted with cumulative values.
    Sums run in integer cents (the fixture's 2-decimal grid) so results
    are exact and batch-split-invariant.
    """
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType as ST,
    )

    key_fields = [stream.schema[k] for k in keys]
    id_field = stream.schema[id_col]
    out_schema = ST(
        [
            *key_fields,
            id_field,
            StructField("running_n", LongType()),
            StructField("running_sum", DoubleType()),
        ]
    )
    state_schema = ST(
        [StructField("n", LongType()), StructField("cents", LongType())]
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batches = [pdf for pdf in pdfs if len(pdf)]
        if not batches:
            return
        pdf = pd.concat(batches, ignore_index=True).sort_values(
            list(order_cols), kind="mergesort"
        )
        n0, cents0 = state.get if state.exists else (0, 0)
        cents = (pdf[value_col] * 100).round().astype("int64").cumsum() + cents0
        running_n = pd.RangeIndex(1, len(pdf) + 1) + n0
        out = pd.DataFrame(
            {
                **{k: pdf[k] for k in keys},
                id_col: pdf[id_col],
                "running_n": list(running_n),
                "running_sum": (cents / 100.0).astype("float64"),
            }
        )
        state.update((int(running_n[-1]), int(cents.iloc[-1])))
        yield out

    return stream.groupBy(*keys).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
