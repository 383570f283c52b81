"""Async lookup join — the reference's async I/O pattern on Spark.

Reference: AsyncWaitOperator.java:91 (flink-streaming-java
.../operators/async/), AsyncLookupJoinRunner.java and
RetryableLookupFunctionDelegator.java (flink-table-runtime
.../operators/join/lookup/), AsyncLookupFunction.java:36. Flink hides
external point-lookup latency by keeping up to ``capacity`` requests
in flight per subtask and re-emitting results in input order (ORDERED
output mode).

On Spark the preferred plan for a snapshottable dimension is the
broadcast join (operators/lookup.py) — no per-row RPC at all. This
operator covers the case the reference's async path actually exists
for: a dimension that can ONLY be point-queried. The Spark-native
shape is ``mapInPandas`` with a bounded thread pool per Arrow batch:
the pool is the in-flight window, ``Executor.map`` preserves input
order (= ORDERED mode), and a retry wrapper reproduces the
fixed-delay retry delegator. Throughput profile matches the
reference's: concurrency = capacity x tasks, zero shuffle.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from concurrent.futures import ThreadPoolExecutor

import pandas as pd

from pyspark.sql import DataFrame


def async_lookup_join(
    df: DataFrame,
    lookup_fn: Callable[[object], dict | None],
    key_col,
    result_fields: dict[str, str],
    capacity: int = 8,
    retries: int = 2,
    retry_delay_s: float = 0.01,
    retry_on_miss: bool = False,
) -> DataFrame:
    """Left lookup join: one concurrent ``lookup_fn(key)`` per row.

    ``key_col`` is one column name or a sequence of them (multi-field
    lookup keys — ``lookup_fn`` then receives a tuple in that order).
    ``result_fields`` maps appended column name -> Spark type. A
    ``None`` lookup result pads NULLs (left-join semantics, matching
    LookupJoinRunner's null padding). ``retries``/``retry_delay_s``
    mirror the reference's retryable delegator (fixed-delay strategy);
    ``retry_on_miss=True`` also retries EMPTY results — the
    RetryPredicates.EMPTY_RESULT_PREDICATE strategy the reference's
    lookup-threshold cases exercise (a miss that would succeed on a
    later attempt resolves within the retry budget; an exhausted
    budget null-pads)."""
    keys = [key_col] if isinstance(key_col, str) else list(key_col)
    out_schema = df.schema.simpleString()[7:-1].replace(":", " ") + ", " + ", ".join(
        f"{name} {typ}" for name, typ in result_fields.items()
    )

    def with_retry(key: object) -> dict | None:
        last: Exception | None = None
        for attempt in range(retries + 1):
            try:
                r = lookup_fn(key)
            except Exception as exc:  # noqa: BLE001 - retry any lookup error
                last = exc
                time.sleep(retry_delay_s)
                continue
            if r is None and retry_on_miss and attempt < retries:
                time.sleep(retry_delay_s)
                continue
            return r
        if last is not None:
            raise last
        return None

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with ThreadPoolExecutor(max_workers=capacity) as pool:
            for pdf in batches:
                # Executor.map = ordered emission (Flink ORDERED mode);
                # the pool bound = the in-flight capacity window.
                if len(keys) == 1:
                    keyvals = pdf[keys[0]].tolist()
                else:
                    keyvals = list(
                        pdf[keys].itertuples(index=False, name=None)
                    )
                results = list(pool.map(with_retry, keyvals))
                for name in result_fields:
                    pdf[name] = [None if r is None else r.get(name) for r in results]
                yield pdf

    return df.mapInPandas(gen, schema=out_schema)
