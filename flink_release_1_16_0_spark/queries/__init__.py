"""Operator-coverage query registry (SURVEY.md section 2 inventory).

Every implemented operator gets a named entry: a Spark callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) a DuckDB
oracle SQL string over the same parquet tables. The driver hash-compares
the two at sf0.01 — column names must match exactly, row order is free.

Determinism rules used throughout (see helpers in ``_util``):
- double-typed SUM/AVG go through DECIMAL(38,s) so the result is exact
  and order-independent, then back to DOUBLE (bit-identical across
  engines);
- every LIMIT/top-k query carries a total order (unique tiebreaker);
- integer SUMs are cast to BIGINT on the DuckDB side (DuckDB widens to
  HUGEINT, Spark stays BIGINT).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}

# Modules that populate REGISTRY on import.
_MODULES = (
    "tpch",
    "tpch_more",
    "tpch_full",
    "joins",
    "aggregates",
    "windows_over",
    "setops",
    "functions_sql",
    "event_windows",
    "llm_dedup",
    "llm_similarity",
    "llm_text",
    "streaming_queries",
    "changelog_queries",
    "plan_inference",
    "advanced_ops",
    "misc_relational",
    "udf_surface",
    "types_coverage",
    "api_facade",
)


def register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, bench=bench)
        return fn

    return deco


def load_registry() -> dict[str, QuerySpec]:
    """Import all query modules and return the populated registry."""
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")
    return REGISTRY
