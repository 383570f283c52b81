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
    "tpcds_deep3",
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
    "cep_negative",
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
    # round-11 window — part 1: the NEW surfaces — the manifest-log
    # incremental tail (Python data source streaming offsets), the
    # outer/semi/anti changelog joins (OuterJoinRecordStateView /
    # StreamingSemiAntiJoinOperator protocols), and the 13
    # archetype-tail TPC-DS shapes (tpcds_deep3.py).
    "stream_manifest_tail",
    "changelog_outer_join",
    "stream_changelog_outer_join",
    "stream_changelog_semi_join",
    "stream_changelog_anti_join",
    "ds_quantity_stdev_bands",
    "ds_chain_mean_compare",
    "ds_cumulative_full_outer",
    "ds_anti_ratio_rank",
    "ds_store_only_customers",
    "ds_order_exists_chain",
    "ds_net_qty_after_returns",
    "ds_before_after_pivot",
    "ds_date_offset_chain",
    "ds_channel_profit_rollup",
    "ds_returned_share_three_way",
    "ds_yoy_net_decline",
    "ds_best_worst_return_rate",
    # part 2: re-grades of code round 11 touched — the MATCH_RECOGNIZE
    # quantifier/navigation semantics (SQL ? never greedy, possessive
    # loops, offsets), the retracting-agg rowkind upgrade, the
    # window-dedup watermark eviction, the ratio re-ranking, the vacuum
    # retention floor, and the quadratic-guarded all-pairs baselines.
    "api_sql_match_recognize",
    "api_sql_match_nfa_define",
    "api_sql_match_reluctant",
    "api_sql_match_skip_last",
    "stream_cep_within",
    "cep_reluctant",
    "stream_group_agg",
    "stream_retract_minmax",
    "stream_window_dedup",
    "window_dedup",
    "ds_return_ratio_rank_union",
    "api_sql_manifest_maintenance",
    "api_sql_manifest_commit",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    # part 3: one representative per SURVEY section-2 family (rotation —
    # families green in earlier windows keep one seat each).
    "q1_pricing_summary",
    "q9_product_profit",
    "join_asof",
    "lookup_join_dim",
    "agg_grouping_sets",
    "over_ignore_nulls",
    "rank_topn_per_group",
    "setop_except_all",
    "func_collections",
    "window_session",
    "format_debezium_cdc",
    "stream_tumble_agg",
    "stream_window_allowed_lateness",
    "changelog_normalize",
    "udtag_table_agg_top2",
    "api_table_window_udaf",
    "correlate_unnest",
    "dedup_minhash_lsh",
    "similarity_brute_force_topk",
    "dsapi_window_cogroup",
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
