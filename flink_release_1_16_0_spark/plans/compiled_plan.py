"""COMPILE PLAN / EXECUTE PLAN — compiled-plan persistence.

The reference serializes an optimized ExecNodeGraph to JSON
(`COMPILE PLAN '<file>' FOR INSERT ...`, Parser.tdd:49,80,83;
TableEnvironmentImpl.compilePlanAndWrite, ExecNodeGraph JSON per the
golden ``*.out`` files under
flink-table-planner/src/test/resources/.../plan/nodes/exec/stream/)
and re-executes it later with ``EXECUTE PLAN '<file>'`` — the
restore-from-compiled-plan surface that pins a query's topology across
job restarts and version upgrades.

Spark-first dual: the engine's logical contract is the SQL statement
plus the catalog state it binds to (Catalyst re-derives the physical
plan on execution — re-optimizing at EXECUTE time is the Spark model,
and AQE re-plans at runtime anyway; freezing physical operators would
*lose* value here). So the compiled artifact persists:

- ``nodes`` / ``edges``: the engine's op-DAG (the changelog-inference
  node tree — Source/Calc/Join/GroupAgg/Sink with their changelog
  modes) in the reference's envelope shape (``flinkVersion``, node
  ``id``/``type``/``description``), best-effort: shapes outside the
  inference subset compile to a single ``sql-insert`` node.
- ``statements``: the INSERT statement(s), verbatim (a statement set
  compiles all of them, like the reference's
  ``COMPILE PLAN ... FOR STATEMENT SET``).
- ``tables``: full catalog metadata (schema, computed columns,
  watermark, primary key, partitioning, connector options, catalog/
  database attribution) for the sink and every referenced catalog
  table, so EXECUTE PLAN restores them into a fresh environment.
- ``configuration``: the table.* config snapshot at compile time.

``EXECUTE PLAN`` restores missing tables, applies the configuration,
and runs the statements through the same INSERT path as live SQL.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from flink_release_1_16_0_spark.table_env import TableEnvironment

_VERSION = "1.16"


def _dag_nodes(tenv: "TableEnvironment", insert_stmt: str) -> tuple[list, list]:
    """Render the changelog-inference op-DAG for one INSERT statement
    as (nodes, edges) in the golden-file envelope shape; fall back to a
    single ``sql-insert`` node for shapes the inference subset does not
    cover (the statement itself stays the executable contract)."""
    from flink_release_1_16_0_spark.plans import changelog_inference as CI

    try:
        sink = CI.infer(tenv._infer_op_dag(insert_stmt))
    except ValueError:
        return (
            [
                {
                    "id": 1,
                    "type": "sql-insert",
                    "description": insert_stmt.strip()[:200],
                    "inputProperties": [],
                }
            ],
            [],
        )

    nodes: list[dict] = []
    edges: list[dict] = []
    counter = {"id": 0}

    def walk(node) -> int:
        inputs = []
        if isinstance(node, CI.Join):
            inputs = [walk(node.left), walk(node.right)]
        elif hasattr(node, "input") and node.input is not None:
            inputs = [walk(node.input)]
        counter["id"] += 1
        nid = counter["id"]
        kind = type(node).__name__
        type_slug = {
            "Source": "stream-exec-table-source-scan_1",
            "Calc": "stream-exec-calc_1",
            "Join": "stream-exec-join_1",
            "GroupAgg": "stream-exec-group-aggregate_1",
            "Sink": "stream-exec-sink_1",
            "UpsertToRetract": "stream-exec-changelog-normalize_1",
            "DropUpdateBefore": "stream-exec-drop-update-before_1",
        }.get(kind, kind.lower())
        entry: dict = {
            "id": nid,
            "type": type_slug,
            "changelogMode": CI.changelog_mode_str(node),
            "description": CI._node_label(node),
            "inputProperties": [{} for _ in inputs],
        }
        tbl = getattr(node, "table_name", None)
        if tbl:
            entry["table"] = tbl
        key = getattr(node, "key", None)
        if key:
            entry["key"] = list(key)
        nodes.append(entry)
        for src in inputs:
            edges.append({"source": src, "target": nid})
        return nid

    walk(sink)
    return nodes, edges


def _referenced_tables(tenv: "TableEnvironment", statements: list[dict]) -> dict:
    """Catalog metadata for the sink and every catalog table the
    statement text references (word-boundary scan — same approach as
    StatementSet._shared_sources)."""
    import re

    out: dict[str, dict] = {}
    for st in statements:
        for name, tbl in tenv._tables.items():
            if name == st["sink"] or re.search(
                rf"\b{re.escape(name)}\b", st["query"], re.IGNORECASE
            ):
                d = dataclasses.asdict(tbl)
                d.pop("stats", None)
                out[name] = d
    return out


def compile_plan(
    tenv: "TableEnvironment", statements: list[dict], path: str, if_not_exists: bool
) -> None:
    """Write the compiled-plan JSON artifact. ``statements`` entries:
    {sink, query, overwrite, partition}. Overwriting an existing plan
    requires IF NOT EXISTS semantics to be explicit — the reference
    fails on an existing file unless IF NOT EXISTS is given
    (TableEnvironmentImpl.compilePlanAndWrite)."""
    if os.path.exists(path):
        if if_not_exists:
            return
        raise ValueError(
            f"cannot overwrite the compiled plan {path!r} "
            "(use COMPILE PLAN ... IF NOT EXISTS to keep the existing plan)"
        )
    all_nodes: list = []
    all_edges: list = []
    for st in statements:
        full = (
            f"INSERT {'OVERWRITE' if st['overwrite'] else 'INTO'} "
            f"{st['sink']} {st['query']}"
        )
        nodes, edges = _dag_nodes(tenv, full)
        offset = len(all_nodes)
        for n in nodes:
            n["id"] += offset
        all_nodes.extend(nodes)
        all_edges.extend(
            {"source": e["source"] + offset, "target": e["target"] + offset}
            for e in edges
        )
    plan = {
        "flinkVersion": _VERSION,
        "nodes": all_nodes,
        "edges": all_edges,
        "statements": statements,
        "tables": _referenced_tables(tenv, statements),
        "configuration": {
            k: v for k, v in tenv._config.items() if k.startswith("table.")
        },
    }
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(path, "w") as f:
        json.dump(plan, f, indent=2)


def execute_plan(tenv: "TableEnvironment", path: str):
    """EXECUTE PLAN '<file>': restore the catalog tables the plan
    carries (skipping names already registered), apply the compiled
    table.* configuration, and run each statement through the live
    INSERT path."""
    from flink_release_1_16_0_spark.table_env import (
        CatalogTable,
        ColumnSpec,
        TableResult,
    )

    if not os.path.exists(path):
        raise ValueError(f"compiled plan {path!r} does not exist")
    with open(path) as f:
        plan = json.load(f)
    if "statements" not in plan or "tables" not in plan:
        raise ValueError(f"{path!r} is not a compiled plan artifact")
    for name, d in plan["tables"].items():
        if name in tenv._tables:
            continue
        tbl = CatalogTable(
            name=d["name"],
            columns=[ColumnSpec(**c) for c in d["columns"]],
            computed=[tuple(x) for x in d.get("computed", [])],
            watermark=tuple(d["watermark"]) if d.get("watermark") else None,
            primary_key=list(d.get("primary_key", [])),
            partitioned_by=list(d.get("partitioned_by", [])),
            options=dict(d.get("options", {})),
            database=d.get("database", "default_database"),
            catalog=d.get("catalog", "default_catalog"),
        )
        cat = tbl.catalog
        tenv._catalogs.setdefault(cat, {"type": "generic_in_memory"})
        tenv._databases.setdefault(cat, {"default_database"}).add(tbl.database)
        tenv._register_table(tbl)
    for k, v in plan.get("configuration", {}).items():
        tenv._config.setdefault(k, v)
    results = []
    for st in plan["statements"]:
        results.append(
            tenv._insert(
                st["sink"],
                st["query"],
                bool(st.get("overwrite")),
                st.get("partition"),
                st.get("columns"),
            )
        )
    return TableResult(rows=["OK"] * len(results))
