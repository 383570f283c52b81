"""Changelog-mode inference — the planner pass Catalyst lacks.

The reference decides, per physical operator, which row kinds flow and
how updates are encoded, in ``FlinkChangelogModeInferenceProgram``
(flink-table/flink-table-planner/src/main/scala/org/apache/flink/table/
planner/plan/optimize/program/FlinkChangelogModeInferenceProgram.scala,
run as the ``physical_rewrite`` phase, FlinkStreamProgram.scala:287).
It makes two traversals:

1. bottom-up, each node's **ModifyKindSet** — which of INSERT / UPDATE /
   DELETE it can emit (``ModifyKindSetTrait.scala``);
2. top-down, each edge's **UpdateKind** encoding
   (``UpdateKindTrait.scala:65,72``): ``BEFORE_AND_AFTER`` (updates as
   -U/+U pairs) vs ``ONLY_UPDATE_AFTER`` (bare +U, legal only when the
   consumer can key rows by the producer's unique key), materializing
   the decision as physical operators:
   - ``ChangelogNormalize`` (StreamExecChangelogNormalize.java:156)
     where a consumer needs retractions but the producer is an upsert
     stream — here :class:`UpsertToRetract`, executed by
     ``streaming.changelog.upsert_to_retract``;
   - ``DropUpdateBefore`` (DropUpdateBeforeFunction.java) where the
     consumer tolerates ONLY_UPDATE_AFTER;
   and rejecting plans with no legal encoding (the reference's
   "Table sink ... doesn't support consuming update changes"
   ValidationException, raised here as :class:`PlanError`).

Spark's Catalyst has no counterpart for any of this (SURVEY.md §4.1) —
DataFrames carry no row kind — so the pass runs over this engine's own
small operator DAG (SURVEY.md §7.0), *before* any DataFrame is built;
the executor then lowers the annotated DAG to plain Catalyst plans over
the ``__rowkind`` encoding. Planning cost is O(nodes) on the driver;
every injected operator lowers to a narrow Catalyst construct (a filter
for DropUpdateBefore, one keyed window pass for UpsertToRetract), so
the 100 TB cost profile is decided here, visibly, not at runtime.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame

from flink_release_1_16_0_spark.streaming import changelog as C

# ModifyKindSet members (ModifyKindSetTrait.scala)
INSERT, UPDATE, DELETE = "I", "U", "D"
# UpdateKind encodings (UpdateKindTrait.scala:65,72)
NONE = "NONE"
ONLY_UPDATE_AFTER = "ONLY_UPDATE_AFTER"
BEFORE_AND_AFTER = "BEFORE_AND_AFTER"


class PlanError(ValueError):
    """No changelog encoding satisfies the plan (the reference's
    ValidationException from FlinkChangelogModeInferenceProgram)."""


# --------------------------------------------------------------------------
# Operator DAG nodes (the engine's op graph, SURVEY.md §7.0)
# --------------------------------------------------------------------------


@dataclass
class Node:
    # filled in by infer(): which kinds this node emits, and how its
    # updates are encoded toward its consumer
    produces: frozenset[str] = field(default=frozenset(), init=False)
    update_kind: str = field(default=NONE, init=False)


@dataclass
class Source(Node):
    """A changelog table: ``mode`` is 'insert_only' (append),
    'upsert' (+I/+U/-D keyed by ``key``; e.g. upsert-kafka,
    UpsertKafkaDynamicTableFactory.java), or 'retract' (full
    +I/-U/+U/-D). ``ts_col``/``seq_col`` give the deterministic replay
    order of the bounded log."""

    df: DataFrame = None
    mode: str = "insert_only"
    key: tuple[str, ...] = ()
    ts_col: str = "ts"
    seq_col: str = "seq"


@dataclass
class Calc(Node):
    """Fused project+filter (StreamExecCalc). Forwards its input's
    changelog mode; an update key survives only if the projection keeps
    the key columns."""

    input: Node = None
    predicate: Column | None = None
    project: tuple[str, ...] | None = None


@dataclass
class GroupAgg(Node):
    """Unbounded grouped aggregation (StreamExecGroupAggregate /
    GroupAggFunction.java). Requires BEFORE_AND_AFTER encoding from an
    updating input (the accumulate/retract branches at
    GroupAggFunction.java:125-172); emits updates keyed by the group
    columns, and deletes once a group's count reaches zero."""

    input: Node = None
    keys: tuple[str, ...] = ()
    sum_cols: dict[str, Column] = field(default_factory=dict)
    count_alias: str = "n"


@dataclass
class Join(Node):
    """Two-input streaming join (StreamExecJoin /
    StreamingJoinOperator.java:60). An inner join of insert-only inputs
    stays insert-only; outer joins can retract their null-padding
    (StreamingJoinOperator's outer-state paths), and any updating input
    makes the output fully updating. A join consumes updating inputs
    only in BEFORE_AND_AFTER encoding (the planner normalizes upsert
    inputs in front of it), and its output has no inferable unique key
    here, so it emits BEFORE_AND_AFTER itself."""

    left: Node = None
    right: Node = None
    on: tuple[str, ...] = ()
    join_type: str = "inner"  # inner | left | right | full

    # single-input traversals reach both children through this
    @property
    def input(self) -> "Node":
        return self.left


@dataclass
class Sink(Node):
    """DML target. 'append' accepts inserts only; 'upsert' accepts
    +I/+U/-D keyed by ``key`` (ONLY_UPDATE_AFTER); 'retract' accepts
    the full encoding."""

    input: Node = None
    mode: str = "append"
    key: tuple[str, ...] = ()


@dataclass
class UpsertToRetract(Node):
    """Injected ChangelogNormalize (StreamExecChangelogNormalize.java:
    156): turns an upsert stream into a retract stream by emitting the
    -U of the prior version from per-key state."""

    input: Node = None


@dataclass
class DropUpdateBefore(Node):
    """Injected -U filter (DropUpdateBeforeFunction.java)."""

    input: Node = None


# --------------------------------------------------------------------------
# Pass 1 (bottom-up): ModifyKindSet
# --------------------------------------------------------------------------

_SOURCE_KINDS = {
    "insert_only": frozenset({INSERT}),
    "upsert": frozenset({INSERT, UPDATE, DELETE}),
    "retract": frozenset({INSERT, UPDATE, DELETE}),
}


def _modify_kinds(node: Node) -> frozenset[str]:
    if isinstance(node, Source):
        kinds = _SOURCE_KINDS.get(node.mode)
        if kinds is None:
            raise PlanError(f"unknown source mode {node.mode!r}")
    elif isinstance(node, (Calc, UpsertToRetract, DropUpdateBefore)):
        kinds = _modify_kinds(node.input)
    elif isinstance(node, Join):
        kl, kr = _modify_kinds(node.left), _modify_kinds(node.right)
        if node.join_type == "inner" and kl == kr == frozenset({INSERT}):
            kinds = frozenset({INSERT})
        else:
            # outer padding retraction, or updating inputs
            kinds = frozenset({INSERT, UPDATE, DELETE})
    elif isinstance(node, GroupAgg):
        in_kinds = _modify_kinds(node.input)
        # insert-only input: groups only ever grow -> I then U, never D;
        # updating input: a group's count can hit zero -> D too
        # (GroupAggFunction.java:155-166)
        kinds = (
            frozenset({INSERT, UPDATE})
            if in_kinds == frozenset({INSERT})
            else frozenset({INSERT, UPDATE, DELETE})
        )
    elif isinstance(node, Sink):
        kinds = _modify_kinds(node.input)
    else:
        raise PlanError(f"unknown node type {type(node).__name__}")
    node.produces = kinds
    return kinds


# --------------------------------------------------------------------------
# Pass 2 (top-down): UpdateKind + operator injection
# --------------------------------------------------------------------------


def _update_key(node: Node) -> tuple[str, ...]:
    """The unique key of the node's update stream, () if none survives."""
    if isinstance(node, Source):
        return tuple(node.key)
    if isinstance(node, Calc):
        key = _update_key(node.input)
        if node.project is not None and not set(key) <= set(node.project):
            return ()  # projection dropped the key -> key lost
        return key
    if isinstance(node, GroupAgg):
        return tuple(node.keys)
    if isinstance(node, (UpsertToRetract, DropUpdateBefore)):
        return _update_key(node.input)
    return ()  # Join and unknown nodes: no unique key survives


def _satisfy(node: Node, required: str) -> Node:
    """Rewrite `node` so its output satisfies the `required` encoding,
    injecting UpsertToRetract / DropUpdateBefore as needed (the
    SatisfyUpdateKindTraitVisitor of the reference program)."""
    has_updates = UPDATE in node.produces
    if not has_updates:
        node.update_kind = NONE
        return node

    if isinstance(node, Source):
        if node.mode == "upsert" and required == BEFORE_AND_AFTER:
            # upsert stream, consumer needs retractions -> normalize
            node.update_kind = ONLY_UPDATE_AFTER
            wrapped = UpsertToRetract(input=node)
            wrapped.produces = node.produces
            wrapped.update_kind = BEFORE_AND_AFTER
            return wrapped
        if node.mode == "retract" and required == ONLY_UPDATE_AFTER:
            node.update_kind = BEFORE_AND_AFTER
            wrapped = DropUpdateBefore(input=node)
            wrapped.produces = node.produces
            wrapped.update_kind = ONLY_UPDATE_AFTER
            return wrapped
        node.update_kind = required
        return node

    if isinstance(node, Calc):
        # the Calc itself is transparent: push the requirement to its
        # input, except ONLY_UPDATE_AFTER is only legal if the update
        # key survives the projection — otherwise the consumer cannot
        # match a bare +U to the row it replaces, so fall back to
        # BEFORE_AND_AFTER (UpdateKindTrait.scala:75-93 semantics)
        child_req = required
        if required == ONLY_UPDATE_AFTER and not _update_key(node):
            child_req = BEFORE_AND_AFTER
        node.input = _satisfy(node.input, child_req)
        node.update_kind = node.input.update_kind
        return node

    if isinstance(node, GroupAgg):
        # the agg's own input must be fully retractable whenever it
        # carries updates (GroupAggFunction.java:125-172)
        in_req = (
            BEFORE_AND_AFTER if UPDATE in node.input.produces else NONE
        )
        node.input = _satisfy(node.input, in_req)
        node.update_kind = required if required != NONE else BEFORE_AND_AFTER
        return node

    if isinstance(node, Join):
        # each updating input must arrive fully retractable — the
        # planner normalizes upsert sources in front of the join
        # (StreamExecJoin's required UpdateKindTrait); with no unique
        # key on the output, the join emits BEFORE_AND_AFTER
        node.left = _satisfy(
            node.left,
            BEFORE_AND_AFTER if UPDATE in node.left.produces else NONE,
        )
        node.right = _satisfy(
            node.right,
            BEFORE_AND_AFTER if UPDATE in node.right.produces else NONE,
        )
        node.update_kind = BEFORE_AND_AFTER
        return node

    raise PlanError(f"cannot satisfy {required} for {type(node).__name__}")


def infer(sink: Sink) -> Sink:
    """Run both traversals over the DAG rooted at `sink`; returns the
    (mutated) DAG with injected encoding operators and per-node
    ``produces`` / ``update_kind`` annotations."""
    _modify_kinds(sink)
    upstream = sink.input

    if sink.mode == "append":
        if upstream.produces - {INSERT}:
            raise PlanError(
                "append sink does not support consuming update and "
                "delete changes (reference: ValidationException from "
                "FlinkChangelogModeInferenceProgram)"
            )
        sink.input = _satisfy(upstream, NONE)
    elif sink.mode == "upsert":
        if not sink.key:
            raise PlanError("upsert sink requires a primary key")
        producer_key = _update_key(upstream)
        if UPDATE in upstream.produces and (
            not producer_key or set(producer_key) - set(sink.key)
        ):
            # the reference plans a SinkUpsertMaterializer here
            # (SinkUpsertMaterializer.java:62; our batch equivalent is
            # operators/sink.upsert_materialize_to_path) — surface the
            # mismatch instead of silently mis-keying the sink
            raise PlanError(
                f"upsert key {producer_key or None} does not match sink "
                f"primary key {tuple(sink.key)}: needs "
                "SinkUpsertMaterializer (operators/sink.py)"
            )
        sink.input = _satisfy(upstream, ONLY_UPDATE_AFTER)
    elif sink.mode == "retract":
        sink.input = _satisfy(upstream, BEFORE_AND_AFTER)
    else:
        raise PlanError(f"unknown sink mode {sink.mode!r}")
    sink.produces = sink.input.produces
    sink.update_kind = sink.input.update_kind
    return sink


# --------------------------------------------------------------------------
# Executor: lower the annotated DAG to a DataFrame (bounded replay)
# --------------------------------------------------------------------------


def _source_of(node: Node) -> Source:
    while not isinstance(node, Source):
        node = node.input
    return node


def _lower(node: Node) -> DataFrame:
    if isinstance(node, Source):
        df = node.df
        if node.mode == "insert_only" and C.ROWKIND not in df.columns:
            df = C.to_changelog(df)
        return df
    if isinstance(node, Calc):
        df = _lower(node.input)
        if node.predicate is not None:
            df = df.filter(node.predicate)
        if node.project is not None:
            src = _source_of(node)
            meta = [
                c
                for c in (C.ROWKIND, src.ts_col, src.seq_col)
                if c in df.columns and c not in node.project
            ]
            df = df.select(*meta, *node.project)
        return df
    if isinstance(node, UpsertToRetract):
        src = _source_of(node)
        return C.upsert_to_retract(
            _lower(node.input), src.key, src.ts_col, src.seq_col
        )
    if isinstance(node, DropUpdateBefore):
        return C.drop_update_before(_lower(node.input))
    if isinstance(node, GroupAgg):
        return C.retracting_group_agg(
            _lower(node.input),
            group_cols=list(node.keys),
            sum_cols=node.sum_cols,
            count_alias=node.count_alias,
        )
    if isinstance(node, Join):
        if node.join_type != "inner":
            raise PlanError(
                "only inner equi-joins lower to the bounded replay here; "
                "outer variants run as streaming.stateful."
                "streaming_changelog_join"
            )
        lsrc, rsrc = _source_of(node.left), _source_of(node.right)
        ldf = _lower(node.left).drop(lsrc.ts_col, lsrc.seq_col)
        rdf = _lower(node.right).drop(rsrc.ts_col, rsrc.seq_col)
        # changelog_join materializes (row, multiplicity) directly
        return C.changelog_join(ldf, rdf, list(node.on))
    raise PlanError(f"cannot lower {type(node).__name__}")


def execute(sink: Sink) -> DataFrame:
    """Lower an inferred DAG to its bounded-replay materialization:
    what a downstream table converges to after the log drains. The sink
    mode picks the final collapse — append passes through, upsert keeps
    the latest version per key, retract nets multiplicities."""
    if not sink.produces:  # not yet inferred
        infer(sink)
    df = _lower(sink.input)
    if isinstance(sink.input, (GroupAgg, Join)):
        # retracting agg / changelog join already materialize net state
        return df
    if sink.mode == "append":
        return df.drop(C.ROWKIND) if C.ROWKIND in df.columns else df
    src = _source_of(sink.input)
    if sink.mode == "upsert":
        return C.changelog_normalize(
            df, list(sink.key), src.ts_col, src.seq_col
        ).drop(src.ts_col, src.seq_col)
    return C.net_multiplicity(df.drop(src.ts_col, src.seq_col))


# --------------------------------------------------------------------------
# EXPLAIN CHANGELOG_MODE renderer (ExplainDetail.CHANGELOG_MODE;
# the reference renders `changelogMode=[I,UB,UA,D]` per physical node —
# FlinkRelOptUtil.toString with withChangelogTraits=true)
# --------------------------------------------------------------------------


def changelog_mode_str(node: Node) -> str:
    """Render a node's changelog mode the way the reference does:
    subset of [I, UB, UA, D] in that order. UB appears only under
    BEFORE_AND_AFTER encoding; ONLY_UPDATE_AFTER renders bare UA."""
    if not node.produces:
        raise PlanError("node not inferred yet — call infer() first")
    parts = []
    if INSERT in node.produces:
        parts.append("I")
    if UPDATE in node.produces:
        if node.update_kind == BEFORE_AND_AFTER:
            parts.append("UB")
        parts.append("UA")
    if DELETE in node.produces:
        parts.append("D")
    return ",".join(parts)


def _node_label(node: Node) -> str:
    if isinstance(node, Source):
        name = getattr(node, "table_name", None) or "source"
        return f"TableSourceScan(table=[{name}], mode=[{node.mode}]"
    if isinstance(node, UpsertToRetract):
        return "ChangelogNormalize(" + (
            f"key=[{', '.join(_update_key(node))}]"
        )
    if isinstance(node, DropUpdateBefore):
        return "DropUpdateBefore("
    if isinstance(node, Calc):
        bits = []
        if node.project is not None:
            bits.append(f"select=[{', '.join(node.project)}]")
        if node.predicate is not None:
            bits.append("where=[...]")
        return "Calc(" + ", ".join(bits)
    if isinstance(node, GroupAgg):
        return f"GroupAggregate(groupBy=[{', '.join(node.keys)}]"
    if isinstance(node, Join):
        return (
            f"Join(joinType=[{node.join_type}], "
            f"on=[{', '.join(node.on)}]"
        )
    if isinstance(node, Sink):
        return f"Sink(mode=[{node.mode}]"
    return type(node).__name__ + "("


def render(sink: Sink) -> str:
    """Render the inferred DAG as the reference's CHANGELOG_MODE
    explain tree: one line per node, `changelogMode=[...]` appended,
    children indented with the `+- ` / `   ` ASCII-art the reference's
    ExplainDetail.CHANGELOG_MODE output uses."""
    if not sink.produces:
        infer(sink)
    lines: list[str] = []

    def emit(node: Node, prefix: str, child_prefix: str) -> None:
        label = _node_label(node)
        sep = ", " if not label.endswith("(") else ""
        lines.append(
            f"{prefix}{label}{sep}changelogMode=[{changelog_mode_str(node)}])"
        )
        children = (
            [node.left, node.right]
            if isinstance(node, Join)
            else [node.input]
            if not isinstance(node, Source)
            else []
        )
        for i, ch in enumerate(children):
            last = i == len(children) - 1
            emit(
                ch,
                child_prefix + "+- ",
                child_prefix + ("   " if last else "|  "),
            )

    emit(sink, "", "")
    return "\n".join(lines)
