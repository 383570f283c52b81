"""Advanced operator coverage: CEP pattern matching, lookup join,
multimodal binary columns, streaming OVER aggregation.

Reference anchors: StreamExecMatch.java:59 / CepOperator.java:82 (CEP),
CommonExecLookupJoin + LookupFunction.java:35 (lookup join),
StreamExecOverAggregate / RowTimeRowsUnboundedPrecedingFunction
(streaming over-agg); multimodal columns are the training-data-pipeline
extension (binary payload + mapInPandas metadata extraction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_release_1_16_0_spark.catalog import load_table
from flink_release_1_16_0_spark.operators.cep import (
    classify,
    match_fixed_pattern,
    match_regex_pattern,
)
from flink_release_1_16_0_spark.operators.lookup import lookup_join
from flink_release_1_16_0_spark.operators.multimodal import (
    extract_media_metadata,
    with_binary_payload,
)
from flink_release_1_16_0_spark.queries import register
from flink_release_1_16_0_spark.streaming.core import replay_stream, run_to_table
from flink_release_1_16_0_spark.streaming.stateful import streaming_over_rows_unbounded

# --------------------------------------------------------------------------
# CEP fixed pattern: click -> click -> purchase on consecutive events of
# a user (lowered to LEAD window functions — the quantifier-free tier)
# --------------------------------------------------------------------------

_CEP_FIXED_ORACLE = """
WITH tagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN event_type = 'click' THEN 'c'
              WHEN event_type = 'purchase' THEN 'p'
              ELSE '-' END AS sym
  FROM events
), led AS (
  SELECT user_id, event_id, sym,
         LEAD(sym, 1) OVER w AS s1,
         LEAD(sym, 2) OVER w AS s2
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id AS start_event
FROM led WHERE sym = 'c' AND s1 = 'c' AND s2 = 'p'
"""


@register("cep_fixed_pattern", _CEP_FIXED_ORACLE, tags=("cep", "match"))
def cep_fixed_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sym = classify(
        {
            "c": F.col("event_type") == "click",
            "p": F.col("event_type") == "purchase",
        }
    )
    return match_fixed_pattern(
        ev, keys=["user_id"], order_cols=["ts", "event_id"], symbol=sym, pattern="ccp"
    ).select("user_id", F.col("event_id").alias("start_event"))


# --------------------------------------------------------------------------
# CEP regex pattern with quantifier: one-or-more clicks then a purchase
# (c+p, leftmost greedy, skip past last row) — the NFA tier in
# applyInPandas; oracle counts matches via regexp over the per-user
# symbol string
# --------------------------------------------------------------------------

_CEP_REGEX_ORACLE = """
WITH tagged AS (
  SELECT user_id,
         CASE WHEN event_type = 'click' THEN 'c'
              WHEN event_type = 'purchase' THEN 'p'
              ELSE '-' END AS sym,
         ts, event_id
  FROM events
), strs AS (
  SELECT user_id, string_agg(sym, '' ORDER BY ts, event_id) AS s
  FROM tagged GROUP BY user_id
)
SELECT user_id, len(regexp_extract_all(s, 'c+p')) AS n_matches
FROM strs
WHERE len(regexp_extract_all(s, 'c+p')) > 0
"""


@register("cep_regex_pattern", _CEP_REGEX_ORACLE, tags=("cep", "match"))
def cep_regex_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sym = classify(
        {
            "c": F.col("event_type") == "click",
            "p": F.col("event_type") == "purchase",
        }
    )
    matches = match_regex_pattern(
        ev, keys=["user_id"], ts_col="ts", symbol=sym, pattern="c+p", id_col="event_id"
    )
    return (
        matches.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_matches"))
    )


# --------------------------------------------------------------------------
# lookup join: events fetch their user's customer attributes (dim
# broadcast — the physical shape of a point lookup)
# --------------------------------------------------------------------------

_LOOKUP_ORACLE = """
SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment
FROM (SELECT * FROM events WHERE event_type = 'purchase') e
LEFT JOIN customer c ON e.user_id = c.c_custkey
"""


@register("lookup_join_dim", _LOOKUP_ORACLE, tags=("join", "lookup"))
def lookup_join_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return lookup_join(ev, cust, on=[("user_id", "c_custkey")], how="left").select(
        "event_id", "user_id", "c_name", "c_mktsegment"
    )


# --------------------------------------------------------------------------
# JDBC-backed lookup join: the dimension lives in a real database
# (embedded Derby — the only DB in this container) and is scanned
# through Spark's JDBC source, then broadcast against the fact — the
# batch shape of JdbcRowDataLookupFunction.java:54 point lookups.
# --------------------------------------------------------------------------

_JDBC_LOOKUP_ORACLE = """
SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment
FROM (SELECT * FROM events WHERE event_type = 'purchase') e
JOIN customer c ON e.user_id = c.c_custkey
"""


@register("jdbc_lookup_join", _JDBC_LOOKUP_ORACLE, tags=("join", "lookup", "jdbc"))
def jdbc_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_release_1_16_0_spark.sources.jdbc import jdbc_source, jdbc_write

    url = "jdbc:derby:memory:graft_registry;create=true"
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    jdbc_write(cust, url, "customer_dim", mode="overwrite")
    # Derby upper-cases unquoted identifiers; restore the source names
    dim = jdbc_source(spark, url, "customer_dim").toDF(
        "c_custkey", "c_name", "c_mktsegment"
    )
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return lookup_join(ev, dim, on=[("user_id", "c_custkey")], how="inner").select(
        "event_id", "user_id", "c_name", "c_mktsegment"
    )


# --------------------------------------------------------------------------
# multimodal: binary payload + mapInPandas metadata extraction (the
# Arrow-batched plumbing a real decoder slots into)
# --------------------------------------------------------------------------

_MEDIA_ORACLE = """
SELECT doc_id AS media_id,
       octet_length(encode(text)) AS byte_len,
       md5(text) AS content_hash,
       CAST(octet_length(encode(text)) % 640 + 16 AS INTEGER) AS fake_width,
       CAST(octet_length(encode(text)) % 480 + 16 AS INTEGER) AS fake_height
FROM documents
WHERE doc_id % 5 = 0
"""


@register("multimodal_metadata", _MEDIA_ORACLE, tags=("llm", "multimodal"))
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    media = with_binary_payload(docs, text_col="text", id_col="doc_id")
    return extract_media_metadata(media)


# --------------------------------------------------------------------------
# streaming OVER agg: per-row running count/sum per user across the
# replayed stream (custom keyed-state operator)
# --------------------------------------------------------------------------

_STREAM_OVER_ORACLE = """
SELECT user_id, event_id,
       ROW_NUMBER() OVER w AS running_n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS DOUBLE) / 100.0
         AS running_sum
FROM events
WHERE user_id % 10 = 6
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@register("stream_over_agg", _STREAM_OVER_ORACLE, tags=("streaming", "over"))
def stream_over_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = replay_stream(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 6)
    out = streaming_over_rows_unbounded(
        ev.select("user_id", "event_id", "ts", "value"),
        keys=["user_id"],
        order_cols=["ts", "event_id"],
        value_col="value",
        id_col="event_id",
    )
    return run_to_table(out, "update")


# --------------------------------------------------------------------------
# CEP MEASURES: per-variable FIRST/LAST/SUM/COUNT over c+p matches.
# Oracle via gaps-and-islands: a maximal click-run immediately followed
# by a purchase IS the leftmost non-overlapping c+p match (skip past
# last row), so the island aggregation reproduces the NFA measures.
# --------------------------------------------------------------------------

_CEP_MEASURES_ORACLE = """
WITH tagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN event_type = 'click' THEN 'c'
              WHEN event_type = 'purchase' THEN 'p'
              ELSE '-' END AS sym,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), clicks AS (
  SELECT *, rn - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) AS grp
  FROM tagged WHERE sym = 'c'
), islands AS (
  SELECT user_id, grp, MIN(rn) AS start_rn, MAX(rn) AS end_rn,
         CAST(COUNT(*) AS BIGINT) AS n_clicks,
         MIN(ts) AS first_click_ts,
         CAST(SUM(CAST(value AS DECIMAL(38,2))) AS DOUBLE) AS click_value_sum
  FROM clicks GROUP BY user_id, grp
)
SELECT i.user_id, i.n_clicks, i.first_click_ts, i.click_value_sum,
       p.event_id AS purchase_id, p.value AS purchase_value
FROM islands i
JOIN tagged p
  ON p.user_id = i.user_id AND p.rn = i.end_rn + 1 AND p.sym = 'p'
"""


@register("cep_measures", _CEP_MEASURES_ORACLE, tags=("cep", "match"))
def cep_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_release_1_16_0_spark.operators.cep import match_regex_measures

    ev = load_table(spark, sf_dir, "events")
    sym = classify(
        {
            "c": F.col("event_type") == "click",
            "p": F.col("event_type") == "purchase",
        }
    )
    return match_regex_measures(
        ev,
        keys=["user_id"],
        ts_col="ts",
        symbol=sym,
        pattern="(?P<C>c+)(?P<P>p)",
        id_col="event_id",
        measures={
            "n_clicks": ("C", "count", "event_id", "bigint"),
            "first_click_ts": ("C", "first", "ts", "timestamp"),
            "click_value_sum": ("C", "sum", "value", "double"),
            "purchase_id": ("P", "last", "event_id", "bigint"),
            "purchase_value": ("P", "last", "value", "double"),
        },
        value_cols=["value"],
        grid_scale=2,
    ).drop("match_no")


# --------------------------------------------------------------------------
# CEP ALL ROWS PER MATCH: every matched event of each c+p match, with
# RUNNING measures (CepOperator.java:82 per-row emission,
# MatchCodeGenerator.scala RUNNING evaluation). Oracle: same
# gaps-and-islands match derivation as _CEP_MEASURES_ORACLE, then the
# per-row running aggregates via a cumulative window inside each match.
# --------------------------------------------------------------------------

_CEP_ALL_ROWS_ORACLE = """
WITH tagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN event_type = 'click' THEN 'c'
              WHEN event_type = 'purchase' THEN 'p'
              ELSE '-' END AS sym,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), clicks AS (
  SELECT *, rn - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) AS grp
  FROM tagged WHERE sym = 'c'
), islands AS (
  SELECT user_id, grp, MIN(rn) AS start_rn, MAX(rn) AS end_rn
  FROM clicks GROUP BY user_id, grp
), matches AS (
  SELECT i.user_id, i.start_rn, i.end_rn,
         CAST(ROW_NUMBER() OVER (PARTITION BY i.user_id ORDER BY i.start_rn) - 1
              AS INT) AS match_no
  FROM islands i
  JOIN tagged p
    ON p.user_id = i.user_id AND p.rn = i.end_rn + 1 AND p.sym = 'p'
), rows_out AS (
  SELECT t.user_id, t.ts, t.event_id, t.value, t.sym, t.rn,
         m.match_no, m.start_rn, m.end_rn
  FROM tagged t
  JOIN matches m
    ON t.user_id = m.user_id AND t.rn BETWEEN m.start_rn AND m.end_rn + 1
)
SELECT user_id, ts, event_id, value, match_no,
       CASE WHEN sym = 'c' THEN 'C' ELSE 'P' END AS classifier,
       CAST(CASE WHEN sym = 'c' THEN rn - start_rn + 1
                 ELSE end_rn - start_rn + 1 END AS BIGINT) AS n_clicks,
       CAST(SUM(CASE WHEN sym = 'c' THEN CAST(value AS DECIMAL(38,2))
                     ELSE CAST(0 AS DECIMAL(38,2)) END)
            OVER (PARTITION BY user_id, start_rn ORDER BY rn) AS DOUBLE)
           AS click_value_sum
FROM rows_out
"""


@register("cep_all_rows_per_match", _CEP_ALL_ROWS_ORACLE, tags=("cep", "match"))
def cep_all_rows_per_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_release_1_16_0_spark.operators.cep import match_regex_all_rows

    ev = load_table(spark, sf_dir, "events")
    sym = classify(
        {
            "c": F.col("event_type") == "click",
            "p": F.col("event_type") == "purchase",
        }
    )
    return match_regex_all_rows(
        ev,
        keys=["user_id"],
        ts_col="ts",
        symbol=sym,
        pattern="(?P<C>c+)(?P<P>p)",
        id_col="event_id",
        measures={
            "n_clicks": ("C", "count", "event_id", "bigint"),
            "click_value_sum": ("C", "sum", "value", "double"),
        },
        value_cols=["value"],
        grid_scale=2,
    )


# --------------------------------------------------------------------------
# CEP NFA with cross-variable DEFINE: a purchase strictly larger than
# the FIRST click of its preceding click-run. Runtime predicate over
# the partial match's bindings — not expressible as a regex over
# precomputed symbols. It IS however SQL-expressible for this linear
# pattern: with leftmost-greedy matching + AFTER MATCH SKIP PAST LAST
# ROW, an attempt at start s matches iff events s..k are consecutive
# clicks followed by a purchase p with p.value > value(click_s)
# (backtracking the A+ run can only fail — B needs a purchase), so a
# match exists per maximal click-run iff SOME click is strictly below
# its terminating purchase, binding the EARLIEST such click. The oracle
# reproduces exactly that with window functions over click-runs.
# --------------------------------------------------------------------------

_CEP_NFA_ORACLE = """
WITH seq AS (
  SELECT user_id, ts, event_id, event_type, value,
         COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS run_id
  FROM events
  WHERE event_type IN ('click', 'purchase')
), clicks AS (
  SELECT user_id, run_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, run_id ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id, run_id) AS run_len
  FROM seq WHERE event_type = 'click'
), purchases AS (
  SELECT user_id, run_id, ts, event_id, value AS purchase_value
  FROM seq WHERE event_type = 'purchase'
), matched AS (
  SELECT p.user_id, p.run_id, p.ts, p.event_id, p.purchase_value,
         MIN(c.rn) AS start_rn, MAX(c.run_len) AS run_len
  FROM purchases p
  JOIN clicks c ON c.user_id = p.user_id AND c.run_id = p.run_id
             AND p.purchase_value > c.value
  GROUP BY p.user_id, p.run_id, p.ts, p.event_id, p.purchase_value
)
SELECT m.user_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY m.user_id ORDER BY m.ts, m.event_id) - 1 AS INT)
           AS match_no,
       CAST(m.run_len - m.start_rn + 1 AS BIGINT) AS n_clicks,
       fc.value AS first_click_value,
       m.purchase_value
FROM matched m
JOIN clicks fc ON fc.user_id = m.user_id AND fc.run_id = m.run_id AND fc.rn = m.start_rn
"""


@register("cep_nfa_define", _CEP_NFA_ORACLE, tags=("cep", "match"))
def cep_nfa_define(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_release_1_16_0_spark.operators.cep import match_nfa

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    is_click = lambda row, ctx: row["event_type"] == "click"  # noqa: E731

    def is_qualifying_purchase(row, ctx):
        return (
            row["event_type"] == "purchase"
            and row["value"] > ctx["A"][0]["value"]
        )

    return match_nfa(
        ev,
        keys=["user_id"],
        ts_col="ts",
        id_col="event_id",
        steps=[("A", "+"), ("B", "1")],
        defines={"A": is_click, "B": is_qualifying_purchase},
        measures={
            "n_clicks": ("A", "count", "event_id", "bigint"),
            "first_click_value": ("A", "first", "value", "double"),
            "purchase_value": ("B", "last", "value", "double"),
        },
        value_cols=["event_type", "value"],
    )


@register("api_sql_match_recognize", _CEP_MEASURES_ORACLE, tags=("cep", "match", "api", "sql"))
def api_sql_match_recognize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same clicks+purchase pattern as cep_measures, but expressed
    as Flink's MATCH_RECOGNIZE SQL clause and translated by the
    TableEnvironment (table_env._translate_match_recognize) — same
    oracle, so the SQL surface is hash-gated end to end."""
    from flink_release_1_16_0_spark.catalog import register_tables
    from flink_release_1_16_0_spark.table_env import TableEnvironment

    register_tables(spark, sf_dir, ("events",))
    tenv = TableEnvironment.create(spark)
    tenv.execute_sql("SET 'table.exec.match-recognize.sum-scale' = '2'")
    return tenv.sql_query(
        """
        SELECT user_id, n_clicks, first_click_ts, click_value_sum,
               purchase_id, purchase_value
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES
            COUNT(C.event_id) AS n_clicks,
            FIRST(C.ts) AS first_click_ts,
            SUM(C.value) AS click_value_sum,
            LAST(P.event_id) AS purchase_id,
            LAST(P.value) AS purchase_value
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (C+ P)
          DEFINE
            C AS C.event_type = 'click',
            P AS P.event_type = 'purchase'
        ) AS m
        """
    ).to_data_frame()


# --------------------------------------------------------------------------
# AFTER MATCH SKIP TO FIRST/LAST <var> through the SQL surface
# (SkipToFirstStrategy.java / SkipToLastStrategy.java; the planner's
# MatchRecognizeITCase skip forms). Pattern (S C+ E) over the user's
# click/purchase subsequence: purchase, clicks, purchase. SKIP TO LAST E
# resumes AT the closing purchase, so consecutive matches CHAIN through
# shared purchases — every consecutive purchase pair with >=1 click
# between them matches (PAST LAST ROW would only yield alternate pairs).
# Oracle: self-join consecutive purchases over the filtered sequence; the
# click-value sum comes from a cumulative DECIMAL window (grid scale 2,
# same device as the operator's grid_scale).
# --------------------------------------------------------------------------

_CEP_SKIP_CHAIN_ORACLE_FMT = """
WITH seq AS (
  SELECT user_id, ts, event_id, value, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type IN ('click', 'purchase')
), cums AS (
  SELECT *, SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(38,2))
                     ELSE CAST(0 AS DECIMAL(38,2)) END)
            OVER (PARTITION BY user_id ORDER BY rn) AS cum
  FROM seq
), purch AS (
  SELECT user_id, rn, event_id, cum,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) AS pn
  FROM cums WHERE event_type = 'purchase'
)
SELECT a.user_id, a.event_id AS start_purchase_id, b.event_id AS end_purchase_id,
       CAST(b.rn - a.rn - 1 AS BIGINT) AS n_clicks,
       {extra}
FROM purch a
JOIN purch b ON b.user_id = a.user_id AND b.pn = a.pn + 1 AND b.rn > a.rn + 1
"""

_CEP_SKIP_LAST_ORACLE = _CEP_SKIP_CHAIN_ORACLE_FMT.format(
    extra="CAST(b.cum - a.cum AS DOUBLE) AS click_value_sum"
)

_CEP_SKIP_FIRST_ORACLE = _CEP_SKIP_CHAIN_ORACLE_FMT.format(
    extra="""(SELECT c.value FROM seq c
        WHERE c.user_id = a.user_id AND c.rn = a.rn + 1) AS first_click_value,
       (SELECT c.value FROM seq c
        WHERE c.user_id = a.user_id AND c.rn = b.rn - 1) AS last_click_value"""
)


def _events_cp_view(spark: SparkSession, sf_dir: str) -> None:
    """Temp view of each user's click/purchase subsequence."""
    from flink_release_1_16_0_spark.catalog import register_tables

    register_tables(spark, sf_dir, ("events",))
    spark.sql(
        "SELECT * FROM events WHERE event_type IN ('click', 'purchase')"
    ).createOrReplaceTempView("events_cp")


@register("api_sql_match_skip_last", _CEP_SKIP_LAST_ORACLE, tags=("cep", "match", "api", "sql"))
def api_sql_match_skip_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_release_1_16_0_spark.table_env import TableEnvironment

    _events_cp_view(spark, sf_dir)
    tenv = TableEnvironment.create(spark)
    tenv.execute_sql("SET 'table.exec.match-recognize.sum-scale' = '2'")
    return tenv.sql_query(
        """
        SELECT user_id, start_purchase_id, end_purchase_id, n_clicks,
               click_value_sum
        FROM events_cp MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES
            S.event_id AS start_purchase_id,
            E.event_id AS end_purchase_id,
            COUNT(C.event_id) AS n_clicks,
            SUM(C.value) AS click_value_sum
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO LAST E
          PATTERN (S C+ E)
          DEFINE
            S AS S.event_type = 'purchase',
            C AS C.event_type = 'click',
            E AS E.event_type = 'purchase'
        ) AS m
        """
    ).to_data_frame()


@register("api_sql_match_skip_first", _CEP_SKIP_FIRST_ORACLE, tags=("cep", "match", "api", "sql"))
def api_sql_match_skip_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKIP TO FIRST C resumes at the first click after the opening
    purchase; attempts starting on clicks cannot match S, so scanning
    lands on the closing purchase — yielding the same chained
    consecutive-pair set (and differing from PAST LAST ROW, which skips
    alternate pairs)."""
    from flink_release_1_16_0_spark.table_env import TableEnvironment

    _events_cp_view(spark, sf_dir)
    tenv = TableEnvironment.create(spark)
    return tenv.sql_query(
        """
        SELECT user_id, start_purchase_id, end_purchase_id, n_clicks,
               first_click_value, last_click_value
        FROM events_cp MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES
            S.event_id AS start_purchase_id,
            E.event_id AS end_purchase_id,
            COUNT(C.event_id) AS n_clicks,
            FIRST(C.value) AS first_click_value,
            LAST(C.value) AS last_click_value
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO FIRST C
          PATTERN (S C+ E)
          DEFINE
            S AS S.event_type = 'purchase',
            C AS C.event_type = 'click',
            E AS E.event_type = 'purchase'
        ) AS m
        """
    ).to_data_frame()


# --------------------------------------------------------------------------
# Cross-variable DEFINE through the SQL surface, lowered to the NFA tier
# (nfa/NFA.java predicate-over-partial-match semantics): same pattern and
# oracle derivation as cep_nfa_define, expressed as MATCH_RECOGNIZE SQL.
# --------------------------------------------------------------------------

_CEP_NFA_SQL_ORACLE = """
WITH seq AS (
  SELECT user_id, ts, event_id, event_type, value,
         COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS run_id
  FROM events
  WHERE event_type IN ('click', 'purchase')
), clicks AS (
  SELECT user_id, run_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, run_id ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id, run_id) AS run_len
  FROM seq WHERE event_type = 'click'
), purchases AS (
  SELECT user_id, run_id, ts, event_id, value AS purchase_value
  FROM seq WHERE event_type = 'purchase'
), matched AS (
  SELECT p.user_id, p.run_id, p.ts, p.event_id, p.purchase_value,
         MIN(c.rn) AS start_rn, MAX(c.run_len) AS run_len
  FROM purchases p
  JOIN clicks c ON c.user_id = p.user_id AND c.run_id = p.run_id
             AND p.purchase_value > c.value
  GROUP BY p.user_id, p.run_id, p.ts, p.event_id, p.purchase_value
)
SELECT m.user_id,
       CAST(m.run_len - m.start_rn + 1 AS BIGINT) AS n_clicks,
       fc.value AS first_click_value,
       m.purchase_value
FROM matched m
JOIN clicks fc ON fc.user_id = m.user_id AND fc.run_id = m.run_id AND fc.rn = m.start_rn
"""


@register("api_sql_match_nfa_define", _CEP_NFA_SQL_ORACLE, tags=("cep", "match", "api", "sql"))
def api_sql_match_nfa_define(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_release_1_16_0_spark.table_env import TableEnvironment

    _events_cp_view(spark, sf_dir)
    tenv = TableEnvironment.create(spark)
    return tenv.sql_query(
        """
        SELECT user_id, n_clicks, first_click_value, purchase_value
        FROM events_cp MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES
            COUNT(A.event_id) AS n_clicks,
            FIRST(A.value) AS first_click_value,
            LAST(B.value) AS purchase_value
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A+ B)
          DEFINE
            A AS A.event_type = 'click',
            B AS B.event_type = 'purchase' AND B.value > FIRST(A.value)
        ) AS m
        """
    ).to_data_frame()


# --------------------------------------------------------------------------
# Multimodal frame sampling: binary payload -> N evenly-spaced frame
# rows (the video keyframe-extraction batch shape, 1->N mapInPandas).
# Frames are deterministic byte slices, so the DuckDB oracle mirrors
# them with substring arithmetic (the fixture text is pure ASCII:
# bytes == chars).
# --------------------------------------------------------------------------

_FRAME_ORACLE = """
WITH m AS (
  SELECT doc_id AS media_id, text, length(text) AS len FROM documents
  WHERE length(text) > 0
), f AS (
  SELECT media_id, text, len, GREATEST(len // 4, 1) AS step, i AS frame_idx
  FROM m, generate_series(0, 3) AS g(i)
)
SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
       CAST(LEAST(step, len - frame_idx * step) AS BIGINT) AS frame_len,
       md5(substring(text, frame_idx * step + 1, step)) AS frame_hash
FROM f WHERE frame_idx * step < len
"""


@register("multimodal_frame_sample", _FRAME_ORACLE, tags=("llm", "multimodal"))
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_release_1_16_0_spark.operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    media = with_binary_payload(docs, "text", "doc_id")
    return sample_frames(media, n_frames=4)


# --------------------------------------------------------------------------
# CEP WITHIN clause: c+p where the whole match must complete within 12
# hours of its first row (MATCH_RECOGNIZE ... PATTERN (C+ P) WITHIN
# INTERVAL '12' HOUR; flink-cep Pattern.within / NFA timeout pruning).
# A timed-out greedy start does not kill a later, shorter start. The
# oracle derives the same semantics relationally: for each purchase
# immediately after a maximal click-run, the match exists iff some
# click of the run is inside the window, and its row count is the
# number of in-window clicks + 1 (the earliest in-window click is the
# leftmost start whose truncated greedy match still reaches the
# purchase).
# --------------------------------------------------------------------------

_CEP_WITHIN_ORACLE = """
WITH tagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'click' THEN 'c'
              WHEN event_type = 'purchase' THEN 'p'
              ELSE '-' END AS sym
  FROM events
), seq AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM tagged
), runs AS (
  SELECT *, rn - ROW_NUMBER() OVER (PARTITION BY user_id, sym ORDER BY rn) AS grp
  FROM seq
), c_runs AS (
  SELECT user_id, grp, MIN(rn) AS run_start, MAX(rn) AS run_end
  FROM runs WHERE sym = 'c' GROUP BY user_id, grp
), p_rows AS (
  SELECT user_id, rn AS p_rn, ts AS p_ts FROM seq WHERE sym = 'p'
), matches AS (
  SELECT p.user_id, p.p_rn, COUNT(*) AS n_c
  FROM p_rows p
  JOIN c_runs cr
    ON cr.user_id = p.user_id AND p.p_rn - 1 = cr.run_end
  JOIN runs r
    ON r.user_id = p.user_id AND r.sym = 'c'
   AND r.rn BETWEEN cr.run_start AND cr.run_end
   -- strictly greater: the boundary row (exactly 12h before the
   -- purchase) is excluded, matching the NFA's ts - start >= within
   -- timeout
   AND r.ts > p.p_ts - INTERVAL 12 HOUR
  GROUP BY p.user_id, p.p_rn
)
SELECT user_id,
       COUNT(*) AS n_matches,
       CAST(SUM(n_c) + COUNT(*) AS BIGINT) AS matched_rows
FROM matches GROUP BY user_id
"""


@register("cep_within", _CEP_WITHIN_ORACLE, tags=("cep", "match"))
def cep_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sym = classify(
        {
            "c": F.col("event_type") == "click",
            "p": F.col("event_type") == "purchase",
        }
    )
    matches = match_regex_pattern(
        ev,
        keys=["user_id"],
        ts_col="ts",
        symbol=sym,
        pattern="c+p",
        id_col="event_id",
        within_ms=12 * 3600 * 1000,
    )
    return matches.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches"),
        F.sum("n_rows").cast("bigint").alias("matched_rows"),
    )


# --------------------------------------------------------------------------
# AFTER MATCH SKIP TO NEXT ROW: overlapping c+p matches — every click
# of a purchase-adjacent run anchors its own match
# (AfterMatchSkipStrategy in flink-cep; the reference's non-default
# skip mode). Oracle: each click in a run whose end is immediately
# followed by a purchase is one match spanning click..purchase.
# --------------------------------------------------------------------------

_CEP_SKIP_NEXT_ORACLE = """
WITH tagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'click' THEN 'c'
              WHEN event_type = 'purchase' THEN 'p'
              ELSE '-' END AS sym
  FROM events
), seq AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM tagged
), runs AS (
  SELECT *, rn - ROW_NUMBER() OVER (PARTITION BY user_id, sym ORDER BY rn) AS grp
  FROM seq
), c_runs AS (
  SELECT user_id, grp, MIN(rn) AS run_start, MAX(rn) AS run_end
  FROM runs WHERE sym = 'c' GROUP BY user_id, grp
), p_adj AS (
  SELECT cr.user_id, cr.run_start, cr.run_end
  FROM c_runs cr
  JOIN seq p ON p.user_id = cr.user_id AND p.rn = cr.run_end + 1 AND p.sym = 'p'
)
SELECT a.user_id,
       COUNT(*) AS n_matches,
       CAST(SUM(a.run_end - r.rn + 2) AS BIGINT) AS matched_rows
FROM p_adj a
JOIN runs r ON r.user_id = a.user_id AND r.sym = 'c'
           AND r.rn BETWEEN a.run_start AND a.run_end
GROUP BY a.user_id
"""


@register("cep_skip_to_next", _CEP_SKIP_NEXT_ORACLE, tags=("cep", "match"))
def cep_skip_to_next(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sym = classify(
        {
            "c": F.col("event_type") == "click",
            "p": F.col("event_type") == "purchase",
        }
    )
    matches = match_regex_pattern(
        ev,
        keys=["user_id"],
        ts_col="ts",
        symbol=sym,
        pattern="c+p",
        id_col="event_id",
        skip="to_next_row",
    )
    return matches.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches"),
        F.sum("n_rows").cast("bigint").alias("matched_rows"),
    )


@register("api_sql_match_within", _CEP_WITHIN_ORACLE, tags=("cep", "match", "api", "sql"))
def api_sql_match_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cep_within pattern expressed through the MATCH_RECOGNIZE SQL
    clause with PATTERN ... WITHIN INTERVAL — the translator threads the
    timeout into the regex tier; same relational oracle as cep_within."""
    from flink_release_1_16_0_spark.catalog import register_tables
    from flink_release_1_16_0_spark.table_env import TableEnvironment

    register_tables(spark, sf_dir, ("events",))
    tenv = TableEnvironment.create(spark)
    matches = tenv.sql_query(
        """
        SELECT user_id, n_clicks, n_p
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES COUNT(C.event_id) AS n_clicks, COUNT(P.event_id) AS n_p
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (C+ P) WITHIN INTERVAL '12' HOUR
          DEFINE
            C AS C.event_type = 'click',
            P AS P.event_type = 'purchase'
        ) AS m
        """
    ).to_data_frame().select(
        "user_id", (F.col("n_clicks") + F.col("n_p")).alias("n_rows")
    )
    return matches.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches"),
        F.sum("n_rows").cast("bigint").alias("matched_rows"),
    )


# --------------------------------------------------------------------------
# CEP reluctant quantifier (MATCH_RECOGNIZE PATTERN (V B*? P) — Flink's
# reluctant quantifiers, Pattern.oneOrMore().consecutive() vs greedy;
# MatchCodeGenerator emits lazy NFA branches). Pattern v.*?p: a view,
# then *lazily* anything until the FIRST purchase — greedy would run to
# the LAST purchase, so the two modes genuinely diverge on this data.
# With AFTER MATCH SKIP PAST LAST ROW the matches are: anchor = first
# view after the previous match's purchase, end = first purchase after
# that view. Oracle derives exactly that pairing relationally.
# --------------------------------------------------------------------------

_CEP_RELUCTANT_ORACLE = """
WITH tagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'view' THEN 'v'
              WHEN event_type = 'purchase' THEN 'p'
              ELSE '-' END AS sym
  FROM events
), seq AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM tagged
), p_rows AS (
  SELECT user_id, rn AS p_rn, event_id AS p_id,
         LAG(rn, 1, 0) OVER (PARTITION BY user_id ORDER BY rn) AS prev_p_rn
  FROM seq WHERE sym = 'p'
), first_v AS (
  -- the first view strictly between consecutive purchases anchors the
  -- match; later views in the gap are consumed by the lazy middle
  SELECT p.user_id, p.p_rn, p.p_id, MIN(v.rn) AS v_rn
  FROM p_rows p
  JOIN seq v ON v.user_id = p.user_id AND v.sym = 'v'
            AND v.rn > p.prev_p_rn AND v.rn < p.p_rn
  GROUP BY p.user_id, p.p_rn, p.p_id
)
SELECT f.user_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY f.user_id ORDER BY f.p_rn) - 1
            AS INT) AS match_no,
       v.event_id AS start_id,
       f.p_id AS end_id,
       CAST(f.p_rn - f.v_rn + 1 AS INT) AS n_rows
FROM first_v f
JOIN seq v ON v.user_id = f.user_id AND v.rn = f.v_rn
"""


@register("cep_reluctant", _CEP_RELUCTANT_ORACLE, tags=("cep", "match"))
def cep_reluctant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sym = classify(
        {
            "v": F.col("event_type") == "view",
            "p": F.col("event_type") == "purchase",
        }
    )
    return match_regex_pattern(
        ev,
        keys=["user_id"],
        ts_col="ts",
        symbol=sym,
        pattern="v.*?p",
        id_col="event_id",
    )


# --------------------------------------------------------------------------
# Reluctant quantifier through the SQL surface (Quantifier without the
# GREEDY property; CommonExecMatch.java:135-138 REQUIRES a pattern to
# end with a simple variable or a reluctant quantifier, so trailing
# C+? is the reference's canonical legal form). PATTERN (P C+?) binds
# the purchase plus exactly ONE following click — a greedy C+ would
# swallow the whole click run, so click_id (and n_clicks) decide the
# semantics. Oracle: adjacent (purchase, click) row pairs in the
# per-user click/purchase subsequence; the match set is exactly those
# pairs (a following pair cannot start on the consumed click).
# --------------------------------------------------------------------------

_CEP_RELUCTANT_ORACLE = """
WITH seq AS (
  SELECT user_id, ts, event_id, value, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type IN ('click', 'purchase')
)
SELECT a.user_id,
       a.event_id AS purchase_id,
       b.event_id AS click_id,
       CAST(1 AS BIGINT) AS n_clicks,
       b.value AS click_value
FROM seq a
JOIN seq b ON b.user_id = a.user_id AND b.rn = a.rn + 1
WHERE a.event_type = 'purchase' AND b.event_type = 'click'
"""


@register(
    "api_sql_match_reluctant",
    _CEP_RELUCTANT_ORACLE,
    tags=("cep", "match", "api", "sql"),
)
def api_sql_match_reluctant(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_release_1_16_0_spark.table_env import TableEnvironment

    _events_cp_view(spark, sf_dir)
    tenv = TableEnvironment.create(spark)
    return tenv.sql_query(
        """
        SELECT user_id, purchase_id, click_id, n_clicks, click_value
        FROM events_cp MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES
            P.event_id AS purchase_id,
            LAST(C.event_id) AS click_id,
            COUNT(C.event_id) AS n_clicks,
            LAST(C.value) AS click_value
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (P C+?)
          DEFINE
            P AS P.event_type = 'purchase',
            C AS C.event_type = 'click'
        ) AS m
        """
    ).to_data_frame()
