"""TableEnvironment facade coverage: SQL DDL scans and the fluent
Table API, oracle-gated end to end.

These gate the engine's primary entry points (SURVEY.md section 1.4):
``execute_sql`` DDL + query (TableEnvironmentImpl.executeSql:722) and
the fluent :class:`~flink_release_1_16_0_spark.table_env.Table` pipeline
(OperationTreeBuilder). The DuckDB oracle runs the equivalent ANSI SQL
directly on the same parquet, so a mismatch anywhere in the DDL type
mapping, scan wiring, or fluent lowering fails the hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_release_1_16_0_spark.queries import register
from flink_release_1_16_0_spark.table_env import TableEnvironment

_DDL_ORACLE = """
SELECT
  o_orderpriority,
  COUNT(*) AS order_count,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY o_orderpriority
"""


@register("api_sql_ddl_scan", _DDL_ORACLE, tags=("api", "ddl", "sql"))
def api_sql_ddl_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TABLE ... WITH (filesystem/parquet) then query through
    executeSql — the full SQL-first lifecycle."""
    tenv = TableEnvironment.create(spark)
    tenv.execute_sql(
        f"""
        CREATE TABLE ddl_orders (
          o_orderkey BIGINT NOT NULL,
          o_custkey BIGINT,
          o_orderstatus STRING,
          o_totalprice DOUBLE,
          o_orderdate TIMESTAMP(3),
          o_orderpriority STRING,
          o_clerk STRING,
          o_shippriority INT,
          o_comment STRING,
          PRIMARY KEY (o_orderkey) NOT ENFORCED
        ) WITH ('connector' = 'filesystem',
                'path' = '{sf_dir}/orders.parquet',
                'format' = 'parquet')
        """
    )
    return tenv.execute_sql(
        """
        SELECT
          o_orderpriority,
          COUNT(*) AS order_count,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total_price
        FROM ddl_orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY o_orderpriority
        """
    ).to_data_frame()


_FLUENT_ORACLE = """
SELECT n_name,
       COUNT(*) AS n_cust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(38,2))) AS DOUBLE) AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > 100
GROUP BY n_name
"""


@register("api_table_fluent", _FLUENT_ORACLE, tags=("api", "table_api"))
def api_table_fluent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_path().where().join().group_by().select() — the fluent
    Table API lowering to the same Catalyst plan as the SQL twin."""
    tenv = TableEnvironment.create(spark)
    for name, cols in (
        (
            "tapi_customer",
            "c_custkey BIGINT, c_name STRING, c_address STRING, "
            "c_nationkey BIGINT, c_phone STRING, c_acctbal DOUBLE, "
            "c_mktsegment STRING, c_comment STRING",
        ),
        (
            "tapi_nation",
            "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT, "
            "n_comment STRING",
        ),
    ):
        table = name.split("_", 1)[1]
        tenv.execute_sql(
            f"""
            CREATE TABLE {name} ({cols})
            WITH ('connector' = 'filesystem',
                  'path' = '{sf_dir}/{table}.parquet',
                  'format' = 'parquet')
            """
        )
    result = (
        tenv.from_path("tapi_customer")
        .where("c_acctbal > 100")
        .join(tenv.from_path("tapi_nation"), "c_nationkey = n_nationkey")
        .group_by("n_name")
        .select(
            "n_name, COUNT(*) AS n_cust, "
            "CAST(SUM(CAST(c_acctbal AS DECIMAL(38,2))) AS DOUBLE) AS total_bal"
        )
    )
    return result.to_data_frame()


_30D_US = 30 * 24 * 3600 * 1_000_000

_TVF_ORACLE = f"""
SELECT
  make_timestamp((epoch_us(o_orderdate) // {_30D_US}) * {_30D_US}) AS window_start,
  make_timestamp((epoch_us(o_orderdate) // {_30D_US}) * {_30D_US}
                 + {_30D_US}) AS window_end,
  o_orderstatus,
  COUNT(*) AS order_count,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY 1, 2, 3
"""


@register("api_sql_window_tvf", _TVF_ORACLE, tags=("api", "window", "sql"))
def api_sql_window_tvf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink's windowing-TVF SQL dialect (SqlTumbleTableFunction,
    FlinkSqlOperatorTable.java:1219) executed verbatim through
    executeSql — rewritten to Spark's epoch-aligned window()."""
    tenv = TableEnvironment.create(spark)
    tenv.execute_sql(
        f"""
        CREATE TABLE tvf_orders (
          o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
          o_totalprice DOUBLE, o_orderdate TIMESTAMP_LTZ(3),
          o_orderpriority STRING, o_clerk STRING, o_shippriority INT,
          o_comment STRING
        ) WITH ('connector' = 'filesystem',
                'path' = '{sf_dir}/orders.parquet',
                'format' = 'parquet')
        """
    )
    return tenv.execute_sql(
        """
        SELECT window_start, window_end, o_orderstatus,
               COUNT(*) AS order_count,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total_price
        FROM TABLE(TUMBLE(TABLE tvf_orders, DESCRIPTOR(o_orderdate), INTERVAL '30' DAY))
        GROUP BY window_start, window_end, o_orderstatus
        """
    ).to_data_frame()


_STEP_US = 30 * 24 * 3600 * 1_000_000  # 30 days
_MAX_US = 3 * _STEP_US  # 90 days

_CUM_TVF_ORACLE = f"""
SELECT
  make_timestamp((epoch_us(o_orderdate) // {_MAX_US}) * {_MAX_US}) AS window_start,
  make_timestamp((epoch_us(o_orderdate) // {_MAX_US}) * {_MAX_US}
                 + j * {_STEP_US}) AS window_end,
  COUNT(*) AS order_count,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total_price
FROM orders, generate_series(1, 3) AS g(j)
WHERE epoch_us(o_orderdate)
      < (epoch_us(o_orderdate) // {_MAX_US}) * {_MAX_US} + j * {_STEP_US}
GROUP BY 1, 2
"""


@register("api_sql_cumulate_tvf", _CUM_TVF_ORACLE, tags=("api", "window", "sql"))
def api_sql_cumulate_tvf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUMULATE TVF SQL (SqlCumulateTableFunction,
    FlinkSqlOperatorTable.java:1221) through executeSql — rewritten to
    an explode over growing slices (SliceAssigners.java:281)."""
    tenv = TableEnvironment.create(spark)
    tenv.execute_sql(
        f"""
        CREATE TABLE cum_tvf_orders (
          o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
          o_totalprice DOUBLE, o_orderdate TIMESTAMP_LTZ(3),
          o_orderpriority STRING, o_clerk STRING, o_shippriority INT,
          o_comment STRING
        ) WITH ('connector' = 'filesystem',
                'path' = '{sf_dir}/orders.parquet',
                'format' = 'parquet')
        """
    )
    return tenv.execute_sql(
        """
        SELECT window_start, window_end,
               COUNT(*) AS order_count,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total_price
        FROM TABLE(CUMULATE(TABLE cum_tvf_orders, DESCRIPTOR(o_orderdate),
                            INTERVAL '30' DAY, INTERVAL '90' DAY))
        GROUP BY window_start, window_end
        """
    ).to_data_frame()


# --------------------------------------------------------------------------
# Event-time temporal join through the SQL surface: JOIN versioned
# FOR SYSTEM_TIME AS OF left.rowtime (TemporalRowTimeJoinOperator.java:78
# / the SQL form of stream_temporal_join). The versioned side is a
# catalog table with WATERMARK + PRIMARY KEY (clicks written to a local
# derived parquet — DDL tables address files, and the fixture file
# cannot carry the filter); the facade lowers the join to
# operators/asof.asof_join. Same ASOF oracle as the operator query.
# --------------------------------------------------------------------------

_SQL_TEMPORAL_ORACLE = """
SELECT p.event_id, p.user_id, c.click_id, c.ts AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT event_id AS click_id, user_id, ts
           FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts <= p.ts
"""


@register("api_sql_temporal_join", _SQL_TEMPORAL_ORACLE, tags=("api", "sql", "join", "time"))
def api_sql_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import functions as F

    from flink_release_1_16_0_spark.catalog import load_table

    clicks_path = tempfile.mkdtemp(prefix="click_versions_")
    load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    ).select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    ).coalesce(1).write.mode("overwrite").parquet(clicks_path)

    tenv = TableEnvironment.create(spark)
    tenv.execute_sql(
        f"""
        CREATE TABLE purchases_all (
          event_id BIGINT, ts TIMESTAMP_LTZ(3), user_id BIGINT, event_type STRING
        ) WITH ('connector' = 'filesystem',
                'path' = '{sf_dir}/events.parquet', 'format' = 'parquet')
        """
    )
    tenv.execute_sql(
        f"""
        CREATE TABLE click_versions (
          click_id BIGINT, user_id BIGINT, ts TIMESTAMP_LTZ(3),
          PRIMARY KEY (user_id) NOT ENFORCED,
          WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE
        ) WITH ('connector' = 'filesystem',
                'path' = '{clicks_path}', 'format' = 'parquet')
        """
    )
    return tenv.sql_query(
        """
        SELECT o.event_id, o.user_id, r.click_id, r.ts AS click_ts
        FROM purchases_all o
        JOIN click_versions r FOR SYSTEM_TIME AS OF o.ts
          ON o.user_id = r.user_id
        WHERE o.event_type = 'purchase'
        """
    ).to_data_frame()


# --------------------------------------------------------------------------
# protobuf format end to end (flink-formats/flink-protobuf,
# PbFormatFactory.java / PbRowDataDeserializationSchema.java): nation is
# serialized through the distributed protobuf sink (varint-delimited
# wire-format files, sources/protobuf_format.py) and scanned back via a
# 'format' = 'protobuf' DDL table. proto3 default semantics are on the
# path: nation 0 / region-0 rows leave zero-valued fields off the wire
# and the reader materializes defaults. Oracle: the same rows straight
# from parquet.
# --------------------------------------------------------------------------

_PROTOBUF_ORACLE = """
SELECT n_nationkey, n_name, n_regionkey FROM nation
"""


@register("format_protobuf_roundtrip", _PROTOBUF_ORACLE, tags=("format", "protobuf"))
def format_protobuf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from flink_release_1_16_0_spark.catalog import load_table
    from flink_release_1_16_0_spark.sources.protobuf_format import write_protobuf

    path = tempfile.mkdtemp(prefix="nation_pb_")
    write_protobuf(
        load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        ),
        path,
    )
    tenv = TableEnvironment.create(spark)
    tenv.execute_sql(
        f"""
        CREATE TABLE nation_pb (
          n_nationkey INT, n_name STRING, n_regionkey INT
        ) WITH ('connector' = 'filesystem', 'path' = '{path}',
                'format' = 'protobuf')
        """
    )
    return tenv.sql_query(
        "SELECT n_nationkey, n_name, n_regionkey FROM nation_pb"
    ).to_data_frame()


# --------------------------------------------------------------------------
# LEGACY group-window SQL syntax (FlinkSqlOperatorTable TUMBLE_OLD /
# HOP_OLD and the *_START/_END auxiliaries) — the syntax most Flink
# 1.16 queries actually use, rewritten by rewrite_group_windows into
# Spark window()/session_window() grouping. Same 30-day tumble as the
# TVF query, expressed in the old dialect.
# --------------------------------------------------------------------------

_LEGACY_GW_ORACLE = f"""
SELECT
  make_timestamp((epoch_us(o_orderdate) // {_30D_US}) * {_30D_US}) AS w_start,
  make_timestamp((epoch_us(o_orderdate) // {_30D_US}) * {_30D_US}
                 + {_30D_US}) AS w_end,
  o_orderstatus,
  COUNT(*) AS order_count,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY 1, 2, 3
"""


@register("api_sql_legacy_group_window", _LEGACY_GW_ORACLE, tags=("api", "window", "sql"))
def api_sql_legacy_group_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_release_1_16_0_spark.catalog import register_tables

    register_tables(spark, sf_dir, ("orders",))
    tenv = TableEnvironment.create(spark)
    return tenv.sql_query(
        """
        SELECT TUMBLE_START(o_orderdate, INTERVAL '30' DAY) AS w_start,
               TUMBLE_END(o_orderdate, INTERVAL '30' DAY) AS w_end,
               o_orderstatus,
               COUNT(*) AS order_count,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE)
                 AS total_price
        FROM orders
        GROUP BY TUMBLE(o_orderdate, INTERVAL '30' DAY), o_orderstatus
        """
    ).to_data_frame()


# ---------------------------------------------------------------------------
# Multi-catalog DDL (CatalogManager; Parser.tdd:50,72,85,89): CREATE
# CATALOG / USE CATALOG / qualified catalog.db.table resolution, gated
# end-to-end — the query runs entirely through catalog-qualified paths.
# ---------------------------------------------------------------------------

_CATALOG_DDL_ORACLE = """
SELECT
  r.r_name,
  COUNT(*) AS nation_count,
  CAST(SUM(n.n_nationkey) AS BIGINT) AS key_sum
FROM nation n
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


@register("api_sql_catalog_ddl", _CATALOG_DDL_ORACLE, tags=("api", "ddl", "catalog"))
def api_sql_catalog_ddl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE CATALOG + CREATE DATABASE + qualified-path table DDL,
    then a join written ONLY in catalog.db.table references — gates
    the CatalogManager facade's resolution layer end to end."""
    tenv = TableEnvironment.create(spark)
    tenv.execute_sql(
        "CREATE CATALOG IF NOT EXISTS lake WITH ('type'='generic_in_memory')"
    )
    tenv.execute_sql("CREATE DATABASE IF NOT EXISTS lake.mart")
    tenv.execute_sql("USE CATALOG lake")
    tenv.execute_sql("USE mart")
    tenv.execute_sql(
        f"""CREATE TABLE cat_nation (
          n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT, n_comment STRING
        ) WITH ('connector'='filesystem','path'='{sf_dir}/nation.parquet',
                'format'='parquet')"""
    )
    tenv.execute_sql("USE CATALOG default_catalog")
    tenv.execute_sql(
        f"""CREATE TABLE cat_region (
          r_regionkey BIGINT, r_name STRING, r_comment STRING
        ) WITH ('connector'='filesystem','path'='{sf_dir}/region.parquet',
                'format'='parquet')"""
    )
    return tenv.sql_query(
        """
        SELECT
          r.r_name,
          COUNT(*) AS nation_count,
          CAST(SUM(n.n_nationkey) AS BIGINT) AS key_sum
        FROM lake.mart.cat_nation n
        JOIN default_catalog.default_database.cat_region r
          ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """
    ).to_data_frame()


# ---------------------------------------------------------------------------
# Compiled-plan persistence (Parser.tdd:49,80,83;
# TableEnvironmentImpl.compilePlanAndWrite): COMPILE PLAN serializes
# the op-DAG + statement + catalog metadata; EXECUTE PLAN re-executes
# it in a FRESH TableEnvironment (restore-from-compiled-plan). The
# graded rows are read back from the plan-executed sink.
# ---------------------------------------------------------------------------

_COMPILED_PLAN_ORACLE = """
SELECT event_id, user_id, event_type, value
FROM events
WHERE event_type = 'purchase' AND value > 50
"""


@register("api_sql_compiled_plan", _COMPILED_PLAN_ORACLE, tags=("api", "ddl", "plan"))
def api_sql_compiled_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    work = tempfile.mkdtemp(prefix="compiled_plan_")
    tenv = TableEnvironment.create(spark)
    tenv.execute_sql(
        f"""CREATE TABLE plan_events (
          event_id BIGINT, ts TIMESTAMP(6), user_id BIGINT,
          event_type STRING, value DOUBLE, props STRING
        ) WITH ('connector'='filesystem','path'='{sf_dir}/events.parquet',
                'format'='parquet')"""
    )
    tenv.execute_sql(
        f"""CREATE TABLE plan_sink (
          event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE
        ) WITH ('connector'='filesystem','path'='{work}/sink',
                'format'='parquet')"""
    )
    tenv.execute_sql(
        f"""COMPILE PLAN '{work}/plan.json' FOR INSERT INTO plan_sink
        SELECT event_id, user_id, event_type, value FROM plan_events
        WHERE event_type = 'purchase' AND value > 50"""
    )
    # restore + run in a fresh environment: the artifact alone carries
    # the tables, the statement, and the op-DAG
    fresh = TableEnvironment.create(spark)
    fresh.execute_sql(f"EXECUTE PLAN '{work}/plan.json'")
    return spark.read.parquet(f"{work}/sink")


_HIVE_DIALECT_ORACLE = """
SELECT CAST(n_regionkey AS BIGINT) AS rk,
       COUNT(*) AS n_nations,
       MIN(n_name) AS first_name
FROM nation
WHERE n_regionkey IN (0, 1)
GROUP BY n_regionkey
"""


@register("api_sql_hive_dialect", _HIVE_DIALECT_ORACLE, tags=("api", "ddl", "hive"))
def api_sql_hive_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Hive SQL dialect end to end (SET 'table.sql-dialect'='hive';
    flink-sql-parser-hive's SqlCreateHiveTable + RichSqlInsert): a
    Hive-spelled external parquet table over the source, a partitioned
    TEXTFILE table with a custom delimiter as the intermediate, static
    INSERT OVERWRITE TABLE ... PARTITION per region, then the aggregate
    reads back through the partition-pruned csv scan."""
    import tempfile

    work = tempfile.mkdtemp(prefix="hive_dialect_")
    tenv = TableEnvironment.create(spark)
    tenv.execute_sql("SET 'table.sql-dialect'='hive'")
    tenv.execute_sql(
        f"""CREATE EXTERNAL TABLE `hd_nation` (
          `n_nationkey` BIGINT,
          `n_name` STRING COMMENT 'nation name',
          `n_regionkey` BIGINT,
          `n_comment` STRING
        )
        COMMENT 'tpch nation via the hive dialect'
        STORED AS PARQUET
        LOCATION '{sf_dir}/nation.parquet'"""
    )
    tenv.execute_sql(
        f"""CREATE TABLE hd_by_region (n_nationkey BIGINT, n_name STRING)
        PARTITIONED BY (`rk` BIGINT)
        ROW FORMAT DELIMITED FIELDS TERMINATED BY '|'
        STORED AS TEXTFILE
        LOCATION '{work}/by_region'"""
    )
    for rk in (0, 1):
        tenv.execute_sql(
            f"INSERT OVERWRITE TABLE hd_by_region PARTITION (rk={rk}) "
            f"SELECT n_nationkey, n_name FROM hd_nation WHERE n_regionkey = {rk}"
        )
    return tenv.sql_query(
        "SELECT rk, COUNT(*) AS n_nations, MIN(n_name) AS first_name "
        "FROM hd_by_region GROUP BY rk"
    ).to_data_frame()


_GATEWAY_ORACLE = """
SELECT r_name,
       COUNT(*) AS n_nations,
       MIN(n_name) AS first_nation
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


@register("api_sql_gateway", _GATEWAY_ORACLE, tags=("api", "gateway", "sql"))
def api_sql_gateway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL Gateway session service end to end
    (flink-sql-gateway's SqlGatewayServiceImpl / OperationManager /
    ResultFetcher): open a session, run DDL + a join-aggregate through
    executeStatement, poll the operation to FINISHED, then reassemble
    the token-paged ResultSet into a DataFrame — the exact
    open/execute/fetch lifecycle a gateway client drives."""
    import time

    from flink_release_1_16_0_spark.sql_gateway import FINISHED, SqlGatewayService

    service = SqlGatewayService(spark)
    sh = service.open_session({}, "oracle-session")

    def run(stmt: str):
        oh = service.execute_statement(sh, stmt)
        deadline = time.time() + 120
        while time.time() < deadline:
            st = service.get_operation_status(sh, oh)
            if st == FINISHED:
                return oh
            if st in ("ERROR", "CANCELED"):
                raise RuntimeError(f"gateway operation {st}")
            time.sleep(0.05)
        raise TimeoutError(stmt)

    for name, cols in (
        ("gw_nation", "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT, n_comment STRING"),
        ("gw_region", "r_regionkey BIGINT, r_name STRING, r_comment STRING"),
    ):
        run(
            f"""CREATE TABLE {name} ({cols}) WITH (
                'connector'='filesystem',
                'path'='{sf_dir}/{name[3:]}.parquet',
                'format'='parquet')"""
        )
    oh = run(
        "SELECT r_name, COUNT(*) AS n_nations, MIN(n_name) AS first_nation "
        "FROM gw_nation JOIN gw_region ON n_regionkey = r_regionkey "
        "GROUP BY r_name"
    )
    rows, token = [], 0
    while True:
        page = service.fetch_results(sh, oh, token, max_rows=2)
        rows.extend(tuple(d["fields"]) for d in page["results"]["data"])
        if page["resultType"] == "EOS":
            break
        token += 1
    service.close_session(sh)
    return spark.createDataFrame(
        rows, "r_name STRING, n_nations BIGINT, first_nation STRING"
    )


_ROW_OPS_ORACLE = """
SELECT word,
       COUNT(*) AS cnt,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       MAX(cents) AS max_cents
FROM (
  SELECT unnest(string_split(o_orderpriority, '-')) AS word,
         CAST(CAST(o_totalprice AS DECIMAL(38,2)) * 100 AS BIGINT) AS cents
  FROM orders
) t
GROUP BY word
"""


@register("api_table_row_ops", _ROW_OPS_ORACLE, tags=("api", "fluent", "udf"))
def api_table_row_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table API row-based ops end to end (TableImpl.java:403-418):
    ``Table.map`` (vectorized 1:1 pandas tier) -> ``Table.flatMap``
    (0..n rows per input) -> ``GroupedTable.aggregate`` + mandatory
    ``.select`` (implicit group keys). Money goes through exact integer
    cents so the pandas-side aggregation hash-matches DuckDB's DECIMAL
    arithmetic. 100 TB shape: two shuffle-free Arrow-batched mapInPandas
    stages + ONE keyed exchange (the group-amortized aggregate lowering)
    — linear in input, no driver funnel."""
    import pandas as pd

    tenv = TableEnvironment.create(spark)
    t = tenv.from_data_frame(
        spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderpriority", "o_totalprice"
        )
    )

    def to_cents(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "pri": pdf["o_orderpriority"],
                "cents": (pdf["o_totalprice"] * 100).round().astype("int64"),
            }
        )

    def split_words(row: dict):
        for w in row["pri"].split("-"):
            yield {"word": w, "cents": row["cents"]}

    def money_stats(pdf: pd.DataFrame) -> dict:
        return {
            "cnt": len(pdf),
            "total_cents": int(pdf["cents"].sum()),
            "max_cents": int(pdf["cents"].max()),
        }

    return (
        t.map(to_cents, "pri string, cents bigint", vectorized=True)
        .flat_map(split_words, "word string, cents bigint")
        .group_by("word")
        .aggregate(money_stats, "cnt bigint, total_cents bigint, max_cents bigint")
        .select("word, cnt, total_cents, max_cents")
        .to_data_frame()
    )


_HIVE_STRUCT_CTAS_ORACLE = """
SELECT CAST(n_regionkey AS BIGINT) AS rk,
       COUNT(*) AS n,
       MIN(n_name) AS first_name
FROM nation
GROUP BY n_regionkey
"""


@register("api_sql_hive_struct_ctas", _HIVE_STRUCT_CTAS_ORACLE, tags=("api", "ddl", "hive"))
def api_sql_hive_struct_ctas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive dialect round 2 (parserImpls.ftl): STRUCT<name:type> columns
    (-> engine ROW type) written and read through a Hive-spelled table,
    then Hive CTAS (TableCreationWithQuery) aggregating the struct
    fields into a second managed table. Ends with a plain-scalar read so
    the DuckDB twin hashes exactly."""
    import tempfile

    work = tempfile.mkdtemp(prefix="hive_struct_")
    tenv = TableEnvironment.create(spark)
    tenv.execute_sql("SET 'table.sql-dialect'='hive'")
    tenv.execute_sql(
        f"""CREATE EXTERNAL TABLE hs_nation (
          n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT, n_comment STRING
        ) STORED AS PARQUET LOCATION '{sf_dir}/nation.parquet'"""
    )
    tenv.execute_sql(
        f"""CREATE TABLE hs_packed (
          id BIGINT,
          info STRUCT<name:STRING, region:BIGINT>
        ) STORED AS PARQUET LOCATION '{work}/packed'"""
    )
    tenv.execute_sql(
        "INSERT INTO TABLE hs_packed "
        "SELECT n_nationkey, named_struct('name', n_name, 'region', n_regionkey) "
        "FROM hs_nation"
    )
    tenv.execute_sql(
        f"""CREATE TABLE hs_agg STORED AS PARQUET LOCATION '{work}/agg'
            AS SELECT info.region AS rk, COUNT(*) AS n, MIN(info.name) AS first_name
               FROM hs_packed GROUP BY info.region"""
    )
    return tenv.sql_query("SELECT rk, n, first_name FROM hs_agg").to_data_frame()


_MANIFEST_COMMIT_ORACLE = """
SELECT o_orderpriority AS pri,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(38,2)) * 100 AS BIGINT)
                + CASE WHEN o_orderpriority = '1-URGENT' THEN 100 ELSE 0 END)
            AS BIGINT) AS total_cents
FROM orders
WHERE o_orderkey % 3 = 0
GROUP BY o_orderpriority
"""


@register("api_sql_manifest_commit", _MANIFEST_COMMIT_ORACLE, tags=("api", "sink", "commit"))
def api_sql_manifest_commit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The object-store commit profile end to end
    ('sink.commit-protocol'='manifest', sources/commit_protocol.py):
    INSERT publishes uniquely-named files via an atomic manifest, a
    crashed writer's orphan junk file lands in a live partition dir and
    must stay INVISIBLE (it would crash a directory-listing parquet
    read), and INSERT OVERWRITE of one partition is logical — replaced
    files remain on disk but leave the live set. The read-back aggregate
    hash-matches a DuckDB twin computing the post-overwrite state
    directly from the source."""
    import os
    import tempfile

    work = tempfile.mkdtemp(prefix="manifest_commit_")
    out = f"{work}/mc_part"
    tenv = TableEnvironment.create(spark)
    tenv.execute_sql(
        f"""CREATE TABLE mc_src (
          o_orderkey BIGINT, o_totalprice DOUBLE, o_orderpriority STRING
        ) WITH ('connector'='filesystem','path'='{sf_dir}/orders.parquet',
                'format'='parquet')"""
    )
    tenv.execute_sql(
        f"""CREATE TABLE mc_part (
          o_orderkey BIGINT, o_totalprice DOUBLE, pri STRING
        ) PARTITIONED BY (pri)
        WITH ('connector'='filesystem','path'='{out}','format'='parquet',
              'sink.commit-protocol'='manifest')"""
    )
    tenv.execute_sql(
        "INSERT INTO mc_part SELECT o_orderkey, o_totalprice, o_orderpriority "
        "FROM mc_src WHERE o_orderkey % 3 = 0"
    )
    # a crashed/concurrent writer's orphan: junk bytes in a live
    # partition — a directory-listing read would die on it
    orphan_dir = os.path.join(out, "pri=1-URGENT")
    os.makedirs(orphan_dir, exist_ok=True)
    with open(os.path.join(orphan_dir, "part-orphan.parquet"), "w") as fh:
        fh.write("not parquet")
    # logical overwrite of ONE partition (+1.00 on every price)
    tenv.execute_sql(
        "INSERT OVERWRITE mc_part "
        "SELECT o_orderkey, o_totalprice + 1, o_orderpriority FROM mc_src "
        "WHERE o_orderkey % 3 = 0 AND o_orderpriority = '1-URGENT'"
    )
    return tenv.sql_query(
        "SELECT pri, COUNT(*) AS cnt, "
        "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents "
        "FROM mc_part GROUP BY pri"
    ).to_data_frame()


_MANIFEST_MAINT_ORACLE = """
SELECT o_orderpriority AS pri,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(38,2)) * 100 AS BIGINT))
            AS BIGINT) AS total_cents
FROM orders
GROUP BY o_orderpriority
"""


@register(
    "api_sql_manifest_maintenance",
    _MANIFEST_MAINT_ORACLE,
    tags=("api", "sink", "commit"),
)
def api_sql_manifest_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The commit log's maintenance surface (round-10): a multi-commit
    manifest table is compacted (``ALTER TABLE ... COMPACT`` — the log
    folds into a head checkpoint, SqlAlterTableCompact's role under the
    manifest protocol) and vacuumed (``ALTER TABLE ... VACUUM RETAIN 1
    CHECKPOINTS`` — folded manifests and over-retention checkpoints
    deleted), and the post-maintenance read-back must still hash-match
    a DuckDB twin over the full source: maintenance bounds storage, it
    must never change what a reader sees."""
    import tempfile

    work = tempfile.mkdtemp(prefix="manifest_maint_")
    out = f"{work}/mm_tbl"
    tenv = TableEnvironment.create(spark)
    tenv.execute_sql(
        f"""CREATE TABLE mm_src (
          o_orderkey BIGINT, o_totalprice DOUBLE, o_orderpriority STRING
        ) WITH ('connector'='filesystem','path'='{sf_dir}/orders.parquet',
                'format'='parquet')"""
    )
    tenv.execute_sql(
        f"""CREATE TABLE mm_tbl (
          o_orderkey BIGINT, o_totalprice DOUBLE, pri STRING
        ) WITH ('connector'='filesystem','path'='{out}','format'='parquet',
              'sink.commit-protocol'='manifest')"""
    )
    for i in range(6):  # six separate commits -> six manifests
        tenv.execute_sql(
            "INSERT INTO mm_tbl SELECT o_orderkey, o_totalprice, "
            f"o_orderpriority FROM mm_src WHERE o_orderkey % 6 = {i}"
        )
    tenv.execute_sql("ALTER TABLE mm_tbl COMPACT")
    tenv.execute_sql("ALTER TABLE mm_tbl VACUUM RETAIN 1 CHECKPOINTS")
    return tenv.sql_query(
        "SELECT pri, COUNT(*) AS cnt, "
        "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents "
        "FROM mm_tbl GROUP BY pri"
    ).to_data_frame()


_WINDOW_UDAF_ORACLE = """
SELECT
  make_timestamp((epoch_us(ts) // 600000000) * 600000000) AS win_start,
  event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(CAST(value AS DECIMAL(38,6)) * 1000000 AS BIGINT)) AS BIGINT)
    AS total_micros
FROM events
GROUP BY 1, 2
"""


@register("api_table_window_udaf", _WINDOW_UDAF_ORACLE, tags=("api", "fluent", "window"))
def api_table_window_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fluent windowed UDAF (WindowGroupedTableImpl.aggregate,
    TableImpl.java:651): Tumble.over(...).on(ts) -> group_by(key, w) ->
    pandas aggregate -> select with w.start. Window bounds assign as
    native epoch arithmetic BEFORE the single keyed exchange; the UDAF
    runs group-amortized. Money-style values go through exact integer
    micros so pandas and DuckDB DECIMAL arithmetic hash-match."""
    import pandas as pd

    from flink_release_1_16_0_spark.catalog import load_table
    from flink_release_1_16_0_spark.table_env import TableEnvironment, Tumble

    tenv = TableEnvironment.create(spark)
    ev = tenv.from_data_frame(
        load_table(spark, sf_dir, "events").selectExpr(
            "ts",
            "event_type",
            "CAST(ROUND(value * 1000000) AS BIGINT) AS micros",
        )
    )

    def stats(pdf: pd.DataFrame) -> dict:
        return {"n": len(pdf), "total_micros": int(pdf["micros"].sum())}

    return (
        ev.window(Tumble.over("10 minutes").on("ts").alias("w"))
        .group_by("event_type, w")
        .aggregate(stats, "n bigint, total_micros bigint")
        .select("w.start AS win_start, event_type, n, total_micros")
        .to_data_frame()
    )


_PIPELINE_ORACLE = """
SELECT r_name,
       COUNT(*) AS n,
       MIN(n_name) AS first_nation
FROM nation JOIN region ON n_regionkey = r_regionkey
WHERE n_nationkey % 2 = 0
GROUP BY r_name
"""


@register("api_table_pipeline_insert", _PIPELINE_ORACLE, tags=("api", "fluent", "sink"))
def api_table_pipeline_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table.execute_insert end to end (TableImpl.insertInto +
    TablePipeline.execute): a fluent join+filter pipeline writes into a
    partitioned catalog sink through the same connector machinery as
    INSERT INTO SQL, and the aggregate reads back through the
    partition-discovering scan."""
    import tempfile

    from flink_release_1_16_0_spark.table_env import TableEnvironment

    work = tempfile.mkdtemp(prefix="pipeline_insert_")
    tenv = TableEnvironment.create(spark)
    for name, cols in (
        ("pl_nation", "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT, n_comment STRING"),
        ("pl_region", "r_regionkey BIGINT, r_name STRING, r_comment STRING"),
    ):
        tenv.execute_sql(
            f"""CREATE TABLE {name} ({cols}) WITH (
                'connector'='filesystem',
                'path'='{sf_dir}/{name[3:]}.parquet',
                'format'='parquet')"""
        )
    tenv.execute_sql(
        f"""CREATE TABLE pl_sink (n_nationkey BIGINT, n_name STRING, r_name STRING)
            PARTITIONED BY (r_name)
            WITH ('connector'='filesystem','path'='{work}/sink',
                  'format'='parquet')"""
    )
    (
        tenv.from_path("pl_nation")
        .join(tenv.from_path("pl_region"), "n_regionkey = r_regionkey")
        .where("n_nationkey % 2 = 0")
        .select("n_nationkey, n_name, r_name")
        .execute_insert("pl_sink")
    )
    return tenv.sql_query(
        "SELECT r_name, COUNT(*) AS n, MIN(n_name) AS first_nation "
        "FROM pl_sink GROUP BY r_name"
    ).to_data_frame()


_HIVE_BUCKETS_ORACLE = """
SELECT n.n_name AS n_name,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(CAST(CAST(c.c_acctbal AS DECIMAL(38,2)) * 100 AS BIGINT)) AS BIGINT) AS bal_cents
FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
"""


@register("api_sql_hive_buckets", _HIVE_BUCKETS_ORACLE, tags=("api", "ddl", "hive"))
def api_sql_hive_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive bucketed tables (parserImpls.ftl TableCreationPart's
    CLUSTERED BY ... INTO n BUCKETS): two tables bucketed on the join
    key lower onto Spark-NATIVE catalog bucketing (hive_dialect.py
    _translate_bucketed_create), so this fact-dim join scans
    exchange-free; the aggregate is hash-checked against DuckDB over
    the raw parquet."""
    import tempfile

    work = tempfile.mkdtemp(prefix="hive_bkt_")
    tenv = TableEnvironment.create(spark)
    # repeated runs in one session: the catalog table would otherwise
    # keep pointing at the previous run's location
    for t in ("hb_cust_q", "hb_nat_q"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    tenv.execute_sql("SET 'table.sql-dialect'='hive'")
    tenv.execute_sql(
        f"""CREATE EXTERNAL TABLE hbq_src_cust (
          c_custkey BIGINT, c_name STRING, c_nationkey INT,
          c_acctbal DOUBLE, c_mktsegment STRING
        ) STORED AS PARQUET LOCATION '{sf_dir}/customer.parquet'"""
    )
    tenv.execute_sql(
        f"""CREATE EXTERNAL TABLE hbq_src_nat (
          n_nationkey INT, n_name STRING, n_regionkey INT
        ) STORED AS PARQUET LOCATION '{sf_dir}/nation.parquet'"""
    )
    tenv.execute_sql(
        f"""CREATE TABLE hb_cust_q (ck BIGINT, nk INT, bal DOUBLE)
            CLUSTERED BY (nk) SORTED BY (nk) INTO 4 BUCKETS
            STORED AS PARQUET LOCATION '{work}/cust'"""
    )
    tenv.execute_sql(
        f"""CREATE TABLE hb_nat_q (nk INT, name STRING)
            CLUSTERED BY (nk) INTO 4 BUCKETS
            STORED AS PARQUET LOCATION '{work}/nat'"""
    )
    tenv.execute_sql(
        "INSERT INTO TABLE hb_cust_q "
        "SELECT c_custkey, c_nationkey, c_acctbal FROM hbq_src_cust"
    )
    tenv.execute_sql(
        "INSERT INTO TABLE hb_nat_q SELECT n_nationkey, n_name FROM hbq_src_nat"
    )
    return tenv.sql_query(
        """SELECT n.name AS n_name,
                  CAST(COUNT(*) AS BIGINT) AS n_cust,
                  CAST(SUM(CAST(CAST(c.bal AS DECIMAL(38,2)) * 100 AS BIGINT)) AS BIGINT) AS bal_cents
           FROM hb_cust_q c JOIN hb_nat_q n ON n.nk = c.nk
           GROUP BY n.name"""
    ).to_data_frame()
