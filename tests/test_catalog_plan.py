"""Multi-catalog DDL (CatalogManager; Parser.tdd:50,58,72,85,89) and
compiled-plan persistence (COMPILE PLAN / EXECUTE PLAN;
Parser.tdd:49,80,83, TableEnvironmentImpl.compilePlanAndWrite)."""

import json
import os

import pytest

from flink_release_1_16_0_spark.table_env import TableEnvironment

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture()
def tenv(spark):
    return TableEnvironment.create(spark)


def _nation_ddl(name: str) -> str:
    return (
        f"CREATE TABLE {name} (n_nationkey BIGINT, n_name STRING, "
        "n_regionkey BIGINT, n_comment STRING) WITH ("
        f"'connector'='filesystem','path'='{SF}/nation.parquet',"
        "'format'='parquet')"
    )


class TestCatalogDDL:
    def test_lifecycle(self, tenv):
        tenv.execute_sql("CREATE CATALOG c1 WITH ('type'='generic_in_memory')")
        assert "c1" in tenv.execute_sql("SHOW CATALOGS").collect()
        assert tenv.execute_sql("SHOW CURRENT CATALOG").collect() == [
            "default_catalog"
        ]
        tenv.execute_sql("USE CATALOG c1")
        assert tenv.execute_sql("SHOW CURRENT CATALOG").collect() == ["c1"]
        # USE CATALOG resets current db to the catalog default
        # (CatalogManager.setCurrentCatalog:275)
        assert tenv.execute_sql("SHOW CURRENT DATABASE").collect() == [
            "default_database"
        ]
        desc = dict(tenv.execute_sql("DESCRIBE CATALOG c1").collect())
        assert desc["name"] == "c1" and desc["type"] == "generic_in_memory"
        tenv.execute_sql("USE CATALOG default_catalog")
        tenv.execute_sql("DROP CATALOG c1")
        assert "c1" not in tenv.execute_sql("SHOW CATALOGS").collect()

    def test_create_if_not_exists_and_errors(self, tenv):
        tenv.execute_sql("CREATE CATALOG c2 WITH ('type'='generic_in_memory')")
        with pytest.raises(ValueError, match="already exists"):
            tenv.execute_sql("CREATE CATALOG c2 WITH ('type'='generic_in_memory')")
        tenv.execute_sql("CREATE CATALOG IF NOT EXISTS c2 WITH ('type'='generic_in_memory')")
        with pytest.raises(ValueError, match="unknown catalog"):
            tenv.execute_sql("USE CATALOG nope")
        with pytest.raises(ValueError, match="default catalog"):
            tenv.execute_sql("DROP CATALOG default_catalog")
        # cannot drop the current catalog
        tenv.execute_sql("USE CATALOG c2")
        with pytest.raises(ValueError, match="current catalog"):
            tenv.execute_sql("DROP CATALOG c2")
        tenv.execute_sql("USE CATALOG default_catalog")
        tenv.execute_sql("DROP CATALOG IF EXISTS nope")  # no error

    def test_default_database_option(self, tenv):
        tenv.execute_sql(
            "CREATE CATALOG c3 WITH ('type'='generic_in_memory',"
            "'default-database'='mydb')"
        )
        tenv.execute_sql("USE CATALOG c3")
        assert tenv.execute_sql("SHOW CURRENT DATABASE").collect() == ["mydb"]
        assert tenv.execute_sql("SHOW DATABASES").collect() == ["mydb"]

    def test_qualified_scan_and_insert(self, tenv, spark, tmp_path):
        tenv.execute_sql("CREATE CATALOG cq WITH ('type'='generic_in_memory')")
        tenv.execute_sql("CREATE DATABASE cq.mart")
        tenv.execute_sql("USE CATALOG cq")
        tenv.execute_sql("USE mart")
        tenv.execute_sql(_nation_ddl("nat_cq"))
        # SHOW TABLES lists the current catalog.database's tables (plus
        # session-global temp views, which other suites may have left —
        # membership, not equality, is the stable assertion here)
        assert "nat_cq" in tenv.execute_sql("SHOW TABLES").collect()
        # back in the default catalog, the table is not listed but the
        # qualified path resolves
        tenv.execute_sql("USE CATALOG default_catalog")
        assert "nat_cq" not in tenv.execute_sql("SHOW TABLES").collect()
        n = (
            tenv.sql_query("SELECT COUNT(*) AS n FROM cq.mart.nat_cq")
            .to_data_frame()
            .collect()[0]
            .n
        )
        assert n == 25
        # two-part form resolves against the CURRENT catalog
        tenv.execute_sql("USE CATALOG cq")
        n2 = (
            tenv.sql_query("SELECT COUNT(*) AS n FROM mart.nat_cq")
            .to_data_frame()
            .collect()[0]
            .n
        )
        assert n2 == 25
        # qualified INSERT target + qualified source
        out = str(tmp_path / "cq_out")
        tenv.execute_sql("USE CATALOG default_catalog")
        tenv.execute_sql(
            "CREATE TABLE snk_cq (n_name STRING) WITH ("
            f"'connector'='filesystem','path'='{out}','format'='parquet')"
        )
        tenv.execute_sql(
            "INSERT INTO default_catalog.default_database.snk_cq "
            "SELECT n_name FROM cq.mart.nat_cq WHERE n_regionkey = 0"
        )
        assert spark.read.parquet(out).count() == 5
        # wrong attribution errors
        with pytest.raises(ValueError, match="exists in"):
            tenv.sql_query("SELECT * FROM cq.default_database.nat_cq")

    def test_cross_catalog_name_collision_rejected(self, tenv):
        tenv.execute_sql(_nation_ddl("nat_coll"))
        tenv.execute_sql("CREATE CATALOG cc WITH ('type'='generic_in_memory')")
        tenv.execute_sql("USE CATALOG cc")
        with pytest.raises(ValueError, match="session-global"):
            tenv.execute_sql(_nation_ddl("nat_coll"))

    def test_qualified_ref_not_rewritten_in_string_literal(self, tenv):
        tenv.execute_sql("CREATE CATALOG cl WITH ('type'='generic_in_memory')")
        tenv.execute_sql("USE CATALOG cl")
        tenv.execute_sql(_nation_ddl("nat_lit"))
        tenv.execute_sql("USE CATALOG default_catalog")
        row = (
            tenv.sql_query(
                "SELECT 'cl.default_database.nat_lit' AS s, COUNT(*) AS n "
                "FROM cl.default_database.nat_lit"
            )
            .to_data_frame()
            .collect()[0]
        )
        assert row.s == "cl.default_database.nat_lit" and row.n == 25


class TestCompiledPlan:
    def _mk_tables(self, tenv, spark, tmp_path):
        src = str(tmp_path / "cp_src")
        spark.range(0, 100).selectExpr("id AS k", "id * 2 AS v").write.parquet(src)
        tenv.execute_sql(
            "CREATE TABLE cp_src (k BIGINT, v BIGINT) WITH ("
            f"'connector'='filesystem','path'='{src}','format'='parquet')"
        )
        out = str(tmp_path / "cp_out")
        tenv.execute_sql(
            "CREATE TABLE cp_snk (k BIGINT, v BIGINT) WITH ("
            f"'connector'='filesystem','path'='{out}','format'='parquet')"
        )
        return out

    def test_compile_then_execute_in_fresh_env(self, tenv, spark, tmp_path):
        out = self._mk_tables(tenv, spark, tmp_path)
        plan = str(tmp_path / "plan.json")
        tenv.execute_sql(
            f"COMPILE PLAN '{plan}' FOR INSERT INTO cp_snk "
            "SELECT k, v FROM cp_src WHERE k < 50"
        )
        doc = json.load(open(plan))
        assert doc["flinkVersion"] == "1.16"
        types = [n["type"] for n in doc["nodes"]]
        assert types == [
            "stream-exec-table-source-scan_1",
            "stream-exec-calc_1",
            "stream-exec-sink_1",
        ]
        assert {e["source"] for e in doc["edges"]} == {1, 2}
        assert "cp_src" in doc["tables"] and "cp_snk" in doc["tables"]
        # EXECUTE PLAN in a FRESH environment restores the tables
        fresh = TableEnvironment.create(spark)
        fresh.execute_sql(f"EXECUTE PLAN '{plan}'")
        assert spark.read.parquet(out).count() == 50
        assert "cp_snk" in fresh._tables  # restored from the artifact

    def test_compile_exists_guard(self, tenv, spark, tmp_path):
        self._mk_tables(tenv, spark, tmp_path)
        plan = str(tmp_path / "plan.json")
        stmt = (
            f"COMPILE PLAN '{plan}' FOR INSERT INTO cp_snk "
            "SELECT k, v FROM cp_src"
        )
        tenv.execute_sql(stmt)
        with pytest.raises(ValueError, match="cannot overwrite"):
            tenv.execute_sql(stmt)
        tenv.execute_sql(
            f"COMPILE PLAN '{plan}' IF NOT EXISTS FOR INSERT INTO cp_snk "
            "SELECT k, v FROM cp_src"
        )  # keeps the existing artifact silently

    def test_compile_and_execute_one_shot(self, tenv, spark, tmp_path):
        out = self._mk_tables(tenv, spark, tmp_path)
        plan = str(tmp_path / "plan2.json")
        tenv.execute_sql(
            f"COMPILE AND EXECUTE PLAN '{plan}' FOR INSERT INTO cp_snk "
            "SELECT k, v FROM cp_src WHERE k >= 50"
        )
        assert os.path.exists(plan)
        assert spark.read.parquet(out).count() == 50

    def test_statement_set_plan(self, tenv, spark, tmp_path):
        out = self._mk_tables(tenv, spark, tmp_path)
        out2 = str(tmp_path / "cp_out2")
        tenv.execute_sql(
            "CREATE TABLE cp_snk2 (k BIGINT) WITH ("
            f"'connector'='filesystem','path'='{out2}','format'='parquet')"
        )
        plan = str(tmp_path / "sset.json")
        tenv.execute_sql(
            f"COMPILE PLAN '{plan}' FOR STATEMENT SET BEGIN "
            "INSERT INTO cp_snk SELECT k, v FROM cp_src WHERE k < 10; "
            "INSERT INTO cp_snk2 SELECT k FROM cp_src WHERE k >= 90; END"
        )
        doc = json.load(open(plan))
        assert len(doc["statements"]) == 2
        tenv.execute_sql(f"EXECUTE PLAN '{plan}'")
        assert spark.read.parquet(out).count() == 10
        assert spark.read.parquet(out2).count() == 10

    def test_execute_missing_plan_errors(self, tenv, tmp_path):
        with pytest.raises(ValueError, match="does not exist"):
            tenv.execute_sql(f"EXECUTE PLAN '{tmp_path}/nope.json'")

    def test_unsupported_shape_falls_back_to_sql_node(
        self, tenv, spark, tmp_path
    ):
        out = self._mk_tables(tenv, spark, tmp_path)
        plan = str(tmp_path / "fb.json")
        # ORDER BY is outside the inference subset -> sql-insert node,
        # but the statement still executes faithfully
        tenv.execute_sql(
            f"COMPILE PLAN '{plan}' FOR INSERT INTO cp_snk "
            "SELECT k, v FROM cp_src ORDER BY k LIMIT 7"
        )
        doc = json.load(open(plan))
        assert [n["type"] for n in doc["nodes"]] == ["sql-insert"]
        tenv.execute_sql(f"EXECUTE PLAN '{plan}'")
        assert spark.read.parquet(out).count() == 7


def test_qualified_refs_only_rewrite_table_positions(spark, tmp_path):
    """A select-list alias.column that textually collides with a
    registered db.table must not be rewritten (review finding: the old
    resolver rewrote every occurrence)."""
    from flink_release_1_16_0_spark.table_env import TableEnvironment

    tenv = TableEnvironment.create(spark)
    tenv.execute_sql("CREATE DATABASE o")
    # a table literally named 'amount' inside database 'o'
    tenv.execute_sql(
        f"""CREATE TABLE o.amount (x INT) WITH (
            'connector'='filesystem', 'path'='{tmp_path}/amt', 'format'='parquet')"""
    )
    tenv.execute_sql("INSERT INTO o.amount VALUES (7)")
    # alias 'o' + column 'amount': the old rewrite turned o.amount into
    # the bare table name and broke resolution
    df = tenv.execute_sql(
        "SELECT o.amount FROM (SELECT 41 AS amount) o"
    ).to_data_frame()
    assert [r.amount for r in df.collect()] == [41]
    # table position still resolves through the rewrite
    assert tenv.execute_sql("SELECT * FROM o.amount").to_data_frame().collect()[0].x == 7


def test_qualified_refs_in_comma_from_list(spark, tmp_path):
    """`FROM db.a, db.b` (implicit cross join) rewrites EVERY reference
    in the comma list, not just the first (review finding: the
    table-position rewrite used to stop after one)."""
    from flink_release_1_16_0_spark.table_env import TableEnvironment

    tenv = TableEnvironment.create(spark)
    tenv.execute_sql("CREATE DATABASE cfl")
    for name, vals in (("ca", "(1), (2)"), ("cb", "(10)")):
        tenv.execute_sql(
            f"""CREATE TABLE cfl.{name} (x INT) WITH (
                'connector'='filesystem', 'path'='{tmp_path}/{name}', 'format'='parquet')"""
        )
        tenv.execute_sql(f"INSERT INTO cfl.{name} VALUES {vals}")
    got = sorted(
        (r.ax, r.bx)
        for r in tenv.execute_sql(
            "SELECT a.x AS ax, b.x AS bx FROM cfl.ca a, cfl.cb AS b"
        ).to_data_frame().collect()
    )
    assert got == [(1, 10), (2, 10)]
    # three-way, mixing unqualified and qualified references
    n = tenv.execute_sql(
        "SELECT COUNT(*) AS n FROM cfl.ca, cfl.cb, cfl.ca"
    ).to_data_frame().collect()[0].n
    assert n == 4


def test_qualified_ref_in_window_tvf(spark, tmp_path):
    """`TABLE db.t` inside a window TVF resolves through the rewrite."""
    from flink_release_1_16_0_spark.table_env import TableEnvironment

    tenv = TableEnvironment.create(spark)
    tenv.execute_sql("CREATE DATABASE tvfdb")
    tenv.execute_sql(
        f"""CREATE TABLE tvfdb.evts (ts TIMESTAMP(3), v INT) WITH (
            'connector'='filesystem', 'path'='{tmp_path}/evts', 'format'='parquet')"""
    )
    tenv.execute_sql(
        "INSERT INTO tvfdb.evts VALUES (TIMESTAMP '2024-01-01 10:00:00', 1),"
        " (TIMESTAMP '2024-01-01 10:20:00', 2)"
    )
    df = tenv.execute_sql(
        """
        SELECT window_start, SUM(v) AS total
        FROM TABLE(TUMBLE(TABLE tvfdb.evts, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        GROUP BY window_start
        """
    ).to_data_frame()
    assert [r.total for r in df.collect()] == [3]
