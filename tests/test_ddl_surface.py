"""Round-6 DDL/DQL surface: ALTER/DESCRIBE DATABASE, SHOW COLUMNS,
SHOW CREATE VIEW, ALTER VIEW, DROP/ALTER FUNCTION, ADD/REMOVE/SHOW
JARS, interactive BEGIN/END STATEMENT SET (Parser.tdd statement list
SqlAlterDatabase, SqlDescribeDatabase, SqlShowColumns, SqlShowCreate,
SqlAlterView, SqlAlterFunction, SqlAddJar, SqlBeginStatementSet)."""

import pytest

from flink_release_1_16_0_spark.table_env import TableEnvironment


@pytest.fixture()
def tenv(spark):
    return TableEnvironment.create(spark)


def test_database_properties(tenv):
    tenv.execute_sql("CREATE DATABASE dbp COMMENT 'mart' WITH ('owner'='a')")
    rows = dict(tenv.execute_sql("DESCRIBE DATABASE EXTENDED dbp").collect())
    assert rows["comment"] == "mart" and rows["option:owner"] == "a"
    tenv.execute_sql("ALTER DATABASE dbp SET ('owner'='b','tier'='gold')")
    rows = dict(tenv.execute_sql("DESCRIBE DATABASE EXTENDED dbp").collect())
    assert rows["option:owner"] == "b" and rows["option:tier"] == "gold"
    # non-EXTENDED omits options
    rows = tenv.execute_sql("DESCRIBE DATABASE dbp").collect()
    assert all(not k.startswith("option:") for k, _v in rows)
    with pytest.raises(ValueError, match="unknown database"):
        tenv.execute_sql("ALTER DATABASE nope SET ('a'='b')")


def test_show_columns_like(tenv, tmp_path):
    tenv.execute_sql(
        "CREATE TABLE sct (a BIGINT NOT NULL, ab STRING, bb DOUBLE) WITH ("
        f"'connector'='filesystem','path'='{tmp_path}/sct','format'='parquet')"
    )
    assert [c[0] for c in tenv.execute_sql("SHOW COLUMNS FROM sct").collect()] == [
        "a",
        "ab",
        "bb",
    ]
    assert [
        c[0]
        for c in tenv.execute_sql("SHOW COLUMNS FROM sct LIKE 'a%'").collect()
    ] == ["a", "ab"]
    assert [
        c[0]
        for c in tenv.execute_sql(
            "SHOW COLUMNS IN sct NOT LIKE 'a%'"
        ).collect()
    ] == ["bb"]
    # '_' matches exactly one character
    assert [
        c[0]
        for c in tenv.execute_sql("SHOW COLUMNS FROM sct LIKE '_b'").collect()
    ] == ["ab", "bb"]
    # NOT NULL columns report nullable=False
    cols = {c[0]: c for c in tenv.execute_sql("SHOW COLUMNS FROM sct").collect()}
    assert cols["a"][2] is False and cols["ab"][2] is True


def test_view_lifecycle(tenv, spark):
    tenv.execute_sql("CREATE VIEW vl1 AS SELECT 1 AS one")
    assert tenv.execute_sql("SHOW CREATE VIEW vl1").collect() == [
        "CREATE VIEW vl1 AS SELECT 1 AS one"
    ]
    tenv.execute_sql("ALTER VIEW vl1 AS SELECT 2 AS two")
    assert spark.table("vl1").collect()[0].two == 2
    tenv.execute_sql("ALTER VIEW vl1 RENAME TO vl2")
    assert spark.table("vl2").collect()[0].two == 2
    with pytest.raises(Exception):
        spark.table("vl1").collect()
    tenv.execute_sql("DROP VIEW vl2")
    with pytest.raises(ValueError, match="unknown view"):
        tenv.execute_sql("SHOW CREATE VIEW vl2")


def test_function_alter_drop(tenv, spark):
    tenv.execute_sql(
        "CREATE FUNCTION ddlfn AS "
        "'flink_release_1_16_0_spark.functions.examples.shout'"
    )
    assert spark.sql("SELECT ddlfn('x') AS r").collect()[0].r == "X!"
    # ALTER redefines an existing function; unknown names error
    tenv.execute_sql(
        "ALTER FUNCTION ddlfn AS "
        "'flink_release_1_16_0_spark.functions.examples.shout'"
    )
    with pytest.raises(ValueError, match="unknown function"):
        tenv.execute_sql(
            "ALTER FUNCTION never_created AS "
            "'flink_release_1_16_0_spark.functions.examples.shout'"
        )
    tenv.execute_sql("DROP FUNCTION ddlfn")
    with pytest.raises(Exception):
        spark.sql("SELECT ddlfn('x')").collect()
    tenv.execute_sql("DROP FUNCTION IF EXISTS ddlfn")  # no error


def test_jars_registry(tenv):
    assert tenv.execute_sql("SHOW JARS").collect() == []
    with pytest.raises(ValueError, match="was not added"):
        tenv.execute_sql("REMOVE JAR '/tmp/never.jar'")


def test_begin_end_statement_set(tenv, spark, tmp_path):
    src = str(tmp_path / "bss_src")
    spark.range(0, 6).selectExpr("id AS k").write.parquet(src)
    tenv.execute_sql(
        "CREATE TABLE bss_s (k BIGINT) WITH ("
        f"'connector'='filesystem','path'='{src}','format'='parquet')"
    )
    out = str(tmp_path / "bss_out")
    tenv.execute_sql(
        "CREATE TABLE bss_t (k BIGINT) WITH ("
        f"'connector'='filesystem','path'='{out}','format'='parquet')"
    )
    tenv.execute_sql("BEGIN STATEMENT SET")
    tenv.execute_sql("INSERT INTO bss_t SELECT k FROM bss_s WHERE k < 3")
    tenv.execute_sql("INSERT INTO bss_t SELECT k FROM bss_s WHERE k >= 3")
    # nothing executed yet
    import os

    assert not os.path.exists(out)
    tenv.execute_sql("END")
    assert spark.read.parquet(out).count() == 6
    # non-INSERT inside a set is rejected and the buffer survives
    tenv.execute_sql("BEGIN STATEMENT SET")
    with pytest.raises(ValueError, match="only INSERT"):
        tenv.execute_sql("SHOW TABLES")
    tenv.execute_sql("INSERT INTO bss_t SELECT k FROM bss_s WHERE k = 0")
    tenv.execute_sql("END")
    assert spark.read.parquet(out).count() == 7


def test_insert_column_list_partial(tenv, spark, tmp_path):
    """RichSqlInsert target column list: listed columns take the query
    values, unlisted fill NULL; composes with static PARTITION."""
    src = str(tmp_path / "icl_src")
    spark.range(0, 4).selectExpr("id AS k", "id * 10 AS v").write.parquet(src)
    tenv.execute_sql(
        "CREATE TABLE icl_src (k BIGINT, v BIGINT) WITH ("
        f"'connector'='filesystem','path'='{src}','format'='parquet')"
    )
    out = str(tmp_path / "icl_out")
    tenv.execute_sql(
        "CREATE TABLE icl_snk (a BIGINT, b STRING, c BIGINT) WITH ("
        f"'connector'='filesystem','path'='{out}','format'='parquet')"
    )
    tenv.execute_sql("INSERT INTO icl_snk (c, a) SELECT v, k FROM icl_src")
    rows = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert rows == [(0, None, 0), (1, None, 10), (2, None, 20), (3, None, 30)]

    pout = str(tmp_path / "icl_part")
    tenv.execute_sql(
        "CREATE TABLE icl_p (a BIGINT, b STRING, p STRING) PARTITIONED BY (p)"
        f" WITH ('connector'='filesystem','path'='{pout}','format'='parquet')"
    )
    tenv.execute_sql(
        "INSERT INTO icl_p PARTITION (p='x') (a) SELECT k FROM icl_src WHERE k < 2"
    )
    prow = sorted(tuple(r) for r in spark.read.parquet(pout).collect())
    assert prow == [(0, None, "x"), (1, None, "x")]

    with pytest.raises(ValueError, match="not in schema"):
        tenv.execute_sql("INSERT INTO icl_snk (nope) SELECT k FROM icl_src")
    with pytest.raises(ValueError, match="count mismatch"):
        tenv.execute_sql("INSERT INTO icl_snk (a) SELECT k, v FROM icl_src")
    with pytest.raises(ValueError, match="overlaps"):
        tenv.execute_sql(
            "INSERT INTO icl_p PARTITION (p='y') (a, p) SELECT k, k FROM icl_src"
        )


def test_show_tables_like_and_from(tenv, tmp_path):
    tenv.execute_sql(
        "CREATE TABLE stl_one (a BIGINT) WITH ("
        f"'connector'='filesystem','path'='{tmp_path}/a','format'='parquet')"
    )
    tenv.execute_sql(
        "CREATE TABLE stl_two (a BIGINT) WITH ("
        f"'connector'='filesystem','path'='{tmp_path}/b','format'='parquet')"
    )
    got = tenv.execute_sql("SHOW TABLES LIKE 'stl%'").collect()
    assert got == ["stl_one", "stl_two"]
    assert tenv.execute_sql("SHOW TABLES LIKE 'stl_on_'").collect() == ["stl_one"]
    assert "stl_one" not in tenv.execute_sql("SHOW TABLES NOT LIKE 'stl%'").collect()
    # FROM a database: tables created in another db are listed there
    tenv.execute_sql("CREATE DATABASE stl_db")
    tenv.execute_sql("USE stl_db")
    tenv.execute_sql(
        "CREATE TABLE stl_three (a BIGINT) WITH ("
        f"'connector'='filesystem','path'='{tmp_path}/c','format'='parquet')"
    )
    tenv.execute_sql("USE default_database")
    assert "stl_three" in tenv.execute_sql(
        "SHOW TABLES FROM stl_db LIKE 'stl%'"
    ).collect()
    with pytest.raises(ValueError, match="unknown database"):
        tenv.execute_sql("SHOW TABLES FROM no_db")
