"""SQL Client script runner tests (sql-client.sh -f parity)."""

from __future__ import annotations

from flink_release_1_16_0_spark.sql_client import run_script, split_statements


def test_split_statements_literals_and_comments():
    script = """
    -- a comment; with a semicolon
    SET 'pipeline.name' = 'a;b';  /* block; comment */
    SELECT ';' AS semi, 1 AS x;
    INSERT INTO t VALUES ('it''s; fine')
    """
    stmts = split_statements(script)
    assert len(stmts) == 3
    assert stmts[0] == "SET 'pipeline.name' = 'a;b'"
    assert stmts[1] == "SELECT ';' AS semi, 1 AS x"
    assert stmts[2] == "INSERT INTO t VALUES ('it''s; fine')"


def test_split_statement_set_keeps_inner_semicolons():
    script = """
    EXECUTE STATEMENT SET
    BEGIN
      INSERT INTO a SELECT 1;
      INSERT INTO b SELECT 2;
    END;
    SELECT 3;
    """
    stmts = split_statements(script)
    assert len(stmts) == 2
    assert stmts[0].upper().startswith("EXECUTE STATEMENT SET")
    assert "INSERT INTO b" in stmts[0]
    assert stmts[1] == "SELECT 3"


def test_run_script_end_to_end(spark, tmp_path):
    out = tmp_path / "sink"
    script = f"""
    -- end-to-end: DDL, config, INSERT, query
    CREATE TABLE src (x INT, tag STRING) WITH (
      'connector' = 'filesystem', 'path' = '{tmp_path}/src', 'format' = 'parquet');
    INSERT INTO src VALUES (1, 'a'), (2, 'b'), (3, 'a');
    CREATE TABLE snk (tag STRING, total BIGINT) WITH (
      'connector' = 'filesystem', 'path' = '{out}', 'format' = 'parquet');
    INSERT INTO snk SELECT tag, SUM(x) AS total FROM src GROUP BY tag;
    """
    run_script(spark, script, echo=False)
    got = {
        (r.tag, r.total) for r in spark.read.parquet(str(out)).collect()
    }
    assert got == {("a", 4), ("b", 2)}


def test_split_hardening():
    # apostrophes inside comments are comment text, not literal openers
    s = split_statements("-- don't use this\nSELECT 1;\nSELECT 2;")
    assert s == ["SELECT 1", "SELECT 2"]
    # identifiers containing begin/end don't affect block tracking
    s = split_statements(
        "EXECUTE STATEMENT SET BEGIN INSERT INTO a SELECT window_end FROM w; "
        "INSERT INTO b SELECT 2; END; SELECT trip_begin FROM t; SELECT 3;"
    )
    assert len(s) == 3 and "INSERT INTO b" in s[0]
    # CASE ... END inside a block consumes its own END
    s = split_statements(
        "EXECUTE STATEMENT SET BEGIN "
        "INSERT INTO a SELECT CASE WHEN x THEN 1 ELSE 2 END FROM w; END; SELECT 9;"
    )
    assert len(s) == 2 and s[1] == "SELECT 9"
    # block comments are whitespace, not token glue
    s = split_statements("SELECT x FROM t WHERE a=1/*c*/AND b=2;")
    assert "1 AND" in s[0]


def test_statement_set_literal_semicolons(spark, tmp_path):
    script = f"""
    CREATE TABLE semi_src (x INT, s STRING) WITH (
      'connector' = 'filesystem', 'path' = '{tmp_path}/ss', 'format' = 'parquet');
    CREATE TABLE semi_a (x INT, s STRING) WITH (
      'connector' = 'filesystem', 'path' = '{tmp_path}/sa', 'format' = 'parquet');
    INSERT INTO semi_src VALUES (1, 'a;b');
    EXECUTE STATEMENT SET
    BEGIN
      INSERT INTO semi_a SELECT x, ';' FROM semi_src;
    END;
    """
    run_script(spark, script, echo=False)
    assert spark.read.parquet(f"{tmp_path}/sa").collect()[0].s == ";"


def test_begin_alias_does_not_block_splitting():
    s = split_statements("SELECT ts AS begin FROM t; SELECT 2;")
    assert s == ["SELECT ts AS begin FROM t", "SELECT 2"]
    # interactive form splits normally (execute_sql buffers it)
    s = split_statements("BEGIN STATEMENT SET; INSERT INTO a SELECT 1; END;")
    assert s == ["BEGIN STATEMENT SET", "INSERT INTO a SELECT 1", "END"]


def test_interactive_begin_statement_set_via_script(spark, tmp_path):
    """The SQL-client interactive form (BEGIN STATEMENT SET; ...; END;)
    splits into individual statements that execute_sql buffers."""
    script = f"""
    CREATE TABLE ib_src (x INT) WITH (
      'connector' = 'filesystem', 'path' = '{tmp_path}/ibs', 'format' = 'parquet');
    INSERT INTO ib_src VALUES (1), (2);
    CREATE TABLE ib_a (x INT) WITH (
      'connector' = 'filesystem', 'path' = '{tmp_path}/iba', 'format' = 'parquet');
    CREATE TABLE ib_b (x INT) WITH (
      'connector' = 'filesystem', 'path' = '{tmp_path}/ibb', 'format' = 'parquet');
    BEGIN STATEMENT SET;
      INSERT INTO ib_a SELECT x FROM ib_src WHERE x = 1;
      INSERT INTO ib_b SELECT x * 10 AS x FROM ib_src;
    END;
    """
    run_script(spark, script, echo=False)
    assert [r.x for r in spark.read.parquet(f"{tmp_path}/iba").collect()] == [1]
    assert sorted(r.x for r in spark.read.parquet(f"{tmp_path}/ibb").collect()) == [10, 20]


def test_init_script_then_main(spark, tmp_path):
    """-i init file runs FIRST in the SAME session (CliOptionsParser):
    tables/config it creates are visible to the main script."""
    src = str(tmp_path / "cli_src")
    spark.range(0, 4).selectExpr("id AS k").write.parquet(src)
    out = str(tmp_path / "cli_out")
    init = f"""
      CREATE TABLE cli_in (k BIGINT)
      WITH ('connector'='filesystem','path'='{src}','format'='parquet');
      CREATE TABLE cli_out (k BIGINT)
      WITH ('connector'='filesystem','path'='{out}','format'='parquet');
    """
    main = "INSERT INTO cli_out SELECT k + 10 FROM cli_in;"
    run_script(spark, main, echo=False, init_script=init)
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == [10, 11, 12, 13]


def test_cli_flags_e_and_i(spark, tmp_path, capsys, monkeypatch):
    """main() argument surface: -i + -e end to end; -f/-e are mutually
    exclusive."""
    import flink_release_1_16_0_spark.sql_client as C

    init_path = tmp_path / "init.sql"
    init_path.write_text("CREATE VIEW cli_v AS SELECT 41 + 1 AS answer;")
    # main() builds its own SparkSession via get_spark — reuse the test one
    monkeypatch.setattr(
        "flink_release_1_16_0_spark.get_spark", lambda *a, **k: spark
    )
    rc = C.main(["-i", str(init_path), "-e", "SELECT answer FROM cli_v"])
    assert rc == 0
    assert "42" in capsys.readouterr().out
    assert C.main(["-e", "SELECT 1", "-f", "x.sql"]) == 2
    # no -f/-e: the client enters interactive mode (after -i), the
    # reference's default embedded mode
    import io

    monkeypatch.setattr("sys.stdin", io.StringIO("SELECT answer FROM cli_v;\nQUIT;\n"))
    assert C.main(["-i", str(init_path)]) == 0
    out = capsys.readouterr().out
    assert "Flink SQL>" in out and "42" in out and "Bye." in out
    monkeypatch.setattr("sys.stdin", io.StringIO(""))
    assert C.main([]) == 0


def test_split_statements_with_tail():
    from flink_release_1_16_0_spark.sql_client import split_statements_with_tail

    stmts, tail = split_statements_with_tail("SELECT 1; SELECT 'a;")
    assert stmts == ["SELECT 1"]
    assert tail == " SELECT 'a;"  # unterminated literal keeps assembling
    stmts, tail = split_statements_with_tail("SELECT\n  2")
    assert stmts == [] and tail.strip() == "SELECT\n  2".strip()
    stmts, tail = split_statements_with_tail("SELECT 3;")
    assert stmts == ["SELECT 3"] and tail == ""


def test_interactive_repl_session(spark, tmp_path):
    """Scripted stdin session through the interactive mode (CliClient's
    stdin loop, SqlClient.java:61): DDL, a multi-line query assembled
    across continuation lines, a failing statement that does NOT kill
    the session, recovery, HELP/CLEAR, QUIT."""
    import io

    from flink_release_1_16_0_spark.sql_client import run_interactive
    from flink_release_1_16_0_spark.table_env import TableEnvironment

    src = str(tmp_path / "repl_src")
    spark.range(0, 3).selectExpr("id AS k").write.parquet(src)
    tenv = TableEnvironment.create(spark)
    stdin = io.StringIO(
        f"CREATE TABLE r_t (k BIGINT)\n"
        f"WITH ('connector'='filesystem','path'='{src}',\n"
        f"      'format'='parquet');\n"
        "SELECT COUNT(*) AS n\n"
        "FROM r_t;\n"
        "SELECT * FROM no_such_table;\n"  # error: session must survive
        "HELP;\n"
        "CLEAR;\n"
        "SELECT MAX(k) AS mx FROM r_t;\n"  # recovery proof
        "QUIT;\n"
        "SELECT 1;\n"  # after QUIT: never executed
    )
    out = io.StringIO()
    failures = run_interactive(tenv, instream=stdin, outstream=out)
    text = out.getvalue()
    assert failures == 1
    assert "Flink SQL>" in text and "         >" in text  # continuation prompt
    assert "| 3  |" in text or "|3  " in text or "|  3|" in text or "|3|" in text.replace(" ", "")
    assert "[ERROR]" in text and "no_such_table" in text.lower()
    assert "Available client commands" in text  # HELP
    assert "\x1b[2J" in text  # CLEAR
    assert "mx" in text and "Bye." in text
    # nothing after QUIT ran: the final SELECT 1 output (a column named
    # "1") must not appear after Bye.
    assert text.strip().endswith("Bye.")


def test_interactive_repl_eof_ends_session(spark):
    import io

    from flink_release_1_16_0_spark.sql_client import run_interactive
    from flink_release_1_16_0_spark.table_env import TableEnvironment

    tenv = TableEnvironment.create(spark)
    out = io.StringIO()
    failures = run_interactive(tenv, instream=io.StringIO("SELECT 41+1 AS a;\n"), outstream=out)
    assert failures == 0
    assert "42" in out.getvalue() and out.getvalue().strip().endswith("Bye.")


def test_interactive_repl_shows_introspection_rows(spark, tmp_path):
    """SHOW TABLES / DESCRIBE return rows-based TableResults (no
    DataFrame); the REPL must render the rows, not swallow them behind
    the INFO line."""
    import io

    from flink_release_1_16_0_spark.sql_client import run_interactive
    from flink_release_1_16_0_spark.table_env import TableEnvironment

    src = str(tmp_path / "it_src")
    spark.range(0, 2).selectExpr("id AS k").write.parquet(src)
    tenv = TableEnvironment.create(spark)
    stdin = io.StringIO(
        f"CREATE TABLE repl_shown (k BIGINT) WITH "
        f"('connector'='filesystem','path'='{src}','format'='parquet');\n"
        "SHOW TABLES;\n"
        "QUIT;\n"
    )
    out = io.StringIO()
    assert run_interactive(tenv, instream=stdin, outstream=out) == 0
    assert "repl_shown" in out.getvalue()


def test_tail_carries_open_block_comment():
    """An unterminated /* block comment is carried VERBATIM in the
    interactive tail (like an unterminated literal) so its continuation
    line is comment text, not SQL; file-mode split_statements keeps the
    comments-are-whitespace reading."""
    from flink_release_1_16_0_spark.sql_client import (
        split_statements,
        split_statements_with_tail,
    )

    stmts, tail = split_statements_with_tail("SELECT 1; /* note\n")
    assert stmts == ["SELECT 1"]
    assert "/* note" in tail  # the opener survives for reassembly
    # reassembled with the closing line: the comment collapses away
    stmts, tail = split_statements_with_tail(tail + "still a comment */ SELECT 2;\n")
    assert stmts == ["SELECT 2"] and tail.strip() == ""
    # an apostrophe inside the open comment must NOT open a literal
    stmts, tail = split_statements_with_tail("/* don't\n")
    assert stmts == [] and "/* don't" in tail
    stmts, _ = split_statements_with_tail(tail + "*/ SELECT 3;\n")
    assert stmts == ["SELECT 3"]
    # file mode unchanged: an open comment at EOF swallows the rest
    assert split_statements("SELECT 1; /* trailing junk") == ["SELECT 1"]


def test_interactive_block_comment_spans_lines(spark):
    """The REPL regression from review: a /* comment opened on one line
    and closed on a later one must not execute the continuation line as
    SQL."""
    import io

    from flink_release_1_16_0_spark.sql_client import run_interactive
    from flink_release_1_16_0_spark.table_env import TableEnvironment

    tenv = TableEnvironment.create(spark)
    stdin = io.StringIO(
        "/* this comment\n"
        "still a comment */ SELECT 6*7 AS a;\n"
        "QUIT;\n"
    )
    out = io.StringIO()
    failures = run_interactive(tenv, instream=stdin, outstream=out)
    assert failures == 0
    assert "42" in out.getvalue()


def test_repl_rendering_truncation_and_result_modes(spark, tmp_path):
    """Round-10 REPL polish: results render through PUBLIC DataFrame
    APIs (no _jdf handle) as an ascii tableau with an EXPLICIT
    truncation footer when >20 rows, and
    SET 'sql-client.execution.result-mode'='changelog' prepends the op
    column (CliClient result modes)."""
    import io

    from flink_release_1_16_0_spark.sql_client import run_interactive
    from flink_release_1_16_0_spark.table_env import TableEnvironment

    src = str(tmp_path / "rm_src")
    spark.range(0, 25).selectExpr("id AS k").write.parquet(src)
    tenv = TableEnvironment.create(spark)
    stdin = io.StringIO(
        f"CREATE TABLE rm_t (k BIGINT) WITH ('connector'='filesystem',"
        f"'path'='{src}','format'='parquet');\n"
        "SELECT k FROM rm_t ORDER BY k;\n"          # 25 rows -> truncated
        "SELECT COUNT(*) AS n FROM rm_t;\n"          # 1 row -> no footer
        "SET 'sql-client.execution.result-mode' = 'changelog';\n"
        "SELECT MAX(k) AS mx FROM rm_t;\n"           # op column appears
        "SET 'sql-client.execution.result-mode' = 'bogus';\n"
        "SELECT 1 AS one;\n"                         # bad mode -> [ERROR], survives
        "SET 'sql-client.execution.result-mode' = 'tableau';\n"
        "SELECT 2 AS two;\n"                         # recovery
        "QUIT;\n"
    )
    out = io.StringIO()
    failures = run_interactive(tenv, instream=stdin, outstream=out)
    text = out.getvalue()
    assert failures == 1  # only the bogus-mode SELECT failed
    assert "-- only showing first 20 rows" in text
    assert "20 row(s) in set" in text and "1 row(s) in set" in text
    assert "| op |" in text and "+I" in text  # changelog mode
    assert "[ERROR]" in text and "bogus" in text
    assert "| two |" in text or "| two" in text  # recovered in tableau mode
    # NULL renders as the reference's NULL, not Python's None
    stdin = io.StringIO("SELECT CAST(NULL AS INT) AS v;\nQUIT;\n")
    out = io.StringIO()
    assert run_interactive(tenv, instream=stdin, outstream=out) == 0
    assert "NULL" in out.getvalue() and "None" not in out.getvalue()


def test_format_rows_tableau_alignment():
    from flink_release_1_16_0_spark.sql_client import format_rows_tableau

    text = format_rows_tableau(["a", "long_col"], [["1", "x"], ["22", "yyy"]])
    lines = text.splitlines()
    assert lines[0] == "+----+----------+"
    assert lines[1] == "| a  | long_col |"
    assert lines[3] == "| 1  | x        |"
    assert lines[4] == "| 22 | yyy      |"
    assert len({len(ln) for ln in lines}) == 1  # perfectly rectangular


def test_interactive_ctrl_c_cancels_query_not_session():
    """CliClient's Ctrl-C contract: a KeyboardInterrupt raised while a
    statement executes cancels THAT query and the session continues."""
    import io

    from flink_release_1_16_0_spark.sql_client import run_interactive

    class FakeTenv:
        def execute_sql(self, stmt):
            if "boom" in stmt:
                raise KeyboardInterrupt
            return None

    stdin = io.StringIO("SELECT boom;\nSELECT fine;\nQUIT;\n")
    out = io.StringIO()
    failures = run_interactive(FakeTenv(), instream=stdin, outstream=out)
    text = out.getvalue()
    assert failures == 0  # a cancel is not an error
    assert "[INFO] Query cancelled." in text
    assert text.count("[INFO] Execute statement succeeded.") == 1  # the fine one
    assert text.strip().endswith("Bye.")


def test_show_jobs_and_stop_job(spark, tmp_path):
    """SHOW JOBS lists active streaming queries; STOP JOB '<id>' stops
    one gracefully (SqlShowJobs/SqlStopJob, FLINK-28738 — the 1.16
    sql-client job lifecycle statements)."""
    import time

    import pytest as _pytest

    from flink_release_1_16_0_spark.table_env import TableEnvironment

    tenv = TableEnvironment.create(spark)
    assert tenv.execute_sql("SHOW JOBS").collect() == []

    src = str(tmp_path / "in")
    import os

    os.makedirs(src)
    spark.range(5).coalesce(1).write.mode("overwrite").parquet(f"{src}/f0")
    q = (
        spark.readStream.schema("id BIGINT")
        .parquet(f"{src}/*")
        .writeStream.format("memory")
        .queryName("show_jobs_probe")
        .outputMode("append")
        .start()
    )
    try:
        rows = tenv.execute_sql("SHOW JOBS").collect()
        assert any("show_jobs_probe" in r and "RUNNING" in r for r in rows)
        tenv.execute_sql(f"STOP JOB '{q.id}'")
        deadline = time.time() + 30
        while q.isActive and time.time() < deadline:
            time.sleep(0.2)
        assert not q.isActive
        assert tenv.execute_sql("SHOW JOBS").collect() == []
        with _pytest.raises(ValueError, match="no active job"):
            tenv.execute_sql("STOP JOB 'nonexistent'")
    finally:
        if q.isActive:
            q.stop()
