"""SQL script runner — the reference's SQL Client surface.

Reference: ``flink-table/flink-sql-client`` (SqlClient.java:61,
``-f <script>`` mode; the interactive CLI's statement splitter in
cli/parser/SqlMultiLineParser.java). A user porting a Flink deployment
typically carries ``.sql`` scripts executed by ``sql-client.sh -f`` —
this module gives them the same entry point:

    python -m flink_release_1_16_0_spark.sql_client script.sql

Semantics: statements split on ``;`` outside string literals (the
client's rule), ``--`` line comments and ``/* ... */`` block comments
stripped outside literals, each statement executed in order through
``TableEnvironment.execute_sql`` (so the full DDL/DML/SET/EXPLAIN/
EXECUTE STATEMENT SET surface applies). SELECT-shaped results print in
the client's tableau mode (Table.print -> show()).
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def split_statements(script: str) -> list[str]:
    """Split a SQL script into statements: ``;`` terminates a statement
    only outside single-quoted literals; ``--`` and ``/* */`` comments
    are stripped outside literals (the SQL-client parsing rules).
    Statement-set blocks (EXECUTE STATEMENT SET BEGIN ... END;) keep
    their inner semicolons."""
    from flink_release_1_16_0_spark.table_env import _split_sql_literals

    # strip comments, preserving literals verbatim
    cleaned: list[str] = []
    for is_lit, seg in _split_sql_literals(script):
        if is_lit:
            cleaned.append(seg)
            continue
        out, i, n = [], 0, len(seg)
        while i < n:
            if seg.startswith("--", i):
                nl = seg.find("\n", i)
                i = n if nl < 0 else nl  # keep the newline
            elif seg.startswith("/*", i):
                end = seg.find("*/", i + 2)
                i = n if end < 0 else end + 2
            else:
                out.append(seg[i])
                i += 1
        cleaned.append("".join(out))
    text = "".join(cleaned)

    stmts: list[str] = []
    buf: list[str] = []
    depth_set = 0  # inside EXECUTE STATEMENT SET BEGIN ... END
    for is_lit, seg in _split_sql_literals(text):
        if is_lit:
            buf.append(seg)
            continue
        i, n = 0, len(seg)
        while i < n:
            up = seg[i : i + 24].upper()
            if up.startswith("BEGIN") and not (i + 5 < n and seg[i + 5].isalnum()):
                depth_set += 1
            elif up.startswith("END") and not (i + 3 < n and seg[i + 3].isalnum()):
                depth_set = max(0, depth_set - 1)
            if seg[i] == ";" and depth_set == 0:
                stmts.append("".join(buf))
                buf = []
            else:
                buf.append(seg[i])
            i += 1
    stmts.append("".join(buf))
    return [s.strip() for s in stmts if s.strip()]


def run_script(spark: SparkSession, script: str, echo: bool = True) -> list:
    """Execute every statement; return the per-statement results
    (TableResult or None). Queries print tableau-style when ``echo``."""
    from flink_release_1_16_0_spark.table_env import TableEnvironment

    tenv = TableEnvironment.create(spark)
    results = []
    for stmt in split_statements(script):
        if echo:
            first = stmt.splitlines()[0]
            print(f"sql> {first}{' ...' if len(stmt.splitlines()) > 1 else ''}")
        res = tenv.execute_sql(stmt)
        results.append(res)
        if echo and res is not None and hasattr(res, "to_data_frame"):
            try:
                res.to_data_frame().show(20, truncate=False)
            except Exception:  # noqa: BLE001 — non-query results have no frame
                pass
    return results


def main(argv: list[str]) -> int:
    if len(argv) != 1:
        print("usage: python -m flink_release_1_16_0_spark.sql_client <script.sql>")
        return 2
    from flink_release_1_16_0_spark import get_spark

    with open(argv[0], encoding="utf-8") as f:
        script = f.read()
    run_script(get_spark("sql-client"), script)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
