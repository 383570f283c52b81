"""SQL script runner — the reference's SQL Client surface.

Reference: ``flink-table/flink-sql-client`` (SqlClient.java:61 with
CliOptionsParser's ``-f <script>`` / ``-e <statement>`` /
``-i <init file>`` modes; the interactive CLI's statement splitter in
cli/parser/SqlMultiLineParser.java). A user porting a Flink deployment
typically carries ``.sql`` scripts executed by ``sql-client.sh -f`` —
this module gives them the same entry points:

    python -m flink_release_1_16_0_spark.sql_client script.sql
    python -m flink_release_1_16_0_spark.sql_client -i init.sql -f job.sql
    python -m flink_release_1_16_0_spark.sql_client -e "SELECT ..."

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


def _is_word_at(src: str, i: int, word: str) -> bool:
    """Case-insensitive whole-word match at position i (alnum/_ are
    word characters on both sides)."""
    n = len(src)
    if not src[i : i + len(word)].upper() == word:
        return False
    if i > 0 and (src[i - 1].isalnum() or src[i - 1] == "_"):
        return False
    j = i + len(word)
    return not (j < n and (src[j].isalnum() or src[j] == "_"))


def _in_statement_set_context(buf: list[str]) -> bool:
    """BEGIN opens a splitter block only as 'EXECUTE STATEMENT SET ...
    BEGIN' — a column/alias literally named 'begin' must not disable
    splitting, and the interactive 'BEGIN STATEMENT SET;' form must
    SPLIT normally (execute_sql's statement buffering handles it)."""
    import re

    prefix = "".join(buf)
    return bool(re.search(r"STATEMENT\s+SET\s*$", prefix, re.IGNORECASE))


def split_statements(script: str) -> list[str]:
    """Split a SQL script into statements with one scanner pass: ``;``
    terminates a statement only outside single-quoted literals; ``--``
    and ``/* */`` comments are treated as whitespace (only OUTSIDE
    literals — an apostrophe inside a comment is comment text, not a
    literal opener, and vice versa). Statement-set blocks
    (EXECUTE STATEMENT SET BEGIN ... END;) keep their inner semicolons;
    CASE ... END inside a block does not close it."""
    stmts: list[str] = []
    buf: list[str] = []
    i, n = 0, len(script)
    begin_depth = 0  # EXECUTE STATEMENT SET BEGIN ... END nesting
    case_depth = 0  # CASE ... END pairs consume their own END
    while i < n:
        c = script[i]
        if c == "'":
            j = i + 1
            while j < n:
                if script[j] == "'":
                    if j + 1 < n and script[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            buf.append(script[i : min(j + 1, n)])
            i = j + 1
            continue
        if script.startswith("--", i):
            nl = script.find("\n", i)
            buf.append(" ")  # a comment is whitespace, not glue
            i = n if nl < 0 else nl
            continue
        if script.startswith("/*", i):
            end = script.find("*/", i + 2)
            buf.append(" ")
            i = n if end < 0 else end + 2
            continue
        if _is_word_at(script, i, "BEGIN") and _in_statement_set_context(buf):
            begin_depth += 1
        elif _is_word_at(script, i, "CASE"):
            case_depth += 1
        elif _is_word_at(script, i, "END"):
            if case_depth > 0:
                case_depth -= 1
            else:
                begin_depth = max(0, begin_depth - 1)
        if c == ";" and begin_depth == 0:
            stmts.append("".join(buf))
            buf = []
            i += 1
            continue
        buf.append(c)
        i += 1
    stmts.append("".join(buf))
    return [s.strip() for s in stmts if s.strip()]


def run_statements(tenv, script: str, echo: bool = True) -> list:
    """Execute every statement of ``script`` in an EXISTING session;
    return the per-statement results (TableResult or None). Queries
    print tableau-style when ``echo``."""
    results = []
    for stmt in split_statements(script):
        if echo:
            first = stmt.splitlines()[0]
            print(f"sql> {first}{' ...' if len(stmt.splitlines()) > 1 else ''}")
        res = tenv.execute_sql(stmt)
        results.append(res)
        if echo and res is not None and hasattr(res, "to_data_frame"):
            df = res.to_data_frame()
            if df is not None:
                # real execution errors propagate — only a frameless
                # (DDL/DML) result skips printing
                df.show(20, truncate=False)
    return results


def run_script(
    spark: SparkSession,
    script: str,
    echo: bool = True,
    init_script: str | None = None,
) -> list:
    """One client session: optional init script first (CliOptions'
    ``-i`` — catalogs/tables/config set up before the main input), then
    the main script. Returns the MAIN script's per-statement results."""
    from flink_release_1_16_0_spark.table_env import TableEnvironment

    tenv = TableEnvironment.create(spark)
    if init_script:
        run_statements(tenv, init_script, echo=echo)
    return run_statements(tenv, script, echo=echo)


def _read_file(path: str) -> str | None:
    """Read a script file; print a clean CLI error (no traceback) on
    failure, the reference client's behavior."""
    try:
        with open(path, encoding="utf-8") as f:
            return f.read()
    except OSError as exc:
        print(
            f"sql-client: cannot read {path!r}: {exc.strerror or exc}",
            file=sys.stderr,
        )
        return None


_USAGE = (
    "usage: python -m flink_release_1_16_0_spark.sql_client "
    "[-i <init.sql>] (-f <script.sql> | -e '<statement>' | <script.sql>)"
)


def main(argv: list[str]) -> int:
    """CLI parity with SqlClient.java:61 / CliOptionsParser: ``-f``
    script file, ``-e`` inline statement (mutually exclusive), ``-i``
    init file executed first in the same session. A bare positional
    script is accepted as ``-f`` shorthand."""
    script: str | None = None
    init_script: str | None = None
    i = 0
    while i < len(argv):
        a = argv[i]
        if a in ("-f", "--file", "-e", "--execute", "-i", "--init"):
            if i + 1 >= len(argv):
                print(_USAGE)
                return 2
            val = argv[i + 1]
            if a in ("-i", "--init"):
                if init_script is not None:
                    print(_USAGE)
                    return 2
                init_script = _read_file(val)
                if init_script is None:
                    return 1
            else:
                if script is not None:  # -f/-e twice or mixed
                    print(_USAGE)
                    return 2
                if a in ("-e", "--execute"):
                    script = val
                else:
                    script = _read_file(val)
                    if script is None:
                        return 1
            i += 2
            continue
        if a.startswith("-") or script is not None:
            print(_USAGE)
            return 2
        script = _read_file(a)
        if script is None:
            return 1
        i += 1
    if script is None:
        print(_USAGE)
        return 2
    from flink_release_1_16_0_spark import get_spark

    run_script(get_spark("sql-client"), script, init_script=init_script)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
