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
    python -m flink_release_1_16_0_spark.sql_client            # interactive

With no ``-f``/``-e``/positional script the client enters the
reference's default INTERACTIVE embedded mode (CliClient's stdin loop):
multi-line statements assemble until their terminating ``;`` (the
shared scanner handles literals/comments/STATEMENT SET blocks), QUIT/
EXIT/CLEAR/HELP are client commands, and a failed statement prints its
error without ending the session.

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


def split_statements_with_tail(script: str) -> tuple[list[str], str]:
    """Like :func:`split_statements`, but also return the trailing
    fragment that no ``;`` has terminated yet — the interactive CLI's
    multi-line assembly primitive (SqlMultiLineParser.java keeps
    reading continuation lines until the statement completes). An
    UNTERMINATED ``/* ...`` block comment is carried VERBATIM in the
    tail (like an unterminated string literal) so a comment spanning
    input lines keeps assembling until its ``*/`` arrives — collapsing
    it to whitespace would make the continuation line execute as SQL."""
    stmts = _scan(script, keep_open_comment=True)
    tail = stmts.pop()  # _scan always appends the unterminated tail
    return [s.strip() for s in stmts if s.strip()], tail


def split_statements(script: str) -> list[str]:
    """Split a SQL script into statements with one scanner pass: ``;``
    terminates a statement only outside single-quoted literals; ``--``
    and ``/* */`` comments are treated as whitespace (only OUTSIDE
    literals — an apostrophe inside a comment is comment text, not a
    literal opener, and vice versa; a block comment left open at EOF
    swallows the rest of the script, the file-mode reading). Statement-
    set blocks (EXECUTE STATEMENT SET BEGIN ... END;) keep their inner
    semicolons; CASE ... END inside a block does not close it."""
    stmts = _scan(script)
    return [s.strip() for s in stmts if s.strip()]


def _scan(script: str, keep_open_comment: bool = False) -> list[str]:
    """One scanner pass; the LAST list element is always the
    unterminated tail (possibly empty/whitespace)."""
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
            if end < 0 and keep_open_comment:
                # interactive mode: the comment is still open — keep it
                # verbatim so the assembled tail re-scans once the
                # closing */ arrives on a later line
                buf.append(script[i:])
                i = n
                continue
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
    return stmts


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


_BANNER = "Welcome to the SQL client. Statements end with ';'. Type QUIT; to leave."
_HELP = (
    "Available client commands:\n"
    "  HELP;   print this help\n"
    "  CLEAR;  clear the screen\n"
    "  QUIT; / EXIT;  leave the client\n"
    "Everything else is SQL, executed when the trailing ';' arrives.\n"
    "SET 'sql-client.execution.result-mode' = 'tableau'|'table'|'changelog';"
)

#: CliClient's result-display modes (SET 'sql-client.execution.result-mode',
#: SqlClientOptions / CliTableauResultView in the reference). In this
#: non-curses terminal, 'table' renders like 'tableau' (the reference's
#: table mode is an interactive curses view); 'changelog' prepends the
#: row-kind op column.
_RESULT_MODE_KEY = "sql-client.execution.result-mode"
_MAX_DISPLAY_ROWS = 20


def _fmt_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    return str(v)


def format_rows_tableau(columns: list[str], rows: list[list[str]]) -> str:
    """Ascii-bordered tableau rendering (CliTableauResultView's batch
    print) built from already-collected rows — PUBLIC API only, no
    py4j ``_jdf`` handles."""
    widths = [
        max(len(c), *(len(r[i]) for r in rows)) if rows else len(c)
        for i, c in enumerate(columns)
    ]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    head = "|" + "|".join(f" {c:<{w}} " for c, w in zip(columns, widths)) + "|"
    lines = [sep, head, sep]
    for r in rows:
        lines.append("|" + "|".join(f" {v:<{w}} " for v, w in zip(r, widths)) + "|")
    lines.append(sep)
    return "\n".join(lines)


def _render_df(tenv, df, emit) -> None:
    """Render a query result per the session's result mode, with an
    EXPLICIT truncation footer — the previous ``_jdf.showString`` call
    capped at 20 rows silently through a private py4j handle."""
    mode = "tableau"
    cfg = getattr(tenv, "_config", None)
    if cfg is not None:
        mode = cfg.get(_RESULT_MODE_KEY, "tableau").strip().lower()
    if mode not in ("tableau", "table", "changelog"):
        raise ValueError(
            f"unknown {_RESULT_MODE_KEY} {mode!r} "
            "(supported: tableau, table, changelog)"
        )
    columns = list(df.columns)
    taken = df.take(_MAX_DISPLAY_ROWS + 1)
    truncated = len(taken) > _MAX_DISPLAY_ROWS
    taken = taken[:_MAX_DISPLAY_ROWS]
    if mode == "changelog":
        # the op column: a changelog-bridged table carries __rowkind;
        # plain (insert-only) results are all +I
        if "__rowkind" in columns:
            ki = columns.index("__rowkind")
            out_cols = ["op"] + [c for j, c in enumerate(columns) if j != ki]
            rows = [
                [_fmt_cell(r[ki])] + [_fmt_cell(v) for j, v in enumerate(r) if j != ki]
                for r in taken
            ]
        else:
            out_cols = ["op"] + columns
            rows = [["+I"] + [_fmt_cell(v) for v in r] for r in taken]
    else:
        out_cols = columns
        rows = [[_fmt_cell(v) for v in r] for r in taken]
    emit(format_rows_tableau(out_cols, rows))
    if truncated:
        emit(f"-- only showing first {_MAX_DISPLAY_ROWS} rows")
    emit(f"{len(rows)} row(s) in set")


def run_interactive(tenv, instream=None, outstream=None) -> int:
    """Interactive REPL — the reference client's default embedded mode
    (SqlClient.java:61; CliClient's stdin loop with SqlMultiLineParser's
    multi-line statement assembly). Lines accumulate until a ``;``
    completes the statement (literals, comments and STATEMENT SET
    blocks respected via the shared scanner); client commands QUIT/
    EXIT/CLEAR/HELP are handled locally (CliClient's command parser);
    a failed statement prints its error and the session CONTINUES —
    errors never kill the client. Returns the number of failed
    statements.

    On a real terminal, lines are read through ``input()`` with the
    stdlib ``readline`` imported, giving line editing plus persistent
    statement history in ``~/.flink-sql-history`` (the reference
    client's history file, CliClient's LineReader); scripted/piped
    stdin keeps the plain readline() path."""
    import os

    instream = instream if instream is not None else sys.stdin
    outstream = outstream if outstream is not None else sys.stdout
    tty = (
        instream is sys.stdin
        and getattr(sys.stdin, "isatty", lambda: False)()
    )
    histfile = None
    if tty:
        try:
            import readline

            histfile = os.path.expanduser("~/.flink-sql-history")
            try:
                readline.read_history_file(histfile)
            except OSError:
                pass
        except ImportError:
            histfile = None

    def emit(text: str) -> None:
        print(text, file=outstream)

    emit(_BANNER)
    pending = ""
    failures = 0
    while True:
        prompt = "Flink SQL> " if not pending.strip() else "         > "
        if tty:
            try:
                line = input(prompt) + "\n"
            except EOFError:
                break
            except KeyboardInterrupt:
                emit("")  # newline after ^C; drop the partial statement
                pending = ""
                continue
        else:
            outstream.write(prompt)
            outstream.flush()
            line = instream.readline()
            if not line:  # EOF ends the session like QUIT
                break
        pending += line
        stmts, pending = split_statements_with_tail(pending)
        quit_seen = False
        for stmt in stmts:
            word = stmt.strip().rstrip(";").strip().upper()
            if word in ("QUIT", "EXIT"):
                quit_seen = True
                break
            if word == "CLEAR":
                outstream.write("\x1b[2J\x1b[H")
                continue
            if word == "HELP":
                emit(_HELP)
                continue
            try:
                res = tenv.execute_sql(stmt)
                if res is not None and hasattr(res, "to_data_frame"):
                    df = res.to_data_frame()
                    if df is not None:
                        _render_df(tenv, df, emit)
                    elif getattr(res, "_rows", None):
                        # rows-based results (SHOW TABLES, DESCRIBE,
                        # DDL acks): render the rows, don't swallow them
                        for r in res.collect():
                            emit(str(r))
                    else:
                        emit("[INFO] Execute statement succeeded.")
                else:
                    emit("[INFO] Execute statement succeeded.")
            except KeyboardInterrupt:
                # CliClient's Ctrl-C contract: cancel the RUNNING query,
                # keep the session (only EOF/QUIT end it)
                emit("[INFO] Query cancelled.")
            except Exception as exc:  # noqa: BLE001 — REPL survives any statement error
                failures += 1
                emit(f"[ERROR] {type(exc).__name__}: {exc}")
        if quit_seen:
            break
    if histfile:
        try:
            import readline

            readline.write_history_file(histfile)
        except OSError:
            pass
    emit("Bye.")
    return failures


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
    from flink_release_1_16_0_spark import get_spark

    if script is None:
        # no -f/-e/positional: the reference client's default is the
        # interactive embedded mode (optionally after the -i script)
        from flink_release_1_16_0_spark.table_env import TableEnvironment

        tenv = TableEnvironment.create(get_spark("sql-client"))
        if init_script:
            run_statements(tenv, init_script, echo=True)
        run_interactive(tenv)
        return 0
    run_script(get_spark("sql-client"), script, init_script=init_script)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
