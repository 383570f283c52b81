"""Hive SQL dialect subset — ``SET 'table.sql-dialect'='hive'``.

Reference parity: the reference ships a second parser for Hive-spelled
statements (``flink-table/flink-sql-parser-hive/src/main/codegen/
includes/parserImpls.ftl`` — SqlCreateHiveTable: ``CREATE [EXTERNAL]
TABLE [IF NOT EXISTS] t (cols) [COMMENT] [PARTITIONED BY (col type,..)]
[ROW FORMAT ...] [STORED AS fmt] [LOCATION 'uri'] [TBLPROPERTIES
(...)]``; ``.../hive/ddl/SqlCreateHiveTable.java:45``) selected per
statement by ``table.sql-dialect`` (TableConfig.setSqlDialect,
``flink-table/flink-table-api-java/.../TableConfig.java``).

Spark-first lowering: rather than a second parser, the high-frequency
Hive DDL/DML forms TRANSLATE onto the engine's existing Flink-DDL path —
Hive's separately-typed partition columns append to the schema (Flink's
PARTITIONED BY references schema columns by name), STORED AS becomes the
filesystem connector's format (PARQUET/ORC native; TEXTFILE maps to the
csv reader with the declared field delimiter — Hive's ^A default), a
missing LOCATION defaults under the Spark warehouse dir exactly like a
managed Hive table, and TBLPROPERTIES pass through as table options.
Query syntax needs no translation: Spark SQL accepts backtick
identifiers and Hive type spellings natively.

Also translated: ``STRUCT<a:INT,b:STRING>`` column types (-> Flink
``ROW<a INT, b STRING>``, recursively — Hive's ``:`` separator appears
in no other type spelling), ``ALTER TABLE ADD/DROP PARTITION``
(SqlAddPartitions.java / SqlDropPartitions.java — location-less adds are
served by directory discovery, ``LOCATION`` adds register an external
partition path on the scan), and Hive CTAS (``CREATE TABLE t [STORED AS
fmt] [LOCATION ...] AS SELECT ...`` -> the default dialect's CTAS).

``CLUSTERED BY (c) [SORTED BY (...)] INTO n BUCKETS`` lowers onto
Spark's NATIVE bucketing via the hive-connector (session-catalog) path
— see :func:`_translate_bucketed_create` — so bucketed joins scan
exchange-free, the co-location contract Hive bucketing promises.

Scope (documented, like the reference's own dialect gaps): SERDE row
formats beyond LazySimpleSerDe/OpenCSVSerde and SKEWED BY raise with
pointers; bucketed tables support PARQUET/ORC storage.
"""

from __future__ import annotations

import re


def _q(v: str) -> str:
    """Escape a value for single-quoted SQL option/comment assembly."""
    return v.replace("'", "''")


def _strip_backticks(env, stmt: str) -> str:
    from flink_release_1_16_0_spark.table_env import _split_sql_literals

    out = []
    for is_lit, seg in _split_sql_literals(stmt):
        out.append(seg if is_lit else seg.replace("`", ""))
    return "".join(out)


# One storage-clause grammar shared by CREATE TABLE and CTAS — a
# sub-clause added here (as SERDEPROPERTIES and LINES were) stays in
# sync for BOTH statement shapes.
_STORAGE_CLAUSES = (
    r"(?:ROW\s+FORMAT\s+(?P<rowformat>DELIMITED"
    r"(?:\s+FIELDS\s+TERMINATED\s+BY\s+'(?P<delim>[^']*)')?"
    r"(?:\s+(?P<subdelims>(?:(?:COLLECTION\s+ITEMS|MAP\s+KEYS)\s+TERMINATED\s+BY\s+'[^']*'\s*)+))?"
    r"(?:\s+LINES\s+TERMINATED\s+BY\s+'(?P<lines>[^']*)')?"
    r"|SERDE\s+'(?P<serde>[^']*)'"
    r"(?:\s+WITH\s+SERDEPROPERTIES\s*\((?P<serdeprops>.*?)\))?)\s*)?"
    r"(?:STORED\s+AS\s+(?P<stored>\w+)\s*)?"
    r"(?:LOCATION\s+'(?P<loc>(?:[^']|'')*)'\s*)?"
)


_CREATE_TABLE_RE = re.compile(
    r"CREATE\s+(?:EXTERNAL\s+)?TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>[\w.]+)\s*\((?P<body>.*?)\)\s*"
    r"(?:COMMENT\s+'(?P<comment>(?:[^']|'')*)'\s*)?"
    r"(?:PARTITIONED\s+BY\s*\((?P<parts>[^)]*)\)\s*)?"
    r"(?:CLUSTERED\s+BY\s*\((?P<clustered>[^)]*)\)\s*"
    r"(?:SORTED\s+BY\s*\((?P<sorted>[^)]*)\)\s*)?"
    r"INTO\s+(?P<nbuckets>\d+)\s+BUCKETS\s*)?"
    + _STORAGE_CLAUSES
    + r"(?:TBLPROPERTIES\s*\((?P<props>.*)\)\s*)?",
    re.IGNORECASE | re.DOTALL,
)

_INSERT_TABLE_RE = re.compile(
    r"^(INSERT\s+(?:INTO|OVERWRITE))\s+TABLE\s+", re.IGNORECASE
)

_DB_LOCATION_RE = re.compile(r"\s+LOCATION\s+'(?:[^']|'')*'", re.IGNORECASE)

_STORED_FORMATS = {
    "parquet": "parquet",
    "orc": "orc",
    "textfile": "csv",
    "jsonfile": "json",
}



def _split_cols(body: str) -> list[str]:
    from flink_release_1_16_0_spark.table_env import _split_top_level

    return [c.strip() for c in _split_top_level(body) if c.strip()]


def _clean_col(col: str) -> str:
    """Strip a trailing per-column COMMENT; translate Hive STRUCT to
    Flink ROW (SqlCreateHiveTable accepts the full Hive type grammar;
    the engine's DDL path speaks Flink types)."""
    # '' is Hive's in-literal quote escape — the comment pattern must
    # swallow it, or COMMENT 'it''s fine' leaves residue in the DDL
    col = re.sub(r"\s+COMMENT\s+'(?:[^']|'')*'\s*$", "", col, flags=re.IGNORECASE)
    if re.search(r"\bSTRUCT\s*<", col, re.IGNORECASE):
        # STRUCT<a:INT,b:STRUCT<c:STRING>> -> ROW<a INT,b ROW<c STRING>>
        # ':' appears in no other Hive type spelling (and never in a
        # column name), so the blanket swap is exact, nesting included
        col = re.sub(r"\bSTRUCT\s*<", "ROW<", col, flags=re.IGNORECASE)
        col = col.replace(":", " ")
    return col.strip()


def _default_location(env, name: str) -> str:
    wh = env.spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for prefix in ("file://", "file:"):
        if wh.startswith(prefix):
            wh = wh[len(prefix):]
            break
    return f"{wh}/hive_dialect/{name.split('.')[-1]}"


# SerDes with a faithful csv-reader translation: LazySimpleSerDe is
# Hive's DEFAULT text SerDe (what ROW FORMAT DELIMITED compiles to), and
# OpenCSVSerde is the quoted-csv one. Anything else (Avro/ORC/JSON
# SerDes have STORED AS spellings; binary SerDes have no Spark reader
# knob) still raises with a pointer.
_LAZY_SERDE = "org.apache.hadoop.hive.serde2.lazy.LazySimpleSerDe"
_OPENCSV_SERDE = "org.apache.hadoop.hive.serde2.OpenCSVSerde"


def _unescape(v: str) -> str:
    # '\t'-style escapes in DDL decode to the real character; a value
    # that is not a valid escape sequence (e.g. a lone '\') is literal
    try:
        return v.encode("utf-8").decode("unicode_escape")
    except UnicodeDecodeError:
        return v


def _serde_csv_opts(serde: str, props_src: str | None) -> dict:
    props: dict[str, str] = {}
    if props_src:
        from flink_release_1_16_0_spark.table_env import (
            _parse_option_pair,
            _split_top_level,
        )

        for pair in _split_top_level(props_src):
            km = _parse_option_pair(pair)
            if not km:
                raise ValueError(
                    f"hive dialect: cannot parse SERDEPROPERTIES entry {pair!r}"
                )
            props[km[0]] = km[1]
    if serde == _LAZY_SERDE:
        delim = props.get("field.delim")
        if delim is None:
            # SHOW CREATE TABLE emits serialization.format, which Hive
            # parses as a BYTE CODE when numeric ('1' means \x01,
            # LazySerDeParameters.collectSeparators) — not the digit
            sf = props.get("serialization.format")
            if sf is not None:
                delim = chr(int(sf)) if sf.isdigit() else sf
        return {"sep": _unescape(delim) if delim else "\x01", "header": "false"}
    if serde == _OPENCSV_SERDE:
        # divergence note: Hive's OpenCSVSerde yields all-string columns;
        # the csv reader casts to the DECLARED types instead (strictly
        # more faithful to the table schema)
        return {
            "sep": _unescape(props.get("separatorChar", ",")),
            "quote": _unescape(props.get("quoteChar", '"')),
            "escape": _unescape(props.get("escapeChar", "\\")),
            "header": "false",
        }
    raise ValueError(
        f"hive dialect: ROW FORMAT SERDE {serde!r} is not translated "
        f"(supported: {_LAZY_SERDE}, {_OPENCSV_SERDE}, or ROW FORMAT "
        "DELIMITED FIELDS TERMINATED BY '<d>')"
    )


def _storage_opts(env, m: "re.Match") -> dict:
    """Shared CREATE/CTAS storage translation: STORED AS -> format,
    ROW FORMAT (DELIMITED or a csv-translatable SERDE) -> csv reader
    options, LOCATION -> path (warehouse default), TBLPROPERTIES ->
    passthrough options."""
    rowformat = m.group("rowformat")
    serde_opts = None
    if rowformat and rowformat.upper().startswith("SERDE"):
        serde_opts = _serde_csv_opts(m.group("serde"), m.group("serdeprops"))
    stored = (m.group("stored") or "textfile").lower()
    fmt = _STORED_FORMATS.get(stored)
    if fmt is None:
        raise ValueError(
            f"hive dialect: STORED AS {stored.upper()} is not translated "
            f"(supported: {', '.join(s.upper() for s in _STORED_FORMATS)})"
        )
    if serde_opts is not None and fmt != "csv":
        raise ValueError(
            "hive dialect: a row-format SERDE only applies to TEXTFILE "
            f"storage (table is STORED AS {stored.upper()})"
        )
    opts = {
        "connector": "filesystem",
        "path": (m.group("loc") or "").replace("''", "'")
        or _default_location(env, m.group("name")),
        "format": fmt,
    }
    if fmt == "csv":
        if serde_opts is not None:
            opts.update(serde_opts)
        else:
            if m.group("subdelims"):
                # COLLECTION ITEMS / MAP KEYS delimiters exist only to
                # encode complex types in Hive's text layout; the csv
                # reader has no nested-text decoder
                raise ValueError(
                    "hive dialect: COLLECTION ITEMS / MAP KEYS TERMINATED "
                    "BY is not translated (complex types in TEXTFILE — "
                    "use STORED AS PARQUET/ORC for nested columns)"
                )
            delim = m.group("delim")
            # Hive's default field delimiter is ^A (\001)
            opts["sep"] = _unescape(delim) if delim else "\x01"
            # a header row would eat the first record; Hive text tables
            # never have one
            opts["header"] = "false"
            lines = m.group("lines")
            if lines and _unescape(lines) != "\n":
                # Hive itself only accepts '\n' here (SemanticAnalyzer
                # rejects anything else), and Spark csv's lineSep is
                # single-character — fail at translation time with the
                # dialect's own message, not deep inside the reader
                raise ValueError(
                    "hive dialect: LINES TERMINATED BY only supports "
                    r"'\n' (Hive's own restriction)"
                )
    if m.group("props"):
        from flink_release_1_16_0_spark.table_env import (
            _parse_option_pair,
            _split_top_level,
        )

        for pair in _split_top_level(m.group("props")):
            km = _parse_option_pair(pair)
            if not km:
                raise ValueError(
                    f"hive dialect: cannot parse TBLPROPERTIES entry {pair!r}"
                )
            opts[km[0]] = km[1]
    return opts


def _translate_create_table(env, stmt: str) -> str:
    m = _CREATE_TABLE_RE.fullmatch(stmt)
    if not m:
        raise ValueError(f"hive dialect: cannot parse CREATE TABLE: {stmt!r}")
    if re.search(r"SKEWED\s+BY\s*\(", stmt, re.IGNORECASE):
        # documented permanent gap: Spark has no skewed-table DDL — the
        # metadata Hive uses to split skewed keys into separate
        # directories (list bucketing) has no catalog slot. The INTENT
        # (skew-resilient scans/joins) is covered at runtime by AQE's
        # skew-join splitting (spark.sql.adaptive.skewJoin.enabled, on
        # by default here) and the explicit salted-join operator
        # (operators/skew.py), so the DDL raises rather than silently
        # dropping the clause.
        raise ValueError(
            "hive dialect: SKEWED BY is not supported — Spark has no "
            "skewed-table metadata; skew handling is runtime-adaptive "
            "(AQE skew-join) or explicit (operators/skew.py salted "
            "join). Remove the clause; the data lays out identically."
        )
    cols = [_clean_col(c) for c in _split_cols(m.group("body"))]
    # the regex's trailing clauses are all optional, so an
    # unrecognizable clause makes the lazy body group swallow the rest
    # of the statement instead of failing — catch that mis-parse loudly
    # rather than creating a mangled table
    for c in cols:
        # contextful shapes only: a COLUMN legally named `location` /
        # `tblproperties` must not trip the guard, so each keyword is
        # matched together with the syntax that can only follow it in
        # the clause position (quote, paren, AS <word>, ...)
        if re.search(
            r"\b(STORED\s+AS\s+\w|LOCATION\s+'|TBLPROPERTIES\s*\(|"
            r"ROW\s+FORMAT\s+(?:DELIMITED|SERDE)|PARTITIONED\s+BY\s*\(|"
            r"TERMINATED\s+BY\s+'|SKEWED\s+BY\s*\(|CLUSTERED\s+BY\s*\(|"
            r"SORTED\s+BY\s*\(|\d+\s+BUCKETS\b)",
            c,
            re.IGNORECASE,
        ):
            raise ValueError(
                f"hive dialect: cannot parse CREATE TABLE near {c[:80]!r} "
                "(unsupported clause between the column list and WITH?)"
            )
    part_names: list[str] = []
    if m.group("parts"):
        # Hive declares partition columns OUTSIDE the schema with their
        # own types; Flink DDL references schema columns — append them
        for p in _split_cols(m.group("parts")):
            p = _clean_col(p)
            part_names.append(p.split()[0])
            cols.append(p)
    if m.group("clustered"):
        return _translate_bucketed_create(env, m, cols, part_names)
    opts = _storage_opts(env, m)
    with_clause = ", ".join(f"'{_q(k)}'='{_q(v)}'" for k, v in opts.items())
    comment = f" COMMENT '{m.group('comment')}'" if m.group("comment") else ""
    ine = "IF NOT EXISTS " if m.group("ine") else ""
    parts = f" PARTITIONED BY ({', '.join(part_names)})" if part_names else ""
    return (
        f"CREATE TABLE {ine}{m.group('name')} ({', '.join(cols)})"
        f"{comment}{parts} WITH ({with_clause})"
    )


def _translate_bucketed_create(env, m: "re.Match", cols: list, part_names: list) -> str:
    """``CLUSTERED BY (c) [SORTED BY (...)] INTO n BUCKETS``
    (parserImpls.ftl TableCreationPart's bucket spec;
    SqlCreateHiveTable.java:45) lowers onto Spark's NATIVE bucketing:
    the table becomes a hive-connector (session-catalog) table created
    with ``CLUSTERED BY ... INTO n BUCKETS``, so scans of two tables
    bucketed on the join key run exchange-free (Spark's bucketed-join
    pruning — the same co-location contract Hive bucketing promises).
    The filesystem-path connector cannot honor bucket metadata (path
    scans carry no bucket spec), which is why the bucketed form routes
    to the catalog-managed path instead.

    Scope: bucketed tables use native catalog formats (PARQUET/ORC);
    ROW FORMAT / text SerDes combined with buckets raise with a
    pointer, and a missing STORED AS defaults to parquet (documented
    divergence — Hive would default to TEXTFILE)."""
    if m.group("rowformat"):
        raise ValueError(
            "hive dialect: ROW FORMAT combined with CLUSTERED BY is not "
            "translated (bucketed tables lower onto Spark's native "
            "catalog bucketing, which is columnar here); use STORED AS "
            "PARQUET/ORC for bucketed tables"
        )
    stored = (m.group("stored") or "parquet").lower()
    if stored not in ("parquet", "orc"):
        raise ValueError(
            f"hive dialect: STORED AS {stored.upper()} with CLUSTERED BY "
            "is not translated — Spark-native bucketing is supported for "
            "PARQUET/ORC here (parserImpls.ftl TableCreationPart)"
        )
    bucket_cols = ", ".join(c.strip() for c in m.group("clustered").split(","))
    opts = {
        "connector": "hive",
        "table-name": m.group("name"),
        "using-format": stored,
        "bucket-columns": bucket_cols,
        "bucket-count": m.group("nbuckets"),
    }
    if m.group("sorted"):
        opts["bucket-sort-columns"] = ", ".join(
            c.strip() for c in m.group("sorted").split(",")
        )
    if m.group("loc"):
        opts["location"] = m.group("loc").replace("''", "'")
    if m.group("props"):
        from flink_release_1_16_0_spark.table_env import (
            _parse_option_pair,
            _split_top_level,
        )

        for pair in _split_top_level(m.group("props")):
            km = _parse_option_pair(pair)
            if not km:
                raise ValueError(
                    f"hive dialect: cannot parse TBLPROPERTIES entry {pair!r}"
                )
            opts[km[0]] = km[1]
    with_clause = ", ".join(f"'{_q(k)}'='{_q(v)}'" for k, v in opts.items())
    comment = f" COMMENT '{m.group('comment')}'" if m.group("comment") else ""
    ine = "IF NOT EXISTS " if m.group("ine") else ""
    parts = f" PARTITIONED BY ({', '.join(part_names)})" if part_names else ""
    return (
        f"CREATE TABLE {ine}{m.group('name')} ({', '.join(cols)})"
        f"{comment}{parts} WITH ({with_clause})"
    )


# Hive CTAS (parserImpls.ftl TableCreationWithQuery): no column list —
# the schema comes from the query; PARTITIONED BY is not allowed (Hive's
# own CTAS restriction)
_CTAS_HIVE_RE = re.compile(
    r"CREATE\s+(?:EXTERNAL\s+)?TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>[\w.]+)\s*"
    r"(?:COMMENT\s+'(?P<comment>(?:[^']|'')*)'\s*)?"
    + _STORAGE_CLAUSES
    + r"(?:TBLPROPERTIES\s*\((?P<props>.*?)\)\s*)?"
    r"AS\s+(?P<query>(?:SELECT|WITH|VALUES|TABLE)\b.*)",
    re.IGNORECASE | re.DOTALL,
)


def _translate_ctas(env, stmt: str, m: "re.Match") -> str:
    """Hive CTAS -> default-dialect CTAS (CREATE TABLE ... WITH (...) AS
    query). A COMMENT clause is accepted and dropped — the default
    dialect's own CTAS carries no comment slot and table comments are
    informational throughout this engine."""
    opts = _storage_opts(env, m)
    with_clause = ", ".join(f"'{_q(k)}'='{_q(v)}'" for k, v in opts.items())
    ine = "IF NOT EXISTS " if m.group("ine") else ""
    return (
        f"CREATE TABLE {ine}{m.group('name')} WITH ({with_clause}) "
        f"AS {m.group('query')}"
    )


def _translate_alter_table(stmt: str, up: str) -> str:
    """The high-frequency SqlAlterHiveTable* forms
    (flink-sql-parser-hive/.../ddl/SqlAlterHiveTableProps.java,
    SqlAlterHiveTableLocation.java, SqlAlterHiveTableFileFormat.java):
    SET TBLPROPERTIES / SET LOCATION / SET FILEFORMAT lower onto the
    default dialect's ALTER TABLE ... SET (options); RENAME TO passes
    through. Column/partition surgery raises with pointers."""
    m = re.fullmatch(
        r"ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+SET\s+TBLPROPERTIES\s*\((?P<props>.*)\)",
        stmt,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        return f"ALTER TABLE {m.group('name')} SET ({m.group('props')})"
    m = re.fullmatch(
        r"ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+SET\s+LOCATION\s+'(?P<loc>(?:[^']|'')*)'",
        stmt,
        re.IGNORECASE,
    )
    if m:
        return f"ALTER TABLE {m.group('name')} SET ('path'='{_q(m.group('loc'))}')"
    m = re.fullmatch(
        r"ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+SET\s+FILEFORMAT\s+(?P<fmt>\w+)",
        stmt,
        re.IGNORECASE,
    )
    if m:
        fmt = _STORED_FORMATS.get(m.group("fmt").lower())
        if fmt is None:
            raise ValueError(
                f"hive dialect: SET FILEFORMAT {m.group('fmt').upper()} is not "
                f"translated (supported: {', '.join(s.upper() for s in _STORED_FORMATS)})"
            )
        return f"ALTER TABLE {m.group('name')} SET ('format'='{fmt}')"
    if re.search(r"\b(ADD|REPLACE|CHANGE)\s+COLUMNS?\b", up):
        raise ValueError(
            "hive dialect: ALTER TABLE column surgery is not translated — "
            "recreate the table (CREATE TABLE ... LIKE keeps options)"
        )
    # ADD/DROP PARTITION share the default-dialect spelling — the
    # engine's _alter_table parses them (SqlAddPartitions /
    # SqlDropPartitions); RENAME TO and friends pass through likewise
    return stmt


def translate_hive(env, stmt: str) -> str:
    """Translate one Hive-dialect statement onto the default-dialect
    surface. Statements whose spelling already coincides (SELECT, USE,
    SHOW, DROP, SET, ...) pass through with backticks stripped."""
    from flink_release_1_16_0_spark.table_env import _split_sql_literals

    stmt = _strip_backticks(env, stmt).strip()
    up = stmt.upper()
    # CREATE TABLE ... LIKE detection: the LIKE keyword must sit at
    # paren depth 0 and outside string literals — a column named `like`
    # (inside the column parens) or a COMMENT containing the word must
    # not skip translation
    bare = "".join(
        seg for is_lit, seg in _split_sql_literals(stmt) if not is_lit
    ).upper()

    def top_level_like(text: str) -> bool:
        depth = 0
        for m in re.finditer(r"[()]|\bLIKE\b", text):
            tok = m.group(0)
            if tok == "(":
                depth += 1
            elif tok == ")":
                depth = max(0, depth - 1)
            elif depth == 0:
                return True
        return False

    if re.match(r"CREATE\s+(?:EXTERNAL\s+)?TABLE\b", up) and not top_level_like(bare):
        # a column-list CREATE cannot fullmatch the CTAS shape (nothing
        # between the table name and AS admits a paren group), so the
        # two forms are disjoint
        ctas = _CTAS_HIVE_RE.fullmatch(stmt)
        if ctas:
            return _translate_ctas(env, stmt, ctas)
        return _translate_create_table(env, stmt)
    m = _INSERT_TABLE_RE.match(stmt)
    if m:
        # INSERT INTO|OVERWRITE TABLE t ... -> drop the TABLE keyword
        # (RichSqlInsert accepts both; the default dialect omits it)
        return m.group(1) + " " + stmt[m.end():]
    if re.match(r"ALTER\s+TABLE\b", up):
        return _translate_alter_table(stmt, up)
    if re.match(r"CREATE\s+(?:DATABASE|SCHEMA)\b", up):
        # SCHEMA is Hive's synonym; a LOCATION clause has no counterpart
        # on the in-memory database namespace — drop it
        stmt = re.sub(r"^CREATE\s+SCHEMA\b", "CREATE DATABASE", stmt, flags=re.IGNORECASE)
        return _DB_LOCATION_RE.sub("", stmt)
    return stmt
