"""Flink-spelled SQL functions, registered as Spark SQL scalar UDFs.

The python-side shims in ``functions/__init__`` cover the DataFrame API;
this module covers the SQL surface: names from
BuiltInFunctionDefinitions.java / FlinkSqlOperatorTable.java that Spark
SQL lacks (or spells differently) are created as SQL scalar UDFs
(``CREATE OR REPLACE TEMPORARY FUNCTION ... RETURN <expr>``). SQL UDFs
inline into the Catalyst plan — JVM-side, codegen-able, zero Python
overhead — so using the Flink spelling costs nothing at 100 TB.

Names Spark already has natively (CHAR_LENGTH, STR_TO_MAP, PARSE_URL,
REGEXP, COT, TIMESTAMPADD/DIFF, IFNULL, UUID, CHR, ...) are not
re-registered.

Documented divergences: HASH_CODE is murmur3 (Spark's hash), not Java
String.hashCode; JSON_VALUE supports the '$.path' subset (Flink's
lax-mode default) via get_json_object.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name -> (signature, body). Bodies are pure Spark SQL expressions.
FLINK_SQL_UDFS: dict[str, tuple[str, str]] = {
    # SqlFunctionUtils.splitIndex: literal separator, 0-based index,
    # NULL when out of range
    "SPLIT_INDEX": (
        "(s STRING, sep STRING, idx INT) RETURNS STRING",
        r"try_element_at(split(s, concat('\\Q', sep, '\\E')), idx + 1)",
    ),
    "IS_DIGIT": ("(s STRING) RETURNS BOOLEAN", "s rlike '^[0-9]+$'"),
    "IS_ALPHA": ("(s STRING) RETURNS BOOLEAN", "s rlike '^[a-zA-Z]+$'"),
    "IS_DECIMAL": (
        "(s STRING) RETURNS BOOLEAN",
        "try_cast(s AS DOUBLE) IS NOT NULL",
    ),
    "HASH_CODE": ("(s STRING) RETURNS INT", "hash(s)"),
    # BuiltInFunctionDefinitions.CURRENT_WATERMARK: the operator's
    # current watermark for the given rowtime. In the micro-batch model
    # the per-operator watermark is not an expression-level quantity, so
    # this permanently returns NULL — Flink's own legal value before the
    # first watermark is generated (SURVEY section-2.8 scoping).
    # DOCUMENTED DIVERGENCE: a bare comparison like
    # `ts > CURRENT_WATERMARK(ts)` evaluates UNKNOWN against NULL and a
    # WHERE drops every row, exactly as it would in Flink before the
    # first watermark — but here that state never ends. Spell the guard
    # `CURRENT_WATERMARK(ts) IS NULL OR ts > CURRENT_WATERMARK(ts)`
    # (the pattern Flink's own docs recommend for the pre-watermark
    # window) and the query behaves identically on both engines.
    "CURRENT_WATERMARK": (
        "(ts TIMESTAMP) RETURNS TIMESTAMP",
        "CAST(NULL AS TIMESTAMP)",
    ),
    # numeric truncation toward zero at n decimals
    "TRUNCATE": (
        "(x DOUBLE, n INT) RETURNS DOUBLE",
        "sign(x) * floor(abs(x) * power(10, n)) / power(10, n)",
    ),
    "TO_BASE64": ("(b BINARY) RETURNS STRING", "base64(b)"),
    "FROM_BASE64": ("(s STRING) RETURNS BINARY", "unbase64(s)"),
    # NOTE: TO_TIMESTAMP_LTZ is NOT here — Spark 4 ships a builtin of
    # that name (string-parsing form) which SQL UDFs cannot replace;
    # Flink's epoch form lives in the python shim (functions/__init__).
    "IS_JSON": (
        "(s STRING) RETURNS BOOLEAN",
        "try_parse_json(s) IS NOT NULL",
    ),
    "JSON_VALUE": (
        "(s STRING, p STRING) RETURNS STRING",
        "get_json_object(s, p)",
    ),
    "RAND_INTEGER": (
        "(bound INT) RETURNS INT",
        "cast(floor(rand() * bound) AS INT)",
    ),
    # SqlFunctionUtils.convertTz: reinterpret a wall-clock string from
    # one zone into another (Flink's 3-arg string form)
    "CONVERT_TZ": (
        "(s STRING, tz_from STRING, tz_to STRING) RETURNS STRING",
        "date_format(from_utc_timestamp(to_utc_timestamp(s, tz_from), tz_to),"
        " 'yyyy-MM-dd HH:mm:ss')",
    ),
    # CurrentRowTimestampSqlFunction: per-row evaluation timestamp
    # (non-deterministic by contract, like PROCTIME)
    "CURRENT_ROW_TIMESTAMP": (
        "() RETURNS TIMESTAMP_LTZ", "current_timestamp()"
    ),
    # Flink's fixed-width SHA spellings over Spark's sha2 family
    "SHA224": ("(s STRING) RETURNS STRING", "sha2(s, 224)"),
    "SHA256": ("(s STRING) RETURNS STRING", "sha2(s, 256)"),
    "SHA384": ("(s STRING) RETURNS STRING", "sha2(s, 384)"),
    "SHA512": ("(s STRING) RETURNS STRING", "sha2(s, 512)"),
    # PrintSqlFunction: identity passthrough (the reference prints to
    # the taskmanager log as a side effect; a distributed stdout has no
    # Spark equivalent — use the print sink for inspection)
    "PRINT": ("(tag STRING, v STRING) RETURNS STRING", "v"),
}


# Hive-module functions (the reference's HiveModule exposes Hive's
# built-in UDFs; flink-connectors/flink-connector-hive/.../HiveModule.java).
# Spark already ships almost every Hive built-in natively — the surface
# that is genuinely hive-module-only here is the data-masking family
# (GenericUDFMaskFirstN & co.), which Spark SQL lacks. Masking rules per
# Hive: upper -> 'X', lower -> 'x', digit -> 'n', others unchanged.
_MASK = (
    "regexp_replace(regexp_replace(regexp_replace({v}, '[A-Z]', 'X'),"
    " '[a-z]', 'x'), '[0-9]', 'n')"
)
HIVE_SQL_UDFS: dict[str, tuple[str, str]] = {
    "MASK_FIRST_N": (
        "(s STRING, n INT) RETURNS STRING",
        f"concat({_MASK.format(v='substring(s, 1, n)')}, substring(s, n + 1))",
    ),
    "MASK_LAST_N": (
        "(s STRING, n INT) RETURNS STRING",
        "concat(substring(s, 1, greatest(length(s) - n, 0)), "
        + _MASK.format(v="substring(s, greatest(length(s) - n, 0) + 1)")
        + ")",
    ),
    "MASK_SHOW_FIRST_N": (
        "(s STRING, n INT) RETURNS STRING",
        f"concat(substring(s, 1, n), {_MASK.format(v='substring(s, n + 1)')})",
    ),
    "MASK_SHOW_LAST_N": (
        "(s STRING, n INT) RETURNS STRING",
        _MASK.format(v="substring(s, 1, greatest(length(s) - n, 0))")
        + " || substring(s, greatest(length(s) - n, 0) + 1)",
    ),
    # Hive's mask_hash: deterministic one-way hash of the value
    "MASK_HASH": ("(s STRING) RETURNS STRING", "md5(s)"),
}

# module name -> its SQL-UDF function set (the resolution surface the
# module contributes; ModuleManager.listFunctions per-module scoping)
MODULE_FUNCTIONS: dict[str, dict[str, tuple[str, str]]] = {
    "core": FLINK_SQL_UDFS,
    "hive": HIVE_SQL_UDFS,
}


def register_sql_functions(
    spark: SparkSession, module: str = "core"
) -> None:
    """Create a module's SQL UDFs on the session (idempotent)."""
    for name, (signature, body) in MODULE_FUNCTIONS[module].items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{signature} RETURN {body}"
        )


def deregister_sql_functions(spark: SparkSession, module: str) -> None:
    """Drop a module's SQL UDFs — its names stop resolving, the
    reference's unload / not-used semantics (ModuleManager.unloadModule
    / useModules)."""
    for name in MODULE_FUNCTIONS[module]:
        spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {name}")
