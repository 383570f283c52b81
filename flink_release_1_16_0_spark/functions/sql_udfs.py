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


def register_sql_functions(spark: SparkSession) -> None:
    """Create every Flink-spelled SQL UDF on the session (idempotent)."""
    for name, (signature, body) in FLINK_SQL_UDFS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{signature} RETURN {body}"
        )
