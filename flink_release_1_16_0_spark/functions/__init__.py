"""Flink-named scalar/aggregate function shims (SURVEY.md section 2.8).

The reference's function surface (BuiltInFunctionDefinitions.java +
FlinkSqlOperatorTable.java) is ~95% name-identical to Spark's. This
module covers the remainder: Flink spellings whose Spark equivalent has
a different name or needs a one-line rewrite (SqlFunctionUtils.java
runtime bodies). Each shim is a pure Column expression — JVM-side,
codegen-friendly, no Python UDFs.

Usage mirrors `pyspark.sql.functions`:

    from flink_release_1_16_0_spark import functions as FF
    df.select(FF.split_index("col", ",", 2), FF.sum0("x"))
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# -- string ----------------------------------------------------------------


def char_length(col: Column | str) -> Column:
    """Flink CHAR_LENGTH."""
    return F.length(_c(col))


def split_index(col: Column | str, sep: str, index: int) -> Column:
    """Flink SPLIT_INDEX(s, sep, i): 0-based split element, NULL if out
    of range (SqlFunctionUtils.splitIndex). The separator is LITERAL in
    Flink, but Spark's split() takes a Java regex — quote it with
    \\Q...\\E so '.', '|', etc. split literally. try_element_at keeps
    the NULL-on-out-of-range contract under ANSI mode."""
    return F.try_element_at(
        F.split(_c(col), F.lit("\\Q" + sep + "\\E"), -1), F.lit(index + 1)
    )


def str_to_map(col: Column | str, pair_sep: str = ",", kv_sep: str = "=") -> Column:
    """Flink STR_TO_MAP."""
    return F.str_to_map(_c(col), F.lit(pair_sep), F.lit(kv_sep))


def is_digit(col: Column | str) -> Column:
    """Flink IS_DIGIT: true iff all chars are [0-9] (and non-empty)."""
    return _c(col).rlike("^[0-9]+$")


def is_alpha(col: Column | str) -> Column:
    """Flink IS_ALPHA: true iff all chars are letters (and non-empty)."""
    return _c(col).rlike("^[A-Za-z]+$")


def is_decimal(col: Column | str) -> Column:
    """Flink IS_DECIMAL: parseable as a decimal number."""
    return F.expr(f"TRY_CAST({_c(col)._jc.toString()} AS DECIMAL(38,18))").isNotNull()


def json_string(col: Column | str) -> Column:
    """Flink JSON_STRING(v): serialize any scalar to its JSON literal
    (BuiltInFunctionDefinitions JSON block; strings quoted + escaped,
    numbers bare). Spark's to_json only takes complex types, so wrap in
    a 1-element array and strip the brackets — the element encoding is
    exactly the JSON literal."""
    c = _c(col)
    arr = F.to_json(F.array(c))
    # null-on-null like the reference (to_json(array(NULL)) would give
    # the literal string 'null' otherwise)
    return F.when(c.isNull(), F.lit(None)).otherwise(
        arr.substr(F.lit(2), F.length(arr) - 2)
    )


def hash_code(col: Column | str) -> Column:
    """Flink HASH_CODE(s): a deterministic 32-bit hash. Spark's murmur3
    `hash` (NOT Java String.hashCode — documented divergence; stable
    within this engine)."""
    return F.hash(_c(col))


def regexp(col: Column | str, pattern: str) -> Column:
    """Flink REGEXP(s, p): partial-match semantics."""
    return _c(col).rlike(pattern)


def similar_to(col: Column | str, pattern: str) -> Column:
    """SQL SIMILAR TO: full-match regex (anchored rlike)."""
    return _c(col).rlike(f"^(?:{pattern})$")


def parse_url(col: Column | str, part: str, key: str | None = None) -> Column:
    """Flink/Hive PARSE_URL."""
    if key is None:
        return F.parse_url(_c(col), F.lit(part))
    return F.parse_url(_c(col), F.lit(part), F.lit(key))


def from_base64(col: Column | str) -> Column:
    return F.unbase64(_c(col)).cast("string")


def to_base64(col: Column | str) -> Column:
    return F.base64(_c(col).cast("binary"))


# -- numeric ---------------------------------------------------------------


def sum0(col: Column | str) -> Column:
    """Flink SUM0: SUM that returns 0 (not NULL) on empty/all-null input
    (Sum0AggFunction.java)."""
    c = _c(col)
    return F.coalesce(F.sum(c), F.lit(0).cast("double") * 0)


def truncate(col: Column | str, n: int = 0) -> Column:
    """Flink TRUNCATE(x, n): toward zero at n decimals
    (SqlFunctionUtils.struncate)."""
    c = _c(col)
    factor = 10.0**n
    return (
        F.when(c >= 0, F.floor(c * factor) / factor)
        .otherwise(F.ceil(c * factor) / factor)
    )


def cot(col: Column | str) -> Column:
    """Flink COT = 1/tan."""
    return F.lit(1.0) / F.tan(_c(col))


def rand_integer(bound: int, seed: int | None = None) -> Column:
    """Flink RAND_INTEGER(bound): uniform int in [0, bound)."""
    r = F.rand(seed) if seed is not None else F.rand()
    return F.floor(r * bound).cast("int")


def log2(col: Column | str) -> Column:
    return F.log2(_c(col))


def bin_(col: Column | str) -> Column:
    """Flink BIN: binary string of a bigint."""
    return F.bin(_c(col))


def hex_(col: Column | str) -> Column:
    return F.hex(_c(col))


# -- temporal --------------------------------------------------------------


def timestampadd(unit: str, n: Column | int, ts: Column | str) -> Column:
    """Flink TIMESTAMPADD(unit, n, ts)."""
    n_expr = F.lit(n) if isinstance(n, int) else n
    return F.timestampadd(unit, n_expr, _c(ts))


def timestampdiff(unit: str, start: Column | str, end: Column | str) -> Column:
    """Flink TIMESTAMPDIFF(unit, start, end)."""
    return F.timestampdiff(unit, _c(start), _c(end))


def date_format_flink(ts: Column | str, fmt: str) -> Column:
    """Flink DATE_FORMAT uses Java SimpleDateFormat patterns = Spark's."""
    return F.date_format(_c(ts), fmt)


def temporal_overlaps(
    s1: Column, e1: Column, s2: Column, e2: Column
) -> Column:
    """Flink TEMPORAL_OVERLAPS((s1,e1),(s2,e2))."""
    return (s1 <= e2) & (s2 <= e1)


def to_timestamp_ltz(col: Column | str, precision: int = 3) -> Column:
    """Flink TO_TIMESTAMP_LTZ(epoch, 0|3): epoch seconds/millis -> ts."""
    c = _c(col).cast("bigint")
    if precision == 0:
        return F.timestamp_seconds(c)
    if precision == 3:
        return F.timestamp_millis(c)
    raise ValueError("precision must be 0 or 3 (TO_TIMESTAMP_LTZ contract)")


def unix_timestamp_flink(ts: Column | str | None = None) -> Column:
    return F.unix_timestamp() if ts is None else F.unix_timestamp(_c(ts))


# -- conditional / misc ----------------------------------------------------


def ifnull(col: Column | str, default: Column) -> Column:
    return F.coalesce(_c(col), default)


def try_cast(col: Column | str, dtype: str) -> Column:
    c = _c(col)
    return F.expr(f"TRY_CAST({c._jc.toString()} AS {dtype})")


def typeof(col: Column | str) -> Column:
    """Flink TYPEOF: the value's SQL type name."""
    return F.typeof(_c(col))


def single_value(col: Column | str) -> Column:
    """Flink SINGLE_VALUE agg: the sole value of a 1-row group; errors on
    multiple distinct values — approximated as strict first+count guard
    (raises at runtime via ANSI division when violated)."""
    c = _c(col)
    # count>1 -> force an error by dividing by zero under ANSI; else first
    return F.when(F.count(F.lit(1)) == 1, F.first(c)).otherwise(
        F.first(c) / (F.count(F.lit(1)) - F.count(F.lit(1)))
    )


# -- multiset / collect ----------------------------------------------------


def multiset_from_array(arr: Column) -> Column:
    """Flink COLLECT -> MULTISET encoding: element -> count map (the
    reference's runtime encoding of MULTISET, SURVEY.md section 1.2).
    Apply to a collected array: ``agg(collect_list(x).alias("a"))``
    then ``select(multiset_from_array(col("a")))``."""
    return F.map_from_entries(
        F.transform(
            F.array_distinct(arr),
            lambda x: F.struct(
                x.alias("key"),
                F.size(F.filter(arr, lambda y: y == x)).alias("value"),
            ),
        )
    )


def listagg(col: Column | str, sep: str = ",") -> Column:
    """Flink LISTAGG(col, sep)."""
    return F.concat_ws(sep, F.collect_list(_c(col)))
