"""Scalar-function parity coverage (SURVEY.md section 2.8).

Reference: the BuiltInFunctionDefinitions.java (2052 lines) +
FlinkSqlOperatorTable.java function surface, with runtime bodies in
RT/../functions/SqlFunctionUtils.java. On Spark nearly all of them are
native `pyspark.sql.functions`; the queries below pin the semantics of
each family against DuckDB, bundling several functions per query the
way the reference's ScalarOperatorsTest / SqlExpressionTest group cases.

Flink-name shims that differ from Spark's spelling (SPLIT_INDEX ->
split()[i], IS_DIGIT -> rlike, SUM0 -> coalesce(sum), ...) live in
``flink_release_1_16_0_spark.functions`` and are exercised here too.

Cross-engine determinism notes:
- libm functions (exp/ln/sin/...) are not guaranteed correctly rounded,
  so transcendental cases run on a small integer domain (nation, 25
  rows) and round to 9 decimals — verified bit-stable on this data.
- ROUND: Spark and DuckDB both round half away from zero for decimals;
  doubles are rounded only at scales beyond the data's 2-decimal grid.
- Engine-specific hashes (Spark murmur3 vs DuckDB hash) are not
  comparable; only MD5/SHA-2 are oracle-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_release_1_16_0_spark import functions as FF
from flink_release_1_16_0_spark.catalog import load_table
from flink_release_1_16_0_spark.queries import register

# --------------------------------------------------------------------------
# string basics: CHAR_LENGTH, UPPER/LOWER, SUBSTRING, TRIM family, CONCAT,
# CONCAT_WS, LPAD/RPAD, LEFT/RIGHT, REPEAT, REVERSE, REPLACE, OVERLAY
# --------------------------------------------------------------------------

_STR_BASIC_ORACLE = """
SELECT
  c_custkey,
  LENGTH(c_name)                          AS name_len,
  UPPER(c_name)                           AS name_upper,
  LOWER(c_mktsegment)                     AS seg_lower,
  SUBSTRING(c_name, 1, 8)                 AS name_prefix,
  TRIM(CONCAT('  ', c_name, ' '))         AS name_trim,
  LTRIM(CONCAT('xxab', c_name), 'xa')     AS name_ltrim,
  RTRIM(CONCAT(c_name, 'byy'), 'yb')      AS name_rtrim,
  CONCAT(c_name, '#', c_mktsegment)       AS name_seg,
  CONCAT_WS('-', c_name, c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS ws,
  LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS key_lpad,
  RPAD(c_mktsegment, 12, '.')             AS seg_rpad,
  LEFT(c_name, 4)                         AS name_left,
  RIGHT(c_name, 3)                        AS name_right,
  REPEAT(c_mktsegment, 2)                 AS seg_twice,
  REVERSE(c_name)                         AS name_rev,
  REPLACE(c_name, 'Customer', 'Cust')     AS name_repl
FROM customer
WHERE c_custkey % 17 = 0
"""


@register("func_string_basic", _STR_BASIC_ORACLE, tags=("function", "string"))
def func_string_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 17 == 0)
    return cust.select(
        "c_custkey",
        F.length("c_name").alias("name_len"),
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("name_trim"),
        F.expr("TRIM(LEADING 'xa' FROM CONCAT('xxab', c_name))").alias("name_ltrim"),
        F.expr("TRIM(TRAILING 'yb' FROM CONCAT(c_name, 'byy'))").alias("name_rtrim"),
        F.concat(F.col("c_name"), F.lit("#"), F.col("c_mktsegment")).alias("name_seg"),
        F.concat_ws(
            "-", "c_name", "c_mktsegment", F.col("c_nationkey").cast("string")
        ).alias("ws"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_lpad"),
        F.rpad("c_mktsegment", 12, ".").alias("seg_rpad"),
        F.substring("c_name", 1, 4).alias("name_left"),
        F.expr("RIGHT(c_name, 3)").alias("name_right"),
        F.repeat("c_mktsegment", 2).alias("seg_twice"),
        F.reverse("c_name").alias("name_rev"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("name_repl"),
    )


# --------------------------------------------------------------------------
# regex + position family: REGEXP_EXTRACT, REGEXP_REPLACE, LIKE/SIMILAR,
# POSITION/LOCATE/INSTR, SPLIT_INDEX, ASCII, CHR, STR_TO_MAP
# --------------------------------------------------------------------------

_STR_REGEX_ORACLE = """
SELECT
  c_custkey,
  REGEXP_EXTRACT(c_name, '([0-9]+)', 1)              AS digits,
  REGEXP_REPLACE(c_name, '[0-9]', '#', 'g')          AS masked,
  (c_name LIKE 'Customer%')                          AS is_cust,
  REGEXP_MATCHES(c_mktsegment, '^[A-Z]+$')           AS seg_alpha,
  STRPOS(c_name, 'stom')                             AS pos_stom,
  INSTR(c_name, '0')                                 AS pos_zero,
  SPLIT_PART(CONCAT(c_name, '#', c_mktsegment), '#', 2) AS split_idx1,
  ASCII(c_mktsegment)                                AS seg_ascii,
  CHR(CAST(65 + (c_custkey % 26) AS INTEGER))        AS key_chr
FROM customer
WHERE c_custkey % 19 = 0
"""


@register("func_string_regex", _STR_REGEX_ORACLE, tags=("function", "string"))
def func_string_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 19 == 0)
    return cust.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_name", r"[0-9]", "#").alias("masked"),
        F.col("c_name").like("Customer%").alias("is_cust"),
        F.col("c_mktsegment").rlike(r"^[A-Z]+$").alias("seg_alpha"),
        F.instr("c_name", "stom").alias("pos_stom"),
        F.instr("c_name", "0").alias("pos_zero"),
        # Flink SPLIT_INDEX(s, sep, idx) is 0-based -> split()[1]
        F.split(F.concat("c_name", F.lit("#"), "c_mktsegment"), "#")
        .getItem(1)
        .alias("split_idx1"),
        F.ascii("c_mktsegment").alias("seg_ascii"),
        F.chr(F.lit(65) + (F.col("c_custkey") % 26)).alias("key_chr"),
    )


# --------------------------------------------------------------------------
# math family on an integer domain (exactness, see module docstring):
# ABS/SIGN/MOD/FLOOR/CEIL/SQRT/POWER/EXP/LN/LOG10/SIN/COS/ATAN2/DEGREES/PI
# --------------------------------------------------------------------------

_MATH_ORACLE = """
SELECT
  n_nationkey AS k,
  ABS(n_nationkey - 12)                      AS abs_c,
  CAST(SIGN(n_nationkey - 12) AS DOUBLE)     AS sign_c,
  n_nationkey % 7                            AS mod_c,
  CAST(FLOOR(n_nationkey / 4.0) AS BIGINT)   AS floor_c,
  CAST(CEIL(n_nationkey / 4.0) AS BIGINT)    AS ceil_c,
  ROUND(SQRT(n_nationkey), 9)                AS sqrt_c,
  POWER(n_nationkey, 2)                      AS pow_c,
  ROUND(EXP(n_nationkey / 10.0), 9)          AS exp_c,
  ROUND(LN(n_nationkey + 1), 9)              AS ln_c,
  ROUND(LOG10(n_nationkey + 1), 9)           AS log10_c,
  ROUND(SIN(n_nationkey), 9)                 AS sin_c,
  ROUND(COS(n_nationkey), 9)                 AS cos_c,
  ROUND(ATAN2(n_nationkey, 7), 9)            AS atan2_c,
  ROUND(ACOS(n_nationkey / 30.0), 9)         AS acos_c,
  ROUND(ASIN(n_nationkey / 30.0), 9)         AS asin_c,
  ROUND(DEGREES(n_nationkey / 10.0), 9)      AS deg_c,
  ROUND(PI(), 9)                             AS pi_c,
  CAST(n_nationkey AS BIGINT) & 12           AS band_c,
  CAST(n_nationkey AS BIGINT) | 5            AS bor_c,
  XOR(CAST(n_nationkey AS BIGINT), 9)        AS bxor_c
FROM nation
"""


@register("func_math", _MATH_ORACLE, tags=("function", "math"))
def func_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load_table(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    return nat.select(
        k.alias("k"),
        F.abs(k - 12).alias("abs_c"),
        F.signum((k - 12).cast("double")).cast("double").alias("sign_c"),
        (k % 7).alias("mod_c"),
        F.floor(k / 4.0).alias("floor_c"),
        F.ceil(k / 4.0).alias("ceil_c"),
        F.round(F.sqrt(k.cast("double")), 9).alias("sqrt_c"),
        F.pow(k, 2).alias("pow_c"),
        F.round(F.exp(k / 10.0), 9).alias("exp_c"),
        F.round(F.log((k + 1).cast("double")), 9).alias("ln_c"),
        F.round(F.log10((k + 1).cast("double")), 9).alias("log10_c"),
        F.round(F.sin(k.cast("double")), 9).alias("sin_c"),
        F.round(F.cos(k.cast("double")), 9).alias("cos_c"),
        F.round(F.atan2(k.cast("double"), F.lit(7.0)), 9).alias("atan2_c"),
        F.round(F.acos(k / 30.0), 9).alias("acos_c"),
        F.round(F.asin(k / 30.0), 9).alias("asin_c"),
        F.round(F.degrees(k / 10.0), 9).alias("deg_c"),
        F.round(F.lit(3.141592653589793), 9).alias("pi_c"),
        k.cast("bigint").bitwiseAND(12).alias("band_c"),
        k.cast("bigint").bitwiseOR(5).alias("bor_c"),
        k.cast("bigint").bitwiseXOR(9).alias("bxor_c"),
    )


# --------------------------------------------------------------------------
# temporal family: EXTRACT, DATE_TRUNC, DATE_FORMAT, TIMESTAMPADD/DIFF,
# UNIX epoch conversions, TO_DATE
# --------------------------------------------------------------------------

_TEMPORAL_ORACLE = """
SELECT
  event_id,
  EXTRACT(YEAR FROM ts)                       AS y,
  EXTRACT(MONTH FROM ts)                      AS mo,
  EXTRACT(DAY FROM ts)                        AS d,
  EXTRACT(HOUR FROM ts)                       AS h,
  EXTRACT(MINUTE FROM ts)                     AS mi,
  CAST(EXTRACT(DOY FROM ts) AS BIGINT)        AS doy,
  CAST(EXTRACT(DOW FROM ts) + 1 AS BIGINT)    AS dow,
  EXTRACT(QUARTER FROM ts)                    AS q,
  DATE_TRUNC('hour', ts)                      AS ts_hour,
  DATE_TRUNC('day', ts)                       AS ts_day,
  STRFTIME(ts, '%Y-%m')                       AS ym,
  ts + INTERVAL 90 MINUTE                     AS ts_plus,
  DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since,
  EPOCH_US(ts)                                AS us,
  STRFTIME(TO_TIMESTAMP(EPOCH(ts)), '%Y-%m-%d %H:%M:%S') AS from_unix,
  CAST(CAST(ts AS DATE) AS VARCHAR)           AS dt
FROM events
WHERE event_id % 31 = 0
"""


@register("func_temporal", _TEMPORAL_ORACLE, tags=("function", "time"))
def func_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 31 == 0)
    ts = F.col("ts")
    return ev.select(
        "event_id",
        F.year(ts).cast("bigint").alias("y"),
        F.month(ts).cast("bigint").alias("mo"),
        F.dayofmonth(ts).cast("bigint").alias("d"),
        F.hour(ts).cast("bigint").alias("h"),
        F.minute(ts).cast("bigint").alias("mi"),
        F.dayofyear(ts).cast("bigint").alias("doy"),
        F.dayofweek(ts).cast("bigint").alias("dow"),
        F.quarter(ts).cast("bigint").alias("q"),
        F.date_trunc("hour", ts).alias("ts_hour"),
        F.date_trunc("day", ts).alias("ts_day"),
        F.date_format(ts, "yyyy-MM").alias("ym"),
        (ts + F.expr("INTERVAL 90 MINUTES")).alias("ts_plus"),
        F.datediff(ts.cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since"),
        F.unix_micros(ts).alias("us"),
        # FROM_UNIXTIME (BuiltInFunctionDefinitions): epoch-seconds ->
        # formatted wall-clock string in the session TZ (UTC here).
        F.from_unixtime(F.unix_seconds(ts.cast("timestamp"))).alias("from_unix"),
        ts.cast("date").cast("string").alias("dt"),
    )


# --------------------------------------------------------------------------
# conditional / comparison: CASE WHEN, IF, IFNULL, NULLIF, COALESCE,
# GREATEST, LEAST, BETWEEN, IN, IS NULL
# --------------------------------------------------------------------------

_COND_ORACLE = """
SELECT
  o_orderkey,
  CASE WHEN o_totalprice > 200000 THEN 'big'
       WHEN o_totalprice > 100000 THEN 'mid'
       ELSE 'small' END                                    AS bucket,
  IF(o_orderstatus = 'O', 'open', 'done')                  AS status_word,
  COALESCE(NULLIF(o_orderstatus, 'O'), 'open!')            AS nullif_c,
  IFNULL(NULLIF(o_orderpriority, o_orderpriority), 'same') AS ifnull_c,
  GREATEST(o_orderkey % 97, o_custkey % 89)                AS greatest_c,
  LEAST(o_orderkey % 97, o_custkey % 89)                   AS least_c,
  (o_totalprice BETWEEN 50000 AND 150000)                  AS in_band,
  (o_orderpriority IN ('1-URGENT', '2-HIGH'))              AS hot,
  (NULLIF(o_orderstatus, 'F') IS NULL)                     AS was_f
FROM orders
WHERE o_orderkey % 23 = 0
"""


@register("func_conditional", _COND_ORACLE, tags=("function", "calc"))
def func_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 23 == 0)
    tp = F.col("o_totalprice")
    return orders.select(
        "o_orderkey",
        F.when(tp > 200000, "big").when(tp > 100000, "mid").otherwise("small").alias("bucket"),
        F.when(F.col("o_orderstatus") == "O", "open").otherwise("done").alias("status_word"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open!")).alias(
            "nullif_c"
        ),
        F.ifnull(
            F.nullif(F.col("o_orderpriority"), F.col("o_orderpriority")), F.lit("same")
        ).alias("ifnull_c"),
        F.greatest(F.col("o_orderkey") % 97, F.col("o_custkey") % 89).alias("greatest_c"),
        F.least(F.col("o_orderkey") % 97, F.col("o_custkey") % 89).alias("least_c"),
        tp.between(50000, 150000).alias("in_band"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("hot"),
        F.nullif(F.col("o_orderstatus"), F.lit("F")).isNull().alias("was_f"),
    )


# --------------------------------------------------------------------------
# hash family: MD5 / SHA2-256 (engine-portable digests)
# --------------------------------------------------------------------------

_HASH_ORACLE = """
SELECT
  c_custkey,
  MD5(c_name)            AS md5_name,
  SHA256(c_mktsegment)   AS sha256_seg
FROM customer
WHERE c_custkey % 29 = 0
"""


@register("func_hash", _HASH_ORACLE, tags=("function", "hash"))
def func_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 29 == 0)
    return cust.select(
        "c_custkey",
        F.md5("c_name").alias("md5_name"),
        F.sha2("c_mktsegment", 256).alias("sha256_seg"),
    )


# --------------------------------------------------------------------------
# JSON family over events.props (JSON_VALUE / get_json_object, typed
# extraction, TO_JSON of a constructed row)
# --------------------------------------------------------------------------

_JSON_ORACLE = """
SELECT
  event_id,
  props->>'$.k'                              AS k_str,
  CAST(props->>'$.k' AS BIGINT)              AS k_int,
  (CAST(props->>'$.k' AS BIGINT) > 50)       AS k_big,
  JSON_VALID(props)                          AS is_json,
  TO_JSON({'id': event_id, 'type': event_type}) :: VARCHAR AS packed,
  TO_JSON(event_type) :: VARCHAR              AS js_str,
  TO_JSON(event_id) :: VARCHAR                AS js_num
FROM events
WHERE event_id % 37 = 0
"""


@register("func_json", _JSON_ORACLE, tags=("function", "json"))
def func_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 37 == 0)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
        (F.get_json_object("props", "$.k").cast("bigint") > 50).alias("k_big"),
        F.when(F.from_json("props", "map<string,string>").isNotNull(), F.lit(True))
        .otherwise(F.lit(False))
        .alias("is_json"),
        F.to_json(
            F.struct(F.col("event_id").alias("id"), F.col("event_type").alias("type"))
        ).alias("packed"),
        # JSON_STRING: scalar -> JSON literal (strings quoted, numbers bare)
        FF.json_string("event_type").alias("js_str"),
        FF.json_string("event_id").alias("js_num"),
    )


# --------------------------------------------------------------------------
# SQL/JSON path family: JSON_QUERY (subtree extraction re-serialized as
# minified JSON text), JSON_EXISTS, and JSON array cardinality over a
# nested document (BuiltInFunctionDefinitions JSON block; runtime
# SqlJsonUtils.java). The nested doc is built identically on both
# engines from event columns; both engines minify extracted subtrees,
# so JSON_QUERY output is hash-comparable.
# --------------------------------------------------------------------------

_JSON_QUERY_ORACLE = """
WITH j AS (
  SELECT event_id,
         '{"a": {"b": ' || CAST(user_id AS VARCHAR)
         || ', "c": [1, ' || CAST(event_id % 5 AS VARCHAR) || ']}}' AS doc
  FROM events WHERE event_id % 41 = 0
)
SELECT event_id,
       json_extract(doc, '$.a')::VARCHAR        AS q_obj,
       json_extract(doc, '$.a.c[1]')::VARCHAR   AS q_elem,
       (json_extract(doc, '$.a.b') IS NOT NULL) AS exists_b,
       (json_extract(doc, '$.a.nope') IS NOT NULL) AS exists_missing,
       CAST(json_array_length(doc, '$.a.c') AS BIGINT) AS c_len
FROM j
"""


@register("func_json_query_exists", _JSON_QUERY_ORACLE, tags=("function", "json"))
def func_json_query_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 41 == 0)
    doc = F.concat(
        F.lit('{"a": {"b": '),
        F.col("user_id").cast("string"),
        F.lit(', "c": [1, '),
        (F.col("event_id") % 5).cast("string"),
        F.lit("]}}"),
    )
    j = ev.select("event_id", doc.alias("doc"))
    return j.select(
        "event_id",
        F.get_json_object("doc", "$.a").alias("q_obj"),
        F.get_json_object("doc", "$.a.c[1]").alias("q_elem"),
        F.get_json_object("doc", "$.a.b").isNotNull().alias("exists_b"),
        F.get_json_object("doc", "$.a.nope").isNotNull().alias("exists_missing"),
        F.json_array_length(F.get_json_object("doc", "$.a.c")).cast("bigint").alias("c_len"),
    )


# --------------------------------------------------------------------------
# collection constructors & access: ARRAY, CARDINALITY, element access,
# ARRAY_CONTAINS, sort, MAP construction + key access, ROW/STRUCT field
# --------------------------------------------------------------------------

# NOTE: the array-valued columns are serialized to comma-joined strings on
# BOTH engines (Spark concat_ws vs DuckDB array_to_string) because the
# driver's canonicalizer sorts with pandas and cannot hash raw list cells
# (round-5 red cell). The collection operators themselves (ARRAY constructor,
# LIST_SORT, element access, MAP, ROW field) remain fully under test — only
# the wire format of the graded output is scalar.
_COLLECTION_ORACLE = """
SELECT
  n_nationkey,
  ARRAY_TO_STRING([n_nationkey, n_regionkey, n_nationkey + n_regionkey], ',') AS arr,
  LEN([n_nationkey, n_regionkey])                          AS card,
  [n_nationkey, n_regionkey][1]                            AS first_elem,
  LIST_CONTAINS([0, 2, 4], n_regionkey)                    AS reg_even,
  ARRAY_TO_STRING(LIST_SORT([n_regionkey, n_nationkey % 5, 3]), ',') AS sorted_arr,
  MAP(['k','r'], [n_nationkey, n_regionkey])['r'][1]       AS map_r,
  {'name': n_name, 'region': n_regionkey}.name             AS row_name
FROM nation
"""


@register("func_collections", _COLLECTION_ORACLE, tags=("function", "collection"))
def func_collections(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load_table(spark, sf_dir, "nation")
    k, r = F.col("n_nationkey"), F.col("n_regionkey")
    return nat.select(
        "n_nationkey",
        F.concat_ws(",", F.array(k, r, k + r).cast("array<string>")).alias("arr"),
        F.size(F.array(k, r)).cast("bigint").alias("card"),
        F.array(k, r).getItem(0).alias("first_elem"),
        F.array_contains(F.array(F.lit(0), F.lit(2), F.lit(4)), r).alias("reg_even"),
        F.concat_ws(
            ",", F.sort_array(F.array(r, k % 5, F.lit(3))).cast("array<string>")
        ).alias("sorted_arr"),
        F.create_map(F.lit("k"), k, F.lit("r"), r).getItem("r").alias("map_r"),
        F.struct(F.col("n_name").alias("name"), r.alias("region"))
        .getField("name")
        .alias("row_name"),
    )


# --------------------------------------------------------------------------
# UNNEST / lateral correlate (CommonExecCorrelate, UnnestRowsFunction):
# explode + posexplode of a per-row array
# --------------------------------------------------------------------------

_UNNEST_ORACLE = """
SELECT n_nationkey, i AS pos, arr[i + 1] AS elem
FROM (SELECT n_nationkey, [n_nationkey, n_regionkey, 99] AS arr FROM nation),
     generate_series(0, 2) AS g(i)
"""


@register("correlate_unnest", _UNNEST_ORACLE, tags=("correlate", "unnest"))
def correlate_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load_table(spark, sf_dir, "nation")
    arr = F.array(F.col("n_nationkey"), F.col("n_regionkey"), F.lit(99))
    return nat.select(
        "n_nationkey", F.posexplode(arr).alias("pos", "elem")
    ).select("n_nationkey", F.col("pos").cast("bigint").alias("pos"), "elem")


# --------------------------------------------------------------------------
# cast / TRY_CAST semantics (TRY_CAST returns NULL on failure)
# --------------------------------------------------------------------------

_CAST_ORACLE = """
SELECT
  c_custkey,
  CAST(c_custkey AS VARCHAR)                        AS key_str,
  CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) AS bal_str,
  TRY_CAST(c_mktsegment AS INTEGER)                 AS seg_int,
  TRY_CAST(SUBSTRING(c_name, 10) AS BIGINT)         AS name_digits,
  CAST(FLOOR(c_acctbal) AS BIGINT)                  AS bal_floor,
  CAST(c_nationkey AS DOUBLE)                       AS nk_double
FROM customer
WHERE c_custkey % 13 = 0
"""


@register("func_cast_try_cast", _CAST_ORACLE, tags=("function", "cast"))
def func_cast_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 13 == 0)
    return cust.select(
        "c_custkey",
        F.col("c_custkey").cast("string").alias("key_str"),
        F.col("c_acctbal").cast("decimal(12,2)").cast("string").alias("bal_str"),
        F.expr("TRY_CAST(c_mktsegment AS INT)").alias("seg_int"),
        F.expr("TRY_CAST(SUBSTRING(c_name, 10) AS BIGINT)").alias("name_digits"),
        F.floor("c_acctbal").cast("bigint").alias("bal_floor"),
        F.col("c_nationkey").cast("double").alias("nk_double"),
    )


# --------------------------------------------------------------------------
# INIT_CAP + hyperbolic trig + RADIANS (SURVEY 2.8 names not covered by
# func_math/func_string_basic). DuckDB lacks initcap and sinh/cosh/tanh
# natively — the oracle emulates them (per-word capitalize via list
# lambdas; hyperbolics via exp), rounded to 9 decimals like func_math.
# --------------------------------------------------------------------------

_MISC_EXTRAS_ORACLE = """
SELECT n_nationkey AS k,
       array_to_string(
         list_transform(string_split(lower(n_name), ' '),
                        w -> upper(substr(w, 1, 1)) || substr(w, 2)),
         ' ') AS name_cap,
       ROUND((exp(n_nationkey / 10.0) - exp(-n_nationkey / 10.0)) / 2, 9) AS sinh_c,
       ROUND((exp(n_nationkey / 10.0) + exp(-n_nationkey / 10.0)) / 2, 9) AS cosh_c,
       ROUND((exp(n_nationkey / 5.0) - 1) / (exp(n_nationkey / 5.0) + 1), 9) AS tanh_c,
       ROUND(radians(CAST(n_nationkey AS DOUBLE) * 10), 9) AS rad_c
FROM nation
"""


@register("func_misc_extras", _MISC_EXTRAS_ORACLE, tags=("function",))
def func_misc_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load_table(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    x = (k / 10.0).cast("double")
    return nat.select(
        k.alias("k"),
        F.initcap(F.lower(F.col("n_name"))).alias("name_cap"),
        F.round(F.sinh(x), 9).alias("sinh_c"),
        F.round(F.cosh(x), 9).alias("cosh_c"),
        F.round(F.tanh((k / 5.0).cast("double") / 2), 9).alias("tanh_c"),
        F.round(F.radians(k.cast("double") * 10), 9).alias("rad_c"),
    )


# --------------------------------------------------------------------------
# CONVERT_TZ / TO_TIMESTAMP_LTZ-adjacent timezone shifts: Spark's
# from_utc_timestamp/to_utc_timestamp vs DuckDB's AT TIME ZONE (ICU is
# bundled in the python package).
# --------------------------------------------------------------------------

_TZ_ORACLE = """
SELECT event_id,
       CAST((ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York' AS TIMESTAMP) AS ny_wall,
       CAST((ts AT TIME ZONE 'UTC') AT TIME ZONE 'Asia/Tokyo' AS TIMESTAMP) AS tokyo_wall,
       CAST(timezone('Europe/Paris', ts::TIMESTAMP) AS TIMESTAMP) AS paris_to_utc
FROM events
WHERE event_id % 31 = 0
"""


@register("func_temporal_tz", _TZ_ORACLE, tags=("function", "time"))
def func_temporal_tz(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 31 == 0)
    ts = F.col("ts")
    return ev.select(
        "event_id",
        F.from_utc_timestamp(ts, "America/New_York").alias("ny_wall"),
        F.from_utc_timestamp(ts, "Asia/Tokyo").alias("tokyo_wall"),
        F.to_utc_timestamp(ts, "Europe/Paris").alias("paris_to_utc"),
    )


# --------------------------------------------------------------------------
# Flink-spelled SQL UDF names (functions/sql_udfs.py): the SQL surface
# of the shims — SPLIT_INDEX, IS_DIGIT/ALPHA/DECIMAL, TRUNCATE,
# TO/FROM_BASE64, TO_TIMESTAMP_LTZ, IS_JSON, JSON_VALUE — executed
# through spark.sql with the registered names. HASH_CODE/RAND_INTEGER
# are registered but engine-private (murmur3 / RNG), so not oracle-gated.
# --------------------------------------------------------------------------

_SQL_UDF_ORACLE = """
SELECT event_id,
       string_split(event_type, 'r')[1]                      AS et_head,
       regexp_full_match(CAST(event_id AS VARCHAR), '[0-9]+') AS id_digits,
       regexp_full_match(event_type, '[a-zA-Z]+')            AS et_alpha,
       TRY_CAST(CAST(value AS VARCHAR) AS DOUBLE) IS NOT NULL AS val_dec,
       sign(value) * floor(abs(value) * power(10, 1)) / power(10, 1) AS val_trunc1,
       base64(encode(event_type))                            AS et_b64,
       decode(from_base64(base64(encode(event_type))))       AS et_roundtrip,
       json_valid(props)                                     AS props_is_json,
       json_extract_string(props, '$.k')                     AS props_k
FROM events
WHERE event_id % 13 = 0
"""


@register("func_sql_udf_names", _SQL_UDF_ORACLE, tags=("function", "api", "sql"))
def func_sql_udf_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_release_1_16_0_spark.catalog import register_tables
    from flink_release_1_16_0_spark.functions.sql_udfs import register_sql_functions

    register_tables(spark, sf_dir, ("events",))
    register_sql_functions(spark)
    return spark.sql(
        """
        SELECT event_id,
               SPLIT_INDEX(event_type, 'r', 0)          AS et_head,
               IS_DIGIT(CAST(event_id AS STRING))       AS id_digits,
               IS_ALPHA(event_type)                     AS et_alpha,
               IS_DECIMAL(CAST(value AS STRING))        AS val_dec,
               TRUNCATE(value, 1)                       AS val_trunc1,
               TO_BASE64(CAST(event_type AS BINARY))    AS et_b64,
               CAST(FROM_BASE64(TO_BASE64(CAST(event_type AS BINARY))) AS STRING) AS et_roundtrip,
               IS_JSON(props)                           AS props_is_json,
               JSON_VALUE(props, '$.k')                 AS props_k
        FROM events
        WHERE event_id % 13 = 0
        """
    )


# --------------------------------------------------------------------------
# PARSE_URL family + HEX encoding (the last two section-2.8 names
# without an oracle row). URLs are synthesized deterministically from
# order columns; the DuckDB twin extracts the same parts with anchored
# regexes (DuckDB has no parse_url builtin).
# --------------------------------------------------------------------------

_URL_HEX_ORACLE = """
WITH u AS (
  SELECT o_orderkey,
         'https://shop' || CAST(o_custkey % 10 AS VARCHAR)
           || '.example.com/order/' || CAST(o_orderkey AS VARCHAR)
           || '?prio=' || replace(o_orderpriority, ' ', '_') AS url
  FROM orders WHERE o_orderkey % 11 = 0
)
SELECT o_orderkey,
       regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)        AS url_host,
       regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS url_path,
       regexp_extract(url, '\\?([^#]*)', 1)                 AS url_query,
       regexp_extract(url, '[?&]prio=([^&#]*)', 1)          AS url_prio,
       hex(o_orderkey)                                      AS key_hex
FROM u
"""


@register("func_url_hex", _URL_HEX_ORACLE, tags=("function", "string"))
def func_url_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 11 == 0
    )
    url = F.concat(
        F.lit("https://shop"),
        (F.col("o_custkey") % 10).cast("string"),
        F.lit(".example.com/order/"),
        F.col("o_orderkey").cast("string"),
        F.lit("?prio="),
        F.replace(F.col("o_orderpriority"), F.lit(" "), F.lit("_")),
    )
    u = orders.select("o_orderkey", url.alias("url"))
    return u.select(
        "o_orderkey",
        FF.parse_url("url", "HOST").alias("url_host"),
        FF.parse_url("url", "PATH").alias("url_path"),
        FF.parse_url("url", "QUERY").alias("url_query"),
        FF.parse_url("url", "QUERY", "prio").alias("url_prio"),
        F.hex("o_orderkey").alias("key_hex"),
    )


# --------------------------------------------------------------------------
# UNNEST of a MAP (UnnestRowsFunction.java:41 handles arrays, maps and
# multisets; the array path is correlate_unnest): each map entry
# becomes a (key, value) row.
# --------------------------------------------------------------------------

_UNNEST_MAP_ORACLE = """
SELECT n_name, e.key AS attr, e.value AS val
FROM (
  SELECT n_name,
         unnest(map_entries(MAP(['nation_key', 'region_key'],
                                [n_nationkey, n_regionkey]))) AS e
  FROM nation
)
"""


@register("correlate_unnest_map", _UNNEST_MAP_ORACLE, tags=("correlate", "unnest"))
def correlate_unnest_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("nation_key"),
        F.col("n_nationkey"),
        F.lit("region_key"),
        F.col("n_regionkey"),
    )
    return nation.select("n_name", F.explode(m).alias("attr", "val"))


# --------------------------------------------------------------------------
# UNNEST of a MULTISET (the third UnnestRowsFunction input kind):
# COLLECT builds the element->count multiset encoding, UNNEST emits
# each element count times — so collect-then-unnest is the identity on
# the grouped rows, which is exactly what the oracle states.
# --------------------------------------------------------------------------

_UNNEST_MULTISET_ORACLE = """
SELECT c_nationkey, c_mktsegment AS segment FROM customer
"""


@register(
    "correlate_unnest_multiset", _UNNEST_MULTISET_ORACLE, tags=("correlate", "unnest")
)
def correlate_unnest_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_release_1_16_0_spark.functions import multiset_from_array

    cust = load_table(spark, sf_dir, "customer")
    ms = cust.groupBy("c_nationkey").agg(
        multiset_from_array(F.collect_list("c_mktsegment")).alias("ms")
    )
    entries = ms.select("c_nationkey", F.explode("ms").alias("segment", "cnt"))
    return entries.select(
        "c_nationkey",
        "segment",
        F.explode(F.sequence(F.lit(1), F.col("cnt"))).alias("__i"),
    ).drop("__i")
