"""Cross-engine-exact HyperLogLog distinct-count sketch.

The reference implements batch APPROX_COUNT_DISTINCT with a dense
HyperLogLog++ sketch (BatchApproxCountDistinctAggFunctions.java:55,
hyperloglog/HyperLogLogPlusPlus.java, hashing via XXH64.java). Spark's
native ``approx_count_distinct`` is the same HLL++ family, but its
sketch (relativeSD parameterization, xxhash64 seed) is not reproducible
in DuckDB, so a native call can only ever get a rows-only correctness
check. This module implements the *same algorithm shape* — per-bucket
max leading-zero registers + harmonic-mean estimator with the standard
small-range linear-counting correction — out of primitives BOTH engines
evaluate bit-identically:

- hash: ``md5(cast(value as string))`` (lowercase hex in both engines);
  bucket = first 2 hex chars (m=256), register input = next 16 hex
  chars (a 64-bit word);
- rho (leading-zero rank) computed by *string* inspection of the hex
  word (leading '0' chars * 4 + a CASE over the first non-zero digit),
  avoiding any engine-specific bit intrinsics;
- the harmonic sum is kept in exact BIGINT arithmetic
  (``sum(1 << (48 - register))`` — registers are capped at 40 so every
  term and the 256-term sum fit comfortably), because a floating-point
  sum of powers of two spanning >52 bits of exponent would be
  rounding-order-dependent and break the hash gate;
- the only floating-point steps are one division by the exact sum and
  (in the small-range branch) one ``ln``; the final estimate is rounded
  to BIGINT, absorbing any sub-ulp cross-engine drift.

Accuracy is the textbook ~1.04/sqrt(256) ≈ 6.5% relative error —
the same regime the reference's default relativeSD=0.01..0.05 targets
(pytest pins <7% on the fixtures). Divergence from the reference: md5
instead of XXH64 (cross-engine determinism requirement) and no HLL++
bias-correction table lookup; both documented here deliberately.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M = 256  # buckets (first two hex chars of the md5)
RHO_CAP = 40  # register cap: keeps 1 << (48 - rho) exact in BIGINT
_ALPHA = 0.7213 / (1 + 1.079 / M)  # standard HLL alpha_m for m >= 128
# Single precomputed numerator so both engines do exactly ONE fp divide:
# alpha * m^2 * 2^48 (the 2^48 undoes the integer-scaled harmonic sum).
NUMERATOR = _ALPHA * (M * M) * float(1 << 48)
SMALL_RANGE = 2.5 * M

# CASE over the first non-zero hex digit -> extra leading zero *bits*.
_LZ_CASE = (
    "CASE WHEN {c} = '1' THEN 3 "
    "WHEN {c} IN ('2','3') THEN 2 "
    "WHEN {c} IN ('4','5','6','7') THEN 1 "
    "ELSE 0 END"
)


def _rho_exprs(hash_col: str) -> tuple[str, str]:
    """(bucket, rho) SQL fragments over a 32-hex-char md5 column.

    Shared template: the Spark and DuckDB texts are identical except
    for the leading-zero trim spelling, which each dialect handles
    below.
    """
    bucket = f"substring({hash_col}, 1, 2)"
    word = f"substring({hash_col}, 3, 16)"
    return bucket, word


def _rho_from_word(word: str, trimmed: str) -> str:
    """rho = 4 * (leading zero hex chars) + (zero bits of first digit) + 1,
    capped at RHO_CAP; an all-zero word maps to the cap."""
    first = f"substring({trimmed}, 1, 1)"
    lz = _LZ_CASE.format(c=first)
    return (
        f"CASE WHEN {trimmed} = '' THEN {RHO_CAP} "
        f"ELSE LEAST(4 * (16 - length({trimmed})) + {lz} + 1, {RHO_CAP}) END"
    )


def hll_count_distinct(
    df: DataFrame, group_cols: Sequence[str], value_col: str, alias: str
) -> DataFrame:
    """Grouped approximate COUNT(DISTINCT value_col) via the sketch.

    Physical shape (the 100 TB path): one map-side projection computes
    (bucket, rho) per row, then a two-phase partial/final
    ``groupBy(group, bucket).max(rho)`` — the shuffle carries at most
    |groups| * 256 register rows regardless of input size, exactly the
    reference's sketch-merge profile (HyperLogLogPlusPlus.merge).
    """
    h = F.md5(F.col(value_col).cast("string").cast("binary"))
    bucket_sql, word_sql = _rho_exprs("__h")
    trimmed = "trim(LEADING '0' FROM __w)"
    rho_sql = _rho_from_word(word_sql, trimmed)

    rows = df.select(*group_cols, h.alias("__h")).select(
        *group_cols,
        F.expr(bucket_sql).alias("__bucket"),
        F.expr(word_sql).alias("__w"),
    )
    regs = (
        rows.select(*group_cols, "__bucket", F.expr(rho_sql).alias("__rho"))
        .groupBy(*group_cols, "__bucket")
        .agg(F.max("__rho").alias("__m"))
    )
    est = (
        regs.groupBy(*group_cols)
        .agg(
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 48 - __m)")).alias("__s"),
            F.count(F.lit(1)).alias("__b"),
        )
        .withColumn("__z0", F.lit(M) - F.col("__b"))
        .withColumn(
            "__s_total",
            F.col("__s") + F.col("__z0") * F.lit(1 << 48).cast("long"),
        )
        .withColumn(
            "__raw", F.lit(NUMERATOR) / F.col("__s_total").cast("double")
        )
        .withColumn(
            alias,
            F.round(
                F.when(
                    (F.col("__raw") <= F.lit(SMALL_RANGE)) & (F.col("__z0") > 0),
                    F.lit(float(M)) * F.log(F.lit(float(M)) / F.col("__z0").cast("double")),
                ).otherwise(F.col("__raw"))
            ).cast("long"),
        )
    )
    return est.select(*group_cols, alias)


def hll_oracle_sql(
    table: str, group_cols: Sequence[str], value_col: str, alias: str
) -> str:
    """DuckDB SQL computing the identical sketch (same constants, same
    integer-exact harmonic sum, same rounding) for the hash gate."""
    groups = ", ".join(group_cols)
    bucket_sql, word_sql = _rho_exprs("__h")
    trimmed = "ltrim(__w, '0')"
    rho_sql = _rho_from_word(word_sql, trimmed)
    return f"""
WITH hashed AS (
  SELECT {groups}, md5(CAST({value_col} AS VARCHAR)) AS __h FROM {table}
), words AS (
  SELECT {groups}, {bucket_sql} AS __bucket, {word_sql} AS __w FROM hashed
), regs AS (
  SELECT {groups}, __bucket, MAX({rho_sql}) AS __m
  FROM words GROUP BY {groups}, __bucket
), sums AS (
  SELECT {groups},
         SUM(CAST(1 AS BIGINT) << (48 - __m)) AS __s,
         COUNT(*) AS __b
  FROM regs GROUP BY {groups}
), est AS (
  SELECT {groups},
         {M} - __b AS __z0,
         CAST({NUMERATOR!r} AS DOUBLE)
           / CAST(__s + ({M} - __b) * (CAST(1 AS BIGINT) << 48) AS DOUBLE) AS __raw
  FROM sums
)
SELECT {groups},
       CAST(ROUND(CASE WHEN __raw <= {SMALL_RANGE!r} AND __z0 > 0
                       THEN {float(M)!r} * ln({float(M)!r} / CAST(__z0 AS DOUBLE))
                       ELSE __raw END) AS BIGINT) AS {alias}
FROM est
"""
