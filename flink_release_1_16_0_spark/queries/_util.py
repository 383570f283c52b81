"""Shared helpers for oracle-comparable queries.

The driver hashes values after sorting columns by name, so the one
fragile axis is floating-point nondeterminism: a parallel SUM(double)
depends on reduction order, and double->decimal rounding at an arbitrary
scale differs between engines (Spark rounds the shortest decimal string,
DuckDB rounds the binary value) when a value lands on a .5 boundary.

The driver data's numeric columns sit exactly on a 2-decimal grid
(events.value: 4), so any product of k such columns sits on a
(2k)-decimal grid. Casting at the expression's NATURAL grid scale makes
the decimal conversion unambiguous (double noise ~1e-11 abs never
reaches the half-ulp boundary of the grid), and decimal SUM is exact and
commutative — the final cast back to DOUBLE is then bit-identical across
engines and partitionings. This mirrors the reference engine's exact
DECIMAL accumulation (Flink DecimalData, SURVEY.md section 1.2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dec(scale: int) -> str:
    return f"DECIMAL(38,{scale})"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, scale: int = 2, out_scale: int = 2) -> Column:
    """Order-independent SUM over a double column, returned as double.

    ``scale`` must be the decimal grid the expression's true values live
    on (2 for raw money columns, 2k for a product of k of them).

    The exact decimal sum is rounded to the CENTS grid before the final
    double cast: once a sum's grid-integer exceeds 2^53 (a scale-6 sum
    over millions of rows — first observed in the sf1 scaling study),
    the decimal→double conversions of the two engines can differ by one
    ulp (Spark rounds the exact BigDecimal, DuckDB divides the int128
    mantissa by 10^scale in floats). A cents-rounded sum stays exactly
    double-representable up to ~9e13 monetary units, and rounding half
    away from zero matches between the engines — this is also exactly
    the 0.01 tolerance TPC-H's own answer comparator grants.

    ``out_scale`` overrides the cents grid for NON-monetary expressions
    (ratio averages pass out_scale=scale to keep their full precision);
    the caller then owns the guarantee that max|sum| * 10^out_scale
    stays below 2^53."""
    return F.sum(_c(col).cast(_dec(scale))).cast(_dec(out_scale)).cast("double")


def davg(col: Column | str, scale: int = 2, out_scale: int = 2) -> Column:
    """Order-independent AVG: exact decimal sum (cents-rounded, see
    :func:`dsum` — an unrounded >2^53 sum would smuggle its 1-ulp
    divergence into the quotient) / count, as double."""
    c = _c(col)
    return (
        F.sum(c.cast(_dec(scale))).cast(_dec(out_scale)).cast("double") / F.count(c)
    ).cast("double")


def sql_dsum(expr: str, scale: int = 2, out_scale: int = 2) -> str:
    """DuckDB-side twin of :func:`dsum`. NOTE: the cents rescale must be
    ROUND(), not a decimal CAST — DuckDB's decimal downscale TRUNCATES
    while Spark's rounds HALF_UP; ROUND(decimal, 2) rounds half away
    from zero, matching Spark's cast."""
    return f"CAST(ROUND(SUM(CAST(({expr}) AS {_dec(scale)})), {out_scale}) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2, out_scale: int = 2) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return (
        f"CAST(CAST(ROUND(SUM(CAST(({expr}) AS {_dec(scale)})), {out_scale}) AS DOUBLE)"
        f" / COUNT({expr}) AS DOUBLE)"
    )


def _size_threshold(spark) -> int:
    """The session's autoBroadcastJoinThreshold in bytes (-1 = off)."""
    raw = str(spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "67108864"))
    units = {"k": 1024, "m": 1024**2, "g": 1024**3}
    s = raw.strip().lower().removesuffix("b")
    if s and s[-1] in units:
        return int(float(s[:-1]) * units[s[-1]])
    return int(s)


def broadcast_if_small(df, *inputs, threshold: int | None = None):
    """Broadcast hint gated on the *input* relations' size estimates.

    An unconditional ``F.broadcast`` removes the planner's ability to
    fall back to a shuffle join — Spark hard-fails broadcasts >8 GB and
    can OOM the driver well before that — so the hint must disappear on
    inputs that grow with the corpus. The gate sums the optimizer size
    estimates of ``inputs`` (for a bare parquet relation this is the
    file size; pass the join's base tables, whose cached DataFrame
    objects memoize the stat) rather than of ``df`` itself: without
    column statistics Spark estimates a join product as near the
    CARTESIAN size (measured 860 GB for a 3 MB customer x orders at
    sf0.1 — the same estimate artifact that made the planner broadcast
    the fact side in the first place), while an FK join's true output
    is bounded by its fact-side input. Threshold defaults to the
    session's autoBroadcastJoinThreshold: under it the hint pins the
    known-good build side; over it (the 100 TB case) the planner keeps
    every fallback, including AQE's runtime join demotion.
    """
    if threshold is None:
        threshold = _size_threshold(df.sparkSession)
    if threshold < 0:
        return df
    total = 0
    for p in inputs or (df,):
        total += int(p._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    return F.broadcast(df) if total <= threshold else df


def spread_scan(df, key: str | None = None):
    """Single-split-file parallelization idiom.

    A one-row-group parquet file (the driver fixtures) hands the whole
    scan — and any partial aggregation Catalyst fuses into it — to a
    single task. When the scan has fewer partitions than the session's
    parallelism, one cheap exchange of raw rows buys full-width partial
    aggregation (measured 1.5x on the 8-accumulator q1 at sf0.1). On a
    many-split corpus (the 100 TB case) the condition is false and this
    is a no-op — no extra shuffle. Decimal-grid aggregation keeps
    results identical under any partitioning (module docstring), so the
    oracle is unaffected.

    ``key`` selects HASH partitioning on that (high-cardinality) column
    instead of round-robin. Round-robin pays a full local sort of the
    input inside the (single) map task first — Spark's
    ``sortBeforeRepartition`` retry-determinism guard — which is the
    dominant serial cost of the exchange; hashing a data column is
    deterministic under retry by construction, needs no sort, and
    measured 0.97 s -> 0.57 s on q1 at sf0.1 (round-13 optimization
    round). Prefer a key that is already in the query's projection so
    the exchange carries no extra column.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par, F.col(key)) if key else df.repartition(par)
    return df
