"""Catalog: the driver's star schema as named tables.

Equivalent in role to the reference's catalog resolution
(``CatalogManager`` via TableEnvironmentImpl.java:498-504): table name ->
relation. Here a table is a parquet file under the scale-factor dir
(TESTDATA.md); registration is a temp view so both the DataFrame API and
``spark.sql`` can address it. Parquet scans go through Spark's
vectorized DSv2 reader with filter/column pushdown (the reference's
``Supports{Filter,Projection}PushDown`` abilities are native here).
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to the session TimestampType (TIMESTAMP_LTZ).

    The events fixture stores ts as parquet INT64 TIMESTAMP(NANOS); what
    Spark hands back depends on reader conf and version:

    - ``bigint`` (nanosAsLong): convert via integer division (lossless —
      the driver data carries no sub-microsecond precision).
    - ``timestamp_ntz``: cast to TIMESTAMP. The session time zone is UTC
      in this harness, so the cast is a lossless re-tag; downstream
      ``unix_micros()`` and ``withWatermark`` both reject NTZ, so the
      cast is required for event-time semantics to work at all.
    - ``timestamp``: already the session type, no-op.

    Mirrors the reference's single TIMESTAMP(p) event-time type
    (LogicalTypeRoot.java:108).
    """
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif dt == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# Session-scoped caches. Resolving a parquet relation costs a footer
# read (~80 ms driver-side per table) and a temp-view registration
# another ~50 ms of py4j/analysis — per-query costs that a real
# catalog pays once per session. Keyed weakly on the SparkSession so a
# stopped session's entries are collectable; values key on sf_dir so a
# session that switches scale factors re-resolves.
_DF_CACHE: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()
_VIEW_CACHE: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table as a DataFrame (cached per session).

    Parquet TIMESTAMP(NANOS) columns (events.ts) are normalized to the
    session TimestampType regardless of how the reader surfaces them
    (bigint / timestamp_ntz / timestamp) — see normalize_event_ts.
    """
    cache = _DF_CACHE.setdefault(spark, {})
    key = (sf_dir, name)
    if key in cache:
        return cache[key]
    if name == "events":
        # events.parquet stores ts as INT64 TIMESTAMP(NANOS), which Spark's
        # vectorized reader rejects unless nanosAsLong is on. It is a runtime
        # SQL conf, so set it defensively here: callers (the external
        # correctness driver in particular) build their own SparkSession and
        # do not know about this quirk.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    cache[key] = df
    return df


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> None:
    """Register the star schema as temp views for ``spark.sql``.

    Idempotent and cached: a name already registered from the same
    sf_dir on this session is skipped (the views only ever point at the
    immutable fixture relations, so re-pointing them is a no-op). A
    different sf_dir re-registers.
    """
    registered = _VIEW_CACHE.setdefault(spark, {})
    for name in tables:
        if registered.get(name) == sf_dir:
            continue
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
        registered[name] = sf_dir
