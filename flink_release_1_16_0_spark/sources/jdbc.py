"""JDBC source / sink / lookup backing (SURVEY.md section 2.1).

Reference: flink-connector-jdbc's JdbcDynamicTableFactory (DDL options),
JdbcRowDataInputFormat (parallel bounded scans via numeric range
splits) and JdbcRowDataLookupFunction.java:54 (point lookups). Spark
equivalent: the built-in JDBC DataSource — predicate/projection
pushdown is native, and the same partitionColumn/lowerBound/upperBound/
numPartitions contract drives the parallel scan, so the Flink
`scan.partition.*` options translate 1:1.

Scale notes: a JDBC scan parallelizes only when a partition column is
declared — otherwise a single executor pulls the whole table (exactly
the reference's behavior with no partitioning). Lookup joins against a
JDBC dimension table snapshot the dim via one scan and broadcast it
(operators/lookup.py) instead of per-row point queries: at 1000
executors, N×RPC round trips lose to one bounded scan + broadcast for
any dimension that fits the broadcast threshold.

The test/dev database is embedded Derby (shipped with Spark — no
external service in this container); the code paths are generic JDBC
and take any url/driver at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Embedded Derby registers itself via this driver class (derbytools jar,
# Derby >= 10.15 module layout).
_DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def _infer_driver(url: str) -> str | None:
    return _DERBY_DRIVER if url.startswith("jdbc:derby:") else None


def jdbc_source(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """Bounded JDBC scan (JdbcRowDataInputFormat equivalent).

    ``partition_column`` (+ bounds + ``num_partitions``) enables the
    range-split parallel read; without it the scan is a single task,
    matching the reference's unpartitioned JdbcInputFormat.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    driver = driver or _infer_driver(url)
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        if num_partitions is None or lower_bound is None or upper_bound is None:
            raise ValueError(
                "partitioned JDBC scan needs partition_column, num_partitions, "
                "lower_bound and upper_bound together"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader.options(**options).load()


def jdbc_write(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    driver: str | None = None,
    **options: str,
) -> None:
    """JDBC sink (JdbcDynamicTableSink equivalent). ``mode='overwrite'``
    recreates the table — the batch INSERT OVERWRITE shape."""
    writer = (
        df.write.format("jdbc").option("url", url).option("dbtable", table).mode(mode)
    )
    driver = driver or _infer_driver(url)
    if driver:
        writer = writer.option("driver", driver)
    writer.options(**options).save()
