"""SparkSession factory.

Mirrors the role of the reference's ``TableEnvironmentImpl.create``
(flink-table-api-java/.../internal/TableEnvironmentImpl.java:498) as the
single entry point that wires configuration; here it is just a tuned
SparkSession: AQE on (runtime re-plan ~= Flink's adaptive batch
scheduler), UTC session timezone (oracle comparability), Arrow on
(pandas-UDF fast path), shuffle partitions sized for the harness.

At cluster scale the same settings hold: AQE coalesces the 32-partition
default up/down, and ``spark.sql.shuffle.partitions`` becomes a cluster
level knob the caller overrides via ``extra_conf``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "flink_release_1_16_0_spark",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        # the correctness harness materializes streaming changelogs
        # through the MEMORY sink (driver-side by construction); sf3
        # density replays exceed the 1g default. Production paths
        # write to real sinks and never collect to the driver.
        .config(
            "spark.driver.maxResultSize",
            os.environ.get("SPARK_GRAFT_MAX_RESULT", "4g"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # events.parquet stores TIMESTAMP(NANOS); read as long and convert
        # in catalog.load_table (data has no sub-microsecond components).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
