"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship TPC-H-Q1-shape query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator-coverage
registry from ``flink_release_1_16_0_spark.queries`` (one entry per
implemented operator from SURVEY.md section 2; DuckDB oracle attached
wherever the semantics are ANSI-SQL-expressible).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from flink_release_1_16_0_spark.queries import load_registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_registry()
    return registry["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return {name: spec.fn for name, spec in load_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted -> rows-only)."""
    return {
        name: spec.oracle
        for name, spec in load_registry().items()
        if spec.oracle is not None
    }
