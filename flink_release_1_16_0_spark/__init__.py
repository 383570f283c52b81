"""PySpark-native analytics engine with Flink-1.16 Table/SQL capabilities.

A brand-new engine (NOT a port) re-expressing the query and
data-processing surface of the reference (`/root/reference`,
lukoou3/flink-release-1.16.0) on idiomatic PySpark:

- batch relational algebra -> DataFrame/SQL (Catalyst plans, AQE)
- streaming -> Structured Streaming (watermarks, stateful pandas ops)
- changelog (+I/-U/+U/-D per reference RowKind.java:31-52) -> a
  `__rowkind` metadata column + python-side changelog algebra
- the scalar/aggregate function library -> thin shims over
  `pyspark.sql.functions`

Subpackages:
- ``table_env`` TableEnvironment facade: executeSql DDL/DML/query + the
                fluent Table API (the reference's primary entry points)
- ``session``   SparkSession factory tuned for the driver harness
- ``catalog``   parquet star-schema registration (TESTDATA.md tables)
- ``queries``   the operator-coverage query registry (SURVEY.md section 2)
- ``functions`` Flink-named scalar/aggregate function shims
- ``operators`` batch operators Spark lacks natively (as-of join, topn,
                dedup family, similarity search, text analysis)
- ``streaming`` watermark/window/stateful streaming layer
"""

from flink_release_1_16_0_spark.session import get_spark
from flink_release_1_16_0_spark.catalog import load_table, register_tables
from flink_release_1_16_0_spark.table_env import Table, TableEnvironment

__all__ = ["get_spark", "load_table", "register_tables", "Table", "TableEnvironment"]

__version__ = "0.1.0"
