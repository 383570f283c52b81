"""CI slice of the property-based cross-engine fuzzer.

``tools/fuzz_oracle.py`` generates deterministic random query
compositions (joins/filters/aggregates/set-ops/windows under the
repo's cross-engine determinism rules) and diffs Spark against DuckDB
with the driver-grade canonicalizer. The full 1000-seed corpus runs
out-of-band per round; this test pins a fixed slice so the generator,
the comparator plumbing, and a representative sample of shapes stay
green in every pytest run — a divergence here is a real engine
disagreement, not flake (the reference has no generative corpus at
all, SURVEY §5.5)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from check_oracle import compare  # noqa: E402
from fuzz_oracle import gen_query  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def engines(spark):
    from flink_release_1_16_0_spark import register_tables
    from flink_release_1_16_0_spark.catalog import TABLES

    register_tables(spark, SF)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return spark, con


def test_generator_is_deterministic():
    assert gen_query(7) == gen_query(7)
    # different seeds produce different shapes somewhere in a small range
    assert len({gen_query(s) for s in range(10)}) > 5


@pytest.mark.parametrize("seed", range(25))
def test_fuzz_seed_matches_oracle(engines, seed):
    spark, con = engines
    sql = gen_query(seed)
    spark_pdf = spark.sql(sql).toPandas()
    oracle_pdf = con.execute(sql).fetchdf()
    status, detail = compare(spark_pdf, oracle_pdf)
    assert status == "OK", f"seed {seed}: {status} {detail}\n{sql}"
