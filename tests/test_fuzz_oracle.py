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


def _is_known_empty_grouping_divergence(sql, spark_pdf, oracle_pdf):
    """The fuzzer-found documented substrate divergence: Spark expands
    grouping sets over input ROWS, so an empty input yields zero rows
    where the standard (DuckDB/PostgreSQL/Calcite) emits the () grouping
    set's grand-total row. Pinned below; documented in COVERAGE.md."""
    if not ("ROLLUP(" in sql or "CUBE(" in sql or "GROUPING SETS" in sql):
        return False
    return len(spark_pdf) == 0 and len(oracle_pdf) == 1 and all(
        (oracle_pdf[c].isna().all() or (oracle_pdf[c] == 0).all())
        for c in oracle_pdf.columns
    )


@pytest.mark.parametrize("seed", range(25))
def test_fuzz_seed_matches_oracle(engines, seed):
    spark, con = engines
    sql = gen_query(seed)
    spark_pdf = spark.sql(sql).toPandas()
    oracle_pdf = con.execute(sql).fetchdf()
    status, detail = compare(spark_pdf, oracle_pdf)
    if status != "OK" and _is_known_empty_grouping_divergence(
        sql, spark_pdf, oracle_pdf
    ):
        return  # documented divergence, pinned explicitly below
    assert status == "OK", f"seed {seed}: {status} {detail}\n{sql}"


def test_empty_input_grouping_sets_divergence_pinned(engines):
    """Pin the documented divergence so a substrate change surfaces: on
    EMPTY input, GROUP BY ROLLUP returns 0 rows on Spark and the
    grand-total row (NULL groups, COUNT 0) on DuckDB — the standard's
    reading. If this test ever fails, Spark changed behavior: delete
    the known-divergence allowance in tools/fuzz_oracle.py and here."""
    spark, con = engines
    sql = (
        "SELECT o_custkey % 2 AS g, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM orders WHERE o_custkey < 0 GROUP BY ROLLUP(o_custkey % 2)"
    )
    assert len(spark.sql(sql).collect()) == 0
    duck = con.execute(sql).fetchall()
    assert duck == [(None, 0)]
