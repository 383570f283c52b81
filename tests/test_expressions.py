"""Expression DSL tests (PyFlink col/lit/call parity) — the DSL and the
SQL-fragment strings must lower to identical results."""

from __future__ import annotations

from flink_release_1_16_0_spark.expressions import call, col, lit
from flink_release_1_16_0_spark.table_env import TableEnvironment


def _orders(spark, sf):
    tenv = TableEnvironment.create(spark)
    return tenv.from_data_frame(spark.read.parquet(f"{sf}/orders.parquet")), tenv


def test_where_select_dsl_equals_fragment(spark, sf_smoke):
    t, _ = _orders(spark, sf_smoke)
    dsl = (
        t.where((col("o_totalprice") > 1000) & (col("o_orderpriority") != "1-URGENT"))
        .select(col("o_orderkey"), (col("o_totalprice") * 2).alias("dbl"))
        .to_data_frame()
    )
    frag = (
        t.where("(o_totalprice > 1000) AND (o_orderpriority <> '1-URGENT')")
        .select("o_orderkey, (o_totalprice * 2) AS dbl")
        .to_data_frame()
    )
    assert dsl.exceptAll(frag).count() == 0 and frag.exceptAll(dsl).count() == 0


def test_group_by_agg_dsl(spark, sf_smoke):
    t, _ = _orders(spark, sf_smoke)
    out = (
        t.group_by(col("o_orderpriority"))
        .select(
            col("o_orderpriority"),
            col("o_totalprice").sum().alias("total"),
            col("o_orderkey").count().alias("n"),
        )
        .to_data_frame()
    )
    rows = out.collect()
    assert len(rows) == 5 and all(r.n > 0 for r in rows)


def test_misc_expression_surface(spark, sf_smoke):
    t, _ = _orders(spark, sf_smoke)
    out = (
        t.where(col("o_orderstatus").in_("O", "F"))
        .where(col("o_totalprice").between(0, 10**9))
        .where(col("o_orderpriority").is_not_null())
        .where(~(col("o_orderkey") < lit(0)))
        .select(
            call("upper", col("o_orderstatus")).alias("st"),
            col("o_orderdate").cast("DATE").alias("d"),
        )
        .to_data_frame()
    )
    assert out.count() > 0 and set(out.columns) == {"st", "d"}
