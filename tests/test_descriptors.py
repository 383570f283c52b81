"""TableDescriptor / Schema builder API tests (TableDescriptor.java:63,
Schema.java:95) — the programmatic twin of CREATE TABLE DDL."""

from __future__ import annotations

from flink_release_1_16_0_spark.descriptors import Schema, TableDescriptor
from flink_release_1_16_0_spark.table_env import TableEnvironment


def test_descriptor_create_and_query(spark, tmp_path, sf_smoke):
    tenv = TableEnvironment.create(spark)
    desc = (
        TableDescriptor.for_connector("filesystem")
        .schema(
            Schema.new_builder()
            .column("o_orderkey", "BIGINT")
            .column("o_custkey", "BIGINT")
            .column("o_orderstatus", "STRING")
            .column("o_totalprice", "DOUBLE")
            .column("o_orderdate", "TIMESTAMP(3)")
            .column("o_orderpriority", "STRING")
            .column("o_clerk", "STRING")
            .column("o_shippriority", "INT")
            .column("o_comment", "STRING")
            .column_by_expression("price_band", "CAST(o_totalprice / 1000 AS INT)")
            .primary_key("o_orderkey")
            .build()
        )
        .option("path", f"{sf_smoke}/orders.parquet")
        .format("parquet")
        .comment("orders via descriptor")
        .build()
    )
    tenv.create_table("desc_orders", desc)
    df = tenv.execute_sql(
        "SELECT COUNT(*) AS n, MAX(price_band) AS b FROM desc_orders"
    ).to_data_frame()
    row = df.collect()[0]
    assert row.n > 0 and row.b >= 0


def test_descriptor_watermark_and_anonymous(spark, sf_smoke):
    tenv = TableEnvironment.create(spark)
    desc = (
        TableDescriptor.for_connector("filesystem")
        .schema(
            Schema.new_builder()
            .column("event_id", "BIGINT")
            .column("ts", "TIMESTAMP(3)")
            .column("user_id", "BIGINT")
            .column("event_type", "STRING")
            .column("value", "DOUBLE")
            .column("props", "STRING")
            .watermark("ts", "ts - INTERVAL '10' MINUTE")
            .build()
        )
        .option("path", f"{sf_smoke}/events.parquet")
        .format("parquet")
        .build()
    )
    t = tenv.from_descriptor(desc)
    assert t.to_data_frame().count() > 0


def test_descriptor_partitioned_write(spark, tmp_path):
    tenv = TableEnvironment.create(spark)
    desc = (
        TableDescriptor.for_connector("filesystem")
        .schema(
            Schema.new_builder().column("x", "INT").column("tag", "STRING").build()
        )
        .option("path", str(tmp_path / "part_sink"))
        .format("parquet")
        .partitioned_by("tag")
        .build()
    )
    tenv.create_table("desc_sink", desc)
    tenv.execute_sql("INSERT INTO desc_sink VALUES (1, 'a'), (2, 'b')")
    import os

    dirs = {d for d in os.listdir(tmp_path / "part_sink") if d.startswith("tag=")}
    assert dirs == {"tag=a", "tag=b"}
