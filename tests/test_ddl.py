"""Tests for ClickHouse DDL generation (sinks/ddl.py) over the real fixture
schemas — the setup step the reference leaves to the user (SURVEY.md §1.2).
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    ArrayType,
    DecimalType,
    FloatType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.sinks.ddl import (
    cdc_ddl,
    clickhouse_ddl,
    clickhouse_type,
    snapshot_ddl,
)

SF = "/root/testdata/sf0.001"


def test_scalar_type_mapping():
    assert clickhouse_type(LongType(), False) == "Int64"
    assert clickhouse_type(LongType(), True) == "Nullable(Int64)"
    assert clickhouse_type(DecimalType(18, 2), True) == "Nullable(Decimal(18, 2))"
    assert clickhouse_type(TimestampNTZType(), False) == "DateTime64(6)"


def test_array_and_map_nullability_moves_inside():
    # CH forbids Nullable(Array(...)) — outer nullability is dropped and
    # element nullability is preserved inside.
    assert (
        clickhouse_type(ArrayType(FloatType(), False), True) == "Array(Float32)"
    )
    assert (
        clickhouse_type(ArrayType(FloatType(), True), False)
        == "Array(Nullable(Float32))"
    )
    assert (
        clickhouse_type(MapType(StringType(), LongType(), True), False)
        == "Map(String, Nullable(Int64))"
    )


def test_unmappable_type_raises():
    with pytest.raises(TypeError):
        clickhouse_type(StructType([StructField("x", LongType())]), False)


def test_snapshot_ddl_orders_fixture(spark):
    orders = load_table(spark, SF, "orders")
    ddl = snapshot_ddl(orders.schema, "orders", rowid="o_orderkey")
    assert "CREATE TABLE IF NOT EXISTS `orders`" in ddl
    assert "ENGINE = MergeTree" in ddl
    assert "ORDER BY (`o_orderkey`)" in ddl
    # Key column forced bare even though parquet marks it nullable.
    assert "`o_orderkey` Int64" in ddl
    assert "Nullable(Int64)" not in ddl.split("\n")[1]  # first col line is the key
    assert "`o_totalprice` Nullable(Float64)" in ddl
    assert "`o_orderdate` Nullable(DateTime64(6))" in ddl


def test_cdc_ddl_is_replacing_merge_tree(spark):
    events = load_table(spark, SF, "events")
    ddl = cdc_ddl(
        events.schema, "events_state", keys=["user_id"], version_col="ts"
    )
    assert "ENGINE = ReplacingMergeTree(ts)" in ddl
    assert "ORDER BY (`user_id`)" in ddl
    assert "`user_id` Int64" in ddl  # merge key: bare


def test_embeddings_array_column(spark):
    emb = load_table(spark, SF, "embeddings")
    ddl = snapshot_ddl(emb.schema, "embeddings", rowid="vec_id")
    assert "Array(" in ddl and "Nullable(Array" not in ddl


def test_validation_errors(spark):
    orders = load_table(spark, SF, "orders")
    with pytest.raises(ValueError):
        clickhouse_ddl(orders.schema, "orders", order_by=["nope"])
    with pytest.raises(ValueError):
        cdc_ddl(orders.schema, "o", keys=["o_orderkey"], version_col="nope")


def test_partition_by_clause(spark):
    orders = load_table(spark, SF, "orders")
    ddl = clickhouse_ddl(
        orders.schema,
        "orders",
        order_by=["o_orderkey"],
        partition_by="toYYYYMM(o_orderdate)",
    )
    assert "PARTITION BY toYYYYMM(o_orderdate)" in ddl
    # PARTITION BY precedes ORDER BY in CH DDL.
    assert ddl.index("PARTITION BY") < ddl.index("ORDER BY")
