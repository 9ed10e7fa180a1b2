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


def _st(*fields):
    from pyspark.sql.types import IntegerType

    types = {
        "int": IntegerType(),
        "long": LongType(),
        "float": FloatType(),
        "str": StringType(),
        "dec": DecimalType(12, 2),
        "dec_wide": DecimalType(18, 2),
    }
    return StructType(
        [StructField(n, types[t], nullable) for n, t, nullable in fields]
    )


def test_alter_ddl_add_column_is_nullable_idempotent_positioned():
    from mysql_to_clickhouse_sync_spark.sinks.ddl import alter_table_ddl

    old = _st(("a", "long", False), ("b", "str", True))
    new = _st(
        ("a", "long", False),
        ("b", "str", True),
        ("props", "str", False),  # upstream non-null — target must be
    )  # Nullable anyway: pre-ALTER rows carry no value
    stmts = alter_table_ddl(old, new, "events_cdc")
    assert stmts == [
        "ALTER TABLE `events_cdc` ADD COLUMN IF NOT EXISTS"
        " `props` Nullable(String) AFTER `b`"
    ]
    # new leading column -> FIRST; database qualification honored
    new2 = _st(("z", "int", True), ("a", "long", False), ("b", "str", True))
    stmts2 = alter_table_ddl(old, new2, "t", database="db")
    assert stmts2 == [
        "ALTER TABLE `db`.`t` ADD COLUMN IF NOT EXISTS"
        " `z` Nullable(Int32) FIRST"
    ]


def test_alter_ddl_widen_and_noop():
    from mysql_to_clickhouse_sync_spark.sinks.ddl import alter_table_ddl

    old = _st(("a", "int", False), ("p", "dec", True), ("x", "float", True))
    # no drift -> no statements (callers log-and-skip)
    assert alter_table_ddl(old, old, "t") == []
    # int widening + decimal precision growth at equal scale
    new = _st(("a", "long", False), ("p", "dec_wide", True), ("x", "float", True))
    stmts = alter_table_ddl(old, new, "t")
    assert stmts == [
        "ALTER TABLE `t` MODIFY COLUMN `a` Int64",
        "ALTER TABLE `t` MODIFY COLUMN `p` Nullable(Decimal(18, 2))",
    ]
    # non-null -> nullable is a safe MODIFY
    loosened = _st(("a", "int", True), ("p", "dec", True), ("x", "float", True))
    assert alter_table_ddl(old, loosened, "t") == [
        "ALTER TABLE `t` MODIFY COLUMN `a` Nullable(Int32)"
    ]
    # dropped upstream column: left in place, no statement
    assert alter_table_ddl(old, _st(("a", "int", False), ("p", "dec", True)), "t") == []


def test_alter_ddl_refuses_lossy_changes():
    from mysql_to_clickhouse_sync_spark.sinks.ddl import alter_table_ddl

    old = _st(("a", "long", False), ("s", "str", True))
    with pytest.raises(ValueError):  # narrowing int
        alter_table_ddl(old, _st(("a", "int", False), ("s", "str", True)), "t")
    with pytest.raises(ValueError):  # type swap
        alter_table_ddl(old, _st(("a", "long", False), ("s", "long", True)), "t")
    with pytest.raises(ValueError):  # nullable -> non-null
        alter_table_ddl(old, _st(("a", "long", False), ("s", "str", False)), "t")


def test_alter_ddl_matches_drift_stream_schemas(spark):
    """The exact diff s_cdc_schema_drift logs: v1 events schema vs the
    wide (post-ALTER) schema yields one Nullable props ADD COLUMN."""
    from mysql_to_clickhouse_sync_spark.sinks.ddl import alter_table_ddl
    from mysql_to_clickhouse_sync_spark.streaming.evolution import (
        _V1_COLS,
        _V2_COLS,
    )

    events = load_table(spark, SF, "events")
    stmts = alter_table_ddl(
        events.select(*_V1_COLS).schema,
        events.select(*_V2_COLS).schema,
        "events_cdc",
    )
    assert len(stmts) == 1
    assert "ADD COLUMN IF NOT EXISTS `props` Nullable(String)" in stmts[0]
    assert stmts[0].endswith("AFTER `value`")


def test_alter_ddl_refuses_key_column_drift():
    """ClickHouse ORDER BY key columns can neither change type nor become
    Nullable (ADVICE r5): even a widening that is safe elsewhere must be
    rejected at plan time when the column is in the key set."""
    from mysql_to_clickhouse_sync_spark.sinks.ddl import alter_table_ddl

    old = _st(("k", "int", False), ("v", "str", True))
    widened = _st(("k", "long", False), ("v", "str", True))
    # same widening is fine on a non-key column...
    assert alter_table_ddl(old, widened, "t") == [
        "ALTER TABLE `t` MODIFY COLUMN `k` Int64"
    ]
    # ...but raises when the column is part of the ORDER BY key
    with pytest.raises(ValueError, match="ORDER BY key"):
        alter_table_ddl(old, widened, "t", order_by=("k",))
    loosened = _st(("k", "int", True), ("v", "str", True))
    with pytest.raises(ValueError, match="ORDER BY key"):
        alter_table_ddl(old, loosened, "t", order_by=("k",))
    # key-set knowledge must not affect non-key drift
    new_col = _st(("k", "int", False), ("v", "str", True), ("p", "str", True))
    assert len(alter_table_ddl(old, new_col, "t", order_by=("k",))) == 1


def test_drift_stream_records_alter_and_null_fills(spark, caplog):
    """Integration (r5 VERDICT #5): running the schema-drift CDC stream
    must (a) RECORD the idempotent ALTER statement at the moment the
    wide generation appears, and (b) NULL-fill the new column for every
    winner serialized before the upstream ALTER — both halves of the
    drift contract observed from one run."""
    import logging

    from mysql_to_clickhouse_sync_spark.streaming.evolution import (
        ALTER_TS,
        s_cdc_schema_drift,
    )

    with caplog.at_level(
        logging.INFO, logger="mysql_to_clickhouse_sync_spark.streaming.evolution"
    ):
        rows = s_cdc_schema_drift(spark, SF).collect()

    ddl = [r.message for r in caplog.records if "schema drift DDL" in r.message]
    assert len(ddl) == 1
    assert "ADD COLUMN IF NOT EXISTS `props` Nullable(String)" in ddl[0]
    assert "`events_cdc`" in ddl[0]

    # data half: pre-ALTER winners carry NULL props; post-ALTER winners
    # carry the source value verbatim
    import datetime

    alter = datetime.datetime.fromisoformat(ALTER_TS)
    src = {
        r.event_id: r.props
        for r in load_table(spark, SF, "events")
        .select("event_id", "props")
        .collect()
    }
    assert rows  # stream converged to a non-empty state
    for r in rows:
        if r.ts < alter:
            assert r.props is None, f"pre-ALTER winner {r.event_id} not NULL"
        else:
            assert r.props == src[r.event_id]
