"""Binlog envelope source: Debezium/Maxwell JSON → changelog frames.

The reference stops at recording the binlog offset (metadata.txt,
mysql_to_clickhouse_sync.py:175-183); these tests pin the missing half —
parsing the row-event wire formats a binlog replayer emits and applying
them through the CDC merge. Kafka transport is environment-gated (no
connector jar here); the gate's error message is pinned too."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from mysql_to_clickhouse_sync_spark.sources.binlog import (
    parse_debezium,
    parse_maxwell,
    quarantine_malformed,
    read_envelope_kafka,
    read_envelope_stream,
)
from mysql_to_clickhouse_sync_spark.streaming.cdc import (
    apply_changelog,
    as_state,
    live_rows,
)

PAYLOAD = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("bal", DoubleType()),
    ]
)


def _dbz(op, row, pos, ts_ms=1700000000000):
    doc = {
        "op": op,
        "ts_ms": ts_ms,
        "source": {"file": "binlog.000002", "pos": pos},
    }
    if op == "d":
        doc["before"] = row
    else:
        doc["after"] = row
    return json.dumps(doc)


def _mxw(typ, row, xid):
    return json.dumps(
        {
            "database": "shop",
            "table": "accounts",
            "type": typ,
            "ts": 1700000000,
            "xid": xid,
            "position": "binlog.000002:4",
            "data": row,
        }
    )


def test_parse_debezium_ops_and_row_images(spark):
    lines = [
        _dbz("c", {"id": 1, "name": "a", "bal": 10.5}, 100),
        _dbz("u", {"id": 1, "name": "a2", "bal": 11.25}, 200),
        _dbz("r", {"id": 2, "name": "b", "bal": 0.0}, 300),  # snapshot read
        _dbz("d", {"id": 2, "name": "b", "bal": 0.0}, 400),
    ]
    raw = spark.createDataFrame([(l,) for l in lines], "value string")
    out = parse_debezium(raw, PAYLOAD).orderBy("_binlog_pos").collect()
    assert [r["op"] for r in out] == ["upsert", "upsert", "upsert", "delete"]
    # delete takes its row image from `before`
    assert out[3]["id"] == 2 and out[3]["name"] == "b"
    assert out[1]["bal"] == 11.25
    assert [r["_binlog_pos"] for r in out] == [100, 200, 300, 400]
    assert out[0]["_binlog_file"] == "binlog.000002"


def test_parse_maxwell_ops(spark):
    lines = [
        _mxw("insert", {"id": 1, "name": "a", "bal": 1.0}, 7),
        _mxw("update", {"id": 1, "name": "a2", "bal": 2.0}, 8),
        _mxw("delete", {"id": 1, "name": "a2", "bal": 2.0}, 9),
    ]
    raw = spark.createDataFrame([(l,) for l in lines], "value string")
    out = parse_maxwell(raw, PAYLOAD).orderBy("_binlog_pos").collect()
    assert [r["op"] for r in out] == ["upsert", "upsert", "delete"]
    assert out[2]["id"] == 1  # Maxwell deletes carry the row in `data`
    assert [r["_binlog_pos"] for r in out] == [7, 8, 9]


def test_malformed_envelope_quarantined_not_fatal(spark):
    lines = [
        _dbz("c", {"id": 1, "name": "a", "bal": 1.0}, 100),
        "{not json at all",
        _dbz("u", {"id": 1, "name": "b", "bal": 2.0}, 200),
    ]
    raw = spark.createDataFrame([(l,) for l in lines], "value string")
    good, bad = quarantine_malformed(parse_debezium(raw, PAYLOAD), "id")
    assert good.count() == 2
    assert bad.count() == 1


def test_envelope_file_stream_applies_through_cdc_merge(spark):
    """End to end: envelope files arrive as micro-batches, apply_changelog
    folds them onto the snapshot, final state = latest-per-key minus
    deletes."""
    workdir = tempfile.mkdtemp(prefix="binlog_stream_")
    in_dir = os.path.join(workdir, "feed")
    os.makedirs(in_dir)
    try:
        snapshot = spark.createDataFrame(
            [(1, "one", 1.0, 0), (2, "two", 2.0, 0)],
            "id long, name string, bal double, _binlog_pos long",
        )
        state = {"df": as_state(snapshot)}

        def merge(batch_df, _epoch):
            state["df"] = apply_changelog(
                state["df"],
                batch_df.drop("_binlog_file"),
                keys=["id"],
                version_cols=["_binlog_pos"],
            ).localCheckpoint(eager=True)

        stream = read_envelope_stream(spark, in_dir, PAYLOAD)
        q = (
            stream.writeStream.foreachBatch(merge)
            .option("checkpointLocation", os.path.join(workdir, "ckpt"))
            .start()
        )
        try:
            batches = [
                [
                    _dbz("u", {"id": 1, "name": "one*", "bal": 1.5}, 10),
                    _dbz("c", {"id": 3, "name": "three", "bal": 3.0}, 11),
                ],
                [
                    _dbz("d", {"id": 2, "name": "two", "bal": 2.0}, 20),
                    # out-of-order stale update for id 1 — must lose to pos 10
                    _dbz("u", {"id": 1, "name": "stale", "bal": 0.0}, 5),
                ],
            ]
            for i, lines in enumerate(batches):
                with open(os.path.join(in_dir, f"b{i}.json"), "w") as fh:
                    fh.write("\n".join(lines) + "\n")
                q.processAllAvailable()
        finally:
            q.stop()

        final = {
            r["id"]: (r["name"], r["bal"])
            for r in live_rows(state["df"]).collect()
        }
        assert final == {1: ("one*", 1.5), 3: ("three", 3.0)}
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_kafka_transport_gated_with_actionable_error(spark):
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        read_envelope_kafka(spark, "localhost:9092", "binlog.shop", PAYLOAD)
