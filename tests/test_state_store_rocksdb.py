"""RocksDB state store coverage: at 100 TB/day the HDFS-backed in-memory
state store OOMs on large stateful joins/dedup — RocksDB spills to disk and
is the production choice. The provider is a session config baked in at
query start; this test pins that our streaming queries run (and produce
identical results) under it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.registry import queries
from tests.conftest import SF_DIR

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
_KEY = "spark.sql.streaming.stateStore.providerClass"


def test_tumbling_stream_identical_under_rocksdb(spark):
    prev = spark.conf.get(_KEY, None)
    qs = queries()
    baseline = {
        tuple(r) for r in qs["s_tumbling_stream"](spark, SF_DIR).collect()
    }
    try:
        spark.conf.set(_KEY, ROCKSDB)
        rocks = {
            tuple(r) for r in qs["s_tumbling_stream"](spark, SF_DIR).collect()
        }
    finally:
        if prev is None:
            spark.conf.unset(_KEY)
        else:
            spark.conf.set(_KEY, prev)
    assert rocks == baseline


def test_rocksdb_kill_and_resume_from_checkpoint(spark, tmp_path):
    """Crash-resume under the RocksDB provider (VERDICT r4 #4): a
    stateful stream (dropDuplicates dedup state + running agg state) is
    KILLED between micro-batches, more input arrives — including
    at-least-once REDELIVERY of earlier rows — and a fresh query object
    restarts from the same checkpoint. The converged state must equal
    the batch ground truth over distinct events: the dedup state
    recovered from RocksDB must remember pre-crash event_ids, so
    redelivered rows do not double-count (the matview crash-window
    discipline applied to Spark's own state store)."""
    import json
    import os

    from mysql_to_clickhouse_sync_spark.catalog import load_table

    prev = spark.conf.get(_KEY, None)
    events = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "event_type", "value")
        .filter(F.col("event_id") < 3000)
    )
    rows = [r.asDict() for r in events.collect()]
    assert len(rows) >= 100
    third = len(rows) // 3
    in_dir = tmp_path / "in"
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    def write_file(name, payload):
        with open(in_dir / name, "w") as fh:
            for r in payload:
                fh.write(json.dumps(r) + "\n")

    def start_query():
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .json(str(in_dir))
            .dropDuplicates(["event_id"])
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                # integer cents: float sums are partition-order sensitive
                # and this test compares across two different plans
                F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                    "total"
                ),
            )
        )
        return (
            stream.writeStream.outputMode("complete")
            .format("memory")
            .queryName("rocks_resume")
            .option("checkpointLocation", ckpt)
            .start()
        )

    try:
        spark.conf.set(_KEY, ROCKSDB)
        # phase 1: two files; the second REDELIVERS half of the first
        write_file("a.json", rows[:third])
        write_file("b.json", rows[: third // 2] + rows[third : 2 * third])
        q1 = start_query()
        q1.processAllAvailable()
        mid = spark.sql("SELECT * FROM rocks_resume").collect()
        assert mid  # some state accumulated pre-crash
        q1.stop()  # the kill, between micro-batches

        # phase 2: more input + another redelivery of phase-1 rows
        write_file("c.json", rows[2 * third :] + rows[third : third + 50])
        q2 = start_query()  # fresh query object, same checkpoint
        q2.processAllAvailable()
        got = {
            r.event_type: (r.n, r.total)
            for r in spark.sql("SELECT * FROM rocks_resume").collect()
        }
        q2.stop()
    finally:
        if prev is None:
            spark.conf.unset(_KEY)
        else:
            spark.conf.set(_KEY, prev)

    truth = {
        r.event_type: (r.n, r.total)
        for r in events.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("total"),
        )
        .collect()
    }
    assert got == truth
    # and RocksDB actually provided the state store for this checkpoint
    offsets = os.listdir(os.path.join(ckpt, "state", "0", "0"))
    assert any(f.endswith(".zip") or f.endswith(".changelog") for f in offsets)
