"""CDC stream landing in the lakehouse MERGE sink — the production path.

s_cdc_apply (streaming/declared.py) proves the MERGE ALGEBRA converges
under any micro-batch slicing, but its state lives in a driver-held
DataFrame. This stream runs the same snapshot-then-changelog pipeline
with the state where production keeps it: a sinks/merge.py `LakeTable`,
every micro-batch committed through the exactly-once foreachBatch writer
(atomic generation publish, batch-id watermark, tombstone persistence).
The declared result is the final table read back FROM STORAGE — so the
oracle hash checks the full loop: wire slices -> MERGE commits ->
manifest/pointer -> parquet -> live rows. Reference contrast: this is
the durable form of the ReplacingMergeTree target the reference assumes
on the ClickHouse side (SURVEY §1.2), with time travel the reference's
TRUNCATE-and-recopy recovery story lacks.

Scale notes: per micro-batch, one key shuffle (apply_changelog window)
plus a state-table rewrite — at 100 TB the state is key-hash-partitioned
so only touched partitions rewrite (sinks/merge.py scale notes); the
commit itself is O(1) filesystem metadata regardless of data size.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.registry import declare
from mysql_to_clickhouse_sync_spark.sinks.merge import LakeTable
from mysql_to_clickhouse_sync_spark.streaming.cdc import (
    OP_COL,
    as_state,
    latest_per_key,
)
from mysql_to_clickhouse_sync_spark.streaming.declared import (
    _CDC_APPLY_ORACLE,
    N_STREAM_FILES,
    SPLIT_TS,
    _changelog_from_events,
)
from mysql_to_clickhouse_sync_spark.streaming.tuning import tuned


@declare("s_lake_merge", oracle=_CDC_APPLY_ORACLE, tier="P3")
@tuned
def s_lake_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot + binlog-replay CDC through the LakeTable MERGE sink:
    version 0 is the bulk snapshot commit, each replayed micro-batch is
    one exactly-once MERGE commit, and the declared output is the final
    version read back from parquet. Oracle-equal to s_cdc_apply — the
    storage layer must be semantically invisible."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    )
    cols = ["user_id", "event_id", "ts", "event_type", "value"]
    snapshot = as_state(
        latest_per_key(
            events.filter(F.col("ts") < F.lit(SPLIT_TS)).select(cols),
            ["user_id"],
            [F.col("ts").desc(), F.col("event_id").desc()],
        )
    )
    changelog = _changelog_from_events(events).select(*cols, OP_COL)
    slices = [
        changelog.filter(F.col("event_id") % N_STREAM_FILES == i)
        for i in range(N_STREAM_FILES)
    ]

    workdir = tempfile.mkdtemp(prefix="lake_cdc_")
    in_dir = f"{workdir}/changelog"
    ckpt = f"{workdir}/ckpt"
    os.makedirs(in_dir, exist_ok=True)
    table = LakeTable(
        spark,
        f"{workdir}/state",
        keys=["user_id"],
        version_cols=["ts", "event_id"],
        retention=N_STREAM_FILES,
    )
    table.merge(snapshot)  # version 0: the reference's bulk copy

    query = None
    try:
        stream = (
            spark.readStream.schema(changelog.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
            .writeStream.foreachBatch(table.writer())
            .option("checkpointLocation", ckpt)
        )
        query = stream.start()
        for part in slices:
            part.coalesce(1).write.mode("append").parquet(in_dir)
            query.processAllAvailable()
        # one commit per micro-batch landed, watermark at the last batch
        assert table.current_version() == N_STREAM_FILES
        assert table.last_batch() == N_STREAM_FILES - 1
        return table.read().localCheckpoint(eager=True)
    finally:
        if query is not None:
            query.stop()
        shutil.rmtree(workdir, ignore_errors=True)
