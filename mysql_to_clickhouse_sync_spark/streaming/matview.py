"""Incremental materialized view — the streaming half of
q_agg_state_merge's AggregatingMergeTree contract.

ClickHouse materialized views populate an AggregatingMergeTree target
incrementally: every INSERT block is pre-aggregated to partial -State rows
and parts merge later. The Spark-native equivalent is a foreachBatch sink
that maintains a STATE TABLE: each micro-batch aggregates to partial
states at the fine grain and merges them into the persisted states with a
read-modify-write (all aggregates mergeable — count/sum by sum, min/max by
min/max — so the merge is associative and batch-boundary-independent).

The declared query drives a real two-micro-batch stream and returns the
final -Merge readout; the oracle is the SAME SQL as q_agg_state_merge —
proving the incremental path converges to the batch answer regardless of
how rows were sliced into batches (including the per-(type,day) state
count, which must equal the batch state count because states merge by
key, never split).

Scale notes: each micro-batch shuffles only its own partial states (group
cardinality, not row count); the read-modify-write touches the state
table (bounded by key cardinality), never reprocessed raw history. At
100 TB/day the state table lives in a keyed, transactional store
(Delta/Iceberg MERGE or ClickHouse itself) — the parquet
checkpoint-then-overwrite here is the sandbox stand-in with the same merge
algebra.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.operators.clickhouse import (
    AGG_STATE_ORACLE,
    _cents,
)
from mysql_to_clickhouse_sync_spark.registry import declare
from mysql_to_clickhouse_sync_spark.streaming.tuning import tuned

SPLIT_TS = "2024-01-20 00:00:00"  # same micro-batch split as declared.py


def _partial_states(df: DataFrame) -> DataFrame:
    return df.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.count("*").alias("c"),
        F.sum(_cents()).alias("s"),
        F.min("ts").alias("mn"),
        F.max("ts").alias("mx"),
    )


def merge_states(cur: DataFrame, partial: DataFrame) -> DataFrame:
    """-Merge of two state tables: associative, key-aligned."""
    return (
        cur.unionByName(partial)
        .groupBy("event_type", "day")
        .agg(
            F.sum("c").alias("c"),
            F.sum("s").alias("s"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )


class StateSink:
    """Idempotent foreachBatch state sink. Structured Streaming's
    foreachBatch is at-least-once: after a failure the SAME batch_id can
    be re-delivered, and a naive merge would double-count it. The fix is
    the standard exactly-once recipe — state and the applied-batch log
    commit ATOMICALLY, as one artifact.

    Commit protocol (single-writer, like foreachBatch itself):
      * each apply() writes a fresh generation directory
        ``gen-<n>`` holding the merged state parquet AND a ``_APPLIED``
        manifest (all batch ids folded into that state);
      * the generation is published by atomically replacing the
        ``_CURRENT`` pointer file (os.replace — atomic on POSIX).
    A crash BEFORE the pointer flip leaves _CURRENT on the old
    generation, whose manifest doesn't list the batch — redelivery
    re-merges from the OLD state: no double count, no loss. A crash
    AFTER the flip leaves the batch in the committed manifest —
    redelivery is skipped. The live state dir is never deleted or
    overwritten in place; stale generations are pruned only after a
    successful flip, keeping the previous one as a crash fallback.
    (batch_id is stable across retries by contract; at 100 TB the state
    lives in a transactional table — Delta/Iceberg MERGE keyed on
    batch_id — this generation scheme is the sandbox stand-in with the
    same commit algebra.)"""

    def __init__(self, spark: SparkSession, state_dir: str) -> None:
        self.spark = spark
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)
        self._pointer = os.path.join(state_dir, "_CURRENT")

    def _current_gen(self) -> str | None:
        if not os.path.exists(self._pointer):
            return None
        with open(self._pointer) as fh:
            name = fh.read().strip()
        return os.path.join(self.state_dir, name) if name else None

    @staticmethod
    def _manifest(gen_dir: str) -> set[int]:
        path = os.path.join(gen_dir, "_APPLIED")
        if not os.path.exists(path):
            return set()
        with open(path) as fh:
            return {int(line) for line in fh if line.strip()}

    def apply(self, batch_df: DataFrame, batch_id: int) -> None:
        cur_gen = self._current_gen()
        applied = self._manifest(cur_gen) if cur_gen else set()
        if batch_id in applied:
            return  # re-delivered batch: already committed, skip
        partial = _partial_states(batch_df)
        if cur_gen:
            cur = self.spark.read.parquet(os.path.join(cur_gen, "data"))
            merged = merge_states(cur, partial)
        else:
            merged = partial
        new_gen_name = f"gen-{len(applied)}-{batch_id}"
        new_gen = os.path.join(self.state_dir, new_gen_name)
        # a leftover dir from a crashed earlier attempt is uncommitted
        # garbage (the pointer never flipped to it) — clear and rewrite
        shutil.rmtree(new_gen, ignore_errors=True)
        merged.write.mode("overwrite").parquet(os.path.join(new_gen, "data"))
        with open(os.path.join(new_gen, "_APPLIED"), "w") as fh:
            for b in sorted(applied | {batch_id}):
                fh.write(f"{b}\n")
        # atomic publish: state + log become visible in one rename
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(new_gen_name)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self._pointer)
        # prune generations older than the committed one's predecessor
        keep = {new_gen_name, os.path.basename(cur_gen) if cur_gen else ""}
        for d in os.listdir(self.state_dir):
            if d.startswith("gen-") and d not in keep:
                shutil.rmtree(os.path.join(self.state_dir, d), ignore_errors=True)

    def readout(self) -> DataFrame:
        cur_gen = self._current_gen()
        if cur_gen is None:
            raise FileNotFoundError(f"no committed state in {self.state_dir}")
        states = self.spark.read.parquet(os.path.join(cur_gen, "data"))
        return states.groupBy("event_type").agg(
            F.sum("c").cast("bigint").alias("n_events"),
            F.sum("s").cast("bigint").alias("sum_cents"),
            F.min("mn").alias("first_ts"),
            F.max("mx").alias("last_ts"),
            F.count("*").alias("n_states"),
        )


@declare("s_agg_state_stream", oracle=AGG_STATE_ORACLE, tier="P3")
@tuned
def s_agg_state_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental materialized view: micro-batches of the events
    feed are pre-aggregated to partial states and merged into a persisted
    state table via foreachBatch; the result is the -Merge readout of the
    final states. Oracle-equal to the one-shot batch aggregation."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    early = events.filter(F.col("ts") < F.lit(SPLIT_TS))
    late = events.filter(F.col("ts") >= F.lit(SPLIT_TS))

    workdir = tempfile.mkdtemp(prefix="matview_")
    in_dir = f"{workdir}/in"
    ckpt = f"{workdir}/ckpt"
    os.makedirs(in_dir, exist_ok=True)
    sink = StateSink(spark, f"{workdir}/state")

    query = None
    try:
        early.coalesce(1).write.mode("append").parquet(in_dir)
        query = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
            .writeStream.foreachBatch(sink.apply)
            .option("checkpointLocation", ckpt)
            .start()
        )
        query.processAllAvailable()
        late.coalesce(1).write.mode("append").parquet(in_dir)
        query.processAllAvailable()
        return sink.readout().localCheckpoint(eager=True)
    finally:
        if query is not None:
            query.stop()
        shutil.rmtree(workdir, ignore_errors=True)
