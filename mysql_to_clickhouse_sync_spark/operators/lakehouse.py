"""Lakehouse MERGE + time travel as a declared, oracle-checked query.

The reference's north star is continuous MySQL->ClickHouse replication
(mysql_to_clickhouse_sync.py:97-116 batches INSERTs; ReplacingMergeTree
collapses to latest-per-key at merge time). The engine's landing zone for
that CDC feed is sinks/merge.py `LakeTable`: versioned-manifest parquet
MERGE with snapshot isolation and time travel. This module pins the
TABLE-LEVEL law of that sink relationally:

    the live state as of commit v  ==  latest-per-key over the changelog
    PREFIX folded through commits 0..v, minus keys whose winner is a
    delete

by actually driving three MERGE commits against a scratch LakeTable and
reading every retained version back through the time-travel API. The
DuckDB oracle states all three prefixes in one window query — so the
pointer/manifest/tombstone machinery (filesystem, JSON, atomic rename)
is hash-checked against pure SQL, not just unit-asserted.

Scale notes: each commit shuffles once on the merge key (the
apply_changelog window); reads are manifest-pruned parquet scans of one
immutable generation. The time-travel union here re-reads three
generations — the audit shape, not a hot path; production readers pin
one version.
"""

from __future__ import annotations

import shutil
import tempfile
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import EVENTS_US_CTE, load_table
from mysql_to_clickhouse_sync_spark.registry import declare
from mysql_to_clickhouse_sync_spark.sinks.merge import LakeTable
from mysql_to_clickhouse_sync_spark.streaming.cdc import (
    DELETE,
    OP_COL,
    UPSERT,
)

# Commit boundaries: three changelog batches by event time.
MERGE_T1 = "2024-01-11 00:00:00"
MERGE_T2 = "2024-01-21 00:00:00"

_COLS = ["user_id", "event_id", "ts", "event_type", "value"]

_ORACLE = f"""
    {EVENTS_US_CTE}
    , c AS (
        SELECT user_id, event_id, ts, event_type, value,
               CASE WHEN ts < TIMESTAMP '{MERGE_T1}' THEN 0
                    WHEN ts < TIMESTAMP '{MERGE_T2}' THEN 1
                    ELSE 2 END AS b
        FROM events_us WHERE ts IS NOT NULL
    ), v(version) AS (VALUES (0), (1), (2)),
    ranked AS (
        SELECT v.version, c.user_id, c.event_id, c.ts, c.event_type,
               c.value,
               row_number() OVER (
                   PARTITION BY v.version, c.user_id
                   ORDER BY c.ts DESC, c.event_id DESC) AS rn
        FROM v JOIN c ON c.b <= v.version
    )
    SELECT CAST(version AS BIGINT) AS version, user_id, event_id, ts,
           event_type, value
    FROM ranked WHERE rn = 1 AND event_type <> 'error'
"""


def _run_merge_commits(
    spark: SparkSession, sf_dir: str, n_buckets: int | None
) -> DataFrame:
    """Shared driver for the (un)bucketed snapshot queries: three MERGE
    commits, then the union of every retained version's live rows."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(*_COLS)
    )
    log = ev.withColumn(
        OP_COL,
        F.when(F.col("event_type") == "error", F.lit(DELETE)).otherwise(
            F.lit(UPSERT)
        ),
    )
    batches = [
        log.filter(F.col("ts") < F.lit(MERGE_T1)),
        log.filter(
            (F.col("ts") >= F.lit(MERGE_T1)) & (F.col("ts") < F.lit(MERGE_T2))
        ),
        log.filter(F.col("ts") >= F.lit(MERGE_T2)),
    ]
    workdir = tempfile.mkdtemp(prefix="lake_snapshot_")
    try:
        table = LakeTable(
            spark,
            f"{workdir}/state",
            keys=["user_id"],
            version_cols=["ts", "event_id"],
            retention=len(batches),  # keep every commit readable
            n_buckets=n_buckets,
        )
        for i, b in enumerate(batches):
            table.merge(b, batch_id=i)
        assert table.versions() == [0, 1, 2]
        reads = [
            table.read(version=v).withColumn(
                "version", F.lit(v).cast("long")
            )
            for v in table.versions()
        ]
        out = reduce(lambda a, b: a.unionByName(b), reads).select(
            "version", *_COLS
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


@declare("q_merge_snapshot", oracle=_ORACLE, tier="P2")
def q_merge_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three MERGE commits into a LakeTable, read back at every retained
    version: commit v's live state must equal the latest-per-user fold
    of the changelog prefix (error events are deletes — their keys
    vanish while the tombstone persists in storage). Output is the
    union of the three time-traveled reads tagged with their version —
    the snapshot-isolation/time-travel contract stated as data."""
    return _run_merge_commits(spark, sf_dir, n_buckets=None)


@declare("q_merge_bucketed", oracle=_ORACLE, tier="P2")
def q_merge_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The identical commit sequence through a KEY-HASH-BUCKETED
    LakeTable (8 buckets): each commit rewrites only the buckets its
    changelog touches, untouched buckets stay manifest-referenced from
    older generations, and every time-traveled read unions through
    those references. Same oracle as q_merge_snapshot — the pruned
    incremental rewrite must be semantically invisible, which is
    exactly what makes it safe to rely on at 100 TB (where merge cost
    being O(touched bytes), not O(table bytes), is the difference
    between a commit and a table rewrite)."""
    return _run_merge_commits(spark, sf_dir, n_buckets=8)
