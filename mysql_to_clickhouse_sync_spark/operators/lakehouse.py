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


def _changelog_batches(spark: SparkSession, sf_dir: str) -> list[DataFrame]:
    """The shared three-commit changelog: events in three event-time
    windows, 'error' events as deletes."""
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
    return [
        log.filter(F.col("ts") < F.lit(MERGE_T1)),
        log.filter(
            (F.col("ts") >= F.lit(MERGE_T1)) & (F.col("ts") < F.lit(MERGE_T2))
        ),
        log.filter(F.col("ts") >= F.lit(MERGE_T2)),
    ]


def _run_merge_commits(
    spark: SparkSession, sf_dir: str, n_buckets: int | None
) -> DataFrame:
    """Shared driver for the (un)bucketed snapshot queries: three MERGE
    commits, then the union of every retained version's live rows."""
    batches = _changelog_batches(spark, sf_dir)

    def per_version(table: LakeTable) -> list[DataFrame]:
        return [
            table.read(version=v).withColumn(
                "version", F.lit(v).cast("long")
            )
            for v in table.versions()
        ]

    return _with_committed_table(
        spark, batches, n_buckets, per_version, ["version", *_COLS]
    )


def _with_committed_table(spark, batches, n_buckets, reader, cols):
    """Commit `batches` into a scratch LakeTable, apply `reader` to get
    per-version frames, union, checkpoint, clean up."""
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
        out = reduce(
            lambda a, b: a.unionByName(b), reader(table)
        ).select(*cols)
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


_CDF_ORACLE = f"""
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
    ), st AS MATERIALIZED (
        SELECT version, user_id, event_id, ts, event_type, value
        FROM ranked WHERE rn = 1 AND event_type <> 'error'
    )
    SELECT CAST(0 AS BIGINT) AS version, 'insert' AS change_type,
           user_id, event_id, ts, event_type, value
    FROM st WHERE version = 0
    UNION ALL
    SELECT CAST(n.version AS BIGINT), 'insert',
           n.user_id, n.event_id, n.ts, n.event_type, n.value
    FROM st n LEFT JOIN st p
      ON p.version = n.version - 1 AND p.user_id = n.user_id
    WHERE n.version >= 1 AND p.user_id IS NULL
    UNION ALL
    SELECT CAST(p.version + 1 AS BIGINT), 'delete',
           p.user_id, p.event_id, p.ts, p.event_type, p.value
    FROM st p LEFT JOIN st n
      ON n.version = p.version + 1 AND n.user_id = p.user_id
    WHERE p.version <= 1 AND n.user_id IS NULL
    UNION ALL
    SELECT CAST(n.version AS BIGINT), 'update_preimage',
           p.user_id, p.event_id, p.ts, p.event_type, p.value
    FROM st n JOIN st p
      ON p.version = n.version - 1 AND p.user_id = n.user_id
     AND p.event_id <> n.event_id
    UNION ALL
    SELECT CAST(n.version AS BIGINT), 'update_postimage',
           n.user_id, n.event_id, n.ts, n.event_type, n.value
    FROM st n JOIN st p
      ON p.version = n.version - 1 AND p.user_id = n.user_id
     AND p.event_id <> n.event_id
"""


@declare("q_lake_cdf", oracle=_CDF_ORACLE, tier="P2")
def q_lake_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED over the three-commit LakeTable: for every
    retained commit, what it did to the live table — inserts, deletes
    (an 'error' winner killing the key), and update pre/post images
    (the winner moved under the version order). The first commit reads
    as all-insert (bootstrap). The oracle re-derives every feed row
    from adjacent prefix states, so the sink's read-side CDF (a keyed
    full-outer join of adjacent snapshots) is hash-checked end to end —
    the reverse direction of q_merge_snapshot, which checks states;
    this checks DELTAS.

    Scale notes: one co-partitioned self-join per commit pair; at
    100 TB the feed is derived forward from each merge's changelog —
    this read-side form exists to re-derive any retained commit's feed
    without having kept its changelog (the Delta CDF contract)."""
    batches = _changelog_batches(spark, sf_dir)

    def feeds(table: LakeTable) -> list[DataFrame]:
        return [
            table.changes(v)
            .withColumnRenamed("_commit_version", "version")
            .withColumnRenamed("_change_type", "change_type")
            for v in table.versions()
        ]

    return _with_committed_table(
        spark, batches, None, feeds, ["version", "change_type", *_COLS]
    )
