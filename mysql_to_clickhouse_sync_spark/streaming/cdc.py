"""CDC changelog application — the streaming phase the reference prepares
for but never implements.

The reference records (binlog_file, position, gtid) to metadata.txt under the
snapshot lock (mysql_to_clickhouse_sync.py:175-183) precisely so a binlog
replayer can resume from it. This module is that replayer's merge logic,
Spark-first: a changelog of (key, op, payload) rows applied onto a snapshot
yields "latest row per key, minus deletes" — ClickHouse ReplacingMergeTree /
CollapsingMergeTree semantics as one window + filter.

Batch and streaming share the same function: Structured Streaming's
foreachBatch applies each micro-batch with `apply_changelog`, keeping the
running state exact (idempotent per key — reprocessing a batch converges).

Scale notes: the merge shuffles once on the key; with the state stored as a
key-partitioned table (bucketed parquet / Delta), each micro-batch joins
co-located. Deletes are data, not DDL — they flow through the same window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

OP_COL = "op"
UPSERT = "upsert"
DELETE = "delete"


def latest_per_key(
    df: DataFrame, keys: list[str], order_by: list[Column]
) -> DataFrame:
    """One row per key: the last according to order_by (descending ordering
    must be encoded by the caller, e.g. [col('ts').desc(), col('seq').desc()]
    with a unique tiebreaker for determinism)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changelog(
    state: DataFrame,
    changelog: DataFrame,
    keys: list[str],
    version_cols: list[str],
    allow_schema_evolution: bool = False,
) -> DataFrame:
    """Merge a changelog batch into the current state.

    state: rows with an `op` column — live rows carry 'upsert', deleted keys
    persist as 'delete' TOMBSTONES. Tombstones must stay in state: dropping
    them eagerly lets an out-of-order older upsert (arriving in a later
    batch) resurrect a deleted key. Filter through `live_rows` only when
    reading the state out.

    changelog: same payload schema + `op`; version_cols (e.g. [ts, seq])
    decide recency. Returns the new state (with op), latest version per key.

    allow_schema_evolution: accept a changelog whose schema gained or lost
    columns relative to the state — missing columns null-fill on either side
    (the upstream-ALTER-TABLE case a long-running CDC pipeline must absorb).
    """
    if allow_schema_evolution:
        merged = state.unionByName(changelog, allowMissingColumns=True)
    else:
        merged = state.select(*changelog.columns).unionByName(changelog)
    order = [F.col(c).desc() for c in version_cols]
    return latest_per_key(merged, keys, order)


def as_state(snapshot: DataFrame) -> DataFrame:
    """Lift a plain snapshot (all rows live) into changelog-state form."""
    return snapshot.withColumn(OP_COL, F.lit(UPSERT))


def live_rows(state: DataFrame) -> DataFrame:
    """The user-visible face of the state: tombstones filtered out."""
    return state.filter(F.col(OP_COL) != DELETE).drop(OP_COL)
