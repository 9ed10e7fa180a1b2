"""CDC-apply golden tests (SURVEY.md §5.2): insert/update/delete replay onto
a base snapshot must yield latest-per-key minus deletes, independent of the
order batches arrive in. Deletes persist in state as tombstones — dropping
them eagerly would let an out-of-order older upsert resurrect a deleted key
(a real bug caught by the streaming equivalence test)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.streaming.cdc import (
    apply_changelog,
    as_state,
    latest_per_key,
    live_rows,
)


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 0, minute)


SCHEMA = "user_id bigint, event_id bigint, ts timestamp, value double"
LOG_SCHEMA = SCHEMA + ", op string"
KEYS, VER = ["user_id"], ["ts", "event_id"]


def test_apply_insert_update_delete(spark):
    state = as_state(
        spark.createDataFrame(
            [(1, 10, _ts(0), 1.0), (2, 20, _ts(0), 2.0), (3, 30, _ts(0), 3.0)],
            SCHEMA,
        )
    )
    changelog = spark.createDataFrame(
        [
            (1, 11, _ts(5), 1.5, "upsert"),   # update user 1
            (4, 40, _ts(6), 4.0, "upsert"),   # insert user 4
            (2, 21, _ts(7), 0.0, "delete"),   # delete user 2
        ],
        LOG_SCHEMA,
    )
    out = live_rows(apply_changelog(state, changelog, KEYS, VER))
    rows = {r.user_id: (r.event_id, r.value) for r in out.collect()}
    assert rows == {1: (11, 1.5), 3: (30, 3.0), 4: (40, 4.0)}


def test_delete_then_reinsert_and_stale_update(spark):
    state = as_state(spark.createDataFrame([(1, 10, _ts(0), 1.0)], SCHEMA))
    batch1 = spark.createDataFrame(
        [(1, 11, _ts(5), 0.0, "delete")], LOG_SCHEMA
    )
    batch2 = spark.createDataFrame(
        [
            (1, 12, _ts(9), 9.0, "upsert"),  # re-insert after delete
            (1, 9, _ts(1), 0.5, "upsert"),   # stale update — must lose
        ],
        LOG_SCHEMA,
    )
    s1 = apply_changelog(state, batch1, KEYS, VER)
    assert live_rows(s1).count() == 0
    s2 = apply_changelog(s1, batch2, KEYS, VER)
    rows = live_rows(s2).collect()
    assert len(rows) == 1 and rows[0].event_id == 12


def test_tombstone_survives_out_of_order_upsert(spark):
    """THE tombstone case: a delete arrives, then an OLDER upsert arrives in
    a later batch. The key must stay deleted."""
    state = as_state(spark.createDataFrame([(1, 10, _ts(0), 1.0)], SCHEMA))
    delete_batch = spark.createDataFrame(
        [(1, 20, _ts(8), 0.0, "delete")], LOG_SCHEMA
    )
    stale_upsert_batch = spark.createDataFrame(
        [(1, 15, _ts(4), 5.0, "upsert")], LOG_SCHEMA
    )
    s = apply_changelog(state, delete_batch, KEYS, VER)
    s = apply_changelog(s, stale_upsert_batch, KEYS, VER)
    assert live_rows(s).count() == 0


def test_out_of_order_batches_converge(spark):
    """Applying batches in either order yields the same final state —
    the property that lets s_cdc_apply slice its changelog arbitrarily."""
    state = as_state(spark.createDataFrame([(1, 10, _ts(0), 1.0)], SCHEMA))
    b1 = spark.createDataFrame([(1, 12, _ts(9), 9.0, "upsert")], LOG_SCHEMA)
    b2 = spark.createDataFrame([(1, 11, _ts(5), 5.0, "upsert")], LOG_SCHEMA)
    fwd = live_rows(
        apply_changelog(apply_changelog(state, b1, KEYS, VER), b2, KEYS, VER)
    )
    rev = live_rows(
        apply_changelog(apply_changelog(state, b2, KEYS, VER), b1, KEYS, VER)
    )
    assert fwd.collect() == rev.collect()
    assert fwd.collect()[0].event_id == 12


def test_latest_per_key_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, 10, _ts(5), 1.0), (1, 11, _ts(5), 2.0)], SCHEMA
    )
    out = latest_per_key(
        df, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]
    ).collect()
    assert len(out) == 1 and out[0].event_id == 11
