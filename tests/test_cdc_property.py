"""Property-based CDC validation: apply_changelog under ARBITRARY batch
splits must equal a sequential single-threaded replay (a plain Python dict
simulator). This is the strongest evidence the tombstone-retaining merge is
correct — hypothesis explores op orders, duplicate versions, delete/revive
chains, and batch boundaries that hand-written cases miss."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mysql_to_clickhouse_sync_spark.streaming.cdc import (
    apply_changelog,
    as_state,
    live_rows,
)

LOG_SCHEMA = "k bigint, seq bigint, ts timestamp, v double, op string"
SCHEMA = "k bigint, seq bigint, ts timestamp, v double"


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 0, 0) + datetime.timedelta(
        minutes=minute
    )


# An op: (key 0-3, version 0-30, delete?) — seq doubles as the unique
# tiebreaker so the expected outcome is total-ordered.
ops_strategy = st.lists(
    st.tuples(
        st.integers(0, 3),
        st.integers(0, 30),
        st.booleans(),
    ),
    min_size=0,
    max_size=12,
)
splits_strategy = st.lists(st.integers(1, 4), min_size=1, max_size=3)


def simulate(ops: list[tuple[int, int, bool]]) -> dict[int, tuple]:
    """Sequential replay oracle: per key, the highest (ts, seq) wins; the
    key is live iff that winner is an upsert."""
    best: dict[int, tuple] = {}
    for seq, (k, minute, is_delete) in enumerate(ops):
        cur = best.get(k)
        cand = (minute, seq, is_delete)
        if cur is None or (cand[0], cand[1]) > (cur[0], cur[1]):
            best[k] = cand
    return {
        k: (minute, seq)
        for k, (minute, seq, is_delete) in best.items()
        if not is_delete
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(ops=ops_strategy, splits=splits_strategy)
def test_batched_apply_equals_sequential_replay(spark, ops, splits):
    rows = [
        (k, seq, _ts(minute), float(seq), "delete" if is_del else "upsert")
        for seq, (k, minute, is_del) in enumerate(ops)
    ]
    state = as_state(spark.createDataFrame([], SCHEMA))

    # Deal rows into batches round-robin-by-weight — arbitrary boundaries,
    # arbitrary intra-history order within the whole replay is preserved
    # only per batch, which is exactly the micro-batch contract.
    batches: list[list] = [[] for _ in splits]
    i = 0
    for row in rows:
        batches[i % len(batches)].append(row)
        i += 1

    for batch_rows in batches:
        batch = spark.createDataFrame(batch_rows, LOG_SCHEMA)
        state = apply_changelog(state, batch, ["k"], ["ts", "seq"])

    got = {
        r.k: (r.ts.minute + (r.ts.hour * 60), r.seq)
        for r in live_rows(state).collect()
    }
    want = simulate(ops)
    assert got == want
