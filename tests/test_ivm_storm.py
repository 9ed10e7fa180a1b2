"""Minimum-delete STORM stress for the k-deep candidate maintenance:
an adversarial changelog that deletes every group's current minimum
each wave forces the 1-deep law (q_mv_delta's d_min <= b_min) to
recompute EVERY group EVERY wave, while the k-deep candidate law
recomputes nothing until a group has lost all k candidates — recompute
work collapses from O(waves x groups) to zero inside the candidate
window, and the promoted candidate min stays exactly right."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.operators.ivm import (
    candidate_decision,
)

G = 20  # groups
M = 50  # rows per group
K = 8


def _base(spark):
    rows = [
        (g * 1000 + i, f"g{g}", float(g * 1000 + i))
        for g in range(G)
        for i in range(M)
    ]
    return spark.createDataFrame(
        rows, "event_id bigint, event_type string, value double"
    )


def test_storm_within_candidate_window_never_recomputes(spark):
    base = _base(spark)
    # the storm: waves 1..K-1 delete each group's i-th smallest row —
    # cumulative deletes always hit the CURRENT minimum of every group
    for wave in range(1, K):
        dels = spark.createDataFrame(
            [
                (g * 1000 + i, f"g{g}", float(g * 1000 + i))
                for g in range(G)
                for i in range(wave)
            ],
            "event_id bigint, event_type string, value double",
        )
        dec = candidate_decision(base, dels, K).collect()
        assert len(dec) == G
        # 1-deep law would flag ALL groups (the deleted set contains
        # every group's minimum); k-deep flags NONE
        assert all(not r["recomputed"] for r in dec), wave
        # and the promoted candidate min is the true survivors' min
        for r in dec:
            g = int(r["event_type"][1:])
            assert r["cand_min"] == float(g * 1000 + wave)


def test_storm_exhausting_candidates_triggers_recompute(spark):
    base = _base(spark)
    dels = spark.createDataFrame(
        [
            (g * 1000 + i, f"g{g}", float(g * 1000 + i))
            for g in range(G)
            for i in range(K)  # ALL K candidates die
        ],
        "event_id bigint, event_type string, value double",
    )
    dec = candidate_decision(base, dels, K).collect()
    assert all(r["recomputed"] for r in dec)
    assert all(r["cand_min"] is None for r in dec)


def test_mixed_storm_recomputes_only_exhausted_groups(spark):
    base = _base(spark)
    # half the groups lose all K candidates, half lose K-1
    dels = spark.createDataFrame(
        [
            (g * 1000 + i, f"g{g}", float(g * 1000 + i))
            for g in range(G)
            for i in range(K if g % 2 == 0 else K - 1)
        ],
        "event_id bigint, event_type string, value double",
    )
    dec = {r["event_type"]: r for r in candidate_decision(base, dels, K).collect()}
    recomputed = {t for t, r in dec.items() if r["recomputed"]}
    assert recomputed == {f"g{g}" for g in range(G) if g % 2 == 0}
    # recompute work is HALF the groups, not all of them — and the
    # surviving half promotes its last candidate correctly
    for g in range(1, G, 2):
        assert dec[f"g{g}"]["cand_min"] == float(g * 1000 + K - 1)
