"""Accuracy bounds for the approximate scale-path operators that can't be
oracle-hashed (sketches are approximate by construction)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.registry import queries
from tests.conftest import SF_DIR


def test_approx_percentile_rank_bounds(spark):
    # approx_percentile returns an actual sample whose empirical rank must
    # sit within the sketch's rank-error envelope of the target quantile
    # (the exact q_median interpolates BETWEEN samples, so value-distance
    # is the wrong metric — rank is the contract).
    from pyspark.sql import functions as F

    from mysql_to_clickhouse_sync_spark.operators.aggregates import (
        APPROX_PCT_ACCURACY,
    )

    # the declared query now emits the AUDIT booleans (hash-checkable);
    # recompute the raw estimates here with the same sketch parameters to
    # keep the value-level rank assertion
    qs = queries()
    audited = qs["q_approx_percentile"](spark, SF_DIR).collect()
    assert audited and all(
        r.median_in_bounds and r.p90_in_bounds for r in audited
    )
    approx = {
        r.event_type: (r.median_approx, r.p90_approx)
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(
            F.expr(
                f"approx_percentile(value, 0.5, {APPROX_PCT_ACCURACY})"
            ).alias("median_approx"),
            F.expr(
                f"approx_percentile(value, 0.9, {APPROX_PCT_ACCURACY})"
            ).alias("p90_approx"),
        )
        .collect()
    }
    vals = defaultdict(list)
    for r in (
        load_table(spark, SF_DIR, "events").select("event_type", "value").collect()
    ):
        vals[r.event_type].append(r.value)
    assert set(vals) == set(approx)
    for et, (am, ap90) in approx.items():
        v = sorted(vals[et])
        n = len(v)
        rank_m = sum(1 for x in v if x <= am) / n
        rank_p90 = sum(1 for x in v if x <= ap90) / n
        assert 0.45 <= rank_m <= 0.55, (et, rank_m)
        assert 0.85 <= rank_p90 <= 0.95, (et, rank_p90)
        assert am in v and ap90 in v  # sketch outputs are real samples


def test_countmin_never_underestimates_and_probes_exact(spark):
    from mysql_to_clickhouse_sync_spark.registry import (
        REGISTRY,
        _load_all_modules,
    )
    from tests.conftest import SF_DIR

    _load_all_modules()
    rows = REGISTRY["q_countmin_heavy"].fn(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        # the one-sided CMS guarantee
        assert r.est_tf >= r.exact_tf, r.token
        assert r.overcount == r.est_tf - r.exact_tf
    # with 1024 counters over a tiny fixture vocab, most heavy hitters
    # should probe nearly exactly
    tight = sum(1 for r in rows if r.overcount * 10 <= r.exact_tf)
    assert tight >= len(rows) // 2
