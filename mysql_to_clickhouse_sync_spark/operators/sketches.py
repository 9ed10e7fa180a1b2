"""Sketch aggregates — the 100 TB path for distinct counting (SURVEY.md
§2.3 extension; the reference has no aggregation at all).

q_distinct_count is the exact twin; this module adds the HyperLogLog
(Apache DataSketches) route: `hll_sketch_agg` builds per-partition sketches
that merge by register-max — commutative and associative, so the estimate
is deterministic regardless of partition order, and the shuffle carries
one ~4 KB sketch per group instead of every distinct value.

Oracle strategy (same estimate-then-audit pattern as q_approx_percentile):
the raw estimate cannot hash-match across engines once the sketch leaves
sparse mode (measured at ~sf1: 15,002/14,987/15,008 vs 15,000 exact — the
sketch's CONTRACT, not a defect), but its ERROR ENVELOPE can. The query
computes the exact distinct count alongside the sketch and emits whether
the estimate sits within the published HLL bound (3·1.04/sqrt(2^lgK),
±1 row slack); the oracle asserts `true`. Hash-green at every SF, and an
estimate drifting outside its guarantee fails the gate. The in-query
exact audit is affordable at bench scale; at 100 TB the audit runs on a
sample while production reads only the sketch column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.registry import declare

HLL_LGK = 17  # sparse/coupon mode (exact) far beyond fixture cardinality
# Standard HLL relative-error constant 1.04/sqrt(m), taken at 3 sigma.
HLL_REL_BOUND = 3 * 1.04 / (2**HLL_LGK) ** 0.5


@declare(
    "q_approx_distinct",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users_exact,
           true AS approx_in_bounds
    FROM events
    GROUP BY event_type
    """,
    tier="P2",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via an HLL sketch aggregate, SELF-
    AUDITING: the sketch is built map-side per partition (only sketches
    shuffle), and the query verifies the estimate against the exact
    distinct count within the sketch's published error envelope, emitting
    a boolean the oracle asserts true. While the lgK=17 sketch stays in
    sparse mode (<= ~10^4 distinct) the estimate is exactly the count;
    in dense mode (~sf1 and beyond) it is a ±0.29%-sigma estimate — both
    regimes satisfy the audited bound, so this stays hash-green at every
    SF instead of carrying a documented boundary."""
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(HLL_LGK))
        ).alias("approx_users"),
        F.count("*").alias("n_events"),
        F.count_distinct("user_id").alias("n_users_exact"),
    )
    err = F.abs(
        F.col("approx_users").cast("double") - F.col("n_users_exact")
    )
    bound = F.greatest(
        F.lit(HLL_REL_BOUND) * F.col("n_users_exact"), F.lit(1.0)
    )
    return agg.select(
        "event_type",
        "n_events",
        "n_users_exact",
        (err <= bound).alias("approx_in_bounds"),
    )
