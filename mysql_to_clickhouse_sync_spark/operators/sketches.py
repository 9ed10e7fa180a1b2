"""Sketch aggregates — the 100 TB path for distinct counting (SURVEY.md
§2.3 extension; the reference has no aggregation at all).

q_distinct_count is the exact twin; this module adds the HyperLogLog
(Apache DataSketches) route: `hll_sketch_agg` builds per-partition sketches
that merge by register-max — commutative and associative, so the estimate
is deterministic regardless of partition order, and the shuffle carries
one ~4 KB sketch per group instead of every distinct value.

Oracle honesty: while the sketch stays in sparse/coupon mode it stores
hashed values exactly and the estimate IS the exact count — hence the
exact COUNT(DISTINCT) oracle below is a true equality, not a tolerance
check. lgConfigK=17 keeps that true far past the fixtures' cardinality
(verified exact at 150 and 1,500 distinct users, sf0.01/sf0.1; the
DEFAULT lgK=12 already left sparse mode at 1,500 and under-counted by
~0.6%). At production cardinalities the estimate diverges and the oracle
would be dropped; the plan shape — map-side sketches, register-max merge,
one ~2^lgK-byte sketch per group on the shuffle — is what carries over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.registry import declare

HLL_LGK = 17  # sparse/coupon mode (exact) far beyond fixture cardinality


@declare(
    "q_approx_distinct",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS approx_users,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
    tier="P2",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via an HLL sketch aggregate. The
    sketch is built map-side per partition; only sketches shuffle.

    Oracle-exactness boundary (measured): the sketch stays in sparse mode
    — hence exact and oracle-matchable — at the driver fixtures'
    cardinalities (<= 1,500 users at sf0.1). At ~sf1 (15,000 users) it
    crosses into dense estimation and returns ±0.1%-ish estimates (15002
    / 14987 / 15008 vs 15000 exact), which is its CONTRACT at 100 TB, not
    a defect; the exact twin is q_distinct_count. Same labeled-boundary
    treatment as q_ngram_jaccard."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(HLL_LGK))).alias(
            "approx_users"
        ),
        F.count("*").alias("n_events"),
    )
