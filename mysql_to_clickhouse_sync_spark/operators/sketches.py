"""Sketch aggregates — the 100 TB path for distinct counting (SURVEY.md
§2.3 extension; the reference has no aggregation at all).

q_distinct_count is the exact twin; this module adds the HyperLogLog
(Apache DataSketches) route: `hll_sketch_agg` builds per-partition sketches
that merge by register-max — commutative and associative, so the estimate
is deterministic regardless of partition order, and the shuffle carries
one ~4 KB sketch per group instead of every distinct value.

Oracle honesty: at the fixtures' cardinality (150 users, far below the
lgConfigK=12 sparse-mode bound of ~3k) the sketch stores the values
themselves and the estimate IS the exact count — hence the exact
COUNT(DISTINCT) oracle below is a true equality, not a tolerance check. At
production cardinalities the estimate diverges (±~1.6% at lgK=12) and this
query's oracle would be dropped; the plan shape is what carries over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.registry import declare


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
    """Distinct users per event type via an HLL sketch aggregate (exact in
    sparse mode at this cardinality — see module docstring). The sketch is
    built map-side per partition; only sketches shuffle."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("approx_users"),
        F.count("*").alias("n_events"),
    )
