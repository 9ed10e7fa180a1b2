"""Robust statistics and multi-criteria filtering (north-star extensions —
SURVEY.md §2.3; the data-quality layer a 100 TB sync lands into).

  * q_anomaly_mad — median-absolute-deviation outliers per event type: the
    robust twin of q_zscore_outliers (a single corrupt batch shifts a mean
    but not a median, so MAD flags survive exactly the dirty data a CDC
    pipeline ingests).
  * q_skyline — 2-D Pareto frontier (skyline operator): customers not
    dominated on (account balance, order count). Spark has no skyline
    operator; the quadratic NOT-EXISTS definition (the oracle) collapses
    to a linear windowed running-max over distinct balance levels.

Exactness: all comparisons run on integers-in-doubles — cents doubled so
every median/interpolated midpoint is integer-valued, hence exactly
representable; Spark percentile and DuckDB quantile_cont both average the
two middle values (verified for q_median) and agree bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.registry import declare

MAD_K = 3  # |dev| > K * MAD flags an outlier (the classic 3-MAD fence)


@declare(
    "q_anomaly_mad",
    oracle=f"""
    WITH cents AS (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS c
        FROM events
    ), med AS (
        SELECT event_type, median(2 * c) AS med2 FROM cents GROUP BY event_type
    ), dev AS (
        SELECT cents.event_type, c, abs(2 * c - med2) AS dev2
        FROM cents JOIN med USING (event_type)
    ), mad AS (
        SELECT event_type, median(dev2) AS mad2 FROM dev GROUP BY event_type
    )
    SELECT dev.event_type,
           count(*) AS n_events,
           CAST(sum(CASE WHEN dev2 > {MAD_K} * mad2 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_outliers,
           CAST(sum(CASE WHEN dev2 > {MAD_K} * mad2 THEN c ELSE 0 END)
               AS BIGINT) AS outlier_cents
    FROM dev JOIN mad USING (event_type)
    GROUP BY dev.event_type
    """,
    tier="P2",
)
def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAD outlier fence per event type: dev = |x - median|, flag when
    dev > 3 * median(dev). Everything is computed on 2x-cents so both
    medians land on integers (the even-count midpoint average of integers
    is at worst a half, and doubling clears it) — exact in doubles on both
    engines. Plan: two grouped exact-percentile passes with the tiny
    per-type results BROADCAST back over the stream (5 keys — a window
    would funnel the table into 5 tasks). Exact percentile holds each
    group's values; at 100 TB swap approx_percentile into the same shape."""
    events = load_table(spark, sf_dir, "events")
    c = (F.col("value").cast("decimal(10,2)") * 100).cast("bigint")
    cents = events.select("event_type", c.alias("c"))
    med = cents.groupBy(F.col("event_type").alias("m_type")).agg(
        F.expr("percentile(2 * c, 0.5)").alias("med2")
    )
    dev = cents.join(
        F.broadcast(med), F.col("event_type") == F.col("m_type")
    ).select("event_type", "c", F.abs(2 * F.col("c") - F.col("med2")).alias("dev2"))
    mad = dev.groupBy(F.col("event_type").alias("d_type")).agg(
        F.expr("percentile(dev2, 0.5)").alias("mad2")
    )
    flagged = dev.join(F.broadcast(mad), F.col("event_type") == F.col("d_type"))
    is_out = F.col("dev2") > MAD_K * F.col("mad2")
    return flagged.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(is_out.cast("bigint")).alias("n_outliers"),
        F.sum(F.when(is_out, F.col("c")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("outlier_cents"),
    )


def skyline_2d(pts: DataFrame, x: str, y: str) -> DataFrame:
    """Maximization skyline on integer axes (x, y): keep rows not dominated
    (another row >= on both, > on one). Linear composition: max(y) per
    distinct x level, one running max over levels sorted by x descending
    (strictly-richer best), broadcast back; dominated iff that running max
    reaches the row's y, or an equal-x peer strictly beats it."""
    levels = pts.groupBy(F.col(x).alias("l_x")).agg(F.max(y).alias("lvl_max"))
    w = (
        Window.orderBy(F.col("l_x").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    levels = levels.withColumn("gt_max", F.max("lvl_max").over(w))
    joined = pts.join(F.broadcast(levels), F.col(x) == F.col("l_x"))
    dominated = (
        F.coalesce(F.col("gt_max") >= F.col(y), F.lit(False))
    ) | (F.col("lvl_max") > F.col(y))
    return joined.filter(~dominated).drop("l_x", "lvl_max", "gt_max")



@declare(
    "q_skyline",
    oracle="""
    WITH pts AS (
        SELECT c_custkey,
               CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS bal_c,
               CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders
        FROM customer
        LEFT JOIN (
            SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
        ) o ON c_custkey = o_custkey
    )
    SELECT c_custkey, bal_c, n_orders
    FROM pts p
    WHERE NOT EXISTS (
        SELECT 1 FROM pts q
        WHERE q.bal_c >= p.bal_c AND q.n_orders >= p.n_orders
          AND (q.bal_c > p.bal_c OR q.n_orders > p.n_orders)
    )
    """,
    tier="P2",
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto frontier on (balance, order count): a customer
    survives iff no other is >= on both axes and > on one. The oracle
    states the O(n^2) NOT EXISTS definition; the plan is linear — per
    distinct balance level take max(n_orders), then one running max over
    levels sorted by balance descending gives the best order count among
    all STRICTLY richer customers; a row is dominated iff that running max
    reaches its n_orders, or an equal-balance peer strictly beats it.
    The level table (distinct balances) is a small aggregate: its
    single-partition window sorts |levels| rows, not |customers|, and
    broadcasts back — the same per-key-stats-broadcast shape as
    q_zscore_outliers, so the fact side never reshuffles."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(F.count("*").alias("o_cnt"))
    pts = customer.join(
        per_cust, customer.c_custkey == per_cust.o_custkey, "left"
    ).select(
        "c_custkey",
        (F.col("c_acctbal").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("bal_c"),
        F.coalesce(F.col("o_cnt"), F.lit(0)).cast("bigint").alias("n_orders"),
    )
    return skyline_2d(pts, "bal_c", "n_orders").select(
        "c_custkey", "bal_c", "n_orders"
    )
