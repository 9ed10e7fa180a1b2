"""Analytic-function batteries (extensions — SURVEY.md §2.5/§2.3/§2.8).

Three declared queries that pin down the full ranking-window surface, the
GROUPING SETS aggregation shape rollup/cube cannot express, and the scalar
string/date function roster — each chosen so Spark and DuckDB agree
bitwise:

  * ranking windows order by (c_acctbal, c_custkey) — the unique tiebreak
    makes row_number/ntile/lag/lead deterministic; percent_rank/cume_dist
    are exact integer ratios, identical in binary double on both engines.
  * grouping sets use Spark 4's native DataFrame.groupingSets (disjoint
    sets (r_name), (n_name) — not expressible as rollup or cube).
  * scalar battery sticks to functions with identical cross-engine
    semantics (substr is 1-based in both; DuckDB concat() skips NULLs so
    the oracle uses ||, which propagates NULL like Spark's concat).

Scale notes: each window query shuffles once on its partition key and sorts
within partitions — state per key is bounded by partition size. Grouping
sets expand rows by the number of sets (2×) before the aggregation's
map-side combine; at 100 TB prefer restating hot sets as separate
aggregations over one wide expansion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.operators.aggregates import DECIMAL_SUM_SQL
from mysql_to_clickhouse_sync_spark.registry import declare


@declare(
    "q_window_ranks",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           row_number()   OVER w AS rn,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk,
           ntile(4)       OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cum_dist,
           lag(c_acctbal)  OVER w AS prev_bal,
           lead(c_acctbal) OVER w AS next_bal
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
    tier="P2",
)
def q_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ranking-window battery per nation: row_number, rank, dense_rank,
    ntile, percent_rank, cume_dist, lag, lead over one shared window (one
    hash-exchange on c_nationkey + one in-partition sort serves all eight
    functions)."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return customer.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
        F.lag("c_acctbal").over(w).alias("prev_bal"),
        F.lead("c_acctbal").over(w).alias("next_bal"),
    )


@declare(
    "q_grouping_sets",
    oracle=f"""
    SELECT r_name, n_name,
           GROUPING(r_name) AS g_region, GROUPING(n_name) AS g_nation,
           count(*) AS n_orders,
           {DECIMAL_SUM_SQL.format(col='o_totalprice')} AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name), (n_name))
    """,
    tier="P2",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjoint GROUPING SETS ((r_name), (n_name)) — two independent
    aggregations in one pass, with GROUPING() markers distinguishing the
    set each row came from (rollup/cube cannot express disjoint sets).
    Uses Spark 4's native DataFrame.groupingSets."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupingSets(
        [[F.col("r_name")], [F.col("n_name")]], F.col("r_name"), F.col("n_name")
    ).agg(
        F.grouping("r_name").cast("int").alias("g_region"),
        F.grouping("n_name").cast("int").alias("g_nation"),
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("decimal(18,2)")
        .cast("double")
        .alias("revenue"),
    )


@declare(
    "q_scalar_battery",
    oracle="""
    SELECT o_orderkey,
           upper(o_orderpriority)                    AS pri_upper,
           lower(o_orderstatus)                      AS status_lower,
           length(o_orderpriority)                   AS pri_len,
           substr(o_orderpriority, 1, 3)             AS pri_pfx,
           replace(o_orderpriority, '-', '_')        AS pri_us,
           lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS key_pad,
           o_orderstatus || ':' || o_orderpriority   AS status_pri,
           CAST(year(o_orderdate) AS INT)            AS yr,
           CAST(month(o_orderdate) AS INT)           AS mo,
           CAST(day(o_orderdate) AS INT)             AS dom,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           greatest(o_totalprice, 1000.0)            AS floor_price,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_decoded
    FROM orders
    WHERE o_orderkey <= 2000
    """,
    tier="P2",
)
def q_scalar_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function roster over one bounded scan: string case/length/
    substr/replace/pad/concat, date part extraction + truncation, greatest /
    coalesce / nullif. All JVM-side builtins inside one whole-stage-codegen
    span — the shape every row-level transform in the engine should take
    (reference equivalent: the per-row tuple formatting at
    mysql_to_clickhouse_sync.py:56-66, done there in Python per value)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return orders.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("pri_upper"),
        F.lower("o_orderstatus").alias("status_lower"),
        F.length("o_orderpriority").alias("pri_len"),
        F.substring("o_orderpriority", 1, 3).alias("pri_pfx"),
        F.replace(F.col("o_orderpriority"), F.lit("-"), F.lit("_")).alias("pri_us"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("key_pad"),
        F.concat(F.col("o_orderstatus"), F.lit(":"), F.col("o_orderpriority")).alias(
            "status_pri"
        ),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.greatest(F.col("o_totalprice"), F.lit(1000.0)).alias("floor_price"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_decoded"
        ),
    )


HOF_BOUND = 50


@declare(
    "q_hof_battery",
    oracle=f"""
    SELECT vec_id,
           -- Serialized, not a raw list: the driver canonicalizes through
           -- pandas, which cannot hash array cells. Fixed-scale DECIMAL
           -- formatting is engine-stable (both engines print all 6 digits),
           -- unlike shortest-round-trip double rendering.
           array_to_string(list_transform(embedding,
               x -> CAST(CAST(CAST(x AS DOUBLE) * 2.0 AS DECIMAL(18,6))
                         AS VARCHAR)), ',') AS scaled,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
           list_reduce(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               (a, b) -> a + b) AS sum_sq,
           len(list_filter(embedding, x -> x > 3.0)) > 0 AS any_big
    FROM embeddings
    WHERE vec_id < {HOF_BOUND}
    """,
    tier="P2",
)
def q_hof_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array function roster: transform / filter / aggregate /
    exists over the embedding column, all JVM-side lambdas (SURVEY.md §2.8;
    the dedup + similarity operators build on exactly these primitives).
    One-argument lambdas only — a 2-arg PySpark HOF lambda means
    (element, index). The fold in sum_sq is the same sequential left fold
    as similarity.dot, bitwise-equal to DuckDB's list_reduce."""
    from mysql_to_clickhouse_sync_spark.catalog import load_table as _lt

    emb = _lt(spark, sf_dir, "embeddings").filter(F.col("vec_id") < HOF_BOUND)
    x2 = lambda x: (  # noqa: E731
        (x.cast("double") * F.lit(2.0)).cast("decimal(18,6)").cast("string")
    )
    sq = lambda x: x.cast("double") * x.cast("double")  # noqa: E731
    return emb.select(
        "vec_id",
        F.concat_ws(",", F.transform("embedding", x2)).alias("scaled"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.aggregate(
            F.transform("embedding", sq), F.lit(0.0), lambda a, b: a + b
        ).alias("sum_sq"),
        (F.size(F.filter("embedding", lambda x: x > 3.0)) > 0).alias("any_big"),
    )


HH_NUM, HH_DEN = 6, 5  # heavy hitter: frequency > 1.2x the mean (exact ratio)


@declare(
    "q_heavy_hitters",
    oracle=f"""
    WITH counts AS (
        SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
    ), totals AS (
        SELECT count(*) AS n_keys, sum(n_events) AS total FROM counts
    )
    SELECT user_id, n_events,
           CAST(n_events AS DOUBLE) / total AS share
    FROM counts CROSS JOIN totals
    WHERE n_events * n_keys * {HH_DEN} > {HH_NUM} * total
    """,
    tier="P2",
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnosis: keys whose frequency exceeds 1.2x the mean — the
    detection pass that decides WHEN to reach for q_salted_agg /
    q_salted_join. The comparison n*k*5 > 6*total is pure integer
    arithmetic (no division, no float); share is a single double division
    of identical exact operands. Counts map-side combine; totals are a
    1-row broadcast."""
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id").agg(F.count("*").alias("n_events"))
    totals = counts.agg(
        F.count("*").alias("n_keys"), F.sum("n_events").alias("total")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .filter(
            F.col("n_events") * F.col("n_keys") * HH_DEN > HH_NUM * F.col("total")
        )
        .select(
            "user_id",
            "n_events",
            (F.col("n_events").cast("double") / F.col("total")).alias("share"),
        )
    )


@declare(
    "q_percentile_disc",
    oracle="""
    WITH ranked AS (
        SELECT event_type, value,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY value, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    )
    SELECT event_type,
           max(CASE WHEN rn = greatest(1, CAST(ceil(0.50 * n) AS BIGINT))
                    THEN value END) AS p50_disc,
           max(CASE WHEN rn = greatest(1, CAST(ceil(0.95 * n) AS BIGINT))
                    THEN value END) AS p95_disc
    FROM ranked
    GROUP BY event_type
    """,
    tier="P2",
)
def q_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete (type-1) percentiles — an ACTUAL data value, not an
    interpolation (q_median covers the continuous variant). Implemented
    relationally on both engines (rank = ceil(p*n), event_id tiebreak)
    because built-in percentile_disc tie rules differ across engines. One
    shuffle on event_type; the window and the aggregation share it."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wc = Window.partitionBy("event_type")
    ranked = events.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )

    def pick(p: float, alias: str):
        target = F.greatest(F.lit(1), F.ceil(F.lit(p) * F.col("n")).cast("long"))
        return F.max(
            F.when(F.col("rn") == target, F.col("value"))
        ).alias(alias)

    return ranked.groupBy("event_type").agg(
        pick(0.50, "p50_disc"), pick(0.95, "p95_disc")
    )
