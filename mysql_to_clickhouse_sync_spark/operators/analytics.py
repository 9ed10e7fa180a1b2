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
