"""Aggregation operators.

Reference-derived (P0):
  * bounds: ``SELECT IFNULL(MIN(_rowid),0), IFNULL(MAX(_rowid),0)`` per table
    (mysql_to_clickhouse_sync.py:163); ``(0,0)`` doubles as the "no PK"
    sentinel (pagination.py:202-211); ``min==max AND min!=0`` is the
    single-row fast path (pagination.py:119).
  * chunk plan: ``range(min, max, batch)`` assigns key k to chunk
    floor((k-min)/batch) (mysql_to_clickhouse_sync.py:109-112).
  * insert batch stats: 1000-row VALUES batches (S:236, :76) — the checkable
    arithmetic is ceil(n/batch) batches and the last-batch remainder.

Extensions (P1/P2, absent in the reference — SURVEY.md §2.3):
  * q_distinct_count — exact distinct aggregation.
  * q_topk_value — group-aggregate top-k with a total order.
  * q_agg_rollup — hierarchical ROLLUP over the star-schema join.
  * q_set_ops — UNION / EXCEPT ALL.

Scale notes: bounds and chunk-plan are single-pass partial aggregations
(map-side combine; no wide shuffle beyond the tiny per-group state). The
rollup joins broadcast every dimension side (region/nation/customer are dims)
so only `orders` streams; AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.registry import declare

CHUNK_BATCH = 1000  # reference --batch_size default (S:236)


def bounds_with_default(df: DataFrame, key: str, label: str) -> DataFrame:
    """IFNULL(MIN,0)/IFNULL(MAX,0) bounds + single-row flag (S:163, P:119)."""
    return df.agg(
        F.lit(label).alias("table_name"),
        F.coalesce(F.min(key), F.lit(0)).cast("bigint").alias("min_id"),
        F.coalesce(F.max(key), F.lit(0)).cast("bigint").alias("max_id"),
    ).withColumn(
        "single_row",
        (F.col("min_id") == F.col("max_id")) & (F.col("min_id") != F.lit(0)),
    )


_BOUNDS_ORACLE_ONE = """
    SELECT '{label}' AS table_name,
           CAST(coalesce(min({key}), 0) AS BIGINT) AS min_id,
           CAST(coalesce(max({key}), 0) AS BIGINT) AS max_id,
           (coalesce(min({key}), 0) = coalesce(max({key}), 0)
            AND coalesce(min({key}), 0) <> 0) AS single_row
    FROM {src}
"""


@declare(
    "q_bounds",
    oracle=" UNION ALL ".join(
        [
            _BOUNDS_ORACLE_ONE.format(label="orders", key="o_orderkey", src="orders"),
            _BOUNDS_ORACLE_ONE.format(label="events", key="event_id", src="events"),
            _BOUNDS_ORACLE_ONE.format(
                label="orders_empty",
                key="o_orderkey",
                src="(SELECT * FROM orders WHERE o_orderkey < 0)",
            ),
        ]
    ),
    tier="P0",
)
def q_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table key bounds incl. the empty-table (0,0) sentinel path."""
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    return (
        bounds_with_default(orders, "o_orderkey", "orders")
        .unionAll(bounds_with_default(events, "event_id", "events"))
        .unionAll(
            bounds_with_default(
                orders.filter(F.col("o_orderkey") < 0), "o_orderkey", "orders_empty"
            )
        )
    )


@declare(
    "q_chunk_plan",
    oracle=f"""
    SELECT CAST(floor((l_orderkey - (SELECT min(l_orderkey) FROM lineitem))
                      / {CHUNK_BATCH}) AS BIGINT) AS chunk_id,
           count(*) AS n_rows,
           min(l_orderkey) AS chunk_min,
           max(l_orderkey) AS chunk_max
    FROM lineitem
    GROUP BY chunk_id
    """,
    tier="P0",
)
def q_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's chunk planner (S:109-112) as a declarative plan: every
    key lands in chunk floor((k-min)/batch); per-chunk stats replace the
    gap-blind ``max-min+1`` row estimate (S:102) with real counts."""
    li = load_table(spark, sf_dir, "lineitem")
    mn = li.agg(F.min("l_orderkey").alias("_mn"))
    return (
        li.join(F.broadcast(mn))  # 1-row bounds, broadcast like the planner's stats
        .withColumn(
            "chunk_id",
            F.floor((F.col("l_orderkey") - F.col("_mn")) / F.lit(CHUNK_BATCH)),
        )
        .groupBy("chunk_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_orderkey").alias("chunk_min"),
            F.max("l_orderkey").alias("chunk_max"),
        )
    )


@declare(
    "q_insert_batch_stats",
    oracle=f"""
    SELECT o_orderstatus,
           count(*) AS n_rows,
           CAST(ceil(count(*) / {CHUNK_BATCH}.0) AS BIGINT) AS n_batches,
           count(*) - (CAST(ceil(count(*) / {CHUNK_BATCH}.0) AS BIGINT) - 1)
               * {CHUNK_BATCH} AS last_batch_rows
    FROM orders
    GROUP BY o_orderstatus
    """,
    tier="P0",
)
def q_insert_batch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched-insert arithmetic (S:76, S:236): how many 1000-row VALUES
    batches each group produces, and the remainder batch size. The empty-batch
    guard (S:98) is implicit — groups only exist with n_rows > 0."""
    orders = load_table(spark, sf_dir, "orders")
    grouped = orders.groupBy("o_orderstatus").agg(F.count("*").alias("n_rows"))
    n_batches = F.ceil(F.col("n_rows") / F.lit(float(CHUNK_BATCH)))
    return grouped.select(
        "o_orderstatus",
        "n_rows",
        n_batches.alias("n_batches"),
        (F.col("n_rows") - (n_batches - F.lit(1)) * F.lit(CHUNK_BATCH)).alias(
            "last_batch_rows"
        ),
    )


@declare(
    "q_distinct_count",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
    tier="P1",
)
def q_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (extension; SURVEY.md §2.3). Expands to a
    two-stage partial/final plan under Catalyst; for 100 TB cardinality
    estimation use approx_count_distinct (not declared — not hash-matchable
    by construction)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


def decimal_sum(col: str, alias: str) -> Column:
    """Exact, partition-order-independent sum of a double column: cast to
    decimal first (decimal addition is associative; float addition is not),
    so Spark and DuckDB agree bit-for-bit regardless of parallelism.

    The FINAL cast to double is for the driver's pandas canonicalization:
    DuckDB DECIMAL maps to float64 there while Spark DECIMAL stays a
    Decimal object, and the two render differently whenever the value has
    a trailing zero ('1234.50' vs '1234.5'). Casting the already-rounded
    2-dp result to double on BOTH sides makes the rendering identical —
    the internal arithmetic stays decimal-exact, and distinct 2-dp values
    below 10^13 stay distinct as doubles (ulp < 0.002), so no information
    is lost at the output boundary."""
    return (
        F.sum(F.col(col).cast("decimal(18,6)"))
        .cast("decimal(18,2)")
        .cast("double")
        .alias(alias)
    )


DECIMAL_SUM_SQL = (
    "CAST(CAST(sum(CAST({col} AS DECIMAL(18,6))) AS DECIMAL(18,2)) AS DOUBLE)"
)


@declare(
    "q_topk_value",
    oracle=f"""
    SELECT user_id,
           {DECIMAL_SUM_SQL.format(col='value')} AS sum_value
    FROM events
    GROUP BY user_id
    ORDER BY sum_value DESC, user_id ASC
    LIMIT 10
    """,
    tier="P1",
)
def q_topk_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users by total value — group-agg + total-order limit (unique
    tiebreak on user_id for hash stability). Catalyst executes the limit as
    per-partition top-k + single-partition merge (TakeOrderedAndProject), so
    no global sort materializes at scale."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(decimal_sum("value", "sum_value"))
        .orderBy(F.col("sum_value").desc(), F.col("user_id").asc())
        .limit(10)
    )


_ROLLUP_JOIN_SQL = """
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
"""


@declare(
    "q_agg_rollup",
    oracle=f"""
    SELECT coalesce(r_name, 'ALL') AS region_name,
           coalesce(n_name, 'ALL') AS nation_name,
           count(*) AS n_orders,
           {DECIMAL_SUM_SQL.format(col='o_totalprice')} AS revenue
    {_ROLLUP_JOIN_SQL}
    GROUP BY ROLLUP (r_name, n_name)
    """,
    tier="P2",
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical revenue rollup region -> nation -> grand total over the
    star join (extension; SURVEY.md §2.3). Dimensions are broadcast so the
    only shuffle is the rollup's own aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        orders.join(
            F.broadcast(customer), orders.o_custkey == customer.c_custkey
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_orders"),
            decimal_sum("o_totalprice", "revenue"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region_name"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation_name"),
            "n_orders",
            "revenue",
        )
    )


@declare(
    "q_median",
    oracle="""
    SELECT event_type,
           median(value) AS median_value,
           quantile_cont(value, 0.9) AS p90_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    GROUP BY event_type
    """,
    tier="P2",
)
def q_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantiles per group (extension): Spark percentile == DuckDB
    quantile_cont — both sort and linearly interpolate, bitwise-identical on
    identical doubles (verified empirically before declaring). At 100 TB use
    approx_percentile instead — exact percentile holds the group's values;
    declared here because only the exact form is oracle-matchable."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("median_value"),
        F.expr("percentile(value, 0.9)").alias("p90_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


_PIVOT_TYPES = ("click", "view", "purchase", "signup", "error")


def _pivot_oracle() -> str:
    cols = []
    for t in _PIVOT_TYPES:
        cols.append(f"count(*) FILTER (WHERE event_type = '{t}') AS n_{t}")
        cols.append(
            f"CAST(CAST(sum(CAST(value AS DECIMAL(18,6)))"
            f" FILTER (WHERE event_type = '{t}') AS DECIMAL(18,2))"
            f" AS DOUBLE) AS sum_{t}"
        )
    return (
        "SELECT user_id, " + ", ".join(cols) + " FROM events GROUP BY user_id"
    )


@declare("q_pivot", oracle=_pivot_oracle(), tier="P2")
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot events wide: one column pair (count, decimal sum) per event
    type, per user. Expressed as conditional aggregation — identical
    semantics to df.groupBy().pivot() but with a statically-known column set
    (pivot's value-discovery pass is a full extra scan at 100 TB)."""
    events = load_table(spark, sf_dir, "events")
    aggs = []
    for t in _PIVOT_TYPES:
        cond = F.col("event_type") == t
        aggs.append(F.count(F.when(cond, 1)).alias(f"n_{t}"))
        aggs.append(
            F.sum(F.when(cond, F.col("value").cast("decimal(18,6)")))
            .cast("decimal(18,2)")
            .cast("double")
            .alias(f"sum_{t}")
        )
    return events.groupBy("user_id").agg(*aggs)


@declare(
    "q_part_stats",
    oracle="""
    SELECT p_brand,
           count(*) AS n_parts,
           count(DISTINCT p_type) AS n_types,
           CAST(CAST(min(p_retailprice) AS DECIMAL(18,2)) AS DOUBLE) AS min_price,
           CAST(CAST(max(p_retailprice) AS DECIMAL(18,2)) AS DOUBLE) AS max_price,
           CAST(CAST(sum(CAST(p_retailprice AS DECIMAL(18,6))) AS DECIMAL(18,2))
               AS DOUBLE) AS total_price,
           max(p_size) AS max_size
    FROM part
    GROUP BY p_brand
    """,
    tier="P2",
)
def q_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand part statistics — covers the part table (decimal-scale
    price handling the reference preserves via its trailing-zeros setting,
    mysql_to_clickhouse_sync.py:77-83) plus a distinct-count."""
    part = load_table(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.count("*").alias("n_parts"),
        F.count_distinct("p_type").alias("n_types"),
        F.min("p_retailprice").cast("decimal(18,2)").cast("double").alias("min_price"),
        F.max("p_retailprice").cast("decimal(18,2)").cast("double").alias("max_price"),
        decimal_sum("p_retailprice", "total_price"),
        F.max("p_size").alias("max_size"),
    )


@declare(
    "q_string_agg",
    oracle="""
    SELECT n_nationkey, n_name,
           string_agg(c_name, ',' ORDER BY c_name) AS customers,
           count(*) AS n_customers
    FROM nation JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_nationkey, n_name
    """,
    tier="P2",
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (extension): customers per nation as a
    sorted CSV — collect_list + array_sort + concat_ws ≡ DuckDB's ordered
    string_agg. Deterministic because the order inside the aggregate is
    total (c_name values are unique)."""
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .groupBy("n_nationkey", "n_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("c_name"))).alias(
                "customers"
            ),
            F.count("*").alias("n_customers"),
        )
    )


HIST_BIN_WIDTH = 25


@declare(
    "q_histogram",
    oracle=f"""
    SELECT event_type,
           CAST(floor(value / {HIST_BIN_WIDTH}) AS BIGINT) AS bin,
           count(*) AS n,
           min(value) AS bin_min,
           max(value) AS bin_max
    FROM events
    GROUP BY event_type, bin
    """,
    tier="P2",
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram per event type (extension): pure groupBy on the
    bin id — one shuffle keyed by (type, bin), the scalable histogram shape
    (width_bucket-style binning without a per-query min/max pass)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(
        "event_type",
        F.floor(F.col("value") / HIST_BIN_WIDTH).alias("bin"),
    ).agg(
        F.count("*").alias("n"),
        F.min("value").alias("bin_min"),
        F.max("value").alias("bin_max"),
    )


@declare(
    "q_cube",
    oracle="""
    SELECT coalesce(lang, 'ALL') AS lang_name,
           coalesce(source, 'ALL') AS source_name,
           count(*) AS n_docs,
           -- CAST: DuckDB sum(BIGINT) is HUGEINT → pandas float64; Spark
           -- stays int64 (dtype-sensitive driver canonicalization).
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY CUBE (lang, source)
    """,
    tier="P2",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (lang, source) — all 4 grouping combinations in one pass
    (extension; completes the rollup/cube family of SURVEY.md §2.3)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.cube("lang", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .select(
            F.coalesce(F.col("lang"), F.lit("ALL")).alias("lang_name"),
            F.coalesce(F.col("source"), F.lit("ALL")).alias("source_name"),
            "n_docs",
            "total_chars",
        )
    )


@declare(
    "q_set_ops",
    oracle="""
    SELECT 'union_distinct' AS kind, nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    )
    UNION ALL
    SELECT 'except_all' AS kind, nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT ALL
        SELECT s_nationkey AS nationkey FROM supplier
    )
    """,
    tier="P2",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (extension; SURVEY.md §2.7): distinct union and bag
    difference of customer vs supplier nation keys, tagged into one result."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    union_d = (
        cust.union(supp).distinct().select(F.lit("union_distinct").alias("kind"), "nationkey")
    )
    except_a = cust.exceptAll(supp).select(
        F.lit("except_all").alias("kind"), "nationkey"
    )
    return union_d.unionAll(except_a)


APPROX_PCT_ACCURACY = 10000  # QuantileSummaries rank error <= 1/accuracy


@declare(
    "q_approx_percentile",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           true AS median_in_bounds,
           true AS p90_in_bounds
    FROM events
    GROUP BY event_type
    """,
    tier="P2",
)
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE scale path for quantiles, SELF-AUDITING so it carries a full
    oracle despite the sketch being approximate: the raw estimates can't
    hash-match across engines, but their RANK-ERROR CONTRACT can. The
    query computes approx_percentile(0.5/0.9), joins the (broadcast,
    one-row-per-group) estimates back over events, counts each estimate's
    exact rank interval [n_lt+1, n_le], and emits whether that interval
    touches the guaranteed window (q ± 1/accuracy)·n (±1 row slack). The
    oracle asserts `true` — any estimate outside its published bound
    hash-fails the driver's check. (tests/test_approx_sketches.py keeps
    the value-level error bounds against q_median's exact answers.)

    Scale: approx_percentile keeps a bounded QuantileSummaries sketch per
    group, merged map-side — one shuffle of sketches, constant memory per
    group, where exact percentiles must hold each group's values. The
    audit adds one more scan of events plus a broadcast join on the tiny
    estimates table — the standard estimate-then-audit shape."""
    eps = 1.0 / APPROX_PCT_ACCURACY
    events = load_table(spark, sf_dir, "events")
    est = events.groupBy("event_type").agg(
        F.expr(
            f"approx_percentile(value, 0.5, {APPROX_PCT_ACCURACY})"
        ).alias("median_approx"),
        F.expr(
            f"approx_percentile(value, 0.9, {APPROX_PCT_ACCURACY})"
        ).alias("p90_approx"),
        F.count("*").alias("n_events"),
    )
    joined = events.select("event_type", "value").join(
        F.broadcast(est), "event_type"
    )
    audited = joined.groupBy("event_type").agg(
        F.first("n_events").alias("n_events"),
        F.count("value").alias("n_vals"),
        F.sum((F.col("value") < F.col("median_approx")).cast("bigint")).alias(
            "n_lt_m"
        ),
        F.sum((F.col("value") <= F.col("median_approx")).cast("bigint")).alias(
            "n_le_m"
        ),
        F.sum((F.col("value") < F.col("p90_approx")).cast("bigint")).alias(
            "n_lt_p"
        ),
        F.sum((F.col("value") <= F.col("p90_approx")).cast("bigint")).alias(
            "n_le_p"
        ),
    )

    def in_bounds(n_lt: str, n_le: str, q: float) -> Column:
        lo = (F.lit(q - eps) * F.col("n_vals")) - 1
        hi = (F.lit(q + eps) * F.col("n_vals")) + 1
        return (F.col(n_lt) <= hi) & (F.col(n_le) >= lo)

    return audited.select(
        "event_type",
        "n_events",
        in_bounds("n_lt_m", "n_le_m", 0.5).alias("median_in_bounds"),
        in_bounds("n_lt_p", "n_le_p", 0.9).alias("p90_in_bounds"),
    )
