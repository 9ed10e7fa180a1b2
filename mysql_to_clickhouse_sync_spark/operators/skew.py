"""Skew mitigation — salting utilities + the TPC-H Q1 headline aggregation.

AQE's skew-join splitting handles most runtime skew, but a hot GROUP BY key
still funnels into one reducer. The classic fix is two-phase salted
aggregation: shuffle once on (key, salt) — spreading the hot key over N
reducers — compute partials, then re-aggregate on the key alone (the second
shuffle moves only N rows per key, not the raw data).

q_salted_agg proves correctness: the salted plan must produce EXACTLY the
plain GROUP BY's result (the oracle is the unsalted SQL). q_tpch_q1 is the
canonical wide-aggregation benchmark query (SURVEY.md §fixtures are
TPC-H-ish), with all money sums in decimal for cross-engine determinism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.registry import declare

SALT_BUCKETS = 8


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, Column],
    n_salts: int = SALT_BUCKETS,
) -> DataFrame:
    """Two-phase skew-resistant aggregation: sums/counts grouped by `keys`
    with a salt spreading each key over n_salts reducers first.

    sum_cols maps output name -> input Column to sum; the partial/final
    split keeps every sum exact (sums and counts re-aggregate losslessly —
    that is precisely why avg is NOT offered here: callers derive it from
    sum/count after the final phase)."""
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        F.count("*").alias("__n"),
        *[expr.alias(f"__s_{name}") for name, expr in
          ((n, F.sum(c)) for n, c in sum_cols.items())],
    )
    return partial.groupBy(*keys).agg(
        F.sum("__n").alias("n_rows"),
        *[F.sum(f"__s_{name}").alias(name) for name in sum_cols],
    )


@declare(
    "q_salted_agg",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_rows,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(18,2))
               AS DOUBLE) AS sum_qty,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(18,2))
               AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tier="P2",
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted aggregation over a deliberately low-cardinality key
    (l_returnflag: 3 values over all of lineitem — maximal skew for a plain
    GROUP BY). The oracle is the UNSALTED aggregation: salting must be
    invisible in the result."""
    li = load_table(spark, sf_dir, "lineitem")
    out = salted_sum_count(
        li,
        keys=["l_returnflag"],
        sum_cols={
            "sum_qty": F.col("l_quantity").cast("decimal(18,6)"),
            "sum_price": F.col("l_extendedprice").cast("decimal(18,6)"),
        },
    )
    return out.select(
        "l_returnflag",
        "n_rows",
        F.col("sum_qty").cast("decimal(18,2)").cast("double").alias("sum_qty"),
        F.col("sum_price").cast("decimal(18,2)").cast("double").alias("sum_price"),
    )


@declare(
    "q_tpch_q1",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(18,2))
               AS DOUBLE) AS sum_qty,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(18,2))
               AS DOUBLE) AS sum_base_price,
           -- exact integer micro-currency: a whole-table 6-scale sum can
           -- exceed 2^53 unscaled, where decimal->double conversion
           -- differs by 1 ulp between engines (observed at ~sf1); the
           -- decimal sum * 10^6 is an exact BIGINT in both engines at any
           -- realistic magnitude (int64 caps at 9.2e18 micros)
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                         * (1 - CAST(l_discount AS DECIMAL(18,6)))
                         AS DECIMAL(18,6))) * 1000000
                AS BIGINT) AS sum_disc_price_micros,
           CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                              * (1 - CAST(l_discount AS DECIMAL(18,6)))
                              AS DECIMAL(18,6))
                         * (1 + CAST(l_tax AS DECIMAL(18,6)))
                         AS DECIMAL(18,6))) * 1000000
                AS BIGINT) AS sum_charge_micros,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tier="P2",
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report) — the canonical wide-aggregation
    benchmark: ship-date filter (pushed to the scan) + 2-key groupBy + money
    arithmetic, all in decimal so Spark and DuckDB agree exactly."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,6)")
    price = F.col("l_extendedprice").cast("decimal(18,6)")
    disc = F.col("l_discount").cast("decimal(18,6)")
    tax = F.col("l_tax").cast("decimal(18,6)")
    # Products rescale back to (18,6) before summing: inputs carry <= 4
    # decimal digits, so the rescale is exact — and it keeps both engines
    # inside identical precision instead of their (different) promotion
    # rules for high-scale decimal multiplication.
    disc_price = (price * (F.lit(1) - disc)).cast("decimal(18,6)")
    charge = (disc_price * (F.lit(1) + tax)).cast("decimal(18,6)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("decimal(18,2)").cast("double").alias("sum_qty"),
            F.sum(price).cast("decimal(18,2)").cast("double").alias("sum_base_price"),
            (F.sum(disc_price) * 1_000_000)
            .cast("bigint")
            .alias("sum_disc_price_micros"),
            (F.sum(charge) * 1_000_000).cast("bigint").alias("sum_charge_micros"),
            F.count("*").alias("count_order"),
        )
    )


JOIN_SALTS = 4


@declare(
    "q_salted_join",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_items,
           CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                         * (1 - CAST(l_discount AS DECIMAL(18,6)))
                         AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    tier="P2",
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant big-big join: lineitem's join key is salted with a
    DETERMINISTIC salt (l_linenumber % N — result-invisible, unlike rand()),
    and orders is exploded N ways so every (key, salt) pair finds its match.
    A hot orderkey's rows now land on N reducers instead of one. The oracle
    is the UNSALTED join: salting must be invisible in the result.

    At 100 TB: use this when BOTH sides are too big to broadcast and one key
    is hot (AQE's skew split handles sort-merge stragglers, but salting also
    de-skews the downstream aggregation). The N-way explode multiplies only
    the smaller side's shuffle volume."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "salt", F.col("l_linenumber") % JOIN_SALTS
    )
    # shuffle_hash hint: at fixture scale Catalyst would broadcast orders
    # and the salted-shuffle path this operator demonstrates would never
    # run; at 100 TB (both sides over the broadcast threshold) the hinted
    # plan IS the chosen plan.
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(JOIN_SALTS - 1))))
        .hint("shuffle_hash")
    )
    price = F.col("l_extendedprice").cast("decimal(18,6)")
    disc = F.col("l_discount").cast("decimal(18,6)")
    revenue = (price * (F.lit(1) - disc)).cast("decimal(18,6)")
    return (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey) & (li.salt == orders.salt),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(revenue).cast("decimal(18,6)").cast("double").alias("revenue"),
        )
    )
