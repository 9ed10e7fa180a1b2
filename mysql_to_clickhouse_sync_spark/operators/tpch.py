"""TPC-H analytics suite (extensions — the reference copies tables without
analytics, mysql_to_clickhouse_sync.py:192-199; these queries demonstrate the
relational completeness a ClickHouse-side user would run on the synced data,
SURVEY.md §2.3/§2.4/§2.6). Q1 lives in skew.py; this module adds Q3, Q4,
Q5, Q6, Q7, Q8, Q10, Q13, Q14, Q15, Q17, Q18 and Q19 — every TPC-H query
expressible on the fixture schemas (no partsupp table, no shippriority /
commitdate / shipmode / container / phone columns — nearest existing
columns substituted; synthetic NATION_N names stand in for country
literals). Q2/Q9/Q11/Q16/Q20 need partsupp; Q12/Q21 need commit/receipt
dates; Q22 needs phone codes — structurally inexpressible here, not
skipped for difficulty.

Money arithmetic follows the q_tpch_q1 pattern: cast operands to
decimal(18,6), rescale every product back to (18,6) (exact — inputs carry
<= 4 decimal digits), sum in decimal so the result is associative and thus
partition-order independent. Output boundary, by sum magnitude:
  * per-group sums (q3/q5/q7/q10/q15): 2-dp-representable values whose
    unscaled decimals stay far below 2^53 — cast to DOUBLE (the driver's
    pandas canonicalization needs one numeric dtype on both sides; the
    conversion is correctly rounded and injective in that window).
  * WHOLE-TABLE sums (q1 disc_price/charge, q6, q8 volumes, q14, q17,
    q19): a 6-scale global sum can exceed 2^53 unscaled, where
    decimal->double conversion differs by 1 ulp between engines (observed
    at ~sf1), and a 6->2 decimal rescale is NOT portable either (Spark
    rounds HALF_UP, DuckDB truncates — measured). These leave the query
    as exact integer MICRO-currency: decimal_sum * 10^6 is an exact
    BIGINT in both engines up to 9.2e18 micros — no rounding anywhere,
    at any corpus size.

Scale notes (100 TB): customer/nation/region/supplier are dimensions —
broadcast, so the orders->lineitem fact spine shuffles only for its own
aggregations. Q18's having-clause aggregation shuffles lineitem once on
l_orderkey with map-side partial sums; the subsequent join to orders reuses
that key. Every LIMIT is a TakeOrderedAndProject (per-partition top-k +
single merge), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.registry import declare


def _revenue() -> Column:
    """l_extendedprice * (1 - l_discount) in exact decimal, rescaled to
    (18,6) before any sum (identical precision in Spark and DuckDB)."""
    price = F.col("l_extendedprice").cast("decimal(18,6)")
    disc = F.col("l_discount").cast("decimal(18,6)")
    return (price * (F.lit(1) - disc)).cast("decimal(18,6)")


# The outer CAST to DOUBLE is the output boundary: DuckDB DECIMAL maps to
# float64 under the driver's pandas canonicalization while Spark DECIMAL
# stays a Decimal object, and the two render differently on trailing zeros.
# The sum itself stays decimal-exact; unscaled values are < 2^53, so the
# decimal->double conversion is the same correctly-rounded result in both
# engines and injective over distinct sums (ordering/top-k unaffected).
_REVENUE_SQL = """CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                 * (1 - CAST(l_discount AS DECIMAL(18,6)))
                 AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE)"""


@declare(
    "q_tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           {_REVENUE_SQL} AS revenue,
           o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
    tier="P2",
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): top-10 highest-revenue orders not yet
    shipped at the cutoff, for one market segment. o_orderpriority stands in
    for the fixture's missing o_shippriority. Customer is broadcast; both
    date predicates push to the parquet scans."""
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01 00:00:00")
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01 00:00:00")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue()).cast("decimal(18,6)").cast("double").alias("revenue"))
        .orderBy(
            F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc()
        )
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@declare(
    "q_tpch_q5",
    oracle=f"""
    SELECT n_name, {_REVENUE_SQL} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    tier="P2",
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue where customer and supplier
    share a nation within one region/year. supplier/nation/region/customer
    all broadcast — the lineitem spine never shuffles for any join; the only
    exchange is the final 5-group aggregation."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(supplier),
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_revenue()).cast("decimal(18,6)").cast("double").alias("revenue"))
    )


@declare(
    "q_tpch_q6",
    oracle="""
    SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                         * CAST(l_discount AS DECIMAL(18,6))
                         AS DECIMAL(18,6))) * 1000000 AS BIGINT)
               AS revenue_micros,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tier="P2",
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure scan-filter-aggregate.
    All three predicates push to the parquet scan (row-group pruning on
    shipdate); no shuffle at all — the 1-row result is a partial/final agg."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,6)")
    disc = F.col("l_discount").cast("decimal(18,6)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum((price * disc).cast("decimal(18,6)")) * 1_000_000)
            .cast("bigint")
            .alias("revenue_micros"),
            F.count("*").alias("n_items"),
        )
    )


@declare(
    "q_tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name, {_REVENUE_SQL} AS revenue, c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    tier="P2",
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top-20 customers by lost revenue
    on returned items in one quarter. Customer and nation broadcast; the
    quarter predicate prunes the orders scan before the lineitem join."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_revenue()).cast("decimal(18,6)").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


Q18_QTY_THRESHOLD = 250  # ~p98 of per-order quantity in the fixtures


@declare(
    "q_tpch_q18",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(18,2))
               AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,6))) > {Q18_QTY_THRESHOLD}
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
    tier="P2",
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds a threshold, with their customers. The HAVING subquery is a
    left-semi join against the aggregated lineitem keys; lineitem shuffles
    once on l_orderkey (map-side partial sums) and that single aggregation
    feeds both the filter and the final per-order quantities."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,6)"))
        .cast("decimal(18,2)")
        .alias("sum_qty")
    )
    big = per_order.filter(F.col("sum_qty") > Q18_QTY_THRESHOLD)
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
    )


@declare(
    "q_tpch_q4",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    tier="P2",
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking): orders in one quarter with at
    least one lineitem shipped after the order date (l_commitdate is absent
    from the fixtures; o_orderdate stands in). The EXISTS is a left-semi
    join — lineitem carries only (l_orderkey, l_shipdate) to the probe and
    short-circuits per key."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    return (
        orders.join(
            lineitem,
            (orders.o_orderkey == lineitem.l_orderkey)
            & (lineitem.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@declare(
    "q_tpch_q7",
    oracle=f"""
    SELECT supp_nation, cust_nation, yr, {_REVENUE_SQL} AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS yr,
               l_extendedprice, l_discount
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10')
            OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9'))
          AND l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
                             AND TIMESTAMP '1998-12-31 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, yr
    """,
    tier="P2",
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade revenue between two
    nations (the fixture's NATION_9/NATION_10 stand in for FRANCE/GERMANY) by year. Nation joined twice under different roles (supplier
    side / customer side) — both broadcast; the symmetric pair filter is a
    single OR predicate evaluated after the dims attach."""
    supplier = load_table(spark, sf_dir, "supplier")
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") <= F.lit("1998-12-31 00:00:00"))
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_10")
    ) | ((F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_9"))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), supplier.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), customer.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .withColumn("yr", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "yr")
        .agg(F.sum(_revenue()).cast("decimal(18,6)").cast("double").alias("revenue"))
    )


@declare(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    tier="P2",
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): histogram of per-customer order
    counts, zero-order customers included via the left outer join (the
    filtered condition lives IN the join, not a WHERE — moving it would
    drop the zeros). Two aggregations: per-customer (shuffle on custkey),
    then the tiny histogram."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@declare(
    "q_tpch_q14",
    oracle=f"""
    WITH j AS (
        SELECT p_type, l_extendedprice, l_discount
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    )
    SELECT
        CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                      * (1 - CAST(l_discount AS DECIMAL(18,6)))
                      AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END)
             * 1000000 AS BIGINT) AS promo_revenue_micros,
        CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                 * (1 - CAST(l_discount AS DECIMAL(18,6)))
                 AS DECIMAL(18,6))) * 1000000 AS BIGINT)
            AS total_revenue_micros,
        100.0 * CAST(CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                      * (1 - CAST(l_discount AS DECIMAL(18,6)))
                      AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END)
                 * 1000000 AS BIGINT) AS DOUBLE)
              / CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                       * (1 - CAST(l_discount AS DECIMAL(18,6)))
                       AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS DOUBLE)
              AS promo_pct
    FROM j
    """,
    tier="P2",
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): share of one month's revenue from promo
    parts. Both sums are exact decimals whose raw integers stay below 2^53,
    so the final double division (the only float op) sees identical
    operands in both engines; part is broadcast, the month filter prunes
    the lineitem scan."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00"))
    )
    rev = _revenue()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (F.sum(promo) * 1_000_000)
            .cast("bigint")
            .alias("promo_revenue_micros"),
            (F.sum(rev) * 1_000_000).cast("bigint").alias("total_revenue_micros"),
        )
    )
    return agg.select(
        "promo_revenue_micros",
        "total_revenue_micros",
        (
            F.lit(100.0)
            * F.col("promo_revenue_micros").cast("double")
            / F.col("total_revenue_micros").cast("double")
        ).alias("promo_pct"),
    )


@declare(
    "q_tpch_q19",
    oracle=f"""
    SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                 * (1 - CAST(l_discount AS DECIMAL(18,6)))
                 AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS revenue_micros,
           count(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 21)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 35
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#5' AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    tier="P2",
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): OR-of-ANDs predicate spanning both
    join sides (container/shipmode legs are absent from the fixtures; the
    brand/size/quantity legs carry the shape). Catalyst pushes the common
    residue of the disjunction below the join where derivable; part stays
    broadcast so the disjunction evaluates streaming-side."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity")
    leg = lambda b, s_lo, s_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == b)
        & F.col("p_size").between(s_lo, s_hi)
        & (qty >= q_lo)
        & (qty <= q_hi)
    )
    cond = (
        leg("Brand#1", 1, 15, 1, 21)
        | leg("Brand#3", 10, 35, 10, 30)
        | leg("Brand#5", 20, 50, 20, 40)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            (F.sum(_revenue()) * 1_000_000).cast("bigint").alias("revenue_micros"),
            F.count("*").alias("n_items"),
        )
    )


@declare(
    "q_tpch_q8",
    oracle=f"""
    WITH volumes AS (
        SELECT CAST(year(o_orderdate) AS INT) AS yr,
               n2.n_name AS supp_nation,
               CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                    * (1 - CAST(l_discount AS DECIMAL(18,6)))
                    AS DECIMAL(18,6)) AS volume
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT yr,
           CAST(sum(CASE WHEN supp_nation = 'NATION_9' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,6)) END) * 1000000
               AS BIGINT) AS nation_volume_micros,
           CAST(sum(volume) * 1000000 AS BIGINT) AS total_volume_micros,
           CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_9' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,6)) END) * 1000000 AS BIGINT)
                AS DOUBLE)
             / CAST(CAST(sum(volume) * 1000000 AS BIGINT) AS DOUBLE)
               AS mkt_share
    FROM volumes
    GROUP BY yr
    """,
    tier="P2",
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_9's share of ASIA's PROMO-
    part order volume by year. Eight-table join, every dimension broadcast,
    nation attached twice (customer region filter vs supplier share tag);
    the share is one double division of exact decimal sums (both < 2^53
    raw)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00"))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rkey")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _revenue()
    nation_vol = F.when(F.col("supp_nation") == "NATION_9", vol).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    agg = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), customer.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_rkey") == region.r_regionkey)
        .join(F.broadcast(n2), supplier.s_nationkey == F.col("n2_key"))
        .withColumn("yr", F.year("o_orderdate"))
        .groupBy("yr")
        .agg(
            (F.sum(nation_vol) * 1_000_000)
            .cast("bigint")
            .alias("nation_volume_micros"),
            (F.sum(vol) * 1_000_000).cast("bigint").alias("total_volume_micros"),
        )
    )
    return agg.select(
        "yr",
        "nation_volume_micros",
        "total_volume_micros",
        (
            F.col("nation_volume_micros").cast("double")
            / F.col("total_volume_micros").cast("double")
        ).alias("mkt_share"),
    )


@declare(
    "q_tpch_q15",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, {_REVENUE_SQL} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    tier="P2",
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the supplier(s) with maximum quarterly
    revenue — a CTE reused by both the ranking and the scalar-max subquery.
    The revenue aggregation computes once; the 1-row max broadcasts back
    against it (decimal equality is exact, so 'the max' is well-defined
    cross-engine; genuine ties all surface, as in the spec)."""
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00"))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    revenue = (
        lineitem.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_revenue()).cast("decimal(18,6)").cast("double").alias("total_revenue"))
        .localCheckpoint(eager=True)  # compute the CTE once, reuse twice
    )
    top = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.join(F.broadcast(top), F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(supplier), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@declare(
    "q_tpch_q17",
    oracle="""
    WITH stats AS (
        SELECT l_partkey AS pk,
               count(*) AS n,
               sum(CAST(l_quantity AS DECIMAL(18,6))) AS sq
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) * 1000000
               AS BIGINT) AS small_qty_price_micros,
           count(*) AS n_items
    FROM lineitem
    JOIN part  ON p_partkey = l_partkey
    JOIN stats ON pk = l_partkey
    WHERE p_brand = 'Brand#1'
      AND CAST(l_quantity AS DECIMAL(18,6)) * n * 5 < sq
    """,
    tier="P2",
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): lineitems of one brand
    whose quantity is below 20% of that part's average. The correlated AVG
    decorrelates to a per-part (count, sum) aggregate joined back; the
    comparison qty*n*5 < sum is division-free exact decimal, so no float
    can split the engines. Lineitem shuffles once on l_partkey for the
    stats; the stats join reuses that key."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    qty = F.col("l_quantity").cast("decimal(18,6)")
    stats = lineitem.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count("*").alias("n"), F.sum(qty).alias("sq")
    )
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(stats, F.col("l_partkey") == F.col("pk"))
        .filter(qty * F.col("n") * F.lit(5) < F.col("sq"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,6)")) * 1_000_000)
            .cast("bigint")
            .alias("small_qty_price_micros"),
            F.count("*").alias("n_items"),
        )
    )
