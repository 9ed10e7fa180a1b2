"""Join operators (extensions — the reference performs zero joins; each table
ships independently, mysql_to_clickhouse_sync.py:192-199. Declared for the
north star's CDC-enrichment shape and relational completeness, SURVEY.md §2.4).

Scale notes: region/nation/customer are dimensions — broadcast them so the
fact side (orders) never shuffles for the join. At 100 TB the fact table
streams through executors once; AQE would pick broadcast automatically below
the threshold, but we hint explicitly since dim-ness is known statically.
Semi/anti joins keep only the left side's columns and short-circuit per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.operators.aggregates import (
    DECIMAL_SUM_SQL,
    decimal_sum,
)
from mysql_to_clickhouse_sync_spark.registry import declare


@declare(
    "q_join_enrich",
    oracle=f"""
    SELECT r_name, n_name, c_mktsegment,
           count(*) AS n_orders,
           {DECIMAL_SUM_SQL.format(col='o_totalprice')} AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name, c_mktsegment
    """,
    tier="P2",
)
def q_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema enrichment: orders joined through customer -> nation ->
    region with all dims broadcast, aggregated per (region, nation, segment)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name", "c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            decimal_sum("o_totalprice", "revenue"),
        )
    )


@declare(
    "q_semi_anti",
    oracle="""
    SELECT c_custkey, 'has_orders' AS kind
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    UNION ALL
    SELECT c_custkey, 'no_orders' AS kind
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tier="P2",
)
def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi and left-anti in one result: customers with >=1 order vs
    none, tagged. The orders side is reduced to its join key before the
    semi/anti join, so the probe input is minimal."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    cond = customer.c_custkey == orders.o_custkey
    semi = customer.join(orders, cond, "left_semi").select(
        "c_custkey", F.lit("has_orders").alias("kind")
    )
    anti = customer.join(orders, cond, "left_anti").select(
        "c_custkey", F.lit("no_orders").alias("kind")
    )
    return semi.unionAll(anti)
