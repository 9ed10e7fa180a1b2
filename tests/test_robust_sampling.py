"""Semantics tests for the robust-stats / mixture-sampling operators on
constructed micro-data (oracle parity covers fixture-scale equivalence).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.operators.robust import q_skyline
from mysql_to_clickhouse_sync_spark.operators.sampling import q_balanced_sample
from tests.conftest import SF_DIR


def _write_tables(spark, d, customers, orders):
    spark.createDataFrame(
        customers,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).write.parquet(f"{d}/customer.parquet")
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(f"{d}/orders.parquet")


def test_skyline_domination_including_ties(spark):
    """(bal, orders): (10, 3) dominates (10, 1) [tie on bal, strict on
    orders] and (5, 3) [strict on bal, tie on orders]; (20, 0) and (1, 9)
    survive as frontier corners; duplicates of a frontier point survive
    together (neither strictly beats the other)."""
    import datetime
    import tempfile

    ts = datetime.datetime(2024, 1, 1)
    customers = [
        (1, "a", 0, 10.0, "B"),  # frontier
        (2, "b", 0, 10.0, "B"),  # dominated by 1 on orders (1 < 3)
        (3, "c", 0, 5.0, "B"),   # dominated by 1 (5 < 10, 3 == 3)
        (4, "d", 0, 20.0, "B"),  # frontier (richest, no orders)
        (5, "e", 0, 1.0, "B"),   # frontier (most orders)
        (6, "f", 0, 10.0, "B"),  # duplicate of 1 -> both survive
    ]
    orders = []

    def add(cust, n):
        for _ in range(n):
            orders.append((len(orders) + 1, cust, "O", 1.0, ts, "1-URGENT"))

    add(1, 3), add(2, 1), add(3, 3), add(5, 9), add(6, 3)
    with tempfile.TemporaryDirectory() as d:
        _write_tables(spark, d, customers, orders)
        got = {r.c_custkey for r in q_skyline(spark, d).collect()}
    assert got == {1, 4, 5, 6}, got


def test_balanced_sample_equal_quota_per_lang(spark):
    out = q_balanced_sample(spark, SF_DIR)
    per_lang = {
        r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    quotas = {r.quota for r in out.select("quota").distinct().collect()}
    assert len(quotas) == 1
    q = quotas.pop()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    assert set(per_lang) == set(langs)
    assert all(n == q for n in per_lang.values())
    min_cnt = min(
        r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    )
    assert q == min_cnt
