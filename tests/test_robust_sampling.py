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


def test_domain_mixture_digitless_source_yields_null_weight(spark, tmp_path):
    """ADVICE r3: a source with NO digits must produce NULL weight on BOTH
    engines — Spark's int cast returns NULL, and the oracle's TRY_CAST
    (not CAST, which DuckDB errors on for '') matches it — so the admission
    math degrades to NULL src_budget / zero keeps instead of crashing or
    diverging."""
    import duckdb

    from mysql_to_clickhouse_sync_spark.operators.sampling import (
        q_domain_mixture,
    )
    from mysql_to_clickhouse_sync_spark.registry import REGISTRY

    rows = [
        (1, "src1", 100),
        (2, "src1", 50),
        (3, "webcrawl", 80),  # digitless: weight must be NULL, not a crash
        (4, "src2", 60),
    ]
    spark.createDataFrame(
        rows, "doc_id long, source string, n_chars int"
    ).write.parquet(f"{tmp_path}/documents.parquet")

    out = {
        r.source: r for r in q_domain_mixture(spark, str(tmp_path)).collect()
    }
    assert out["webcrawl"].weight is None
    assert out["webcrawl"].src_budget is None
    assert out["webcrawl"].n_kept == 0  # c <= NULL admits nothing
    assert out["src1"].weight == 2 and out["src2"].weight == 3

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    oracle = {
        r[0]: r for r in con.sql(REGISTRY["q_domain_mixture"].oracle).fetchall()
    }
    assert oracle["webcrawl"][1] is None  # weight
    assert oracle["webcrawl"][4] == 0  # n_kept
    assert oracle["src1"][1] == 2 and oracle["src2"][1] == 3


def test_corr_and_linreg_degenerate_groups_yield_null_both_engines(
    spark, tmp_path
):
    """Review r4: a constant-x / constant-y group must produce NULL corr
    and slope on BOTH engines, not an ANSI DIVIDE_BY_ZERO crash on the
    Spark side against a quiet NULL in DuckDB."""
    import datetime

    import duckdb

    from mysql_to_clickhouse_sync_spark.operators.stats import (
        q_corr_pearson,
        q_linreg_trend,
    )
    from mysql_to_clickhouse_sync_spark.registry import REGISTRY

    t = datetime.datetime
    rows = [
        # group A: constant discount AND single ship date (degenerate)
        (1, 10.0, 0.05, 100.0, "A", t(2024, 1, 1)),
        (2, 20.0, 0.05, 200.0, "A", t(2024, 1, 1)),
        # group N: dispersed (healthy)
        (3, 10.0, 0.02, 100.0, "N", t(2024, 1, 1)),
        (4, 30.0, 0.08, 300.0, "N", t(2024, 3, 1)),
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_quantity double, l_discount double,"
        " l_extendedprice double, l_returnflag string,"
        " l_shipdate timestamp",
    ).write.parquet(f"{tmp_path}/lineitem.parquet")

    corr = {r.l_returnflag: r for r in q_corr_pearson(spark, str(tmp_path)).collect()}
    assert corr["A"].corr_qty_disc is None  # constant y -> NULL, no crash
    assert corr["A"].covar_samp == 0.0
    assert corr["N"].corr_qty_disc is not None

    lin = {r.l_returnflag: r for r in q_linreg_trend(spark, str(tmp_path)).collect()}
    assert lin["A"].slope_cents_per_day is None  # constant x
    assert lin["A"].intercept_cents is None  # NULL propagation
    assert lin["N"].slope_cents_per_day is not None

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{tmp_path}/lineitem.parquet/*.parquet')"
    )
    o_corr = {r[0]: r for r in con.sql(REGISTRY["q_corr_pearson"].oracle).fetchall()}
    assert o_corr["A"][3] is None and o_corr["N"][3] is not None
    o_lin = {r[0]: r for r in con.sql(REGISTRY["q_linreg_trend"].oracle).fetchall()}
    assert o_lin["A"][2] is None and o_lin["A"][3] is None
    assert o_lin["N"][2] is not None
