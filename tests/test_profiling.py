"""Unit tests for the curation operators (operators/profiling.py):
hash-split determinism + proportions, scrub accounting, profiler exactness.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.operators.profiling import (
    q_hash_split,
    q_null_profile,
    q_redact_scrub,
    split_assign,
)

SF = "/root/testdata/sf0.001"


def test_split_proportions_and_determinism(spark):
    n = 20_000
    df = spark.range(n).select(split_assign(F.col("id")).alias("split"))
    counts = {r["split"]: r["count"] for r in df.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    # md5 is uniform: 79.7 % / 10.2 % / 10.2 % expected, allow ±2 %.
    assert abs(counts["train"] / n - 204 / 256) < 0.02
    assert abs(counts["val"] / n - 26 / 256) < 0.02
    # Assignment is a pure function of the key: repartitioning cannot move
    # a row between splits (the property that makes it shuffle-free at scale).
    again = (
        spark.range(n)
        .repartition(13)
        .select("id", split_assign(F.col("id")).alias("split"))
    )
    first = spark.range(n).select("id", split_assign(F.col("id")).alias("split"))
    moved = (
        first.alias("a")
        .join(again.alias("b"), "id")
        .filter(F.col("a.split") != F.col("b.split"))
        .count()
    )
    assert moved == 0


def test_hash_split_covers_corpus(spark):
    out = q_hash_split(spark, SF)
    total = out.agg(F.sum("n_docs")).first()[0]
    assert total == 500  # every document lands in exactly one split


def test_redact_scrub_accounting(spark):
    out = q_redact_scrub(spark, SF).collect()
    assert sum(r["total_hits"] for r in out) > 0  # pattern really fires
    for r in out:
        # Each hit replaces a 3-8 char word with the 10-char token, so the
        # size delta per language is bounded by the hit count.
        delta = r["chars_after"] - r["chars_before"]
        assert r["total_hits"] * 2 <= delta <= r["total_hits"] * 7
        assert r["docs_hit"] <= r["n_docs"]


def test_null_profile_exact(spark):
    rows = {r["col_name"]: r for r in q_null_profile(spark, SF).collect()}
    assert set(rows) == {
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    }
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    n = orders.count()
    ok = rows["o_orderkey"]
    assert ok["n_null"] == 0
    assert ok["n_distinct"] == n  # primary key
    assert ok["min_str"] == "0"  # fixture orderkeys are 0-based
    # double column: exact counts, deliberately unrendered min/max
    assert rows["o_totalprice"]["min_str"] is None
    assert rows["o_totalprice"]["n_distinct"] > 0
