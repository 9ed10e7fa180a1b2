"""Bloom decontamination gate: one-sidedness and the streaming state
boundary.

The oracle sweep (test_oracle_parity.py) already hash-checks both
declared queries end to end; these tests pin the properties the hash
alone doesn't isolate: the gate can only OVER-admit (exact hits are a
subset of bloom hits — no false negative is possible by construction,
and a regression here would leak benchmark text into training data),
and the streaming counters must carry batch-1 state into batch 2.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.operators.quality import (
    _BENCH_SOURCE,
    _SHINGLES_EXPR,
    bench_bloom,
    decontam_probe_expr,
    q_decontam_gate_audit,
)
from tests.conftest import SF_DIR


def test_exact_hits_are_subset_of_bloom_hits(spark):
    """Doc-level one-sidedness: every exactly-contaminated document is
    bloom-flagged (no false negatives); the reverse may not hold."""
    docs = load_table(spark, SF_DIR, "documents")
    sh = (
        docs.withColumn("words", F.split(F.col("text"), " "))
        .select("doc_id", "source", F.expr(_SHINGLES_EXPR).alias("shingles"))
        .select("doc_id", "source", F.explode("shingles").alias("h"))
    )
    bench = sh.filter(F.col("source") == _BENCH_SOURCE).select("h").distinct()
    exact = {
        r["doc_id"]
        for r in sh.filter(F.col("source") != _BENCH_SOURCE)
        .join(F.broadcast(bench), "h", "left_semi")
        .select("doc_id")
        .distinct()
        .collect()
    }
    bitmap, m = bench_bloom(spark, docs)
    bloom = {
        r["doc_id"]
        for r in docs.filter(F.col("source") != _BENCH_SOURCE)
        .withColumn("words", F.split(F.col("text"), " "))
        .withColumn("shingles", F.expr(_SHINGLES_EXPR))
        .crossJoin(F.broadcast(bitmap))
        .filter(F.expr(decontam_probe_expr(m)))
        .select("doc_id")
        .collect()
    }
    assert exact, "fixture should contain contaminated documents"
    assert exact <= bloom, sorted(exact - bloom)[:5]


def test_audit_accounting_is_consistent(spark):
    rows = q_decontam_gate_audit(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_bloom"] >= r["n_exact"], r
        assert r["n_false_pos"] == r["n_bloom"] - r["n_exact"], r
        assert r["n_train"] >= r["n_bloom"], r


def test_stream_counters_cross_batch(spark):
    """The memory sink sees one update per (lang, micro-batch); the later
    update must build on the earlier one's state, and the final totals
    must equal the batch bloom aggregate (not just the last batch's)."""
    from mysql_to_clickhouse_sync_spark.streaming.decontam import (
        s_decontaminate_stream,
    )

    final = {
        r["lang"]: (r["n_train"], r["n_contaminated"])
        for r in s_decontaminate_stream(spark, SF_DIR).collect()
    }
    docs = load_table(spark, SF_DIR, "documents")
    bitmap, m = bench_bloom(spark, docs)
    batch = {
        r["lang"]: (r["n_train"], r["n_contaminated"])
        for r in docs.filter(F.col("source") != _BENCH_SOURCE)
        .withColumn("words", F.split(F.col("text"), " "))
        .withColumn("shingles", F.expr(_SHINGLES_EXPR))
        .crossJoin(F.broadcast(bitmap))
        .withColumn(
            "contaminated", F.expr(decontam_probe_expr(m)).cast("long")
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_train"),
            F.sum("contaminated").alias("n_contaminated"),
        )
        .collect()
    }
    assert final == batch
    # the split is doc_id-median, so every lang spans both micro-batches
    # in the fixture; equality above then REQUIRES batch-1 state to have
    # survived into batch 2 (a state drop would halve the counts).
    lo, hi = (
        docs.filter(F.col("source") != _BENCH_SOURCE)
        .agg(F.min("doc_id"), F.max("doc_id"))
        .first()
    )
    split = (int(lo) + int(hi)) // 2
    per_half = (
        docs.filter(F.col("source") != _BENCH_SOURCE)
        .groupBy("lang")
        .agg(
            F.sum((F.col("doc_id") <= split).cast("long")).alias("early"),
            F.sum((F.col("doc_id") > split).cast("long")).alias("late"),
        )
        .collect()
    )
    assert all(r["early"] > 0 and r["late"] > 0 for r in per_half), per_half
