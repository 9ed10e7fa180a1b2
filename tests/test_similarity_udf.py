"""Pandas-UDF cosine path vs the fold-based JVM path: numerically agreeing
(to float64 association-order tolerance) and both producing the same top-k
ranking — the evidence behind 'built-ins in the hot path, vectorized UDF as
the measured fallback'."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.operators.similarity import (
    cosine_pandas_pairs,
    dot,
    with_norm,
)
from tests.conftest import SF_DIR


def _pair_table(spark, limit_ids: int = 60):
    emb = with_norm(
        load_table(spark, SF_DIR, "embeddings").filter(
            F.col("vec_id") < limit_ids
        )
    )
    a = emb.select(
        F.col("label"),
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("norm").alias("norm_a"),
    )
    b = emb.select(
        F.col("label").alias("label_b"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("norm").alias("norm_b"),
    )
    return a.join(b, (a.label == b.label_b) & (F.col("vec_a") < F.col("vec_b")))


def test_pandas_and_fold_cosine_agree(spark):
    pairs = _pair_table(spark)
    fold = pairs.withColumn(
        "cosine",
        dot(F.col("emb_a"), F.col("emb_b")) / (F.col("norm_a") * F.col("norm_b")),
    ).select("vec_a", "vec_b", "cosine")
    udf = cosine_pandas_pairs(pairs).select("vec_a", "vec_b", "cosine")
    f = {(r.vec_a, r.vec_b): r.cosine for r in fold.collect()}
    u = {(r.vec_a, r.vec_b): r.cosine for r in udf.collect()}
    assert set(f) == set(u) and len(f) > 0
    assert all(abs(f[k] - u[k]) < 1e-9 for k in f)
    # Identical ranking per pair set.
    assert sorted(f, key=f.get) == sorted(u, key=u.get)
