"""Trained-centroid IVF: the production variant of q_ann_ivf, with coarse
centroids from pyspark.ml KMeans (seeded) instead of the deterministic
lowest-id selection. Not declared as a query — k-means results are
seed/partitioning-dependent so no cross-engine oracle exists; the contract
here is recall against the exact brute force, which should beat (or at
least match) the untrained variant's, since trained centroids fit the data
distribution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.operators.ivf import (
    IVF_K,
    IVF_NPROBE,
    IVF_QUERIES,
    IVF_TOPK,
)
from mysql_to_clickhouse_sync_spark.operators.similarity import dot, with_norm
from tests.conftest import SF_DIR


def _exact_topk(emb):
    q = emb.filter(F.col("vec_id") < IVF_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qemb"),
        F.col("norm").alias("qnorm"),
    )
    pairs = (
        q.crossJoin(emb.withColumnRenamed("vec_id", "neighbor_id"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot(F.col("qemb"), F.col("embedding"))
                / (F.col("qnorm") * F.col("norm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return {
        (r.query_id, r.neighbor_id)
        for r in pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= IVF_TOPK)
        .collect()
    }


@pytest.mark.slow
def test_kmeans_trained_ivf_recall(spark):
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    emb = with_norm(load_table(spark, SF_DIR, "embeddings")).select(
        "vec_id", "embedding", "norm"
    )
    feat = emb.select(
        "vec_id", array_to_vector(F.col("embedding")).alias("features")
    )
    model = KMeans(k=IVF_K, seed=7, maxIter=5).fit(feat)
    centroids = (
        spark.createDataFrame(
            [(i, c.tolist()) for i, c in enumerate(model.clusterCenters())],
            "centroid_id INT, cemb ARRAY<DOUBLE>",
        )
        .withColumn("cnorm", F.sqrt(dot(F.col("cemb"), F.col("cemb"))))
    )

    def nearest(vectors, n):
        w = Window.partitionBy("vec_id").orderBy(
            F.col("c_cos").desc(), F.col("centroid_id").asc()
        )
        return (
            vectors.crossJoin(F.broadcast(centroids))
            .withColumn(
                "c_cos",
                dot(F.col("embedding"), F.col("cemb"))
                / (F.col("norm") * F.col("cnorm")),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= n)
        )

    assign = nearest(emb, 1).select("vec_id", "centroid_id", "embedding", "norm")
    probes = nearest(emb.filter(F.col("vec_id") < IVF_QUERIES), IVF_NPROBE).select(
        F.col("vec_id").alias("query_id"), "centroid_id"
    )
    queries_df = emb.filter(F.col("vec_id") < IVF_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qemb"),
        F.col("norm").alias("qnorm"),
    )
    scored = (
        probes.join(assign, "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(queries_df), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                dot(F.col("qemb"), F.col("embedding"))
                / (F.col("qnorm") * F.col("norm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    trained = {
        (r.query_id, r.neighbor_id)
        for r in scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= IVF_TOPK)
        .collect()
    }
    exact = _exact_topk(emb)
    recall = len(trained & exact) / len(exact)
    assert recall > 0.3, f"trained-IVF recall {recall:.2f} implausibly low"
