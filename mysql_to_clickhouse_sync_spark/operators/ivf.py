"""IVF (inverted-file) approximate nearest neighbor — the trained-index
scale path of the similarity ladder (SURVEY.md §2.8; complements q_ann_lsh's
projection buckets and q_cosine_topk's brute-force ground truth).

IVF structure: (1) pick K coarse centroids, (2) assign every vector to its
nearest centroid (the "inverted lists"), (3) at query time probe only the
NPROBE nearest lists and score candidates exactly. Cost drops from O(n) per
query to O(K + n * NPROBE / K).

Determinism / oracle: production IVF trains centroids with k-means on a
sample; k-means is seed- and order-dependent, so for the oracle the
"training" is a deterministic selection — the K lowest-vec_id vectors ARE
the centroids. Every downstream step (assignment argmax, probe ranking,
candidate scoring) is then exact fold-arithmetic both engines compute
identically (see similarity.py: sequential left-fold dot product). Swap
`_centroids` for a pyspark.ml KMeans fit to get the production index; the
plan shape below is unchanged.

Scale notes (100 TB): centroids are a K-row broadcast — assignment is a
map-side 16× expand + per-vector argmax, no shuffle of the vector table.
The inverted lists materialize as an (assign -> centroid_id) column you
would persist partitioned by centroid_id; probing then prunes partitions.
The only shuffle here is the candidate join keyed on centroid_id, whose
fan-in per query is n*NPROBE/K, not n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.operators.similarity import (
    _DOT_SQL,
    _NORM_SQL,
    dot,
    with_norm,
)
from mysql_to_clickhouse_sync_spark.registry import declare

IVF_K = 16  # coarse centroids (deterministic: the K lowest vec_ids)
IVF_NPROBE = 4  # lists probed per query
IVF_QUERIES = 25  # vec_id bound of the query set
IVF_TOPK = 3


def _cosine(a, b, norm_a, norm_b):
    return dot(a, b) / (norm_a * norm_b)


@declare(
    "q_ann_ivf",
    oracle=f"""
    WITH normed AS (
        SELECT vec_id, embedding, {_NORM_SQL} AS norm FROM embeddings
    ), centroids AS (
        SELECT vec_id AS centroid_id, embedding AS cemb, norm AS cnorm
        FROM normed
        ORDER BY vec_id
        LIMIT {IVF_K}
    ), assign AS (
        SELECT vec_id, centroid_id, embedding, norm FROM (
            SELECT v.vec_id, c.centroid_id, v.embedding, v.norm,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY {_DOT_SQL.format(a='v.embedding', b='c.cemb')}
                                / (v.norm * c.cnorm) DESC,
                                c.centroid_id ASC) AS rn
            FROM normed v CROSS JOIN centroids c
        ) WHERE rn = 1
    ), probes AS (
        SELECT vec_id AS query_id, centroid_id FROM (
            SELECT q.vec_id, c.centroid_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_DOT_SQL.format(a='q.embedding', b='c.cemb')}
                                / (q.norm * c.cnorm) DESC,
                                c.centroid_id ASC) AS rn
            FROM normed q CROSS JOIN centroids c
            WHERE q.vec_id < {IVF_QUERIES}
        ) WHERE rn <= {IVF_NPROBE}
    ), scored AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               {_DOT_SQL.format(a='q.embedding', b='a.embedding')}
                   / (q.norm * a.norm) AS cosine
        FROM probes p
        JOIN assign a ON a.centroid_id = p.centroid_id
        JOIN normed q ON q.vec_id = p.query_id
        WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, cosine FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id ASC) AS rn
        FROM scored
    ) WHERE rn <= {IVF_TOPK}
    """,
    tier="P2",
)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: deterministic coarse centroids -> inverted-list assignment
    (broadcast argmax, no shuffle) -> probe NPROBE lists per query -> exact
    top-k within the candidates. Approximate by construction (recall < 1 vs
    q_cosine_topk); both engines build the identical index so it still
    hash-matches."""
    normed = with_norm(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding", "norm"
    )
    centroids = (
        normed.orderBy("vec_id")
        .limit(IVF_K)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("cemb"),
            F.col("norm").alias("cnorm"),
        )
    )

    def nearest_centroids(vectors: DataFrame, n: int) -> DataFrame:
        """Rank all K centroids per vector by cosine, keep the best n."""
        w = Window.partitionBy("vec_id").orderBy(
            F.col("c_cos").desc(), F.col("centroid_id").asc()
        )
        return (
            vectors.crossJoin(F.broadcast(centroids))
            .withColumn(
                "c_cos",
                _cosine(
                    F.col("embedding"), F.col("cemb"), F.col("norm"), F.col("cnorm")
                ),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= n)
        )

    assign = nearest_centroids(normed, 1).select(
        "vec_id", "centroid_id", "embedding", "norm"
    )
    probes = nearest_centroids(normed.filter(F.col("vec_id") < IVF_QUERIES), IVF_NPROBE).select(
        F.col("vec_id").alias("query_id"), "centroid_id"
    )
    queries = normed.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qemb"),
        F.col("norm").alias("qnorm"),
    ).filter(F.col("query_id") < IVF_QUERIES)
    scored = (
        probes.join(assign, "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _cosine(
                F.col("qemb"), F.col("embedding"), F.col("qnorm"), F.col("norm")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= IVF_TOPK)
        .select("query_id", "neighbor_id", "cosine")
    )
