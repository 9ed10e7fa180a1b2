"""Embedding similarity search — north-star extension (SURVEY.md §2.8).

The embeddings fixture is (vec_id, embedding array<float> x64, label). Three
declared queries cover the similarity ladder:

  * q_cosine_topk       — brute-force top-5 most-similar pairs per label on a
                          bounded id range: the exact baseline.
  * q_embedding_neardup — near-duplicate pairs above a cosine threshold
                          (embedding-space dedup).
  * q_ann_lsh           — the scale path: sign-random-projection buckets
                          (first 8 dims -> 256 buckets), search only within
                          the bucket. Approximate by construction; both
                          engines compute the identical bucketing, so it
                          still hash-matches.

Float determinism: every dot product is a sequential left-fold over
double-cast elements (Spark F.aggregate == DuckDB list_reduce, both starting
from +0.0), so results are bitwise identical across engines — no rounding
needed, and none applied.

Scale notes: pair joins carry only (id, vec) and shuffle on label/bucket; at
100 TB brute force is O(n^2) and exists as ground truth on a bounded subset —
the LSH path is the production shape (cheap bucketing pass, then per-bucket
pair scoring; bucket width tunes recall vs cost). Norms are computed once per
vector before the join, not per pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.registry import declare

TOPK_SUBSET = 1500  # vec_id bound for the brute-force pair queries
TOPK_K = 5
NEARDUP_THRESHOLD = 0.30  # synthetic 64-dim embeddings: high cosine is rare
LSH_BITS = 8
LSH_QUERIES = 50  # vec_id bound for the ANN query set
ANN_K = 3


# Canonical definitions live in functions/vectors.py; re-exported here under
# the historical names for the operator/test importers.
from mysql_to_clickhouse_sync_spark.functions.vectors import (  # noqa: E402
    DOT_SQL as _DOT_SQL,
    NORM_SQL as _NORM_SQL,
    dot,
    with_norm,
)


def _pair_cosine(subset_pred: str) -> str:
    """Oracle CTE: normed vectors + all same-label pairs with cosine."""
    return f"""
    WITH normed AS (
        SELECT vec_id, label, embedding, {_NORM_SQL} AS norm
        FROM embeddings WHERE {subset_pred}
    ), pairs AS (
        SELECT a.label AS label,
               a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_DOT_SQL.format(a='a.embedding', b='b.embedding')}
                   / (a.norm * b.norm) AS cosine
        FROM normed a JOIN normed b
          ON a.label = b.label AND a.vec_id < b.vec_id
    )
    """


def pairwise_cosine(subset: DataFrame) -> DataFrame:
    """Same-label pair cosine similarities from a (vec_id,label,embedding)
    DataFrame. Norms precomputed; join shuffles on label only."""
    normed = with_norm(subset)
    a = normed.select(
        F.col("label"),
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("norm").alias("norm_a"),
    )
    b = normed.select(
        F.col("label").alias("label_b"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("norm").alias("norm_b"),
    )
    return (
        a.join(b, (a.label == b.label_b) & (F.col("vec_a") < F.col("vec_b")))
        .select(
            "label",
            "vec_a",
            "vec_b",
            (
                dot(F.col("emb_a"), F.col("emb_b"))
                / (F.col("norm_a") * F.col("norm_b"))
            ).alias("cosine"),
        )
    )


@declare(
    "q_cosine_topk",
    oracle=f"""
    {_pair_cosine(f'vec_id < {TOPK_SUBSET}')}
    SELECT label, vec_a, vec_b, cosine
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY label ORDER BY cosine DESC, vec_a, vec_b) AS rn
        FROM pairs
    )
    WHERE rn <= {TOPK_K}
    """,
    tier="P2",
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact top-5 most-similar same-label pairs (bounded id
    range — the O(n^2) ground truth for the LSH path)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < TOPK_SUBSET
    )
    pairs = pairwise_cosine(emb)
    w = Window.partitionBy("label").orderBy(
        F.col("cosine").desc(), F.col("vec_a"), F.col("vec_b")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK_K)
        .select("label", "vec_a", "vec_b", "cosine")
    )


@declare(
    "q_embedding_neardup",
    oracle=f"""
    {_pair_cosine(f'vec_id < {TOPK_SUBSET}')}
    SELECT label, vec_a, vec_b, cosine
    FROM pairs
    WHERE cosine >= {NEARDUP_THRESHOLD}
    """,
    tier="P2",
)
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space near-duplicate pairs: cosine above threshold."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < TOPK_SUBSET
    )
    return pairwise_cosine(emb).filter(F.col("cosine") >= NEARDUP_THRESHOLD)


def cosine_pandas_pairs(pairs: DataFrame) -> DataFrame:
    """Alternative physical strategy for pair scoring: Arrow-batched pandas
    UDF computing cosine via numpy over a (emb_a, emb_b, norm_a, norm_b)
    pair table. Same semantics as the fold-based `dot` (float64 ops in a
    different association order, so results can differ in the last ulp —
    fine for ranking, NOT for oracle hashing; declared queries use the fold).

    Exists as the measured fallback SURVEY.md §4.3(4) calls for: on very
    wide vectors numpy's vectorized dot beats the Catalyst fold; on 64-dim
    the JVM fold wins (no Python round-trip). tests/test_similarity_udf.py
    asserts agreement to 1e-9 and keeps both paths honest."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def _cos(emb_a, emb_b, norm_a, norm_b):  # type: ignore[no-untyped-def]
        import numpy as np
        import pandas as pd

        a = np.stack(emb_a.to_numpy()).astype("float64")
        b = np.stack(emb_b.to_numpy()).astype("float64")
        dots = np.einsum("ij,ij->i", a, b)
        return pd.Series(dots / (norm_a.to_numpy() * norm_b.to_numpy()))

    from mysql_to_clickhouse_sync_spark.shipping import ensure_package_shipped

    ensure_package_shipped(pairs.sparkSession)
    return pairs.withColumn(
        "cosine",
        _cos(F.col("emb_a"), F.col("emb_b"), F.col("norm_a"), F.col("norm_b")),
    )


def lsh_bucket(vec: Column, bits: int = LSH_BITS) -> Column:
    """Sign-random-projection bucket: bit i = sign(v[i]) over the first
    `bits` dims (axis-aligned projections — deterministic, engine-portable)."""
    out = F.lit(0)
    for i in range(bits):
        out = out + F.when(
            F.element_at(vec, i + 1) > 0, F.lit(2**i)
        ).otherwise(F.lit(0))
    return out


_LSH_BUCKET_SQL = " + ".join(
    f"CASE WHEN embedding[{i + 1}] > 0 THEN {2**i} ELSE 0 END"
    for i in range(LSH_BITS)
)


@declare(
    "q_ann_lsh",
    oracle=f"""
    WITH normed AS (
        SELECT vec_id, label, embedding, {_NORM_SQL} AS norm,
               {_LSH_BUCKET_SQL} AS bucket
        FROM embeddings
    ), scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_DOT_SQL.format(a='q.embedding', b='c.embedding')}
                   / (q.norm * c.norm) AS cosine
        FROM normed q JOIN normed c
          ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        WHERE q.vec_id < {LSH_QUERIES}
    )
    SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id) AS rn
        FROM scored
    )
    WHERE rn <= {ANN_K}
    """,
    tier="P2",
)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbors: candidates restricted to the query's
    sign-LSH bucket (256 buckets over 8 dims), then exact cosine top-3 within
    the bucket. The production ANN shape: the expensive pair scoring touches
    ~n/256 of the corpus per query instead of n."""
    emb = with_norm(load_table(spark, sf_dir, "embeddings")).withColumn(
        "bucket", lsh_bucket(F.col("embedding"))
    )
    q = emb.filter(F.col("vec_id") < LSH_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("emb_q"),
        F.col("norm").alias("norm_q"),
        F.col("bucket").alias("bucket_q"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("emb_c"),
        F.col("norm").alias("norm_c"),
        F.col("bucket").alias("bucket_c"),
    )
    scored = q.join(
        c,
        (F.col("bucket_q") == F.col("bucket_c"))
        & (F.col("query_id") != F.col("neighbor_id")),
    ).select(
        "query_id",
        "neighbor_id",
        (dot(F.col("emb_q"), F.col("emb_c")) / (F.col("norm_q") * F.col("norm_c"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= ANN_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
