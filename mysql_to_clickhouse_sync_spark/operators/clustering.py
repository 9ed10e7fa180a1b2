"""Iterative connected components — duplicate-cluster resolution.

Near-dup detection (MinHash-LSH, SimHash) yields PAIRS, but pairs aren't
transitive: if A~B and B~C, the dedup decision needs the {A,B,C} CLUSTER.
This is the canonical iterative Spark algorithm: min-label propagation to a
fixed point (each node repeatedly adopts the smallest label among itself and
its neighbors; converges in O(diameter) rounds).

Spark-first notes: each round is one join + one groupBy (two shuffles);
lineage is cut per round with localCheckpoint so the plan doesn't grow
(the classic iterative-DataFrame trap); convergence is detected by counting
changed labels — when 0, stop. At 100 TB-scale graphs the same loop runs
with the label table partitioned by node; rounds are bounded by cluster
diameter, which for dedup graphs is tiny (near-dup clusters are dense).

The DuckDB oracle computes the same fixed point declaratively with a
recursive CTE (reachability -> min reachable label) — an oracle-checked
ITERATIVE algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.operators.dedup import (
    _minhash_oracle,
    minhash_lsh_candidates,
)
from mysql_to_clickhouse_sync_spark.registry import declare

MAX_ITERATIONS = 20
SURVIVOR_JACCARD = 0.5  # MinHash estimate threshold for dedup edges


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iterations: int = MAX_ITERATIONS
) -> DataFrame:
    """Min-label propagation. nodes: (id); edges: (src, dst) undirected
    (either orientation suffices — symmetrized internally). Returns
    (id, component) where component = min node id in the component.

    Raises RuntimeError if labels are still changing when the iteration cap
    is hit: non-converged labels are silently WRONG (some component would
    carry two ids), so the cap is a circuit-breaker, never an answer. Plain
    propagation converges in O(component diameter) rounds; if a dense LSH
    candidate graph ever trips the cap at scale, raise the cap or switch
    the loop to pointer-doubling (large-star/small-star), which converges
    in O(log n) rounds."""
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = nodes.select(F.col("id"), F.col("id").alias("component"))
    changed = 0
    for _ in range(max_iterations):
        neighbor_min = (
            labels.join(sym, labels.id == sym.src)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)  # cut lineage each round
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed > 0:
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} "
            f"iterations ({changed} labels still changing) — raise "
            "max_iterations (diameter-bound) or use pointer-doubling"
        )
    return labels


@declare(
    "q_dedup_clusters",
    oracle="""
    WITH RECURSIVE cand AS (
        SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))
                   AS fp
        FROM documents
    ), edges AS (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM cand a JOIN cand b ON a.fp = b.fp AND a.doc_id < b.doc_id
    ), sym AS (
        SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ), reach(id, label) AS (
        SELECT doc_id, doc_id FROM cand
        UNION
        SELECT s.dst, r.label FROM reach r JOIN sym s ON s.src = r.id
    )
    SELECT id AS doc_id, min(label) AS cluster_id,
           (count(*) > 1) AS in_cluster
    FROM reach
    GROUP BY id
    """,
    tier="P1",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters over fingerprint-equality edges: every document
    labeled with its cluster id (min doc_id reachable through shared
    fingerprints) via iterative min-label propagation. in_cluster flags
    docs with at least one duplicate.

    Fingerprint edges (exact-normalized equality) rather than MinHash
    candidates are used for the DECLARED query so the oracle's recursive
    closure stays cheap; `dedup_clusters_minhash` below is the same loop
    over LSH candidate pairs."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", "")
    cand = docs.select(
        "doc_id", F.md5(norm.cast("binary")).alias("fp")
    )
    a = cand.select(F.col("doc_id").alias("src"), F.col("fp").alias("fp_a"))
    b = cand.select(F.col("doc_id").alias("dst"), F.col("fp").alias("fp_b"))
    edges = a.join(
        b, (F.col("fp_a") == F.col("fp_b")) & (F.col("src") < F.col("dst"))
    ).select("src", "dst")
    nodes = cand.select(F.col("doc_id").alias("id"))
    comp = connected_components(nodes, edges)
    # in_cluster: the component has >1 member.
    sizes = comp.groupBy("component").agg(F.count("*").alias("n"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col("id").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            (F.col("n") > 1).alias("in_cluster"),
        )
    )


def dedup_clusters_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production path: components over MinHash-LSH candidate pairs
    (est_jaccard >= 0.5), so transitive near-dup chains collapse into one
    keepable cluster. Not declared — the recursive oracle over LSH pairs
    re-derives the whole MinHash pipeline; covered by unit test instead."""
    docs = load_table(spark, sf_dir, "documents")
    # max_bucket=None: oracle-exact (uncapped) candidate set.
    pairs = minhash_lsh_candidates(docs, max_bucket=None).filter(
        F.col("est_jaccard") >= 0.5
    )
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    nodes = docs.select(F.col("doc_id").alias("id"))
    return connected_components(nodes, edges)


@declare(
    "q_dedup_survivorship",
    oracle=f"""
    WITH RECURSIVE edges AS (
        SELECT doc_a AS src, doc_b AS dst
        FROM ({_minhash_oracle()})
        WHERE est_jaccard >= {SURVIVOR_JACCARD}
    ), sym AS (
        SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ), reach(id, label) AS (
        -- only edge endpoints: every member of a multi-member cluster
        -- touches an edge, and singletons are dropped by HAVING anyway
        SELECT DISTINCT src, src FROM sym
        UNION
        SELECT s.dst, r.label FROM reach r JOIN sym s ON s.src = r.id
    ), comp AS (
        SELECT id AS doc_id, min(label) AS cluster_id
        FROM reach GROUP BY id
    ), m AS (
        SELECT c.cluster_id, d.doc_id, d.n_chars,
               row_number() OVER (PARTITION BY c.cluster_id
                                  ORDER BY d.n_chars DESC, d.doc_id) AS rn
        FROM comp c JOIN documents d USING (doc_id)
    )
    SELECT cluster_id,
           count(*) AS n_members,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(min(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT)
               AS survivor_doc,
           CAST(sum(CASE WHEN rn = 1 THEN n_chars ELSE 0 END) AS BIGINT)
               AS survivor_chars
    FROM m
    GROUP BY cluster_id
    HAVING count(*) > 1
    """,
    tier="P1",
)
def q_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship over near-duplicate clusters: MinHash-LSH candidate
    pairs at est_jaccard >= 0.5 are the edges, their transitive closure
    the clusters (same min-label propagation as q_dedup_clusters), and for
    every multi-member cluster the canonical representative is elected —
    longest document, doc_id tiebreak — with accounting for what dedup
    drops. This is the decision step a training-data pipeline runs AFTER
    near-dup detection: which copy to keep, how many bytes go away.

    Plan: candidate generation is the banded LSH equi-join (no all-pairs);
    the component labels join back to (doc_id, n_chars) — a skinny payload
    — then one window ranks members inside each cluster and one aggregate
    emits per-cluster stats. Cluster cardinality, not corpus size, bounds
    the output."""
    docs = load_table(spark, sf_dir, "documents")
    edges = (
        minhash_lsh_candidates(docs, max_bucket=None)
        .filter(F.col("est_jaccard") >= SURVIVOR_JACCARD)
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .localCheckpoint(eager=True)  # candidates feed every CC round
    )
    # Nodes = edge endpoints only: every member of a multi-member cluster
    # touches an edge (singletons are filtered out below), so the label
    # table each round is bounded by 2|edges|, not corpus size.
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    comp = connected_components(nodes, edges)
    members = comp.join(
        docs.select(F.col("doc_id").alias("id"), "n_chars"), "id"
    )
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("id")
    )
    ranked = members.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy(F.col("component").alias("cluster_id"))
        .agg(
            F.count("*").alias("n_members"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min(F.when(F.col("rn") == 1, F.col("id")))
            .cast("bigint")
            .alias("survivor_doc"),
            F.sum(F.when(F.col("rn") == 1, F.col("n_chars")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("survivor_chars"),
        )
        .filter(F.col("n_members") > 1)
    )
