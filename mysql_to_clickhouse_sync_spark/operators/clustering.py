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
from mysql_to_clickhouse_sync_spark.operators.text import (
    _fixed_log2_q8_sql,
    with_fixed_log2_q8,
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


# --- Fixed-point PageRank over the near-dup graph ---------------------------

PAGERANK_ITERS = 3
PR_UNIT = 1_000_000  # rank micro-units: integer arithmetic end to end
PR_BASE = 150_000  # (1 - d) * UNIT at damping d = 0.85
PR_EDGE_JACCARD = 0.5  # same edge bar as dedup_clusters_minhash


def _pagerank_oracle() -> str:
    rounds = []
    for i in range(1, PAGERANK_ITERS + 1):
        prev = f"r_{i - 1}"
        rounds.append(
            f"""
    , s_{i} AS MATERIALIZED (
        SELECT e.dst AS doc_id, SUM({prev}.r // d.deg) AS c
        FROM sym e
        JOIN {prev} ON {prev}.doc_id = e.src
        JOIN deg d ON d.doc_id = e.src
        GROUP BY e.dst
    ), r_{i} AS MATERIALIZED (
        SELECT n.doc_id,
               {PR_BASE} + (85 * COALESCE(s.c, 0)) // 100 AS r
        FROM nodes n LEFT JOIN s_{i} s ON s.doc_id = n.doc_id
    )"""
        )
    return f"""
    WITH mh AS (
        {_minhash_oracle()}
    ), nodes AS MATERIALIZED (
        SELECT doc_id FROM documents
    ), edges AS MATERIALIZED (
        SELECT doc_a AS src, doc_b AS dst FROM mh
        WHERE est_jaccard >= {PR_EDGE_JACCARD}
    ), sym AS MATERIALIZED (
        SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ), deg AS MATERIALIZED (
        SELECT src AS doc_id, count(*) AS deg FROM sym GROUP BY src
    ), r_0 AS MATERIALIZED (
        SELECT doc_id, {PR_UNIT} AS r FROM nodes
    )
    {''.join(rounds)}
    SELECT n.doc_id,
           CAST(r.r AS BIGINT) AS rank_micro,
           CAST(COALESCE(d.deg, 0) AS BIGINT) AS degree
    FROM nodes n
    JOIN r_{PAGERANK_ITERS} r ON r.doc_id = n.doc_id
    LEFT JOIN deg d ON d.doc_id = n.doc_id
    """


@declare("q_pagerank", oracle=_pagerank_oracle(), tier="P1")
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIXED-POINT PageRank (damping 0.85, 3 power iterations) over the
    MinHash near-dup graph — the centrality complement to connected
    components: within a dup cluster, rank concentrates on the most-
    connected representative (a principled survivor pick), and across the
    corpus it scores how 'template-like' a document's neighborhood is.

    Engine parity is the point: float PageRank sums r/deg in partition
    order and can never hash-match, so ranks are INTEGER MICRO-UNITS with
    floor-divided contributions (r // deg, then (85 * S) // 100) — every
    operation exact and associative, the same trick as the repo's integer
    cents/micros money sums. The oracle unrolls the three Jacobi rounds
    as MATERIALIZED CTEs (the chained-CTE 2^k inlining trap).

    Scale notes (100 TB): per iteration ONE shuffle — contributions are
    map-side (r // deg on the rank frame, broadcast-or-colocated deg),
    then a sum keyed on dst; the rank frame is localCheckpointed per
    round (constant plan depth, clustering.py's pattern). Total cost is
    ITERS * one keyed aggregation over the EDGE table — the textbook
    distributed PageRank shape."""
    docs = load_table(spark, sf_dir, "documents")
    # max_bucket=None: oracle-exact (uncapped) candidate set.
    pairs = minhash_lsh_candidates(docs, max_bucket=None).filter(
        F.col("est_jaccard") >= PR_EDGE_JACCARD
    )
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    sym = (
        edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = docs.select("doc_id")
    ranks = nodes.select("doc_id", F.lit(PR_UNIT).cast("bigint").alias("r"))
    for _ in range(PAGERANK_ITERS):
        contrib = (
            ranks.join(deg, ranks.doc_id == deg.src)
            .select("doc_id", F.expr("r div deg").alias("c"))
            .join(sym, F.col("doc_id") == sym.src)
            .select(F.col("dst"), "c")
        )
        s = contrib.groupBy("dst").agg(F.sum("c").alias("sc"))
        ranks = (
            nodes.join(s, nodes.doc_id == s.dst, "left")
            .select(
                "doc_id",
                (
                    F.lit(PR_BASE)
                    + F.expr("85 * coalesce(sc, 0) div 100")
                ).cast("bigint").alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        ranks.join(deg, ranks.doc_id == deg.src, "left")
        .select(
            "doc_id",
            F.col("r").alias("rank_micro"),
            F.coalesce("deg", F.lit(0)).cast("bigint").alias("degree"),
        )
    )


# --- Triangle counting / local clustering coefficient -----------------------

TRI_EDGE_JACCARD = 0.5  # same edge bar as q_pagerank / dedup_clusters_minhash


def _triangle_oracle() -> str:
    return f"""
    WITH mh AS (
        {_minhash_oracle()}
    ), edges AS MATERIALIZED (
        SELECT doc_a AS src, doc_b AS dst FROM mh
        WHERE est_jaccard >= {TRI_EDGE_JACCARD}
    ), tri AS MATERIALIZED (
        SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM edges e1
        JOIN edges e2 ON e2.src = e1.dst
        JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
    ), mem AS (
        SELECT a AS doc_id FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    ), sym AS MATERIALIZED (
        SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ), deg AS (
        SELECT src AS doc_id, CAST(count(*) AS BIGINT) AS deg
        FROM sym GROUP BY src
    ), cnt AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS tri FROM mem
        GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(deg.deg, 0) AS BIGINT) AS degree,
           CAST(COALESCE(cnt.tri, 0) AS BIGINT) AS n_triangles,
           CAST(CASE WHEN COALESCE(deg.deg, 0) >= 2
                THEN (2000 * COALESCE(cnt.tri, 0))
                     // (deg.deg * (deg.deg - 1))
                ELSE 0 END AS BIGINT) AS clustering_milli
    FROM documents d
    LEFT JOIN deg ON deg.doc_id = d.doc_id
    LEFT JOIN cnt ON cnt.doc_id = d.doc_id
    """


@declare("q_triangle_count", oracle=_triangle_oracle(), tier="P1")
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document triangle membership + local clustering coefficient
    over the MinHash near-dup graph — the density diagnostic that
    separates tight template clusters (every pair similar: coefficient
    near 1) from hub-and-spoke false-positive stars (a bucket collision
    links many docs through one center: coefficient near 0). The
    standard survivorship/graph-quality signal after candidate
    generation. Coefficient = 2*T/(deg*(deg-1)) in exact integer
    milli-units (2000*T floor-divided — engine-identical).

    Triangles enumerate with the canonical oriented-wedge plan: edges
    kept as (src < dst), wedges a<b<c from one self-join, closed by a
    second join probing the (a, c) edge — each triangle counted exactly
    once, no orientation double-count.

    Scale notes: two equi-joins on the EDGE table; wedge volume is
    sum-of-squared-degrees, which the armed LSH bucket caps bound at
    the source (a degree-capped graph cannot produce a quadratic wedge
    blow-up; this declared form consumes the oracle-exact uncapped
    edges, same contract split as q_pagerank). Per-node tallies are one
    map-side-combined shuffle of 3 rows per triangle."""
    docs = load_table(spark, sf_dir, "documents")
    # max_bucket=None: oracle-exact (uncapped) candidate set.
    pairs = minhash_lsh_candidates(docs, max_bucket=None).filter(
        F.col("est_jaccard") >= TRI_EDGE_JACCARD
    )
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).localCheckpoint(eager=True)
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = edges.select(F.col("src").alias("b2"), F.col("dst").alias("c"))
    e3 = edges.select(F.col("src").alias("a3"), F.col("dst").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(
            e3,
            (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")),
        )
        .select("a", "b", "c")
    )
    mem = (
        tri.select(F.col("a").alias("doc_id"))
        .unionAll(tri.select(F.col("b").alias("doc_id")))
        .unionAll(tri.select(F.col("c").alias("doc_id")))
    )
    cnt = mem.groupBy("doc_id").agg(F.count("*").cast("long").alias("tri"))
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = sym.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
    nodes = docs.select("doc_id")
    return (
        nodes.join(deg, nodes.doc_id == deg.src, "left")
        .join(cnt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("deg", F.lit(0)).cast("long").alias("degree"),
            F.coalesce("tri", F.lit(0)).cast("long").alias("n_triangles"),
            F.expr(
                "CAST(CASE WHEN coalesce(deg, 0) >= 2"
                " THEN (2000 * coalesce(tri, 0))"
                " div (deg * (deg - 1))"
                " ELSE 0 END AS BIGINT)"
            ).alias("clustering_milli"),
        )
    )


# --- Semi-supervised label propagation --------------------------------------

LP_SEED_MOD = 5  # doc_id % 5 == 0 -> seeded with its lang label
LP_ROUNDS = 2


def _label_prop_oracle() -> str:
    rounds = []
    for r in range(1, LP_ROUNDS + 1):
        prev = f"l_{r - 1}"
        rounds.append(
            f"""
    , v_{r} AS MATERIALIZED (
        SELECT s.dst AS doc_id, l.lab, count(*) AS c
        FROM sym s JOIN {prev} l ON l.doc_id = s.src
        GROUP BY s.dst, l.lab
    ), p_{r} AS MATERIALIZED (
        SELECT doc_id, lab FROM (
            SELECT doc_id, lab, row_number() OVER (
                       PARTITION BY doc_id ORDER BY c DESC, lab) AS rn
            FROM v_{r}
        ) WHERE rn = 1
    ), l_{r} AS MATERIALIZED (
        SELECT doc_id, lab FROM l_0
        UNION ALL
        SELECT p.doc_id, p.lab
        FROM p_{r} p JOIN nodes n ON n.doc_id = p.doc_id AND NOT n.seeded
    )"""
        )
    return f"""
    WITH mh AS (
        {_minhash_oracle()}
    ), edges AS MATERIALIZED (
        SELECT doc_a AS src, doc_b AS dst FROM mh
        WHERE est_jaccard >= {TRI_EDGE_JACCARD}
    ), sym AS MATERIALIZED (
        SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ), nodes AS MATERIALIZED (
        SELECT doc_id, lang, (doc_id % {LP_SEED_MOD} = 0) AS seeded
        FROM documents
    ), l_0 AS MATERIALIZED (
        SELECT doc_id, lang AS lab FROM nodes WHERE seeded
    )
    {''.join(rounds)}
    SELECT n.doc_id, l.lab AS lp_label, n.seeded
    FROM nodes n LEFT JOIN l_{LP_ROUNDS} l ON l.doc_id = n.doc_id
    """


@declare("q_label_prop", oracle=_label_prop_oracle(), tier="P1")
def q_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label propagation over the near-dup graph: 20% of
    documents (doc_id % 5 == 0) are seeded with their lang label; for
    two rounds every unseeded node adopts the MAJORITY label among its
    labeled neighbors (deterministic tie-break: higher count, then
    lexicographically smallest label), recomputed fresh each round from
    the fixed seeds. The standard cheap-label-expansion move of a
    curation pipeline (propagate scarce human labels through the
    duplicate graph before training a classifier — near-dups share
    labels almost surely). lp_label stays NULL for nodes with no
    labeled neighbor within two hops.

    Scale notes: per round one (dst, label)-keyed map-side-combined
    shuffle + one per-node window over its distinct neighbor labels —
    the PageRank cost shape. Rounds unroll as MATERIALIZED CTEs in the
    oracle (the chained-CTE 2^k inlining trap)."""
    docs = load_table(spark, sf_dir, "documents")
    # max_bucket=None: oracle-exact (uncapped) candidate set.
    pairs = minhash_lsh_candidates(docs, max_bucket=None).filter(
        F.col("est_jaccard") >= TRI_EDGE_JACCARD
    )
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    sym = (
        edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = docs.select(
        "doc_id", "lang", (F.col("doc_id") % LP_SEED_MOD == 0).alias("seeded")
    )
    seeds = nodes.filter("seeded").select("doc_id", F.col("lang").alias("lab"))
    labels = seeds
    w = Window.partitionBy("doc_id").orderBy(F.desc("c"), F.asc("lab"))
    for _ in range(LP_ROUNDS):
        votes = (
            sym.join(labels, sym.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"), "lab")
            .agg(F.count("*").alias("c"))
        )
        picked = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("doc_id", "lab")
        )
        labels = seeds.unionAll(
            picked.join(
                nodes.filter(~F.col("seeded")).select("doc_id"), "doc_id"
            )
        ).localCheckpoint(eager=True)
    return (
        nodes.join(labels, "doc_id", "left")
        .select("doc_id", F.col("lab").alias("lp_label"), "seeded")
    )


# --- q_link_predict ----------------------------------------------------------

AA_SCALE = 1_000_000  # Adamic-Adar scores in exact integer micro-units
LP_NODE_BOUND = 300  # bounded subgraph (the bounded-subset ground-truth
#                      convention of the dedup honesty loop, SCALE.md)
LP_TAU = 280_000  # edge bar: grid-quantized dot (1024^2 units, ~cos 0.27)


LP_EDGES_CTE = f"""qv AS (
        SELECT vec_id,
               list_transform(embedding,
                   v -> CAST(floor(CAST(v AS DOUBLE) * 1024) AS BIGINT)) AS qv
        FROM embeddings WHERE vec_id < {LP_NODE_BOUND}
    ), edges AS MATERIALIZED (
        SELECT a.vec_id AS src, b.vec_id AS dst
        FROM qv a JOIN qv b ON a.vec_id < b.vec_id
        WHERE list_reduce(list_transform(list_zip(a.qv, b.qv),
                          p -> p[1] * p[2]), (x, y) -> x + y) >= {LP_TAU}
    )"""


def lp_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical (src < dst) edge list of the bounded embedding
    similarity graph (vec_id < LP_NODE_BOUND, grid dot >= LP_TAU) —
    the shared graph of q_link_predict and q_bfs_layers; mirrored by
    LP_EDGES_CTE. Materialized eagerly (it is consumed repeatedly by
    wedge joins / BFS rounds)."""
    qv = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < LP_NODE_BOUND
    ).select(
        "vec_id",
        F.expr(
            "transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE)"
            " * 1024) AS BIGINT))"
        ).alias("qv"),
    )
    a = qv.select(F.col("vec_id").alias("ida"), F.col("qv").alias("qa"))
    b = qv.select(F.col("vec_id").alias("idb"), F.col("qv").alias("qb"))
    return (
        a.join(F.broadcast(b), F.col("ida") < F.col("idb"))
        .withColumn(
            "dot",
            F.aggregate(
                F.zip_with("qa", "qb", lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )
        .filter(F.col("dot") >= LP_TAU)
        .select(F.col("ida").alias("src"), F.col("idb").alias("dst"))
        .localCheckpoint(eager=True)
    )


def _link_predict_oracle() -> str:
    return f"""
    WITH {LP_EDGES_CTE}, sym AS MATERIALIZED (
        SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ), deg AS (
        SELECT src AS z, CAST(count(*) AS BIGINT) AS deg
        FROM sym GROUP BY src
    ), args AS (
        SELECT DISTINCT deg AS x FROM deg WHERE deg >= 2
    ),
    {_fixed_log2_q8_sql('args')},
    dw AS (
        SELECT deg.z, CAST({AA_SCALE * 256} // lg.lq8 AS BIGINT) AS w
        FROM deg JOIN lg ON lg.x = deg.deg WHERE deg.deg >= 2
    ), wedge AS (
        SELECT s1.dst AS u, s2.dst AS w, s1.src AS z
        FROM sym s1 JOIN sym s2 ON s1.src = s2.src AND s1.dst < s2.dst
    ), cand AS (
        SELECT u, w, z FROM wedge
        WHERE NOT EXISTS (SELECT 1 FROM edges e
                          WHERE e.src = wedge.u AND e.dst = wedge.w)
    )
    SELECT cand.u AS src, cand.w AS dst,
           CAST(count(*) AS BIGINT) AS n_common,
           CAST(sum(dw.w) AS BIGINT) AS aa_micro
    FROM cand JOIN dw ON dw.z = cand.z
    GROUP BY cand.u, cand.w
    """


@declare("q_link_predict", oracle=_link_predict_oracle(), tier="P1")
def q_link_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the embedding similarity graph:
    for every non-edge (u, w) sharing at least one neighbor, score =
    sum over common neighbors z of 1/log2(deg z) — rare shared
    neighbors weigh more than hub collisions. The standard
    missing-edge / entity-resolution-completion signal: a pair the
    threshold graph missed but AA ranks high is a likely near-duplicate
    worth an exact re-score (cf. q_editdist_rescore). The graph is a
    bounded subgraph (vec_id < 300, exact integer grid dots >= LP_TAU)
    because AA needs OPEN wedges — the MinHash >= 0.5 dup graph is all
    closed cliques at every fixture SF, so it cannot exercise this
    operator. Common neighbors have deg >= 2 by construction, so
    log2(deg) >= 1 and the per-z weight floor(1e6 * 256 / lq8(deg)) is
    exact BIGINT via the Q8 log2 kernel; per-pair sums of exact terms
    are order-independent, so aa_micro is bitwise engine-identical.

    Scale notes: the bounded subgraph is the ground-truth twin
    (constant cost at every SF, the dedup-honesty convention); the
    production path builds edges from the banded ANN candidates
    (similarity.py) whose armed caps bound sum-of-squared-degrees —
    the exact quantity that controls wedge volume. The degree/weight
    table is |nodes|-bounded and broadcasts; the heavy lifting is the
    sym self-join plus one (u, w)-keyed map-side-combined shuffle."""
    edges = lp_edges(spark, sf_dir)
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = sym.groupBy(F.col("src").alias("z")).agg(
        F.count("*").cast("long").alias("deg")
    )
    dw = with_fixed_log2_q8(deg.filter(F.col("deg") >= 2), "deg", "lq")
    dw = dw.select("z", F.expr(f"{AA_SCALE * 256} div lq").alias("w"))
    s1 = sym.select(F.col("src").alias("z"), F.col("dst").alias("u"))
    s2 = sym.select(F.col("src").alias("z2"), F.col("dst").alias("w2"))
    wedge = s1.join(
        s2, (F.col("z") == F.col("z2")) & (F.col("u") < F.col("w2"))
    ).select("u", F.col("w2").alias("wn"), "z")
    cand = wedge.join(
        edges,
        (F.col("u") == F.col("src")) & (F.col("wn") == F.col("dst")),
        "left_anti",
    )
    return (
        cand.join(F.broadcast(dw), "z")
        .groupBy(F.col("u").alias("src"), F.col("wn").alias("dst"))
        .agg(
            F.count("*").cast("long").alias("n_common"),
            F.sum("w").cast("long").alias("aa_micro"),
        )
    )


# --- q_bfs_layers ------------------------------------------------------------

BFS_MAX_HOPS = 3
BFS_SEED_STRIDE = 50  # seeds: every 50th node of the bounded LP graph


def _bfs_oracle() -> str:
    return f"""
    WITH RECURSIVE {LP_EDGES_CTE}, sym AS MATERIALIZED (
        SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ), reach AS (
        SELECT vec_id AS id, CAST(0 AS BIGINT) AS lvl
        FROM qv WHERE vec_id % {BFS_SEED_STRIDE} = 0
        UNION ALL
        SELECT s.dst AS id, r.lvl + 1 AS lvl
        FROM reach r JOIN sym s ON s.src = r.id
        WHERE r.lvl < {BFS_MAX_HOPS}
    )
    SELECT id AS vec_id, CAST(min(lvl) AS BIGINT) AS layer
    FROM reach GROUP BY id
    """


@declare("q_bfs_layers", oracle=_bfs_oracle(), tier="P2")
def q_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS layers (<= 3 hops) from a fixed seed panel over
    the bounded embedding similarity graph (q_link_predict's graph) —
    "how much of the near-duplicate neighborhood is within k hops of
    the already-reviewed set", the expansion query of an audit or
    labeling campaign. layer = min hop count from any seed; nodes
    beyond 3 hops (or disconnected) are absent.

    Scale notes: each BFS round is one frontier-keyed equi-join against
    the edge list plus an anti-join on the visited set — the canonical
    distributed BFS; rounds are bounded (3). The declared form runs on
    the bounded ground-truth subgraph; production seeds/edges come from
    the banded candidate generators whose caps bound the frontier
    fan-out."""
    edges = lp_edges(spark, sf_dir)
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    labeled = (
        load_table(spark, sf_dir, "embeddings")
        .filter(
            (F.col("vec_id") < LP_NODE_BOUND)
            & (F.col("vec_id") % BFS_SEED_STRIDE == 0)
        )
        .select(
            F.col("vec_id").alias("id"),
            F.lit(0).cast("long").alias("layer"),
        )
        .localCheckpoint(eager=True)
    )
    frontier = labeled
    for hop in range(1, BFS_MAX_HOPS + 1):
        nxt = (
            frontier.join(sym, frontier["id"] == sym["src"])
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(labeled.select("id"), "id", "left_anti")
            .withColumn("layer", F.lit(hop).cast("long"))
            .localCheckpoint(eager=True)
        )
        labeled = labeled.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return labeled.select("id", "layer").withColumnRenamed("id", "vec_id")


# --- q_kcore -----------------------------------------------------------------

KCORE_K = 3  # the core order: nodes keep >= K neighbors inside the core
KCORE_ROUNDS = 12  # unrolled peeling rounds (fixture graphs converge in
# ~4; the law is DEFINED as exactly this many rounds so both engines
# compute the identical object even off-fixture, and the convergence
# test pins that the fixpoint is reached well inside the budget)


def _kcore_oracle() -> str:
    ctes = [
        """a0 AS MATERIALIZED (
        SELECT src AS node FROM edges
        UNION SELECT dst FROM edges
    )"""
    ]
    for i in range(1, KCORE_ROUNDS + 1):
        ctes.append(f"""a{i} AS MATERIALIZED (
        SELECT node FROM (
            SELECT s.src AS node, count(*) AS d
            FROM sym s
            JOIN a{i - 1} x ON x.node = s.src
            JOIN a{i - 1} y ON y.node = s.dst
            GROUP BY s.src
        ) WHERE d >= {KCORE_K}
    )""")
    chain = ",\n    ".join(ctes)
    return f"""
    WITH {LP_EDGES_CTE}, sym AS MATERIALIZED (
        SELECT src, dst FROM edges
        UNION ALL SELECT dst, src FROM edges
    ),
    {chain}
    SELECT s.src AS vec_id, CAST(count(*) AS BIGINT) AS core_degree
    FROM sym s
    JOIN a{KCORE_ROUNDS} x ON x.node = s.src
    JOIN a{KCORE_ROUNDS} y ON y.node = s.dst
    GROUP BY s.src
    """


@declare("q_kcore", oracle=_kcore_oracle(), tier="P2")
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{K}-core of the bounded embedding similarity graph: iteratively
    peel nodes with fewer than K within-subgraph neighbors until the
    fixpoint — the densest-region extractor of the graph battery (the
    community CORES that survive when loosely-attached satellites are
    removed; in a dedup graph, the k-core is the "everything here is
    mutually near-duplicate" nucleus worth human review, where
    connected components also merge chains of barely-related pairs).
    Same shared graph as q_link_predict / q_bfs_layers (LP_EDGES_CTE);
    peeling unrolled to a FIXED round budget with every round
    materialized (the iterative-CTE inlining rule), so the object is
    identical on both engines by construction.

    Scale notes: each round is one degree aggregation over the
    surviving edge set — O(E) per round, rounds bounded; the panel is
    the fixed LP subgraph (the fixed-panel rule), and at corpus scale
    the same peeling runs on the banded-LSH dedup graph whose edge
    count is linear by the guard policy.""".replace("{K}", str(KCORE_K))
    edges = lp_edges(spark, sf_dir)
    sym = (
        edges.select("src", "dst")
        .unionAll(edges.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
        .localCheckpoint(eager=True)
    )
    alive = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(KCORE_ROUNDS):
        alive = (
            sym.join(alive.withColumnRenamed("node", "sa"),
                     F.col("src") == F.col("sa"))
            .join(alive.withColumnRenamed("node", "sb"),
                  F.col("dst") == F.col("sb"))
            .groupBy("src")
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") >= KCORE_K)
            .select(F.col("src").alias("node"))
            .localCheckpoint(eager=True)  # constant plan depth per round
        )
    return (
        sym.join(alive.withColumnRenamed("node", "ka"),
                 F.col("src") == F.col("ka"))
        .join(alive.withColumnRenamed("node", "kb"),
              F.col("dst") == F.col("kb"))
        .groupBy("src")
        .agg(F.count("*").cast("long").alias("core_degree"))
        .select(F.col("src").alias("vec_id"), "core_degree")
    )
