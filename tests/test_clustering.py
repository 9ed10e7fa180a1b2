"""Connected-components tests: transitive chains, isolated nodes, multiple
clusters, and the minhash-edge integration."""

from __future__ import annotations

from mysql_to_clickhouse_sync_spark.operators.clustering import (
    connected_components,
)


def _cc(spark, n_nodes, edge_list):
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "id bigint")
    edges = spark.createDataFrame(
        edge_list or [(0, 0)], "src bigint, dst bigint"
    )
    if not edge_list:
        edges = edges.filter("src < 0")
    return {
        r.id: r.component for r in connected_components(nodes, edges).collect()
    }


def test_transitive_chain_collapses(spark):
    # 0-1, 1-2, 2-3: 0 and 3 share no edge but must share a cluster.
    comp = _cc(spark, 5, [(0, 1), (1, 2), (2, 3)])
    assert comp[0] == comp[1] == comp[2] == comp[3] == 0
    assert comp[4] == 4  # isolated


def test_multiple_components_and_direction_independence(spark):
    # Edges given in arbitrary orientation; two separate clusters.
    comp = _cc(spark, 6, [(1, 0), (2, 1), (5, 4)])
    assert comp[0] == comp[1] == comp[2] == 0
    assert comp[4] == comp[5] == 4
    assert comp[3] == 3


def test_no_edges_all_singletons(spark):
    comp = _cc(spark, 4, [])
    assert comp == {0: 0, 1: 1, 2: 2, 3: 3}


def test_long_path_converges_within_cap(spark):
    # A path of 15 nodes needs ~log rounds with min-propagation through
    # neighbors; must converge inside MAX_ITERATIONS.
    comp = _cc(spark, 15, [(i, i + 1) for i in range(14)])
    assert set(comp.values()) == {0}


def test_non_convergence_raises_not_wrong_labels(spark):
    # Hitting the iteration cap with labels still moving must be an ERROR:
    # returning silently non-converged labels would split a component into
    # two ids and diverge from the recursive-closure oracle.
    import pytest

    from pyspark.sql import Row

    nodes = spark.createDataFrame([Row(id=i) for i in range(6)])
    edges = spark.createDataFrame(
        [Row(src=i, dst=i + 1) for i in range(5)]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges, max_iterations=1)


def test_minhash_cluster_integration(spark):
    """Planted A~B~C chain through one-word edits: B bridges A and C, so all
    three land in one cluster even if A~C alone wouldn't pair."""
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill and the birds sing outside in the garden"
    )
    mid = base.replace("warm", "cold")
    far = mid.replace("quick", "slow")
    other = "entirely unrelated text about columnar execution engines and shuffles"
    docs = spark.createDataFrame(
        [(0, base), (1, mid), (2, far), (3, other)], "doc_id bigint, text string"
    )
    from mysql_to_clickhouse_sync_spark.operators.dedup import (
        minhash_lsh_candidates,
    )
    from pyspark.sql import functions as F

    pairs = minhash_lsh_candidates(docs, max_bucket=None).filter(
        F.col("est_jaccard") >= 0.5
    )
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    nodes = docs.select(F.col("doc_id").alias("id"))
    comp = {
        r.id: r.component
        for r in connected_components(nodes, edges).collect()
    }
    assert comp[0] == comp[1] == comp[2] == 0
    assert comp[3] == 3


def test_pagerank_exact_recompute_and_invariants(spark):
    """Recompute the fixed-point PageRank in pure Python from the same
    edge set and require EXACT equality (the integer spec has one right
    answer); spot invariants: isolated docs keep the closed-form rank
    150000 + 850000*... = base-only chain, and ranks are positive."""
    from mysql_to_clickhouse_sync_spark.operators.clustering import (
        PAGERANK_ITERS,
        PR_BASE,
        PR_EDGE_JACCARD,
        PR_UNIT,
        q_pagerank,
    )
    from mysql_to_clickhouse_sync_spark.operators.dedup import (
        minhash_lsh_candidates,
    )
    from pyspark.sql import functions as F

    from mysql_to_clickhouse_sync_spark.catalog import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    pairs = minhash_lsh_candidates(docs, max_bucket=None).filter(
        F.col("est_jaccard") >= PR_EDGE_JACCARD
    )
    sym = set()
    for r in pairs.collect():
        sym.add((r.doc_a, r.doc_b))
        sym.add((r.doc_b, r.doc_a))
    nodes = [r.doc_id for r in docs.select("doc_id").collect()]
    deg = {}
    for s, _ in sym:
        deg[s] = deg.get(s, 0) + 1
    rank = {v: PR_UNIT for v in nodes}
    for _ in range(PAGERANK_ITERS):
        contrib = {}
        for s, d in sym:
            contrib[d] = contrib.get(d, 0) + rank[s] // deg[s]
        rank = {v: PR_BASE + (85 * contrib.get(v, 0)) // 100 for v in nodes}

    got = {r.doc_id: (r.rank_micro, r.degree) for r in
           q_pagerank(spark, SF_DIR).collect()}
    assert set(got) == set(nodes)
    for v in nodes:
        assert got[v] == (rank[v], deg.get(v, 0)), v
    # isolated nodes: rank settles to the damped base-only fixed chain
    iso = [v for v in nodes if deg.get(v, 0) == 0]
    assert iso and all(got[v][0] == PR_BASE for v in iso)
    assert all(r > 0 for r, _ in got.values())
