"""Triangle counting + label propagation invariants, re-derived in
Python from the same edge set (the oracle parity sweep pins exact
values; these pin the graph semantics independently of SQL)."""

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _edges(spark):
    from mysql_to_clickhouse_sync_spark.catalog import load_table
    from mysql_to_clickhouse_sync_spark.operators.clustering import (
        TRI_EDGE_JACCARD,
    )
    from mysql_to_clickhouse_sync_spark.operators.dedup import (
        minhash_lsh_candidates,
    )

    docs = load_table(spark, SF_DIR, "documents")
    pairs = minhash_lsh_candidates(docs, max_bucket=None).filter(
        F.col("est_jaccard") >= TRI_EDGE_JACCARD
    )
    return [(r.doc_a, r.doc_b) for r in pairs.collect()]


def test_triangle_count_matches_bruteforce(spark):
    from mysql_to_clickhouse_sync_spark.operators.clustering import (
        q_triangle_count,
    )

    edges = set(_edges(spark))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri = Counter()
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:  # a < b < c: count each triangle once
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
    got = {r.doc_id: r for r in q_triangle_count(spark, SF_DIR).collect()}
    assert got  # every document gets a row
    n_tri_total = sum(tri.values())
    assert n_tri_total == sum(r.n_triangles for r in got.values())
    for doc, r in got.items():
        assert r.n_triangles == tri.get(doc, 0)
        assert r.degree == len(adj.get(doc, ()))
        if r.degree >= 2:
            assert (
                r.clustering_milli
                == 2000 * r.n_triangles // (r.degree * (r.degree - 1))
            )
            assert 0 <= r.clustering_milli <= 2000
        else:
            assert r.clustering_milli == 0
    # the near-dup graph genuinely contains triangles at this SF
    # (dup clusters are cliques) — otherwise this test pins nothing
    assert n_tri_total > 0


def test_label_prop_matches_bruteforce(spark):
    from mysql_to_clickhouse_sync_spark.catalog import load_table
    from mysql_to_clickhouse_sync_spark.operators.clustering import (
        LP_ROUNDS,
        LP_SEED_MOD,
        q_label_prop,
    )

    docs = {
        r.doc_id: r.lang
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "lang")
        .collect()
    }
    adj = defaultdict(set)
    for a, b in _edges(spark):
        adj[a].add(b)
        adj[b].add(a)
    seeds = {d: lang for d, lang in docs.items() if d % LP_SEED_MOD == 0}
    labels = dict(seeds)
    for _ in range(LP_ROUNDS):
        nxt = dict(seeds)
        for node in docs:
            if node in seeds:
                continue
            votes = Counter(
                labels[nb] for nb in adj.get(node, ()) if nb in labels
            )
            if votes:
                nxt[node] = min(
                    votes, key=lambda lab: (-votes[lab], lab)
                )
        labels = nxt
    got = {r.doc_id: r for r in q_label_prop(spark, SF_DIR).collect()}
    assert set(got) == set(docs)
    for d, r in got.items():
        assert r.seeded == (d % LP_SEED_MOD == 0)
        assert r.lp_label == labels.get(d), d
        if r.seeded:
            assert r.lp_label == docs[d]
    # propagation actually labeled some unseeded nodes at this SF
    assert any(
        r.lp_label is not None and not r.seeded for r in got.values()
    )


def test_kcore_reaches_fixpoint_within_round_budget(spark):
    """The unrolled peeling budget must cover convergence: one more
    round past KCORE_ROUNDS changes nothing, and every surviving node
    has core-degree >= K (the defining property)."""
    from mysql_to_clickhouse_sync_spark.operators.clustering import (
        KCORE_K,
        q_kcore,
    )
    from tests.conftest import SF_DIR

    rows = q_kcore(spark, SF_DIR).collect()
    assert rows  # the fixture graph has a nonempty 3-core
    core = {r.vec_id for r in rows}
    deg = {r.vec_id: r.core_degree for r in rows}
    assert all(d >= KCORE_K for d in deg.values())
    # brute-force fixpoint check on the collected core: within-core
    # degrees computed from the edge list equal the query's, and no
    # further peel happens
    from mysql_to_clickhouse_sync_spark.operators.clustering import lp_edges

    edges = [
        (r.src, r.dst) for r in lp_edges(spark, SF_DIR).collect()
    ]
    within = {v: 0 for v in core}
    for s, d in edges:
        if s in core and d in core:
            within[s] += 1
            within[d] += 1
    assert within == deg
    assert all(d >= KCORE_K for d in within.values())  # stable: no peel
