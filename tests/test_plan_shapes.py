"""Physical-plan regression tests: the scale properties PLANS.md documents
are asserted here so a refactor can't silently trade a broadcast for a
sort-merge or lose a pushed filter. Plan SHAPE is scale-invariant — these
asserts hold at 100 TB even though they run at sf0.001."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from mysql_to_clickhouse_sync_spark.registry import queries
from tests.conftest import SF_DIR


def _plan(spark, name: str) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        queries()[name](spark, SF_DIR).explain("formatted")
    return buf.getvalue()


def test_star_joins_broadcast_not_shuffle(spark):
    # Dimension joins must be broadcast: the fact spine never shuffles
    # for a join in these plans.
    for name in ("q_join_enrich", "q_tpch_q3", "q_tpch_q5", "q_tpch_q7"):
        p = _plan(spark, name)
        assert "BroadcastHashJoin" in p, name
        assert "SortMergeJoin" not in p, f"{name}: dim join fell back to SMJ"


def test_date_filters_reach_parquet_scan(spark):
    p = _plan(spark, "q_tpch_q6")
    assert "GreaterThanOrEqual(l_shipdate" in p
    assert "LessThan(l_shipdate" in p
    # no shuffle at all: scan -> partial agg -> single-partition final agg
    assert "Exchange hashpartitioning" not in p


def test_topk_is_take_ordered_not_global_sort(spark):
    for name in ("q_tpch_q3", "q_tpch_q10", "q_tpch_q18", "q_topk_value"):
        assert "TakeOrderedAndProject" in _plan(spark, name), name


def test_salted_join_runs_shuffle_hash_path(spark):
    p = _plan(spark, "q_salted_join")
    assert "ShuffledHashJoin" in p
    assert "BroadcastHashJoin" not in p


def test_semi_join_for_exists(spark):
    assert "LeftSemi" in _plan(spark, "q_tpch_q4")


def test_unpivot_generates_no_exchange(spark):
    p = _plan(spark, "q_unpivot")
    assert "Exchange" not in p
    # column pruning: the scan must not read the string columns
    assert "l_returnflag" not in p


def test_ivf_broadcasts_centroids(spark):
    p = _plan(spark, "q_ann_ivf")
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p


def test_stats_broadcast_back_shapes(spark):
    # Per-group stats (medians / skyline levels) broadcast back over the
    # stream; the fact side must never sort-merge for them.
    for name in ("q_anomaly_mad", "q_skyline", "q_balanced_sample"):
        p = _plan(spark, name)
        assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p, name
        assert "SortMergeJoin" not in p, name


def test_collapsing_merge_single_window_single_exchange(spark):
    # The explode formulation runs ONE WindowExec (the union form ran two),
    # and the collapse groupBy rides the window's user_id partitioning —
    # grouping keys are a superset, so NO second exchange exists.
    p = _plan(spark, "q_collapsing_merge")
    assert p.count("Window (") == 1, p
    assert p.count("Exchange (") == 1, p


def test_running_delta_one_exchange_serves_lag_and_cumsum(spark):
    p = _plan(spark, "q_running_delta")
    assert p.count("Exchange (") == 1, p
    assert p.count("Window (") == 1, p


def test_neardup_candidates_are_equi_join_not_all_pairs(spark):
    # The banded-LSH near-dup must generate candidates through an EQUI-join
    # on (label, band, bucket) — never a nested-loop/cartesian pair
    # enumeration (the per-label all-pairs scale-killer lives only in the
    # bounded q_neardup_exact ground-truth twin).
    p = _plan(spark, "q_embedding_neardup")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Join" in p


def test_simhash_candidates_are_equi_join_not_all_pairs(spark):
    # q_simhash_dedup's candidates must come from the pigeonhole-chunk
    # EQUI-join on (lang, chunk_idx, chunk_val) — the per-language all-pairs
    # theta join lives only in the bounded q_simhash_exact twin. A theta
    # join on lang alone would surface as BroadcastNestedLoopJoin or a
    # cartesian with a post-filter.
    p = _plan(spark, "q_simhash_dedup")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "chunk_idx" in p and "chunk_val" in p


def test_dedup_ladder_no_all_pairs(spark):
    # Both ladder stages must stay equi-keyed: exact dedup is a window on
    # the md5 hash, near-dup candidates are the pigeonhole-chunk equi-join
    # — never a nested-loop / cartesian pair enumeration.
    p = _plan(spark, "q_dedup_ladder")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "chunk_idx" in p and "chunk_val" in p


def test_agg_state_merge_two_level_aggregation(spark):
    # -State then -Merge: two partial/final HashAggregate pairs, one
    # exchange per level — the coarse merge never rereads raw events.
    p = _plan(spark, "q_agg_state_merge")
    assert p.count("Exchange (") == 2, p
    assert p.count("HashAggregate (") == 4, p


def test_schema_drift_union_is_map_side(spark):
    # unionByName with NULL-fill must not shuffle; the only exchange is
    # the final audit aggregation.
    p = _plan(spark, "q_schema_drift")
    assert p.count("Exchange (") == 1, p


def test_token_budget_one_exchange_serves_window_and_agg(spark):
    # The per-language running sum and the per-language audit aggregate
    # share a single hash exchange on lang.
    p = _plan(spark, "q_token_budget_sample")
    assert p.count("Exchange (") == 1, p
    assert p.count("Window (") == 1, p


def test_semantic_guarded_equi_join_and_broadcast_guard(spark):
    # q_semantic_guarded: the within-cluster pair join stays an equi-join
    # on cid (never cartesian), and the guard's two joins — the anti-join
    # against the oversize-cluster set and the capped-flag attach — are
    # BROADCAST (the set is <= K rows by construction).
    p = _plan(spark, "q_semantic_guarded")
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p
    assert "LeftAnti" in p


def test_kmeans_pp_no_cartesian_and_broadcast_assignment(spark):
    # q_kmeans_pp: the seeding pipeline runs eagerly (localCheckpointed
    # constant-size frames), so the returned plan is just the assignment —
    # which must be the same 1-row packed-centroid broadcast as q_kmeans
    # (BroadcastNestedLoopJoin against ONE row is the packed kernel, not a
    # pair enumeration), never a shuffled cartesian.
    p = _plan(spark, "q_kmeans_pp")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p
    assert _plan(spark, "q_kmeans").count("Join") == p.count("Join")


def test_neardup_pipeline_guards_armed_and_no_all_pairs(spark):
    """The composed pipeline keeps every stage's scale shape: three
    armed guards (broadcast anti-joins against the oversize-key sets),
    banded equi-joins only (a theta-only join would surface as a
    non-broadcast cartesian), and 1-row broadcast NLJs for the ledger
    assembly."""
    p = _plan(spark, "q_neardup_pipeline")
    assert p.count("LeftAnti") >= 3, "a generator lost its bucket guard"
    assert "CartesianProduct" not in p


def test_unigram_dp_is_single_pipeline_no_join_per_position(spark):
    """The Viterbi DP must stay ONE projection chain over a broadcast
    map column — a join-per-position refactor (24+ joins) would show up
    as a forest of SortMergeJoins."""
    p = _plan(spark, "q_unigram_lm")
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_jpeg_decode_is_shuffle_free_mapinpandas(spark):
    """Codec queries are map-dominated: one scan, ONE deliberate
    round-robin exchange that spreads the doc_ids across cores (the
    corpus parquet is a single split at fixture SFs; without it the
    CPU-bound Python decode serializes onto one worker — measured
    101 s -> 11 s at the 10x stress), then the Python stage. The
    exchange moves ids only, never decoded payloads, and there must be
    exactly one."""
    for name in ("q_jpeg_decode", "q_png_decode"):
        p = _plan(spark, name)
        assert p.count("+- Exchange") == 1, name
        assert "roundrobin" in p.lower(), name
        assert "FlatMapGroupsInPandas" in p or "MapInPandas" in p, name


def test_eval_windows_run_on_histograms_not_raw_rows(spark):
    """AUC/PR/KS aggregate to a score histogram FIRST: the window's
    input must be a HashAggregate, never the raw scan — the property
    that keeps the single-partition windows bounded by the score grid
    at 100 TB."""
    for name in ("q_auc_roc", "q_pr_curve", "q_ks_2samp"):
        p = _plan(spark, name)
        assert "Window" in p, name
        # a hash aggregate appears before (= deeper than) the window
        w_at = p.index("Window")
        assert "HashAggregate" in p[w_at:], (
            f"{name}: window input is not an aggregate"
        )


def test_naive_bayes_model_broadcasts(spark):
    """The 320-row NB model and the priors must broadcast; the only
    shuffles are the training histogram and the per-doc score
    reduction."""
    p = _plan(spark, "q_naive_bayes")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_knn_panel_broadcasts_and_ranks_once(spark):
    """The fixed query panel broadcasts onto the candidate stream (a
    broadcast nested-loop on the vec_id != qid predicate); candidates
    never shuffle before ranking."""
    p = _plan(spark, "q_knn_classify")
    assert "BroadcastNestedLoopJoin" in p
    assert "SortMergeJoin" not in p


def test_cov_matrix_is_single_exchange_gram(spark):
    """Covariance = one deliberate round-robin exchange (single-split
    parquet), the numpy Gram partial stage, then the (i, j)-keyed
    cell aggregation — the data is never shuffled by row."""
    p = _plan(spark, "q_cov_matrix")
    assert "MapInPandas" in p
    assert "roundrobin" in p.lower()
    # exchanges: the round-robin spread + the 2080-cell hash agg only
    assert p.count("+- Exchange") <= 2


def test_bootstrap_fanout_is_map_side(spark):
    """The 40-way resample fan-out must be a generator (explode), not a
    join, and reduce map-side into B rows."""
    p = _plan(spark, "q_bootstrap_ci")
    assert "Generate" in p and "explode(" in p
    assert "SortMergeJoin" not in p


def test_target_encode_broadcasts_source_stats(spark):
    """The per-source table and the 1-row prior broadcast back onto the
    doc stream — no doc-sized shuffle for the join."""
    p = _plan(spark, "q_target_encode")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_source_overlap_materializes_hash_set_once(spark):
    """The distinct (source, passage-hash) set feeds four consumers; it
    must be checkpoint-materialized so the final plan reads the
    materialized set, never re-running tokenize+shingle+md5 per consumer
    (r5 bench watch item: four corpus scans, measured 1.02 -> 0.74 s at
    sf0.1 — at 100 TB the recompute IS the job)."""
    p = _plan(spark, "q_source_overlap")
    assert "Scan parquet" not in p  # every consumer reads the RDD
    assert "ExistingRDD" in p
    # the pair join stays a hash equi-join, never a cartesian
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_ann_bulk_is_cogrouped_numpy_no_cartesian(spark):
    """Bulk IVF must score candidates inside the cogrouped numpy kernel:
    no cartesian/BNLJ anywhere, the ranking a MapInPandas, the list
    scoring a FlatMapCoGroupsInPandas (the relational HOF formulation
    measured 59 s of a 73 s job at 10x stress; the cogrouped matmul ~3 s)."""
    p = _plan(spark, "q_ann_bulk_topk")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # list scoring is the cogrouped Arrow kernel; the centroid ranking
    # (a MapInPandas) is checkpoint-materialized and reads back as RDD
    assert "FlatMapCoGroupsInPandas" in p
    assert "ExistingRDD" in p


def test_ann_filtered_is_cogrouped_no_cartesian(spark):
    """Filtered retrieval must keep the bulk-ANN plan shape: the label
    predicate is masked inside the cogrouped kernel (two skinny label
    joins are the only addition) — no cartesian, no BNLJ, and the
    scoring stays an Arrow cogroup."""
    p = _plan(spark, "q_ann_filtered")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "FlatMapCoGroupsInPandas" in p


def test_ann_capped_is_cogrouped_no_cartesian(spark):
    """Capped-list retrieval keeps the bulk-ANN plan shape: the cap
    decisions are two windows over skinny (vec_id, centroid_id, cos)
    rows and the scoring stays the Arrow cogroup — no cartesian, no
    BNLJ (the cap exists to BOUND compute; it must not add any)."""
    p = _plan(spark, "q_ann_capped")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "FlatMapCoGroupsInPandas" in p


def test_bloom_join_pushes_date_filter_and_probes_o1(spark):
    p = _plan(spark, "q_bloom_join")
    # dim predicate reaches the orders scan
    assert "GreaterThanOrEqual(o_orderdate" in p
    # the fact probe is the O(1) bitmap form (element_at + mask), never
    # an O(set) array_contains scan (the measured 100x regression)
    assert "element_at" in p
    assert "array_contains" not in p


def test_mv_delta_restricts_min_recompute_with_semi_join(spark):
    # the affected-group min recompute must reach the base table through
    # a semi join — the O(affected groups) claim, not a full re-agg
    assert "LeftSemi" in _plan(spark, "q_mv_delta")


def test_decontam_bloom_probe_is_map_only_broadcast(spark):
    """The bloom arm's contract: the training-document side reaches its
    verdict through ONE broadcast of the one-row bitmap and a codegen'd
    exists() probe — no shuffle, no sort-merge join against the
    benchmark on the probe path. (The exact arm of the audit still
    joins — that's its job; the pin is on the streaming gate's probe
    expression, exercised here through its batch twin.)"""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from mysql_to_clickhouse_sync_spark.catalog import load_table
    from mysql_to_clickhouse_sync_spark.operators.quality import (
        _BENCH_SOURCE,
        _SHINGLES_EXPR,
        bench_bloom,
        decontam_probe_expr,
    )

    docs = load_table(spark, SF_DIR, "documents")
    bitmap, m = bench_bloom(spark, docs)
    probe = (
        docs.filter(F.col("source") != _BENCH_SOURCE)
        .withColumn("words", F.split(F.col("text"), " "))
        .withColumn("shingles", F.expr(_SHINGLES_EXPR))
        .crossJoin(F.broadcast(bitmap))
        .withColumn("contaminated", F.expr(decontam_probe_expr(m)))
        .select("doc_id", "contaminated")
    )
    def plan_of(df) -> str:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    p = plan_of(probe)
    build = plan_of(bitmap)
    assert "SortMergeJoin" not in p
    # every Exchange belongs to the one-time bitmap BUILD subtree (plus
    # its single BroadcastExchange); the document side reaches its
    # verdict shuffle-free — self-calibrated against the build-only plan
    # "Exchange (" matches tree nodes only (details render as "(N) Exchange")
    assert p.count("Exchange (") <= build.count("Exchange (") + 1, p
    assert "element_at" in p  # the O(1) bitmap probe, not a set scan
    assert "array_contains" not in p
