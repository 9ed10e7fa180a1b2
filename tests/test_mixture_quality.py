"""Invariants for the round-3 continuation pipeline operators
(q_passage_dedup / q_token_rarity / q_domain_mixture) beyond the registry
oracle-parity sweep — budget feasibility, independent recomputation, and
plan shape."""

from __future__ import annotations

import io
from collections import Counter
from contextlib import redirect_stdout

from mysql_to_clickhouse_sync_spark.operators.dedup import q_passage_dedup
from mysql_to_clickhouse_sync_spark.operators.quality import (
    RARITY_SCALE,
    q_token_rarity,
)
from mysql_to_clickhouse_sync_spark.operators.sampling import q_domain_mixture
from tests.conftest import SF_DIR


def test_passage_dedup_counts_and_coverage(spark, duck):
    rows = q_passage_dedup(spark, SF_DIR).collect()
    n_docs = duck.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert len(rows) == n_docs  # every document reports, even fully-dup ones
    assert all(0 < r.n_kept <= r.n_passages or r.n_kept == 0 for r in rows)
    assert all(0.0 <= r.dup_ratio <= 1.0 for r in rows)
    # Global consistency: total kept passages == distinct passage hashes.
    total_kept = sum(r.n_kept for r in rows)
    distinct = duck.execute(
        """
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
            FROM documents
        ), np AS (
            SELECT doc_id, toks, CAST(ceil(len(toks) / 16.0) AS INT) AS n
            FROM toks
        )
        SELECT count(DISTINCT array_to_string(
                   toks[i * 16 + 1 : (i + 1) * 16], ' '))
        FROM (SELECT doc_id, toks, unnest(range(0, n)) AS i FROM np)
        """
    ).fetchone()[0]
    assert total_kept == distinct
    # The fixture genuinely contains cross-document passage duplication.
    assert any(r.dup_ratio > 0 for r in rows)


def test_token_rarity_independent_recompute(spark, duck):
    rows = {r.doc_id: r for r in q_token_rarity(spark, SF_DIR).collect()}
    docs = duck.execute("SELECT doc_id, lower(text) FROM documents").fetchall()
    import re

    tok = lambda t: [w for w in re.split(r"[^a-z]+", t) if w]
    freq: Counter = Counter()
    for _, t in docs:
        freq.update(tok(t))
    total = sum(freq.values())
    for doc_id, t in docs[:50]:
        words = tok(t)
        expect = sum((RARITY_SCALE * total) // freq[w] for w in words)
        r = rows[doc_id]
        assert r.n_tokens == len(words)
        assert r.rarity_sum == expect, doc_id
        # floor((S*T)/c) >= S because c <= T
        assert r.mean_rarity >= RARITY_SCALE


def test_domain_mixture_budget_feasibility(spark):
    rows = q_domain_mixture(spark, SF_DIR).collect()
    assert len(rows) == 20  # one row per source
    for r in rows:
        assert 1 <= r.weight <= 4
        assert r.chars_kept <= r.src_budget  # admission never overshoots
        assert 0 <= r.fill_bp <= 10000
        assert r.n_kept <= r.n_docs
    # Budgets must be proportional to weights: same weight -> same budget.
    by_weight = {}
    for r in rows:
        by_weight.setdefault(r.weight, set()).add(r.src_budget)
    assert all(len(v) == 1 for v in by_weight.values())
    b1 = by_weight[1].pop()
    for w, v in by_weight.items():
        if w != 1:
            assert abs(v.pop() - w * b1) <= w  # floor-division slack


def _plan(spark, fn) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        fn(spark, SF_DIR).explain("formatted")
    return buf.getvalue()


def test_pipeline_ops_plans_stay_keyed(spark):
    """No cartesian/all-pairs stage: dedup joins on the passage hash,
    rarity on the token, mixture broadcasts its two scalar aggregates."""
    for fn in (q_passage_dedup, q_token_rarity, q_domain_mixture):
        p = _plan(spark, fn)
        assert "CartesianProduct" not in p, fn.__name__


def test_source_overlap_symmetric_and_capped(spark, duck):
    from mysql_to_clickhouse_sync_spark.operators.dedup import (
        OVERLAP_CAP,
        q_source_overlap,
    )

    rows = q_source_overlap(spark, SF_DIR).collect()
    assert rows, "fixture sources share template passages"
    seen = set()
    for r in rows:
        assert r.src_a < r.src_b  # canonical orientation, no mirror rows
        assert (r.src_a, r.src_b) not in seen
        seen.add((r.src_a, r.src_b))
        assert r.n_shared >= 1
        assert 0 <= r.jaccard_bp <= 10000
    # Cap semantics, checked AGAINST THE SPARK OUTPUT: recompute the pair
    # counts in DuckDB twice — capped (must equal Spark exactly) and with
    # the cap lifted (must dominate). Dropping the cap from the Spark
    # implementation would break the equality whenever the fixture holds
    # an over-cap passage, and can never break the domination check.
    def pair_counts(spread_hi: int) -> dict:
        rows = duck.execute(
            f"""
            WITH toks AS (
                SELECT source, string_split_regex(trim(text), '\\s+') AS toks
                FROM documents
            ), np AS (
                SELECT source, toks, CAST(ceil(len(toks) / 16.0) AS INT) AS n
                FROM toks
            ), hs AS (
                SELECT DISTINCT source,
                       md5(array_to_string(toks[i*16+1:(i+1)*16], ' ')) AS h
                FROM (SELECT source, toks, unnest(range(0, n)) AS i FROM np)
            ), eligible AS (
                SELECT hs.source, hs.h FROM hs
                JOIN (SELECT h, count(*) AS ns FROM hs GROUP BY h) s USING (h)
                WHERE s.ns BETWEEN 2 AND {spread_hi}
            )
            SELECT a.source, b.source, count(*)
            FROM eligible a JOIN eligible b
              ON a.h = b.h AND a.source < b.source
            GROUP BY a.source, b.source
            """
        ).fetchall()
        return {(a, b): n for a, b, n in rows}

    capped = pair_counts(OVERLAP_CAP)
    assert {(r.src_a, r.src_b): r.n_shared for r in rows} == capped
    uncapped = pair_counts(10_000)
    assert all(uncapped[k] >= v for k, v in capped.items())


def test_split_leakage_bounds_and_liveness(spark):
    from mysql_to_clickhouse_sync_spark.operators.profiling import (
        q_split_leakage,
    )

    rows = {r.eval_split: r for r in q_split_leakage(spark, SF_DIR).collect()}
    assert set(rows) == {"val", "test"}
    for r in rows.values():
        assert 0 <= r.n_leaked <= r.n_passages
        assert 0 <= r.leak_bp <= 10000
    # the fixture's template-generated text leaks across splits — the
    # audit must detect it (that's the point of the operator)
    assert any(r.n_leaked > 0 for r in rows.values())


def test_boilerplate_report_is_ranked_and_spread(spark):
    from mysql_to_clickhouse_sync_spark.operators.dedup import (
        BOILERPLATE_TOPN,
        q_boilerplate_report,
    )

    rows = sorted(
        q_boilerplate_report(spark, SF_DIR).collect(), key=lambda r: r.rank
    )
    assert 0 < len(rows) <= BOILERPLATE_TOPN
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    keys = [(-r.n_sources, -r.n_occurrences) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        assert r.n_sources >= 2  # spread across sources, by construction
        assert r.n_occurrences >= r.n_sources
        assert len(r.passage.split()) <= 16


def test_boilerplate_topn_is_take_ordered(spark):
    import io
    from contextlib import redirect_stdout

    from mysql_to_clickhouse_sync_spark.operators.dedup import (
        q_boilerplate_report,
    )

    buf = io.StringIO()
    with redirect_stdout(buf):
        q_boilerplate_report(spark, SF_DIR).explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()


def test_zorder_tiles_confine_both_dimensions(spark):
    from mysql_to_clickhouse_sync_spark.operators.clickhouse import (
        q_zorder_layout,
    )

    rows = q_zorder_layout(spark, SF_DIR).collect()
    assert rows
    total = sum(r.n_rows for r in rows)
    full_domain = 65536 * 65536
    for r in rows:
        # top-8 z-bits fix the top 4 bits of BOTH dims: each tile confines
        # x and y to a 4096-wide range — the min-max pruning guarantee
        assert r.x_max - r.x_min < 4096
        assert r.y_max - r.y_min < 4096
        assert r.bbox_area <= 4096 * 4096
        assert r.bbox_area < full_domain // 200  # >=200x skip factor
    # layout is a partition of the table
    from mysql_to_clickhouse_sync_spark.catalog import load_table

    assert total == load_table(spark, SF_DIR, "lineitem").count()


def test_bpe_tokenizer_handles_whitespace_runs(spark, duck):
    """Regression: the \\s in BPE_PAT must survive into the engine (an
    F.expr string-literal splice silently unescapes it to 's', making
    whitespace runs count as tokens). Drive both engines on text the
    fixtures do not contain: tabs, newlines, double spaces."""
    import pandas as pd
    from pyspark.sql import functions as F

    from mysql_to_clickhouse_sync_spark.operators.text import bpe_token_count

    cases = ["a  b", "a\tb", "a\nb", "x 42 y!?", "  padded  "]
    sdf = spark.createDataFrame(pd.DataFrame({"text": cases}))
    got = [
        r.n
        for r in sdf.select(
            bpe_token_count(F.col("text")).alias("n")
        ).collect()
    ]
    want = [
        duck.execute(
            "SELECT len(regexp_extract_all(lower(?), ' ?[a-z]+| ?[0-9]+|"
            " ?[^a-z0-9\\s]+', 0))",
            [t],
        ).fetchone()[0]
        for t in cases
    ]
    assert got == want, (got, want)
