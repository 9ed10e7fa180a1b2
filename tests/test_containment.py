"""Containment dedup (operators/dedup.py:q_containment_dedup) beyond the
oracle-parity sweep: directed semantics, the subset case Jaccard misses,
and the df-cap boilerplate guard (which the fixture's max-df-7 shingles
never exercise)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.operators.dedup import (
    CONTAIN_MIN_BP,
    containment_pairs,
    q_containment_dedup,
)
from tests.conftest import SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_subset_containment_is_directed(spark):
    """A short doc quoted verbatim inside a long host: containment flags
    short-in-long at 100%, but NOT long-in-short; symmetric Jaccard of the
    same pair sits far below any dedup threshold."""
    quote = "alpha beta gamma delta epsilon zeta eta theta"
    host = " ".join(f"w{i}" for i in range(200)) + " " + quote
    out = containment_pairs(
        _docs(spark, [(1, quote), (2, host)])
    ).collect()
    assert [(r.doc_a, r.doc_b, r.containment_bp) for r in out] == [
        (1, 2, 10000)
    ]


def test_df_cap_prunes_boilerplate(spark):
    """Plant a boilerplate footer shared by MORE docs than the cap: with
    the guard the footer shingles generate no pairs, so otherwise-unrelated
    docs stay unflagged; with the cap lifted they all collapse into a
    quadratic pair set."""
    footer = " ".join(f"footer{j}" for j in range(18))
    rows = [(i, f"unique body {i} " + footer) for i in range(30)]
    # 21 tokens -> 19 shingles, 16 of them pure-footer: containment
    # 16/19 = 84% crosses the 80% bar once the cap stops pruning.
    guarded = containment_pairs(_docs(spark, rows), df_cap=20).collect()
    assert guarded == []
    unguarded = containment_pairs(_docs(spark, rows), df_cap=1000).count()
    assert unguarded == 30 * 29  # every ordered pair — what the cap stops


def test_fixture_pairs_are_mutual_near_dups(spark):
    """On the fixture the >=0.80 pairs are the planted near-dups: every
    flagged pair is reciprocal at this threshold (both directions present)
    and containment_bp is within bounds."""
    out = q_containment_dedup(spark, SF_DIR).collect()
    assert out, "fixture should contain planted near-dup pairs"
    pairs = {(r.doc_a, r.doc_b) for r in out}
    for r in out:
        assert CONTAIN_MIN_BP <= r.containment_bp <= 10000
        assert (r.doc_b, r.doc_a) in pairs, (
            "planted fixture dups are mutual — a one-directional hit "
            "would mean a subset relationship the fixture does not plant"
        )


def test_no_document_pair_join(spark):
    """Candidates must come from the inverted index (equi-join on the
    shingle) — no cartesian anywhere in the plan."""
    plan = (
        q_containment_dedup(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
