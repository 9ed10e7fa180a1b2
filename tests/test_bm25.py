"""BM25 + fixed-point log2 kernel tests.

The interesting contract is engine parity WITHOUT libm: the Q8 log2
must be (a) accurate enough to rank, (b) bitwise identical between the
Spark expression tree and the DuckDB CTE chain, because both are the
same integer program.
"""

import math

import duckdb
import pytest
from pyspark.sql import functions as F


def test_fixed_log2_q8_accuracy(spark):
    from mysql_to_clickhouse_sync_spark.operators.text import (
        with_fixed_log2_q8,
    )

    xs = [1, 2, 3, 5, 7, 100, 1023, 1024, 1025, 10**6, 10**9, 2**40 + 12345]
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    got = {
        r.x: r.lq8 for r in with_fixed_log2_q8(df, "x", "lq8").collect()
    }
    for x in xs:
        assert abs(got[x] / 256 - math.log2(x)) < 1 / 64, x


def test_fixed_log2_q8_engine_parity(spark):
    """The DuckDB CTE chain and the Spark column chain are the same
    integer program — every value over a dense + spread probe set must
    agree EXACTLY, not approximately."""
    from mysql_to_clickhouse_sync_spark.operators.text import (
        _fixed_log2_q8_sql,
        with_fixed_log2_q8,
    )

    xs = list(range(1, 300)) + [2**k + d for k in range(9, 45, 5) for d in (-1, 0, 1)]
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    got_spark = {
        r.x: r.lq8 for r in with_fixed_log2_q8(df, "x", "lq8").collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE probe AS SELECT unnest(?::BIGINT[]) AS x", [xs]
    )
    sql = f"WITH {_fixed_log2_q8_sql('probe')} SELECT x, lq8 FROM lg"
    got_duck = dict(con.execute(sql).fetchall())
    assert got_spark == got_duck


def test_bm25_ranking_sanity(spark):
    """Rare terms outrank common terms at equal tf; higher tf raises the
    score within a term; scores are positive (Lucene idf form)."""
    from tests.conftest import SF_DIR

    from mysql_to_clickhouse_sync_spark.operators.text import q_bm25

    rows = q_bm25(spark, SF_DIR).collect()
    assert rows, "corpus must contain the query terms"
    by_term = {}
    for r in rows:
        assert r.score_milli > 0
        by_term.setdefault(r.token, []).append(r)
    # 'dup' is the rare term (df ~5% of docs) — its best score must beat
    # every common term's best score.
    assert "dup" in by_term
    best_dup = max(r.score_milli for r in by_term["dup"])
    for t, rs in by_term.items():
        if t != "dup":
            assert best_dup > max(r.score_milli for r in rs), t
    # within a term, score is monotone in tf at fixed dl: compare two
    # rows with equal dl via re-derivation — weaker but engine-level:
    # max tf row must score >= min tf row when dl equal is not
    # guaranteed, so just check the df ordering is reflected in idf:
    # every dup score with tf=1 beats every tf=1 score of common terms.
    dup1 = [r.score_milli for r in by_term["dup"] if r.tf == 1]
    if dup1:
        for t, rs in by_term.items():
            if t != "dup":
                common1 = [r.score_milli for r in rs if r.tf == 1]
                if common1:
                    assert min(dup1) > max(common1), t


def test_char_entropy_extremes(spark):
    """Constant text has zero entropy; a string of n distinct chars has
    exactly log2(n) bits (in Q8 milli-bit units, up to kernel error)."""
    from mysql_to_clickhouse_sync_spark.operators.text import (
        with_fixed_log2_q8,
    )
    from pyspark.sql import functions as F

    # Reuse the same expression pipeline on a local frame, mirroring
    # q_char_entropy's math on controlled inputs.
    rows = [(1, "aaaaaaaa"), (2, "abcdefgh"), (3, "aabb")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    chars = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text)),"
                " i -> substring(text, i, 1))"
            )
        ).alias("ch"),
    )
    cc = chars.groupBy("doc_id", "ch").agg(
        F.count("*").cast("bigint").alias("c")
    )
    cc = with_fixed_log2_q8(cc, "c", "lc_q8")
    perdoc = cc.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.expr("c * lc_q8")).cast("bigint").alias("s"),
    )
    perdoc = with_fixed_log2_q8(perdoc, "n", "ln_q8")
    got = {
        r.doc_id: r.e
        for r in perdoc.select(
            "doc_id",
            F.expr("CAST((n * ln_q8 - s) * 1000 div (256 * n) AS BIGINT)").alias(
                "e"
            ),
        ).collect()
    }
    assert got[1] == 0  # constant -> zero bits
    assert abs(got[2] - 3000) <= 20  # 8 distinct chars -> 3 bits
    assert abs(got[3] - 1000) <= 20  # two 2-char classes -> 1 bit


def test_ppmi_matches_float_reference(spark):
    """Margins are consistent contingency sums, and ppmi_q8/256 tracks
    the float PMI (recomputed with the corpus bigram total) within the
    kernel's error bound plus the zero clamp."""
    import math

    from tests.conftest import SF_DIR

    from mysql_to_clickhouse_sync_spark.operators.text import q_ppmi
    from mysql_to_clickhouse_sync_spark.catalog import load_table

    rows = q_ppmi(spark, SF_DIR).collect()
    assert rows
    docs = load_table(spark, SF_DIR, "documents")
    n_bi = (
        docs.filter(F.length(F.trim("text")) > 0)
        .select(F.expr("size(split(trim(lower(text)), '\\\\s+')) - 1").alias("k"))
        .filter(F.col("k") >= 1)
        .agg(F.sum("k"))
        .collect()[0][0]
    )
    for r in rows:
        assert r.c_xy <= r.c_x and r.c_xy <= r.c_y
        true_pmi = math.log2(n_bi * r.c_xy / (r.c_x * r.c_y))
        assert abs(r.ppmi_q8 / 256 - max(0.0, true_pmi)) < 0.02 + abs(
            min(0.0, true_pmi)
        ), (r, true_pmi)


def test_rrf_fusion_consistency(spark):
    """Fused scores recompute exactly from the emitted ranks; ranks are
    dense 1..TOPN per modality; at least one doc appears in both lists
    (otherwise fusion is vacuous on this corpus)."""
    from tests.conftest import SF_DIR

    from mysql_to_clickhouse_sync_spark.operators.similarity import (
        RRF_K,
        RRF_SCALE,
        RRF_TOPN,
        q_rrf,
    )

    rows = q_rrf(spark, SF_DIR).collect()
    assert rows
    lex_ranks = sorted(r.rank_lex for r in rows if r.rank_lex is not None)
    vec_ranks = sorted(r.rank_vec for r in rows if r.rank_vec is not None)
    assert lex_ranks == list(range(1, len(lex_ranks) + 1))
    assert vec_ranks == list(range(1, RRF_TOPN + 1))
    both = 0
    for r in rows:
        expect = 0
        if r.rank_lex is not None:
            expect += RRF_SCALE // (RRF_K + r.rank_lex)
        if r.rank_vec is not None:
            expect += RRF_SCALE // (RRF_K + r.rank_vec)
        assert r.rrf_micro == expect
        if r.rank_lex is not None and r.rank_vec is not None:
            both += 1
    assert both >= 1


def test_ndcg_curve_properties(spark):
    """NDCG invariants: 20 positions, gains recompute from (rel, pos)
    via the kernel, dcg_cum is the running sum, ndcg in [0, 1000], and
    the ideal ordering bounds the achieved one (ndcg <= 1000 with
    equality iff the fused ranking is rel-sorted at that prefix)."""
    from tests.conftest import SF_DIR

    from mysql_to_clickhouse_sync_spark.operators.similarity import (
        NDCG_K,
        NDCG_SCALE,
        q_ndcg,
    )

    rows = sorted(q_ndcg(spark, SF_DIR).collect(), key=lambda r: r.pos)
    assert [r.pos for r in rows] == list(range(1, NDCG_K + 1))

    def lq8(x):
        e = x.bit_length() - 1
        m = (x << (29 - e)) if e <= 29 else (x >> (e - 29))
        f = 0
        for _ in range(8):
            t = (m * m) >> 29
            if t >= (1 << 30):
                f, m = f * 2 + 1, t >> 1
            else:
                f, m = f * 2, t
        return e * 256 + f

    run = 0
    for r in rows:
        assert r.gain == r.rel * NDCG_SCALE * 256 // lq8(r.pos + 1)
        run += r.gain
        assert r.dcg_cum == run
        assert 0 <= r.ndcg_milli <= 1000


def test_char_split_equals_substring_enumeration(spark):
    """q_char_entropy's split(text, '') enumeration (round 10) must equal
    the substring(text, i, 1) transform it replaced, code point by code
    point — including multibyte characters and whitespace."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("héllo wörld",), ("a",), ("xy  z",), ("日本語 text",)],
        "text string",
    )
    old = df.select(
        F.expr(
            "transform(sequence(1, length(text)), i -> substring(text, i, 1))"
        ).alias("c")
    ).collect()
    new = df.select(F.split("text", "").alias("c")).collect()
    assert [r.c for r in old] == [r.c for r in new]
