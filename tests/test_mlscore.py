"""Fixed-point exp2 kernel + model-inference scoring tests.

Mirror of tests/test_bm25.py's kernel contract: the Q8→Q30 exp2 must be
(a) accurate against libm, (b) bitwise identical between the Spark
expression tree and the DuckDB CTE chain, and (c) its constant tables
must stay pinned to their float derivation (they are hard-coded in BOTH
engines' programs).
"""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_exp2_constants_pinned():
    from mysql_to_clickhouse_sync_spark.operators.mlscore import (
        EXP2_NEG_C,
        EXP2_POS_C,
    )

    for i in range(8):
        assert EXP2_POS_C[i] == round((2**30) * 2 ** ((2**i) / 256)), i
        assert EXP2_NEG_C[i] == round((2**30) * 2 ** (-(2**i) / 256)), i


@pytest.mark.parametrize("negative", [False, True])
def test_fixed_exp2_q30_accuracy(spark, negative):
    from mysql_to_clickhouse_sync_spark.operators.mlscore import (
        with_fixed_exp2_q30,
    )

    es = [0, 1, 2, 17, 128, 255, 256, 300, 1000, 1024, 2047, 2200]
    df = spark.createDataFrame([(e,) for e in es], "e long")
    got = {r.e: r.w for r in with_fixed_exp2_q30(df, "e", "w", negative).collect()}
    sign = -1 if negative else 1
    for e in es:
        want = (2**30) * 2 ** (sign * e / 256)
        assert abs(got[e] - want) <= max(4e-8 * want, 16.0), (e, got[e], want)


@pytest.mark.parametrize("negative", [False, True])
def test_fixed_exp2_q30_engine_parity(spark, negative):
    """The DuckDB CTE chain and the Spark column chain are the same
    integer program — exact agreement over a dense + spread probe set."""
    from mysql_to_clickhouse_sync_spark.operators.mlscore import (
        _fixed_exp2_q30_sql,
        with_fixed_exp2_q30,
    )

    es = list(range(0, 520)) + [1000, 1024, 2047, 2200, 4096, 70_000]
    df = spark.createDataFrame([(e,) for e in es], "e long")
    got_spark = {
        r.e: r.w for r in with_fixed_exp2_q30(df, "e", "w", negative).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE probe AS SELECT unnest(?::BIGINT[]) AS x", [es])
    sql = (
        f"WITH {_fixed_exp2_q30_sql('probe', negative=negative)}"
        f" SELECT x, w FROM eg"
    )
    got_duck = dict(con.execute(sql).fetchall())
    assert got_spark == got_duck


def test_exp2_inverts_log2(spark):
    """Round trip through both kernels: exp2(log2(x)) must come back to x
    within the combined Q8 quantization error (~x * ln2/256)."""
    from mysql_to_clickhouse_sync_spark.operators.mlscore import (
        with_fixed_exp2_q30,
    )
    from mysql_to_clickhouse_sync_spark.operators.text import (
        with_fixed_log2_q8,
    )

    xs = [1, 2, 3, 10, 100, 12345, 10**6]
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    df = with_fixed_log2_q8(df, "x", "lq8")
    df = with_fixed_exp2_q30(df, "lq8", "w")
    for r in df.collect():
        back = r.w / 2**30
        assert abs(back - r.x) <= r.x * 0.0035 + 1e-9, (r.x, back)


def test_doc_perplexity_bounds(spark):
    """2^h == ppl by construction; perplexity within [1, charset size];
    a uniform-char doc would sit at ppl <= distinct chars (spot-check
    global bounds only — the oracle pins exact values)."""
    from mysql_to_clickhouse_sync_spark.operators.mlscore import (
        q_doc_perplexity,
    )

    rows = q_doc_perplexity(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.ppl_milli >= 1000  # ppl >= 1 always
        assert r.ppl_milli <= 200_000  # char-level: way below 200
        # ppl_milli is monotone in h_milli through the exp2 kernel
    hs = sorted(rows, key=lambda r: r.h_milli)
    ps = [r.ppl_milli for r in hs]
    # h_milli and the exp2 input hq8 are two different quantizations of
    # hnum/n, so allow one Q8 step (~0.28%) of slack.
    assert all(a <= b + b * 0.004 + 2 for a, b in zip(ps, ps[1:]))


def test_softmax_topk_classifies(spark):
    """Nearest-centroid over the synthetic label clusters must beat
    chance comfortably, probabilities must be sane and the top class
    must carry the largest weight."""
    from mysql_to_clickhouse_sync_spark.operators.mlscore import (
        q_softmax_topk,
    )

    rows = q_softmax_topk(spark, SF_DIR).collect()
    assert rows
    acc = sum(1 for r in rows if r.correct) / len(rows)
    # The synthetic 64-dim embeddings are only weakly clustered by label
    # (high cosine is rare — similarity.py:49); nearest-centroid still
    # must beat 10-class chance (0.1) by a wide margin.
    assert acc > 0.2, acc
    for r in rows:
        assert 100 <= r.p_top_milli <= 1000  # top of 10 classes: >= 1/10


def test_logistic_quality_monotone(spark):
    """p_milli must be a monotone function of z_q8 (single link), and the
    keep flag must equal p >= 0.5 <=> z >= 0 up to quantization."""
    from mysql_to_clickhouse_sync_spark.operators.mlscore import (
        q_logistic_quality,
    )

    rows = q_logistic_quality(spark, SF_DIR).collect()
    assert rows
    byz = sorted(rows, key=lambda r: r.z_q8)
    ps = [r.p_milli for r in byz]
    assert all(a <= b for a, b in zip(ps, ps[1:]))
    for r in rows:
        assert (r.p_milli >= 500) == r.keep
        if r.z_q8 > 2:
            assert r.keep
        if r.z_q8 < -2:
            assert not r.keep
    # both classes occur on the fixture corpus (the weights are not a
    # constant classifier)
    assert {r.keep for r in rows} == {True, False}


def test_logistic_sigmoid_value(spark):
    """Spot-check the fixed-point sigmoid against libm at a few logits."""
    from mysql_to_clickhouse_sync_spark.operators.mlscore import (
        q_logistic_quality,
    )

    for r in q_logistic_quality(spark, SF_DIR).limit(200).collect():
        z = r.z_q8 / 256
        want = 1.0 / (1.0 + 2.0 ** (-z))
        assert abs(r.p_milli / 1000 - want) <= 0.002, (r.z_q8, r.p_milli)
