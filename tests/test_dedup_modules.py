"""Module-level dedup tests with planted duplicates — the fixtures carry no
guaranteed near-dups, so these construct them: exact copies, reformatted
copies, and one-word edits must be caught by the right rung of the ladder."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.operators.dedup import (
    minhash_lsh_candidates,
    simhash_table,
    word_shingles,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)
NEAR = BASE.replace("warm", "cold")  # one-word edit
REFORMATTED = "  The QUICK brown fox, jumps over the lazy dog while the cat "\
    "watches from the warm windowsill and the birds sing in the garden outside!"
UNRELATED = (
    "completely different content about distributed query engines and "
    "columnar storage formats with vectorized execution pipelines"
)


def _docs(spark):
    rows = [(0, BASE), (1, NEAR), (2, REFORMATTED), (3, UNRELATED)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_minhash_lsh_finds_planted_near_dups(spark):
    docs = _docs(spark)
    pairs = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in minhash_lsh_candidates(docs, max_bucket=None).collect()
    }
    # Exact-after-normalization copy: all bands collide, agreement 1.0.
    assert pairs.get((0, 2)) == 1.0
    # One-word edit: must at least surface as a candidate with high estimate.
    assert (0, 1) in pairs and pairs[(0, 1)] >= 0.5
    # Unrelated doc: no pair with doc 3.
    assert not any(3 in p for p in pairs)


def test_simhash_close_for_near_dups(spark):
    docs = _docs(spark)
    sh = {r.doc_id: r.simhash for r in simhash_table(docs).collect()}
    assert sh[0] == sh[2]  # normalization-identical
    ham_near = bin(sh[0] ^ sh[1]).count("1")
    ham_far = bin(sh[0] ^ sh[3]).count("1")
    assert ham_near < ham_far
    assert ham_near <= 8


def test_word_shingles_small_docs(spark):
    df = spark.createDataFrame(
        [("one",), ("one two",), ("one two three four",), ("",)], ["text"]
    )
    out = [r.sh for r in df.select(word_shingles(F.col("text")).alias("sh")).collect()]
    assert out[0] == ["one"]
    assert out[1] == ["one two"]
    assert out[2] == ["one two three", "two three four"]
    assert out[3] == [""]  # degenerate but well-defined


def test_banded_neardup_recall_vs_exact(spark):
    # The banded-LSH default path must retain most of the exact all-pairs
    # ground truth at the declared threshold — a recall floor keeps the
    # band-length dial honest (16 bands x 4 bits ≈ 95% measured; assert a
    # conservative 80%).
    from mysql_to_clickhouse_sync_spark.registry import queries
    from tests.conftest import SF_DIR

    qs = queries()
    exact = {
        (r.label, r.vec_a, r.vec_b)
        for r in qs["q_neardup_exact"](spark, SF_DIR).collect()
    }
    banded = {
        (r.label, r.vec_a, r.vec_b)
        for r in qs["q_embedding_neardup"](spark, SF_DIR).collect()
    }
    assert banded <= exact  # candidates are re-scored exactly: no false positives
    assert len(banded) >= 0.8 * len(exact), (len(banded), len(exact))


def test_band_length_dial_is_monotone(spark):
    # Longer bands demand more sign agreement per band: at fixed dimension
    # coverage, the 8-bit-band candidate set must be a SUBSET of the
    # 4-bit-band set — the recall/cost dial turns one way.
    from mysql_to_clickhouse_sync_spark.catalog import load_table
    from mysql_to_clickhouse_sync_spark.operators.similarity import (
        banded_neardup_pairs,
    )
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    short = {
        (r.label, r.vec_a, r.vec_b)
        for r in banded_neardup_pairs(emb, n_bands=16, band_bits=4, max_bucket=None).collect()
    }
    long = {
        (r.label, r.vec_a, r.vec_b)
        for r in banded_neardup_pairs(emb, n_bands=8, band_bits=8, max_bucket=None).collect()
    }
    assert long <= short
    assert len(long) < len(short)  # the dial actually bites on this data


def test_editdist_normalization_pins_engine_portability(spark):
    """Why q_editdist_rescore normalizes to [a-z0-9 ] before measuring:
    DuckDB's levenshtein counts BYTES, Spark's counts CHARACTERS — they
    genuinely diverge on multibyte text, and agree exactly once the
    ASCII normalization removes the multibyte alphabet."""
    import duckdb

    raw_duck = duckdb.sql(
        "SELECT levenshtein('héllo', 'hello')"
    ).fetchone()[0]
    raw_spark = spark.sql(
        "SELECT levenshtein('héllo', 'hello')"
    ).collect()[0][0]
    assert raw_duck == 2 and raw_spark == 1  # the divergence is real

    norm = "regexp_replace(lower('héllo'), '[^a-z0-9 ]', '')"
    duck_norm = duckdb.sql(
        f"SELECT levenshtein(regexp_replace(lower('héllo'),"
        f" '[^a-z0-9 ]', '', 'g'), 'hello')"
    ).fetchone()[0]
    spark_norm = spark.sql(
        f"SELECT levenshtein({norm}, 'hello')"
    ).collect()[0][0]
    assert duck_norm == spark_norm == 1  # hllo vs hello, both engines
