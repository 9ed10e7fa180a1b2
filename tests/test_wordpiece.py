"""WordPiece greedy longest-match-first encoding tests."""

from pyspark.sql import functions as F


def _py_greedy(word, vocab, max_piece=4):
    """Reference implementation of the declared walk."""
    pos, toks = 0, []
    while pos < len(word):
        ln = 1
        for l in range(max_piece, 1, -1):
            if pos + l <= len(word) and word[pos : pos + l] in vocab:
                ln = l
                break
        piece = word[pos : pos + ln]
        toks.append(piece if pos == 0 else "##" + piece)
        pos += ln
    return toks


def test_wordpiece_matches_reference_walk(spark):
    """Every emitted segmentation equals the Python reference greedy
    walk over the SAME vocabulary, concatenates back to the word, and
    counts its own pieces."""
    from tests.conftest import SF_DIR

    from mysql_to_clickhouse_sync_spark.operators.wordpiece import (
        WP_MAX_PIECE,
        WP_PIECES,
        WP_STEPS,
        WP_WORDS,
        q_wordpiece_encode,
    )
    from mysql_to_clickhouse_sync_spark.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    words = (
        docs.select(
            F.explode(
                F.split(F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""), " ")
            ).alias("word")
        )
        .filter((F.col("word") != "") & (F.length("word") <= WP_STEPS))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), "word")
        .limit(WP_WORDS)
    )
    sub_arrays = ", ".join(
        f"CASE WHEN length(word) >= {l} THEN"
        f" transform(sequence(1, length(word) - {l} + 1),"
        f" s -> substr(word, s, {l})) ELSE array() END"
        for l in range(2, WP_MAX_PIECE + 1)
    )
    vocab = {
        r.piece
        for r in words.select(
            "freq", F.explode(F.expr(f"flatten(array({sub_arrays}))")).alias("piece")
        )
        .groupBy("piece")
        .agg(F.sum("freq").alias("score"))
        .orderBy(F.col("score").desc(), "piece")
        .limit(WP_PIECES)
        .collect()
    }

    rows = q_wordpiece_encode(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        expect = _py_greedy(r.word, vocab, WP_MAX_PIECE)
        got = r.pieces.split(" ")
        assert got == expect, (r.word, got, expect)
        assert r.n_pieces == len(expect)
        assert "".join(p.removeprefix("##") for p in got) == r.word
        assert all(p.startswith("##") for p in got[1:])
        assert not got[0].startswith("##")
