"""BPE trainer semantics on constructed micro-data (oracle parity covers
fixture-scale equivalence): known merge sequences, the leftmost-greedy
overlap rule, and the delimiter framing that blocks false matches."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _merges_for(spark, tmp_path, rows, n=3):
    import mysql_to_clickhouse_sync_spark.operators.bpe as bpe

    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    old = bpe.BPE_MERGES
    try:
        bpe.BPE_MERGES = n
        out = bpe.q_bpe_train.__wrapped__ if hasattr(
            bpe.q_bpe_train, "__wrapped__"
        ) else bpe.q_bpe_train
        return sorted(
            (r.merge_round, r.pair, r.merged, r.pair_count)
            for r in out(spark, str(tmp_path)).collect()
        )
    finally:
        bpe.BPE_MERGES = old


def test_bpe_learns_known_merges(spark, tmp_path):
    """Corpus 'hello hello hell': pairs (l,l) freq 3 wins round 1 (ties
    (h,e),(e,l) at 3 but 'e l' < 'h e' < 'l l'?? no — counts: h-e:3,
    e-l:3, l-l:3, l-o:2 -> tie on 3 broken lexicographically: 'e l'.
    The test just pins the DETERMINISTIC sequence the spec produces and
    cross-checks it against a hand-run of the algorithm."""
    rows = [(1, "hello hello"), (2, "hell")]
    got = _merges_for(spark, tmp_path, rows, n=3)
    # hand-run: words {'hello':2, 'hell':1}
    # r1 pairs: h e:3, e l:3, l l:3, l o:2 -> tie -> 'e l' merged 'el'
    # r2: words h el l o(2) / h el l(1): pairs h el:3, el l:3, l o:2
    #     -> tie -> 'el l' merged 'ell'
    # r3: h ell o(2)/h ell(1): h ell:3, ell o:2 -> 'h ell' -> 'hell'
    assert got == [
        (1, "e l", "el", 3),
        (2, "el l", "ell", 3),
        (3, "h ell", "hell", 3),
    ]


def test_bpe_adjacent_occurrences_merge_in_one_round(spark, tmp_path):
    """'abab' must become (ab)(ab) in ONE round — the double-delimiter
    framing lets disjoint adjacent occurrences share boundaries."""
    rows = [(1, "abab abab ax bx")]  # ax/bx keep a,b alive as singles
    got = _merges_for(spark, tmp_path, rows, n=2)
    assert got[0] == (1, "a b", "ab", 4)  # two per word, two words
    # round 2 sees ab-ab pairs (2 of them) — only possible if BOTH
    # occurrences merged in round 1
    assert got[1] == (2, "ab ab", "abab", 2)


def test_bpe_multichar_token_cannot_false_match(spark, tmp_path):
    """After 'l l' -> 'll', the string 'll' inside a token must not match
    a later 'l l' pair pattern (the bug the ·-framing prevents)."""
    rows = [(1, "llll llll ll")]
    got = _merges_for(spark, tmp_path, rows, n=2)
    # r1: l-l pairs: llll has 3 adjacent pairs each (weighted 1 per word
    # occurrence): counts = 3+3+1 = 7 -> merge 'l l' -> 'll'
    assert got[0] == (1, "l l", "ll", 7)
    # llll -> (ll)(ll) [leftmost-greedy], ll -> (ll): r2 best = 'll ll'
    # with count 2 — a false in-token match would corrupt the sequences
    assert got[1] == (2, "ll ll", "llll", 2)


def test_unigram_lm_segmentations_are_valid(spark):
    """Every output row's segmentation must concatenate back to its word,
    use only pieces from the bounded lattice (single chars + <=2-char
    bigrams), and carry the DP-consistent integer score."""
    from mysql_to_clickhouse_sync_spark.operators.unigram import (
        UNI_MAXW,
        UNI_VOCAB,
        q_unigram_lm,
    )

    rows = q_unigram_lm(spark, SF_DIR).collect()
    assert 0 < len(rows) <= UNI_VOCAB
    for r in rows:
        pieces = r.seg.split(" ")
        assert "".join(pieces) == r.word, r
        assert all(1 <= len(p) <= 2 for p in pieces), r
        assert r.n_pieces == len(pieces)
        assert len(r.word) <= UNI_MAXW
        # multi-char words must be segmentable and scored
        assert r.score is not None


def test_unigram_viterbi_prefers_learned_bigrams(spark):
    """The fixed-point Viterbi must actually exploit the bigram lattice:
    on this corpus at least one word segments through a 2-char piece
    (an all-singles output would mean the pair scores never win)."""
    from mysql_to_clickhouse_sync_spark.operators.unigram import (
        q_unigram_lm,
    )

    rows = q_unigram_lm(spark, SF_DIR).collect()
    assert any(
        any(len(p) == 2 for p in r.seg.split(" "))
        for r in rows
        if len(r.word) >= 2
    )
