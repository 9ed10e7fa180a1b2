"""REAL BPE tokenizer training (Sennrich et al. 2016) — the training-data
pipeline's tokenizer step, as an oracle-verified iterative algorithm.

The reference copies rows and never touches text
(mysql_to_clickhouse_sync.py:44 SELECT *); this is a north-star extension
in the q_kmeans / q_pagerank family: a genuinely iterative algorithm whose
every round is relational, with the DuckDB oracle unrolling the rounds.

Algorithm (classic byte/char-pair encoding):
  * vocabulary = the BPE_VOCAB most frequent corpus words (bounded so the
    oracle's unrolled rounds stay cheap; the bound is part of the declared
    semantics, mirrored on both engines — production trains on the full
    word-frequency table with the identical loop);
  * each word becomes a delimiter-framed token sequence
    ``·c1··c2··...··cn·`` (single chars to start);
  * per merge round: count adjacent token pairs weighted by word
    frequency, pick the max-count pair (tie: lexicographically smallest —
    a total order, so the argmax is deterministic on both engines), then
    merge every LEFTMOST-first occurrence via one string replace.

Engine-parity notes (probed, pinned in tests/test_bpe.py):
  * ``replace`` is non-overlapping left-to-right WITHOUT rescanning its
    own output in both engines — exactly BPE's leftmost-greedy merge;
  * the double-delimiter framing ``·a··b·`` lets ADJACENT disjoint
    occurrences share boundaries (both merge in one round) while a
    multi-char token like ``ll`` can never false-match ``l··l``;
  * pair counts are integer sums of integer frequencies — order-free.

Scale notes (100 TB): word counting is the standard one-shuffle
wordcount; each merge round over the (bounded or full) vocabulary is a
map-only explode + one map-side-combined count + a 1-row TakeOrdered
argmax broadcast back — the vocabulary table is localCheckpointed per
round (constant plan depth, the kmeans/clustering pattern). Production
BPE trains on a word-frequency table that is tiny relative to the corpus
(Heaps' law), so rounds cost O(vocab), not O(corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.registry import declare

BPE_MERGES = 5
BPE_VOCAB = 100  # top words by (freq DESC, word ASC) — deterministic bound

_WORDS_SQL = f"""
    words AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS freq
        FROM (
            SELECT unnest(string_split(regexp_replace(lower(text),
                       '[^a-z0-9 ]', '', 'g'), ' ')) AS word
            FROM documents
        )
        WHERE word <> ''
        GROUP BY word
        ORDER BY freq DESC, word
        LIMIT {BPE_VOCAB}
    ), w_0 AS MATERIALIZED (
        SELECT word, freq,
               '·' || array_to_string(list_transform(
                   generate_series(1, length(word)),
                   i -> substr(word, i, 1)), '··') || '·' AS seq
        FROM words
    )"""


def _bpe_round_sql(r: int) -> str:
    prev = f"w_{r - 1}"
    return f"""
    , toks_{r} AS MATERIALIZED (
        SELECT freq, string_split(trim(seq, '·'), '··') AS toks
        FROM {prev}
    ), pairs_{r} AS MATERIALIZED (
        SELECT pair, CAST(sum(freq) AS BIGINT) AS c FROM (
            SELECT freq,
                   unnest(list_transform(generate_series(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i + 1])) AS pair
            FROM toks_{r}
        ) GROUP BY pair
    ), best_{r} AS MATERIALIZED (
        SELECT pair, c FROM pairs_{r} ORDER BY c DESC, pair LIMIT 1
    ), w_{r} AS MATERIALIZED (
        SELECT word, freq,
               replace(seq,
                       '·' || replace(b.pair, ' ', '··') || '·',
                       '·' || replace(b.pair, ' ', '') || '·') AS seq
        FROM {prev} CROSS JOIN best_{r} b
    )"""


def _bpe_oracle() -> str:
    rounds = "".join(_bpe_round_sql(r) for r in range(1, BPE_MERGES + 1))
    outs = "\n        UNION ALL\n        ".join(
        f"SELECT {r} AS merge_round, pair,"
        f" replace(pair, ' ', '') AS merged, c AS pair_count"
        f" FROM best_{r}"
        for r in range(1, BPE_MERGES + 1)
    )
    return f"""
    WITH {_WORDS_SQL}
    {rounds}
    SELECT merge_round, pair, merged, pair_count FROM (
        {outs}
    )
    """



def _bpe_loop(spark: SparkSession, sf_dir: str):
    """The shared training loop: returns (converged word frame, list of
    per-round 1-row best frames). ONE implementation on the Python side,
    mirroring the ONE SQL implementation (_WORDS_SQL/_bpe_round_sql) —
    q_bpe_train reads the merge ledger, q_bpe_encode the word table, and
    any change to the loop (tie-breaks, the sequence(1,0)-descends
    guard) stays bitwise-shared by construction."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(
                F.split(
                    F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""),
                    " ",
                )
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("freq"))
        .orderBy(F.col("freq").desc(), "word")
        .limit(BPE_VOCAB)
    )
    w = words.select(
        "word",
        "freq",
        F.expr(
            "'\u00b7' || array_join(transform(sequence(1, length(word)),"
            " i -> substr(word, i, 1)), '\u00b7\u00b7') || '\u00b7'"
        ).alias("seq"),
    ).localCheckpoint(eager=True)
    bests = []
    for _ in range(BPE_MERGES):
        pairs = (
            w.select(
                "freq",
                F.expr(
                    "split(trim(BOTH '\u00b7' FROM seq), '\u00b7\u00b7')"
                ).alias("toks"),
            )
            # single-token words carry no pairs; also keeps the sequence()
            # bound ascending (Spark's sequence(1, 0) DESCENDS, unlike
            # DuckDB's empty generate_series(1, 0))
            .filter(F.expr("size(toks) >= 2"))
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(toks) - 1),"
                        " i -> concat(element_at(toks, i), ' ',"
                        " element_at(toks, i + 1)))"
                    )
                ).alias("pair"),
            )
            .groupBy("pair")
            .agg(F.sum("freq").cast("bigint").alias("c"))
        )
        best = (
            pairs.orderBy(F.col("c").desc(), "pair")
            .limit(1)
            .localCheckpoint(eager=True)
        )
        bests.append(best)
        w = (
            w.crossJoin(F.broadcast(best))
            .select(
                "word",
                "freq",
                F.expr(
                    "replace(seq, '\u00b7' || replace(pair, ' ',"
                    " '\u00b7\u00b7') || '\u00b7',"
                    " '\u00b7' || replace(pair, ' ', '') || '\u00b7')"
                ).alias("seq"),
            )
            .localCheckpoint(eager=True)
        )
    return w, bests


@declare("q_bpe_train", oracle=_bpe_oracle(), tier="P1")
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train BPE_MERGES merges on the corpus vocabulary and return the
    learned merge table (merge_round, pair, merged, pair_count) — the
    tokenizer-training step of a data pipeline, hash-verified against the
    oracle's unrolled rounds. See the module docstring for the framing
    trick that makes the merge a single engine-portable string replace."""
    _, bests = _bpe_loop(spark, sf_dir)
    merges = [
        best.select(
            F.lit(r).alias("merge_round"),
            "pair",
            F.expr("replace(pair, ' ', '')").alias("merged"),
            F.col("c").alias("pair_count"),
        )
        for r, best in enumerate(bests, start=1)
    ]
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


def _bpe_encode_oracle() -> str:
    rounds = "".join(_bpe_round_sql(r) for r in range(1, BPE_MERGES + 1))
    return f"""
    WITH {_WORDS_SQL}
    {rounds}
    SELECT word, freq,
           CAST(len(string_split(trim(seq, '·'), '··')) AS BIGINT)
               AS n_tokens,
           array_to_string(string_split(trim(seq, '·'), '··'), ' ')
               AS tokens
    FROM w_{BPE_MERGES}
    """


@declare("q_bpe_encode", oracle=_bpe_encode_oracle(), tier="P1")
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inference half of q_bpe_train: every vocabulary word's FINAL
    segmentation after the learned merges are applied in order — token
    count and the space-joined token sequence per word, the lookup table
    a tokenizer service ships. Same training loop, output taken from the
    converged word table instead of the merge ledger.

    Scale notes: identical loop cost to q_bpe_train; applying a FROZEN
    merge table to a new corpus is the same replace chain as a map-only
    pass over its word table (no counting rounds)."""
    w, _ = _bpe_loop(spark, sf_dir)
    return w.select(
        "word",
        "freq",
        F.expr(
            "CAST(size(split(trim(BOTH '\u00b7' FROM seq),"
            " '\u00b7\u00b7')) AS BIGINT)"
        ).alias("n_tokens"),
        F.expr(
            "array_join(split(trim(BOTH '\u00b7' FROM seq),"
            " '\u00b7\u00b7'), ' ')"
        ).alias("tokens"),
    )
