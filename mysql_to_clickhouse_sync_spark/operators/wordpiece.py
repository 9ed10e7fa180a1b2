"""WordPiece tokenizer encoding (Schuster & Nakajima 2012; the BERT
tokenizer, Devlin et al. 2019) — greedy longest-match-first subword
segmentation with ``##`` continuation marks.

Completes the tokenizer-family coverage next to q_bpe_train/q_bpe_encode
(merge-based) and q_unigram_lm (likelihood-based): WordPiece at
inference time is neither — it is a deterministic longest-prefix walk
over a frozen vocabulary, which makes it the one tokenizer whose whole
encode loop is expressible as a bounded unrolled CASE chain with zero
joins in the hot path. The reference copies rows and never touches text
(mysql_to_clickhouse_sync.py:44 SELECT *); north-star extension.

Declared semantics (mirrored expression-for-expression in the oracle):
  * words = the WP_WORDS most frequent corpus words (the q_bpe_train
    word law: lowercase, strip [^a-z0-9 ], split on space; ties broken
    by word ASC), restricted to length <= WP_STEPS so the unrolled walk
    provably completes (each step consumes >= 1 char);
  * vocabulary = the WP_PIECES highest-scoring substrings of length
    2..WP_MAX_PIECE of those words, scored by the frequency-weighted
    occurrence count (every start position of every word counts, weight
    = word freq; ties broken by piece ASC) — a frequency-trained piece
    inventory, the same spirit as WordPiece's likelihood training with
    a relational objective; single characters are implicit fallback
    pieces, so no word needs an UNK;
  * encoding walks each word left to right, at each position taking the
    LONGEST vocabulary piece that fits in the remaining suffix (4, then
    3, then 2, else the single char), emitting the piece bare at
    position 1 and '##'-prefixed after — BERT's greedy
    longest-match-first, with one shared piece set for both positions
    (the initial/continuation vocab split is a table-doubling away and
    orthogonal to the walk under test).

Engine parity: the walk is pure integer + substring CASE arithmetic —
no doubles, no libm, no regex in the loop. The oracle unrolls the same
WP_STEPS steps as paired CTEs (the L-choice CTE separated from the
state-update CTE so DuckDB's same-SELECT alias binding can never
shadow an input column).

Scale notes (100 TB): word counting is the standard one-shuffle
wordcount; piece scoring explodes O(len * WP_MAX_PIECE) substrings per
VOCABULARY word (bounded, not corpus-sized) into one map-side-combined
count; the frozen piece set ships as a one-row broadcast array and the
encode walk is then MAP-ONLY over any corpus word table — applying a
trained WordPiece vocab to 100 TB of text is embarrassingly parallel
with zero shuffles after the wordcount.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.registry import declare

WP_WORDS = 100  # encode targets: top words by (freq DESC, word ASC)
WP_PIECES = 60  # multi-char vocabulary size
WP_MAX_PIECE = 4  # longest piece considered
WP_STEPS = 16  # unrolled walk depth == max encodable word length

_WORDS_SQL = f"""
    words AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS freq
        FROM (
            SELECT unnest(string_split(regexp_replace(lower(text),
                       '[^a-z0-9 ]', '', 'g'), ' ')) AS word
            FROM documents
        )
        WHERE word <> '' AND length(word) <= {WP_STEPS}
        GROUP BY word
        ORDER BY freq DESC, word
        LIMIT {WP_WORDS}
    ), pieces AS MATERIALIZED (
        SELECT piece, CAST(sum(freq) AS BIGINT) AS score FROM (
            SELECT freq, unnest(flatten(list_transform(
                       generate_series(2, {WP_MAX_PIECE}),
                       l -> list_transform(
                           generate_series(1, length(word) - l + 1),
                           s -> substr(word, s, l))))) AS piece
            FROM words
        ) GROUP BY piece
        ORDER BY score DESC, piece
        LIMIT {WP_PIECES}
    ), vrow AS MATERIALIZED (
        SELECT list(piece ORDER BY piece) AS vset FROM pieces
    )"""


def _wp_step_sql(r: int) -> str:
    """One greedy step as a CTE pair: d{r} picks the piece length L,
    e{r} applies it. Kept as two CTEs so every alias in e{r} binds to a
    REAL input column, never to a same-SELECT alias."""
    conds = " ".join(
        f"WHEN pos + {l - 1} <= length(word)"
        f" AND list_contains(vset, substr(word, pos, {l})) THEN {l}"
        for l in range(WP_MAX_PIECE, 1, -1)
    )
    return f"""
    , d{r} AS (
        SELECT word, freq, vset, pos, toks, n,
               CASE WHEN pos > length(word) THEN 0 {conds} ELSE 1 END AS L
        FROM e{r - 1}
    ), e{r} AS (
        SELECT word, freq, vset, pos + L AS pos,
               CASE WHEN L = 0 THEN toks
                    WHEN pos = 1 THEN substr(word, pos, L)
                    ELSE toks || ' ##' || substr(word, pos, L) END AS toks,
               n + CASE WHEN L = 0 THEN 0 ELSE 1 END AS n
        FROM d{r}
    )"""


def _wordpiece_oracle() -> str:
    steps = "".join(_wp_step_sql(r) for r in range(1, WP_STEPS + 1))
    return f"""
    WITH {_WORDS_SQL},
    e0 AS (
        SELECT word, freq, vset, 1 AS pos, '' AS toks, 0 AS n
        FROM words CROSS JOIN vrow
    )
    {steps}
    SELECT word, freq, CAST(n AS BIGINT) AS n_pieces, toks AS pieces
    FROM e{WP_STEPS}
    """


@declare("q_wordpiece_encode", oracle=_wordpiece_oracle(), tier="P1")
def q_wordpiece_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy longest-match-first WordPiece segmentation of the corpus
    vocabulary against a frequency-trained piece inventory — see the
    module docstring for the declared law and the parity/scale design.
    Output: (word, freq, n_pieces, pieces) with continuations
    '##'-marked, e.g. 'customer' -> 'cust ##om ##er'."""
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
        .filter((F.col("word") != "") & (F.length("word") <= WP_STEPS))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("freq"))
        .orderBy(F.col("freq").desc(), "word")
        .limit(WP_WORDS)
    )
    # Substring explode guarded per length: Spark's sequence(1, 0)
    # DESCENDS (unlike DuckDB's empty generate_series), so lengths that
    # do not fit contribute an explicit empty array.
    sub_arrays = ", ".join(
        f"CASE WHEN length(word) >= {l} THEN"
        f" transform(sequence(1, length(word) - {l} + 1),"
        f" s -> substr(word, s, {l})) ELSE array() END"
        for l in range(2, WP_MAX_PIECE + 1)
    )
    pieces = (
        words.select(
            "freq",
            F.explode(F.expr(f"flatten(array({sub_arrays}))")).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("freq").cast("bigint").alias("score"))
        .orderBy(F.col("score").desc(), "piece")
        .limit(WP_PIECES)
    )
    vrow = pieces.agg(F.expr("array_sort(collect_list(piece))").alias("vset"))
    d = words.crossJoin(F.broadcast(vrow))
    # The walk is ONE aggregate() fold over sequence(1, WP_STEPS) with a
    # struct accumulator — not WP_STEPS chained projections, whose
    # analysis/optimization cost (project collapsing re-nests the state
    # expressions) dominated wall time ~20x over the actual 100-row
    # execution. The fold body is the same CASE arithmetic the oracle
    # unrolls as CTE pairs; interpreted HOF evaluation is irrelevant at
    # |words| rows.
    lsql = (
        f"(CASE WHEN acc.pos > length(word) THEN 0 "
        + " ".join(
            f"WHEN acc.pos + {l - 1} <= length(word)"
            f" AND array_contains(vset, substring(word, acc.pos, {l}))"
            f" THEN {l}"
            for l in range(WP_MAX_PIECE, 1, -1)
        )
        + " ELSE 1 END)"
    )
    d = d.selectExpr(
        "word",
        "freq",
        f"""aggregate(
            sequence(1, {WP_STEPS}),
            named_struct('pos', CAST(1 AS BIGINT), 'toks', '',
                         'n', CAST(0 AS BIGINT)),
            (acc, i) -> named_struct(
                'pos', acc.pos + {lsql},
                'toks', CASE WHEN {lsql} = 0 THEN acc.toks
                             WHEN acc.pos = 1
                                 THEN substring(word, acc.pos, {lsql})
                             ELSE acc.toks || ' ##'
                                  || substring(word, acc.pos, {lsql}) END,
                'n', acc.n + CASE WHEN {lsql} = 0 THEN 0 ELSE 1 END),
            acc -> acc) AS _st""",
    )
    return d.select(
        "word",
        "freq",
        F.col("_st.n").cast("bigint").alias("n_pieces"),
        F.col("_st.toks").alias("pieces"),
    )
