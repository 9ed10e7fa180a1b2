"""REAL Unigram-LM tokenizer training (Kudo 2018, SentencePiece's model)
— the EM companion to operators/bpe.py, as an oracle-verified iterative
algorithm (VERDICT r4 #7).

Where BPE greedily MERGES (bottom-up), the unigram LM SEGMENTS top-down:
a fixed piece vocabulary carries a probability each, every word is
segmented by Viterbi DP over the piece lattice, and EM alternates
(E) re-segment under current probabilities / (M) re-estimate
probabilities from the segmentations. This implementation is the
hard-EM (Viterbi) variant over a BOUNDED lattice, everything in
FIXED-POINT INTEGER arithmetic so both engines agree bitwise:

  * vocabulary: the UNI_VOCAB most frequent corpus words of length
    <= UNI_MAXW (freq DESC, word ASC — deterministic);
  * piece set (FIXED across rounds): every single character plus the
    UNI_PAIRS most frequent adjacent character bigrams — the bounded
    lattice means Viterbi at position k chooses between "extend by one
    char" and "extend by the bigram ending here";
  * piece score: probability quantized to integer millionths
    m = cnt * 1_000_000 // total + 1 (floor division — identical on
    both engines for nonnegative ints; +1 is the declared smoothing
    that keeps log defined), then a fixed-point integer log2
    l = 1024*e + (m * 1024) // 2^e - 1024 - 20480
    with e = floor(log2 m) (e via a 20-arm comparison CASE, 2^e via a
    CASE over e — no libm anywhere); the -20480 = 1024*log2(10^6)
    recenters l to 1024*log2(P) < 0 so every piece COSTS and Viterbi's
    maximization is the true unigram-LM objective (a bigram wins iff
    P(ab) > P(a)*P(b), up to quantization); the DP transition weight is
    t = 64*l - 1 (the -1 makes fewer-pieces the built-in tie-break);
  * Viterbi: maximize the summed transition weights; remaining ties
    break on the lexicographically smaller segmentation string — a
    total order, so the argmax is deterministic on both engines;
  * M-step: piece count = freq-weighted uses in the round's best
    segmentations, +1 add-one smoothing, same fixed piece set.

The DuckDB oracle unrolls every round and every DP position as CTEs
(the q_bpe_train pattern; AS MATERIALIZED throughout — DuckDB inlines
multiply-referenced CTEs and the dp chain references each stage twice).

Scale notes (100 TB): word counting is the standard one-shuffle
wordcount; everything after runs on the BOUNDED vocabulary (<= UNI_VOCAB
rows): the piece table is collected into a broadcast map column (one
row, map<piece,int>), the DP is a single projection of integer CASE
expressions per word (no joins, no UDFs), and each EM round is one
map-side-combined count over exploded segmentations. Production trains
on the full Heaps'-law word table with the identical loop; rounds cost
O(vocab), not O(corpus). Public algorithm (arXiv:1804.10959); no
reference cite — the reference has no text processing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.registry import declare

UNI_VOCAB = 80
UNI_MAXW = 12
UNI_PAIRS = 60
UNI_ROUNDS = 2
UNI_SCALE = 1_000_000

_E_MAX = 20  # m <= UNI_SCALE + 1 < 2^20


def _e_case_sql(m: str) -> str:
    arms = " ".join(
        f"WHEN {m} >= {1 << e} THEN {e}" for e in range(_E_MAX, 0, -1)
    )
    return f"CASE {arms} ELSE 0 END"


def _pow_case_sql(e: str) -> str:
    arms = " ".join(f"WHEN {v} THEN {1 << v}" for v in range(1, _E_MAX + 1))
    return f"CASE {e} {arms} ELSE 1 END"


_WTAB_SQL = f"""
    wtab AS MATERIALIZED (
        SELECT word, freq, length(word) AS len FROM (
            SELECT word, CAST(count(*) AS BIGINT) AS freq
            FROM (
                SELECT unnest(string_split(regexp_replace(lower(text),
                           '[^a-z0-9 ]', '', 'g'), ' ')) AS word
                FROM documents
            )
            WHERE word <> '' AND length(word) <= {UNI_MAXW}
            GROUP BY word
            ORDER BY freq DESC, word
            LIMIT {UNI_VOCAB}
        )
    ), singles AS MATERIALIZED (
        SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
            SELECT freq, unnest(list_transform(
                       generate_series(1, len), i -> substr(word, i, 1)))
                       AS piece
            FROM wtab
        ) GROUP BY piece
    ), bigrams AS MATERIALIZED (
        SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
            SELECT freq, unnest(list_transform(
                       generate_series(1, len - 1),
                       i -> substr(word, i, 2))) AS piece
            FROM wtab
            WHERE len >= 2
        ) GROUP BY piece
        ORDER BY cnt DESC, piece
        LIMIT {UNI_PAIRS}
    ), pieces_0 AS MATERIALIZED (
        SELECT piece, cnt FROM singles
        UNION ALL
        SELECT piece, cnt FROM bigrams
    )"""


def _scores_sql(r: int, src: str) -> str:
    return f"""
    , tot_{r} AS (
        SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM {src}
    ), scores_{r} AS MATERIALIZED (
        SELECT piece,
               64 * (1024 * e + (m * 1024) // po - 1024 - 20480) - 1 AS t
        FROM (
            SELECT piece, m, e, {_pow_case_sql('e')} AS po
            FROM (
                SELECT piece, m, {_e_case_sql('m')} AS e
                FROM (
                    SELECT piece,
                           (cnt * {UNI_SCALE}) // tot + 1 AS m
                    FROM {src}, tot_{r}
                )
            )
        )
    )"""


def _dp_sql(r: int) -> str:
    t1 = f"(SELECT t FROM scores_{r} WHERE piece = substr(word, {{k}}, 1))"
    t2 = f"(SELECT t FROM scores_{r} WHERE piece = substr(word, {{km1}}, 2))"
    choose = (
        "c2s IS NULL OR (c1s IS NOT NULL AND (c1s > c2s"
        " OR (c1s = c2s AND c1g <= c2g)))"
    )
    out = [
        f"""
    , dp_{r}_1 AS MATERIALIZED (
        SELECT word, freq, len,
               CAST(0 AS BIGINT) AS s_prev, '' AS g_prev,
               {t1.format(k=1)} AS s_cur,
               substr(word, 1, 1) AS g_cur,
               CASE WHEN len = 1 THEN {t1.format(k=1)} END AS fin_s,
               CASE WHEN len = 1 THEN substr(word, 1, 1) END AS fin_g
        FROM wtab
    )"""
    ]
    for k in range(2, UNI_MAXW + 1):
        out.append(
            f"""
    , dp_{r}_{k} AS MATERIALIZED (
        SELECT word, freq, len, s_prev, g_prev,
               chosen_s AS s_cur, chosen_g AS g_cur,
               CASE WHEN len = {k} THEN chosen_s ELSE fin_s END AS fin_s,
               CASE WHEN len = {k} THEN chosen_g ELSE fin_g END AS fin_g
        FROM (
            SELECT word, freq, len, fin_s, fin_g,
                   s_cur AS s_prev, g_cur AS g_prev,
                   CASE WHEN {choose} THEN c1s ELSE c2s END AS chosen_s,
                   CASE WHEN {choose} THEN c1g ELSE c2g END AS chosen_g
            FROM (
                SELECT word, freq, len, s_prev, g_prev, s_cur, g_cur,
                       fin_s, fin_g,
                       s_cur + {t1.format(k=k)} AS c1s,
                       CASE WHEN g_cur = '' THEN substr(word, {k}, 1)
                            ELSE g_cur || ' ' || substr(word, {k}, 1)
                       END AS c1g,
                       s_prev + {t2.format(km1=k - 1)} AS c2s,
                       CASE WHEN g_prev = '' THEN substr(word, {k - 1}, 2)
                            ELSE g_prev || ' ' || substr(word, {k - 1}, 2)
                       END AS c2g
                FROM dp_{r}_{k - 1}
            )
        )
    )"""
        )
    out.append(
        f"""
    , seg_{r} AS MATERIALIZED (
        SELECT word, freq, fin_s, fin_g FROM dp_{r}_{UNI_MAXW}
    ), used_{r} AS MATERIALIZED (
        SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
            SELECT freq, unnest(string_split(fin_g, ' ')) AS piece
            FROM seg_{r}
        ) GROUP BY piece
    ), pieces_{r} AS MATERIALIZED (
        SELECT p.piece, coalesce(u.cnt, 0) + 1 AS cnt
        FROM pieces_0 p LEFT JOIN used_{r} u USING (piece)
    )"""
    )
    return "".join(out)


def _unigram_oracle() -> str:
    rounds = "".join(
        _scores_sql(r, f"pieces_{r - 1}") + _dp_sql(r)
        for r in range(1, UNI_ROUNDS + 1)
    )
    return f"""
    WITH {_WTAB_SQL}
    {rounds}
    SELECT word, freq,
           CAST(len(string_split(fin_g, ' ')) AS BIGINT) AS n_pieces,
           fin_g AS seg,
           CAST(fin_s AS BIGINT) AS score
    FROM seg_{UNI_ROUNDS}
    """


def _int_log_t(m: Column) -> Column:
    """t = 64 * (1024*e + (m*1024) // 2^e - 1024) - 1, e = floor(log2 m)
    — the same CASE-chain fixed-point log as the oracle, no libm."""
    e = F.lit(0)
    for v in range(1, _E_MAX + 1):
        e = F.when(m >= (1 << v), F.lit(v)).otherwise(e)
    po = F.lit(1).cast("bigint")
    for v in range(1, _E_MAX + 1):
        po = F.when(e == v, F.lit(1 << v).cast("bigint")).otherwise(po)
    # (m * 1024) // po via subtract-mod-then-divide: the numerator is an
    # exact multiple, so the double division is exact and equals the
    # oracle's integer floor // (operands nonnegative throughout).
    frac = (m * F.lit(1024)).cast("bigint")
    # the -20480 recenters l to 1024*log2(m / 10^6) = 1024*log2(P) < 0:
    # every piece COSTS, so Viterbi's maximization trades piece count
    # against probability exactly as the unigram LM demands — a bigram
    # wins iff P(ab) > P(a)*P(b) (up to quantization; the -1 per piece
    # is the fewer-pieces tie-break).
    log_fp = (
        F.lit(1024) * e
        + ((frac - frac % po) / po).cast("bigint")
        - F.lit(1024)
        - F.lit(20480)
    )
    return (F.lit(64) * log_fp - F.lit(1)).cast("bigint")


def _scores_frame(pieces: DataFrame) -> DataFrame:
    """(piece, t): fixed-point transition weights from a count table."""
    tot = pieces.agg(F.sum("cnt").cast("bigint").alias("tot"))
    m = (
        (F.col("cnt") * UNI_SCALE - (F.col("cnt") * UNI_SCALE) % F.col("tot"))
        / F.col("tot")
    ).cast("bigint") + F.lit(1)
    return pieces.crossJoin(F.broadcast(tot)).select(
        "piece", _int_log_t(m.cast("bigint")).alias("t")
    )


def _viterbi(words: DataFrame, scores: DataFrame) -> DataFrame:
    """(word, freq, fin_s, fin_g): the bounded-lattice Viterbi as ONE
    projection of integer CASE expressions — piece weights ride along as
    a broadcast map column, so there are no joins and no Python."""
    pm = scores.agg(
        F.map_from_entries(
            F.collect_list(F.struct("piece", "t"))
        ).alias("pm")
    )

    def t_at(pos: int, ln: int) -> Column:
        return F.element_at(
            F.col("pm"), F.substring(F.col("word"), pos, ln)
        ).cast("bigint")

    def cat(prev_g: Column, piece: Column) -> Column:
        return F.when(prev_g == "", piece).otherwise(
            F.concat(prev_g, F.lit(" "), piece)
        )

    # Each DP stage is a NAMED projection (two selects, exactly the
    # oracle's nested-CTE shape) — folding stages into one expression
    # tree multiplies its size ~6x per position and overflows the
    # column-normalization stack before analysis even starts.
    ln = F.length("word")
    w = words.crossJoin(F.broadcast(pm)).select(
        "word",
        "freq",
        "pm",
        F.lit(0).cast("bigint").alias("s_prev"),
        F.lit("").alias("g_prev"),
        t_at(1, 1).alias("s_cur"),
        F.substring(F.col("word"), 1, 1).alias("g_cur"),
        F.when(ln == 1, t_at(1, 1)).alias("fin_s"),
        F.when(ln == 1, F.substring(F.col("word"), 1, 1)).alias("fin_g"),
    )
    for k in range(2, UNI_MAXW + 1):
        w = w.select(
            "word",
            "freq",
            "pm",
            "s_cur",
            "g_cur",
            "fin_s",
            "fin_g",
            (F.col("s_cur") + t_at(k, 1)).alias("c1s"),
            cat(F.col("g_cur"), F.substring(F.col("word"), k, 1)).alias(
                "c1g"
            ),
            (F.col("s_prev") + t_at(k - 1, 2)).alias("c2s"),
            cat(
                F.col("g_prev"), F.substring(F.col("word"), k - 1, 2)
            ).alias("c2g"),
        )
        take1 = F.col("c2s").isNull() | (
            F.col("c1s").isNotNull()
            & (
                (F.col("c1s") > F.col("c2s"))
                | (
                    (F.col("c1s") == F.col("c2s"))
                    & (F.col("c1g") <= F.col("c2g"))
                )
            )
        )
        chosen_s = F.when(take1, F.col("c1s")).otherwise(F.col("c2s"))
        chosen_g = F.when(take1, F.col("c1g")).otherwise(F.col("c2g"))
        w = w.select(
            "word",
            "freq",
            "pm",
            F.col("s_cur").alias("s_prev"),
            F.col("g_cur").alias("g_prev"),
            chosen_s.alias("s_cur"),
            chosen_g.alias("g_cur"),
            F.when(ln == k, chosen_s).otherwise(F.col("fin_s")).alias(
                "fin_s"
            ),
            F.when(ln == k, chosen_g).otherwise(F.col("fin_g")).alias(
                "fin_g"
            ),
        )
    return w.select(
        "word",
        "freq",
        F.col("fin_s").cast("bigint").alias("fin_s"),
        F.col("fin_g").alias("fin_g"),
    )


@declare("q_unigram_lm", oracle=_unigram_oracle(), tier="P1")
def q_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train UNI_ROUNDS hard-EM rounds of the unigram LM on the bounded
    corpus vocabulary and return each word's converged Viterbi
    segmentation (word, freq, n_pieces, seg, score) — hash-verified
    against the oracle's fully unrolled EM + DP. Together with
    q_bpe_train/q_bpe_encode this covers both dominant public
    subword-tokenizer algorithms."""
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
        .filter((F.col("word") != "") & (F.length("word") <= UNI_MAXW))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("freq"))
        .orderBy(F.col("freq").desc(), "word")
        .limit(UNI_VOCAB)
        .localCheckpoint(eager=True)
    )
    singles = (
        words.select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(word)),"
                    " i -> substring(word, i, 1))"
                )
            ).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
    )
    bigrams = (
        words.filter(F.length("word") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(word) - 1),"
                    " i -> substring(word, i, 2))"
                )
            ).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "piece")
        .limit(UNI_PAIRS)
    )
    pieces = singles.unionByName(bigrams).localCheckpoint(eager=True)
    piece_set = pieces.select("piece")
    seg = None
    counts = pieces
    for _ in range(UNI_ROUNDS):
        scores = _scores_frame(counts).localCheckpoint(eager=True)
        seg = _viterbi(words, scores).localCheckpoint(eager=True)
        used = (
            seg.select(
                "freq", F.explode(F.split("fin_g", " ")).alias("piece")
            )
            .groupBy("piece")
            .agg(F.sum("freq").cast("bigint").alias("used"))
        )
        counts = piece_set.join(used, "piece", "left").select(
            "piece",
            (F.coalesce(F.col("used"), F.lit(0)) + 1)
            .cast("bigint")
            .alias("cnt"),
        )
    return seg.select(
        "word",
        "freq",
        F.size(F.split("fin_g", " ")).cast("bigint").alias("n_pieces"),
        F.col("fin_g").alias("seg"),
        F.col("fin_s").cast("bigint").alias("score"),
    )
