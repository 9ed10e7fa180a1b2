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
wordcount + bounded TakeOrdered — the only corpus-dependent stage, and
it stays in Spark. Everything after runs on the BOUNDED vocabulary
(<= UNI_VOCAB rows of a few bytes each) on the DRIVER — the ivf.py
K-row-quantizer rule. Round 10 moved the EM there from an all-Spark
DP-projection chain: the 2 x 11 stages of ~20-arm CASE expressions
cost ~14 s of driver-side plan analysis + codegen COMPILATION per run
(measured at sf0.1 — a bill a real cluster pays identically, since
compilation is driver work repeated every run) to evaluate 80 rows.
Production trains on the full Heaps'-law word table with the identical
loop once the vocab bound is raised; rounds cost O(vocab), not
O(corpus). Public algorithm (arXiv:1804.10959); no reference cite —
the reference has no text processing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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


def _int_log_t_py(m: int) -> int:
    """t = 64 * (1024*e + (m*1024) // 2^e - 1024 - 20480) - 1 with
    e = floor(log2 m) — the oracle's fixed-point log, plain integers.
    The -20480 recenters l to 1024*log2(m / 10^6) = 1024*log2(P) < 0:
    every piece COSTS, so Viterbi's maximization trades piece count
    against probability exactly as the unigram LM demands — a bigram
    wins iff P(ab) > P(a)*P(b) (up to quantization; the -1 per piece
    is the fewer-pieces tie-break)."""
    e = 0
    for v in range(_E_MAX, 0, -1):
        if m >= (1 << v):
            e = v
            break
    log_fp = 1024 * e + (m * 1024) // (1 << e) - 1024 - 20480
    return 64 * log_fp - 1


def _scores_py(counts: dict[str, int]) -> dict[str, int]:
    """piece -> t: quantized-probability transition weights (m = cnt *
    10^6 // tot + 1, floor division on nonnegative ints — the exact
    arithmetic the DuckDB oracle runs)."""
    tot = sum(counts.values())
    return {
        p: _int_log_t_py(cnt * UNI_SCALE // tot + 1)
        for p, cnt in counts.items()
    }


def _viterbi_py(word: str, scores: dict[str, int]) -> tuple[int, str]:
    """(fin_s, fin_g): the bounded-lattice Viterbi over one word —
    positionally identical to the oracle's unrolled dp_r_k CTE chain
    (c1 extends the best prefix by one char, c2 extends the k-2 prefix
    by the bigram ending at k; NULL bigram scores propagate as None;
    ties break on c1g <= c2g, the lexicographically smaller
    segmentation — ASCII-only strings, so Python's str order equals
    both engines' binary collation)."""
    s_prev: int | None = 0
    g_prev = ""
    s_cur: int | None = scores.get(word[0])
    g_cur = word[0]
    for k in range(2, len(word) + 1):
        t1 = scores.get(word[k - 1 : k])
        c1s = None if (s_cur is None or t1 is None) else s_cur + t1
        c1g = word[k - 1] if g_cur == "" else g_cur + " " + word[k - 1]
        t2 = scores.get(word[k - 2 : k])
        c2s = None if (s_prev is None or t2 is None) else s_prev + t2
        c2g = (
            word[k - 2 : k]
            if g_prev == ""
            else g_prev + " " + word[k - 2 : k]
        )
        take1 = c2s is None or (
            c1s is not None
            and (c1s > c2s or (c1s == c2s and c1g <= c2g))
        )
        s_prev, g_prev = s_cur, g_cur
        s_cur, g_cur = (c1s, c1g) if take1 else (c2s, c2g)
    return s_cur, g_cur


@declare("q_unigram_lm", oracle=_unigram_oracle(), tier="P1")
def q_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train UNI_ROUNDS hard-EM rounds of the unigram LM on the bounded
    corpus vocabulary and return each word's converged Viterbi
    segmentation (word, freq, n_pieces, seg, score) — hash-verified
    against the oracle's fully unrolled EM + DP. Together with
    q_bpe_train/q_bpe_encode this covers both dominant public
    subword-tokenizer algorithms."""
    docs = load_table(spark, sf_dir, "documents")
    # The corpus-scale half: one standard wordcount shuffle + bounded
    # TakeOrdered — this is the ONLY part whose cost grows with the
    # corpus, and it stays in Spark unchanged.
    words = [
        (r[0], int(r[1]))
        for r in docs.select(
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
        .collect()
    ]
    # Everything below runs on the BOUNDED vocabulary (<= UNI_VOCAB = 80
    # rows, corpus-size-independent) — the ivf.py K-row-quantizer rule:
    # bounded K-row state is driver work, exactly like the reference's
    # own MIN/MAX scalars (S:163). The previous all-Spark EM expressed
    # the identical integer arithmetic as 2 rounds x 11 DP projection
    # stages of ~20-arm CASE chains over those 80 rows: ~14 s of plan
    # analysis + whole-stage-codegen COMPILATION (measured this round at
    # sf0.1; profile in plans/r10/q_unigram_lm_before.txt) for
    # microseconds of actual evaluation, and the compile bill recurs on
    # a real cluster too (driver-side, per run). Same fixed-point
    # integers, same oracle, same hash — verified at sf0.001/0.01/0.1.
    singles: dict[str, int] = {}
    big: dict[str, int] = {}
    for wd, fq in words:
        for ch in wd:
            singles[ch] = singles.get(ch, 0) + fq
        for i in range(len(wd) - 1):
            p = wd[i : i + 2]
            big[p] = big.get(p, 0) + fq
    bigrams = dict(
        sorted(big.items(), key=lambda kv: (-kv[1], kv[0]))[:UNI_PAIRS]
    )
    # single-char and 2-char key spaces are disjoint, so the UNION ALL
    # of the oracle's pieces_0 is a plain dict merge
    counts: dict[str, int] = {**singles, **bigrams}
    pieces0 = list(counts)
    seg: dict[str, tuple[int, int, str]] = {}
    for _ in range(UNI_ROUNDS):
        scores = _scores_py(counts)
        seg = {
            wd: (fq, *_viterbi_py(wd, scores)) for wd, fq in words
        }
        used: dict[str, int] = {}
        for _wd, (fq, _s, g) in seg.items():
            for p in g.split(" "):
                used[p] = used.get(p, 0) + fq
        counts = {p: used.get(p, 0) + 1 for p in pieces0}
    return spark.createDataFrame(
        [
            (wd, fq, len(g.split(" ")), g, s)
            for wd, (fq, s, g) in seg.items()
        ],
        "word string, freq bigint, n_pieces bigint, seg string,"
        " score bigint",
    )
