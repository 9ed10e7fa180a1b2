"""Dataset-curation operators: reproducible splits, sensitive-term
scrubbing, and per-column profiling (north-star training-data extensions;
the reference has no analytics surface at all — SURVEY.md §2.8, §2.10).

  * q_hash_split   — deterministic md5-keyed train/val/test split. THE
                     reproducible way to split 100 TB: the assignment is a
                     pure function of the stable key, so it needs no shuffle,
                     no persisted assignment table, and is stable under
                     re-runs, repartitioning, and incremental appends.
  * q_redact_scrub — regex scrub of sensitive terms (PII-shaped machinery:
                     swap the pattern for emails/phones/SSNs in production;
                     the fixture corpus has no digits, so the declared query
                     uses word patterns that actually occur) with per-language
                     hit accounting.
  * q_null_profile — per-column data-quality profile (null count, exact
                     distinct count, typed min/max rendered to strings) of
                     `orders`, unpivoted to one row per column.

Scale notes: hash-split and scrub are map-only scalar expressions inside
whole-stage codegen — they scan once and shuffle only the tiny final
aggregate. The profiler computes every column's aggregates in ONE pass over
the table (single scan at 100 TB) and unpivots the 1-row result driver-side;
exact multi-column distinct counts expand the plan (Catalyst `Expand`, one
shuffle per distinct column set) — at 100 TB you would swap
`count(distinct)` for `approx_count_distinct` per column, which collapses
back to a single aggregate; declared exact here so DuckDB hash-matches.

Reference tie-in: min/max-with-default profiling per table is exactly the
reference's planning scan (IFNULL(MIN/MAX), mysql_to_clickhouse_sync.py:163)
generalized from the PK column to every column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.registry import declare

# 80/10/10 by the first two hex chars of md5(key): hex strings compare
# lexicographically identically in Spark and DuckDB (ASCII '0'<'9'<'a'<'f').
_TRAIN_HI = "cc"  # 0xcc = 204/256 ≈ 79.7 %
_VAL_HI = "e6"  # 0xe6 = 230/256 → next ≈ 10.2 %


def split_assign(key: Column) -> Column:
    """Deterministic split label from a stable key — md5 keeps the
    assignment uniform and engine-independent."""
    bucket = F.substring(F.md5(key.cast("string")), 1, 2)
    return (
        F.when(bucket < _TRAIN_HI, F.lit("train"))
        .when(bucket < _VAL_HI, F.lit("val"))
        .otherwise(F.lit("test"))
    )


# split_assign's SQL twin — the ONE place the split contract is written on
# the oracle side (q_hash_split and q_split_leakage both splice it).
_SPLIT_SQL = f"""CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                          < '{_TRAIN_HI}' THEN 'train'
                      WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                          < '{_VAL_HI}' THEN 'val'
                      ELSE 'test' END"""


@declare(
    "q_hash_split",
    oracle=f"""
    SELECT {_SPLIT_SQL} AS split,
           lang,
           count(*) AS n_docs,
           -- CAST: DuckDB sum(BIGINT) is HUGEINT, which pandas maps to
           -- float64 while Spark's sum stays int64 — the driver's
           -- canonicalization is dtype-sensitive, so pin BIGINT on both
           -- sides (Spark sum(bigint) is already bigint).
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(doc_id) AS first_doc
    FROM documents
    GROUP BY 1, 2
    """,
    tier="P1",
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/val/test split of the document corpus, audited
    per (split, lang). Map-only assignment; the only shuffle is the
    |splits|x|langs|-row audit aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("split", split_assign(F.col("doc_id")))
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("first_doc"),
        )
    )


# Word patterns present in the fixture corpus; production swaps in
# email/phone/SSN alternations — identical plan shape either way.
_SCRUB_PATTERN = r"\b(customer|key)\b"
_SCRUB_TOKEN = "<REDACTED>"


@declare(
    "q_redact_scrub",
    oracle=f"""
    WITH hits AS (
        SELECT lang,
               len(regexp_extract_all(text, '{_SCRUB_PATTERN}')) AS n_hits,
               length(regexp_replace(text, '{_SCRUB_PATTERN}',
                                     '{_SCRUB_TOKEN}', 'g')) AS len_after,
               length(text) AS len_before
        FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           -- CASTs: DuckDB integer sums widen to HUGEINT → pandas float64;
           -- Spark stays int64. Pin BIGINT so the driver's dtype-sensitive
           -- canonicalization matches.
           CAST(sum(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_hit,
           CAST(sum(n_hits) AS BIGINT) AS total_hits,
           CAST(sum(len_before) AS BIGINT) AS chars_before,
           CAST(sum(len_after) AS BIGINT) AS chars_after
    FROM hits
    GROUP BY lang
    """,
    tier="P1",
)
def q_redact_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensitive-term scrub with audit counts: how many documents and
    occurrences were touched per language, and the size delta. One codegen'd
    scan; Spark's regexp_replace is global by default (DuckDB needs 'g')."""
    docs = load_table(spark, sf_dir, "documents")
    n_hits = F.size(
        F.regexp_extract_all("text", F.lit(_SCRUB_PATTERN), 0)
    ).cast("bigint")
    redacted = F.regexp_replace("text", _SCRUB_PATTERN, _SCRUB_TOKEN)
    return (
        docs.select(
            "lang",
            n_hits.alias("n_hits"),
            F.length(redacted).alias("len_after"),
            F.length("text").alias("len_before"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("n_hits") > 0).cast("bigint")).alias("docs_hit"),
            F.sum("n_hits").alias("total_hits"),
            F.sum("len_before").alias("chars_before"),
            F.sum("len_after").alias("chars_after"),
        )
    )


# (column, render) pairs for the profiler. o_totalprice (double) renders no
# min/max string: Java's Double.toString and DuckDB's shortest-round-trip
# repr disagree on some doubles, and rounding through a decimal cast
# double-rounds in DuckDB (memory: wide-decimal→double) — n_null/n_distinct
# are still exact for it.
_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _render(col: str, dtype: str) -> Column:
    if dtype == "double":
        return F.lit(None).cast("string")
    if dtype.startswith("timestamp"):
        return F.date_format(F.col(col), _TS_FMT)
    return F.col(col).cast("string")


def _render_sql(col: str, dtype: str) -> str:
    if dtype == "double":
        return "CAST(NULL AS VARCHAR)"
    if dtype.startswith("timestamp"):
        return f"strftime({col}, '%Y-%m-%d %H:%M:%S.%f')"
    return f"CAST({col} AS VARCHAR)"


_ORDERS_COLS = [
    ("o_orderkey", "bigint"),
    ("o_custkey", "bigint"),
    ("o_orderstatus", "string"),
    ("o_totalprice", "double"),
    ("o_orderdate", "timestamp"),
    ("o_orderpriority", "string"),
]


def _profile_oracle() -> str:
    parts = []
    for c, t in _ORDERS_COLS:
        parts.append(
            f"""SELECT '{c}' AS col_name,
                   count(*) - count({c}) AS n_null,
                   count(DISTINCT {c}) AS n_distinct,
                   min({_render_sql(c, t)}) AS min_str,
                   max({_render_sql(c, t)}) AS max_str
            FROM orders"""
        )
    return " UNION ALL ".join(parts)


@declare("q_null_profile", oracle=_profile_oracle(), tier="P1")
def q_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column quality profile of `orders`: null count, exact distinct
    count, rendered min/max — one independent single-column sub-plan per
    column, unioned.

    Deliberately NOT one agg() with six count_distinct's: Catalyst rewrites
    multi-distinct into a single Expand (rows x (N+1)) feeding a
    SortAggregate keyed on every profiled column at once — a full sort of
    the expanded table. Per-column sub-plans instead each read ONE
    column-pruned parquet column and hash-aggregate it; on a cluster the six
    sub-plans are independent jobs over ~1/6 of the bytes each, so the
    union form is both faster wall-clock and strictly less shuffle. (At
    100 TB, swap count_distinct for approx_count_distinct and the whole
    profile collapses to one scan with no Expand at all.)"""
    orders = load_table(spark, sf_dir, "orders")
    parts = []
    for c, t in _ORDERS_COLS:
        rendered = _render(c, t)
        parts.append(
            orders.select(c).agg(
                F.lit(c).alias("col_name"),
                F.sum(F.col(c).isNull().cast("bigint")).alias("n_null"),
                F.count_distinct(F.col(c)).alias("n_distinct"),
                F.min(rendered).alias("min_str"),
                F.max(rendered).alias("max_str"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


from mysql_to_clickhouse_sync_spark.operators.dedup import (  # noqa: E402
    passage_hashes,
    passages_sql,
)


@declare(
    "q_split_leakage",
    oracle=f"""
    {passages_sql(f"{_SPLIT_SQL} AS split", "split")}
    , hs AS (
        SELECT DISTINCT split, md5(passage) AS h FROM passages
    ), per_split AS (
        SELECT split, count(*) AS n_passages FROM hs GROUP BY split
    ), leaks AS (
        SELECT e.split AS eval_split, count(*) AS n_leaked
        FROM hs e JOIN hs t
          ON t.split = 'train' AND e.h = t.h AND e.split <> 'train'
        GROUP BY e.split
    )
    SELECT p.split AS eval_split,
           CAST(p.n_passages AS BIGINT) AS n_passages,
           CAST(COALESCE(l.n_leaked, 0) AS BIGINT) AS n_leaked,
           CAST(COALESCE(l.n_leaked, 0) * 10000 // p.n_passages AS BIGINT)
               AS leak_bp
    FROM per_split p LEFT JOIN leaks l ON l.eval_split = p.split
    WHERE p.split <> 'train'
    """,
    tier="P2",
)
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-leakage audit: how many distinct 16-token passages in the val
    and test splits also appear in train — the eval-integrity number a
    pipeline must report BEFORE anyone trusts a held-out loss (document-
    level hash splitting does not prevent passage-level leakage when
    near-duplicate documents land in different splits; this measures
    exactly that residue).

    Scale notes (100 TB): distinct (split, passage-hash) pairs are one
    map-side-combined shuffle; the leak check is a hash-keyed equi-join
    where the build side (val+test passages, ~20 % of the corpus) probes
    train — at scale flip it into a broadcast Bloom pre-filter (the
    q_bloom_dedup pattern) with the same audit semantics. No quadratic
    term anywhere: both sides of the join are DISTINCT hash sets."""
    docs = load_table(spark, sf_dir, "documents")
    tagged = docs.select(
        split_assign(F.col("doc_id")).alias("split"), "text"
    )
    hs = passage_hashes(tagged, "split").select("split", "h").distinct()
    train = hs.filter(F.col("split") == "train").select("h")
    evals = hs.filter(F.col("split") != "train")
    per_split = evals.groupBy("split").agg(F.count("*").alias("n_passages"))
    leaks = (
        evals.join(train, "h")
        .groupBy("split")
        .agg(F.count("*").alias("n_leaked"))
    )
    return (
        per_split.join(leaks, "split", "left")
        .select(
            F.col("split").alias("eval_split"),
            F.col("n_passages").cast("bigint").alias("n_passages"),
            F.coalesce("n_leaked", F.lit(0)).cast("bigint").alias("n_leaked"),
            F.expr(
                "CAST(COALESCE(n_leaked, 0) * 10000 div n_passages AS BIGINT)"
            ).alias("leak_bp"),
        )
    )


# --- q_benford_quality ---------------------------------------------------------

# Benford expected first-digit shares, floor(log10(1 + 1/d) * 1e6) for
# d = 1..9 — fixed public constants (same table both engines); pinned
# against float recomputation in tests/test_behavior_quality.py.
BENFORD_MICRO = [
    301029, 176091, 124938, 96910, 79181, 66946, 57991, 51152, 45757,
]


def _benford_oracle() -> str:
    vals = ", ".join(
        f"({d + 1}, {m})" for d, m in enumerate(BENFORD_MICRO)
    )
    return f"""
    WITH src AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                    AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM orders WHERE o_totalprice >= 1
    ), n AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM src
    ), obs AS (
        SELECT digit, CAST(count(*) AS BIGINT) AS cnt FROM src GROUP BY digit
    ), exp AS (
        SELECT d, CAST(m AS BIGINT) AS exp_micro
        FROM (VALUES {vals}) AS t(d, m)
    ), cells AS (
        SELECT exp.d AS digit, COALESCE(obs.cnt, 0) AS cnt, exp.exp_micro,
               n.n, (n.n * exp.exp_micro) // 1000 AS exp_milli
        FROM exp LEFT JOIN obs ON obs.digit = exp.d CROSS JOIN n
    )
    SELECT digit, cnt, exp_micro,
           CAST(exp_milli AS BIGINT) AS exp_cnt_milli,
           CAST((cnt * 1000 - exp_milli) * (cnt * 1000 - exp_milli)
                // exp_milli AS BIGINT) AS dev_milli,
           CAST(SUM((cnt * 1000 - exp_milli) * (cnt * 1000 - exp_milli)
                // exp_milli) OVER () AS BIGINT) AS chi2_milli
    FROM cells
    """


@declare("q_benford_quality", oracle=_benford_oracle(), tier="P2")
def q_benford_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    fabricated-data detector (organic monetary values follow
    P(d) = log10(1 + 1/d); synthetic or tampered columns usually don't):
    observed first-digit counts vs pinned Benford expectations
    (public constants, micro-units), per-digit chi-square deviations in
    exact milli-counts and the total repeated per row. First digit via
    the integer part's string head — identical on both engines because
    the floored BIGINT is identical.

    Scale notes: one digit-keyed map-side-combined shuffle into 9
    cells; the window runs over 9 rows. Overflow: (cnt*1000)^2 bounds
    BIGINT safety at ~1e6 rows per digit cell; beyond, divide the
    deviation by n first (documented, unreached at fixtures)."""
    src = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= 1)
        .select(
            F.expr(
                "CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)"
                " AS STRING), 1, 1) AS BIGINT)"
            ).alias("digit")
        )
    )
    n = src.agg(F.count("*").cast("long").alias("n"))
    obs = src.groupBy("digit").agg(F.count("*").cast("long").alias("cnt"))
    exp = spark.createDataFrame(
        [(d + 1, m) for d, m in enumerate(BENFORD_MICRO)],
        "d long, exp_micro long",
    )
    cells = (
        exp.join(obs, exp["d"] == obs["digit"], "left")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("d").alias("digit"),
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt"),
            "exp_micro",
            F.expr("(n * exp_micro) div 1000").alias("exp_milli"),
        )
    )
    wall = Window.partitionBy()
    dev = F.expr(
        "(cnt * 1000 - exp_milli) * (cnt * 1000 - exp_milli) div exp_milli"
    )
    return cells.select(
        "digit",
        "cnt",
        "exp_micro",
        F.col("exp_milli").alias("exp_cnt_milli"),
        dev.alias("dev_milli"),
        F.sum(dev).over(wall).cast("long").alias("chi2_milli"),
    )
