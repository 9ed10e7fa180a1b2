"""LLM training-data sequence packing (concat-and-chunk).

The standard pretraining batcher concatenates a corpus's token streams in a
deterministic order and slices the concatenation into fixed-length sequences
(GPT-style "concat then chunk"). The planning question a 100 TB pipeline has
to answer BEFORE writing a single packed shard is exactly what
``q_sequence_pack`` computes per language: how many sequences the corpus
yields, how many documents straddle a sequence boundary (and therefore get
split across training examples), and how full the final ragged sequence is.

The core primitive is an exact global prefix sum over a deterministic
document order — the same shape as the reference's offset-paged scan
(mysql_to_clickhouse_sync_pagination.py:130-142 advances a byte/row offset
serially). A single ``Window.partitionBy(lang).orderBy(doc_id)`` would
compute it, but that plan sorts EVERY row of a language into ONE task — the
per-language partition is the whole corpus at scale. Instead this runs the
classic two-level scan:

  1. shard documents into deterministic ``doc_id``-range blocks;
  2. per-block token subtotals (map-side combined groupBy — one output row
     per block, not per doc);
  3. an exclusive prefix sum over the tiny block-subtotal table (a window
     over #blocks rows — thousands, not billions);
  4. broadcast the block offsets back and rebase each block's *local*
     cumulative sum (window partitioned by (lang, block) — every block
     scans in parallel).

Cumulative sums decompose exactly over the split, so the result is
bit-identical to the single-window plan — the DuckDB oracle IS the single
global window, proving the decomposition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.operators.text import (
    _TOKEN_COUNT_SQL,
    token_count,
)
from mysql_to_clickhouse_sync_spark.registry import declare

SEQ_LEN = 512  # tokens per packed training sequence
# Docs per prefix-sum block. Sized so the block-offset table stays
# broadcast-small at scale: at 10^6 docs/block, even a trillion-doc corpus
# yields ~10^6 offset rows (~tens of MB) — a safe broadcast — while each
# block-local window still sorts only its own block. (At 1000 docs/block a
# billion-doc corpus would mean millions of offset rows, risking the
# broadcast limit.)
BLOCK = 1_000_000


@declare(
    "q_sequence_pack",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang,
               {_TOKEN_COUNT_SQL.format(col='text')} AS tok
        FROM documents
    ), pos AS (
        SELECT lang, tok,
               sum(tok) OVER (PARTITION BY lang ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS e
        FROM toks
    ), per_doc AS (
        SELECT lang, tok, e - tok AS s, e FROM pos
    ), g AS (
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(tok) AS BIGINT) AS total_tokens,
               CAST(sum(CASE WHEN tok > 0
                             AND (s // {SEQ_LEN}) < ((e - 1) // {SEQ_LEN})
                        THEN 1 ELSE 0 END) AS BIGINT) AS boundary_docs
        FROM per_doc GROUP BY lang
    )
    SELECT lang, n_docs, total_tokens,
           CAST((total_tokens + {SEQ_LEN - 1}) // {SEQ_LEN} AS BIGINT)
               AS n_seqs,
           boundary_docs,
           CAST(CASE WHEN total_tokens = 0 THEN 0
                ELSE ((total_tokens
                       - ((total_tokens + {SEQ_LEN - 1}) // {SEQ_LEN} - 1)
                         * {SEQ_LEN}) * 10000) // {SEQ_LEN}
                END AS BIGINT) AS last_fill_bp
    FROM g
    """,
    tier="P1",
)
def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing plan per language: sequence count, boundary
    (split) documents, and final-sequence fill, over the deterministic
    (lang, doc_id) concatenation order with SEQ_LEN-token sequences.

    Exact integer arithmetic throughout (token counts, `div`, basis points)
    — no float drift between engines. The global per-language prefix sum is
    computed as a two-level scan (block subtotals -> tiny exclusive window
    -> rebased block-local windows) so no single task ever sorts a whole
    language; see the module docstring. ``last_fill_bp`` is the final
    sequence's fill ratio in basis points (exact integer division).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        token_count(F.col("text")).alias("tok"),
        F.expr(f"doc_id div {BLOCK}").alias("block"),
    )

    # Level 1: per-block subtotals — map-side combined, one row per block.
    block_tot = docs.groupBy("lang", "block").agg(F.sum("tok").alias("bt"))

    # Level 2: exclusive prefix sum over blocks (tiny: #blocks rows).
    w_blocks = Window.partitionBy("lang").orderBy("block")
    offsets = block_tot.select(
        "lang",
        "block",
        (F.sum("bt").over(w_blocks) - F.col("bt")).alias("boff"),
    )

    # Level 3: block-local cumulative sums, rebased by the broadcast offset.
    w_local = Window.partitionBy("lang", "block").orderBy("doc_id")
    per_doc = (
        docs.withColumn("ie", F.sum("tok").over(w_local))
        .join(F.broadcast(offsets), ["lang", "block"])
        .select(
            "lang",
            "tok",
            (F.col("boff") + F.col("ie") - F.col("tok")).alias("s"),
            (F.col("boff") + F.col("ie")).alias("e"),
        )
    )

    boundary = (F.col("tok") > 0) & (
        F.expr(f"s div {SEQ_LEN}") < F.expr(f"(e - 1) div {SEQ_LEN}")
    )
    g = per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("tok").alias("total_tokens"),
        F.sum(boundary.cast("bigint")).alias("boundary_docs"),
    )
    n_seqs = F.expr(f"(total_tokens + {SEQ_LEN - 1}) div {SEQ_LEN}")
    last_fill = F.when(F.col("total_tokens") == 0, F.lit(0)).otherwise(
        F.expr(
            f"((total_tokens - ((total_tokens + {SEQ_LEN - 1}) div {SEQ_LEN}"
            f" - 1) * {SEQ_LEN}) * 10000) div {SEQ_LEN}"
        )
    )
    return g.select(
        "lang",
        "n_docs",
        F.col("total_tokens").cast("bigint").alias("total_tokens"),
        n_seqs.cast("bigint").alias("n_seqs"),
        F.col("boundary_docs").cast("bigint").alias("boundary_docs"),
        last_fill.cast("bigint").alias("last_fill_bp"),
    )
