"""Python UDTF surface (SURVEY.md §2.10 — the reference's only "UDF" is its
per-value literal formatter, mysql_to_clickhouse_sync.py:56-74; Spark's
user-function ladder is scalar UDF -> pandas UDF -> mapInPandas -> UDTF,
and the other rungs are covered by similarity.py / multimodal.py /
stateful.py. This module covers the table-function rung).

q_udtf_chunks splits each document into fixed-size word-window chunks — the
standard LLM-pipeline chunking step for training/RAG — via a Python UDTF
invoked through a LATERAL join, yielding a variable number of rows per
input document.

Scale notes: a Python UDTF is row-at-a-time — the SLOWEST user-code path
(one Python call per input row, pickled transfer, no Arrow batching). It
exists for API completeness and for logic with genuinely per-row variable
output + state; this particular chunking is also expressible relationally
(split + posexplode + group by i div K) — that plan IS the oracle and runs
entirely JVM-side, which is what production should use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.registry import declare

UDTF_DOC_BOUND = 100
CHUNK_WORDS = 10


@udtf(returnType="chunk_idx: int, chunk: string, n_words: int")
class ChunkWords:
    """Yield (0-based chunk index, space-joined chunk, word count) per
    CHUNK_WORDS-word window; the final chunk may be short."""

    def eval(self, text: str):  # noqa: D401
        if text is None:
            return
        words = text.split()
        for i in range(0, len(words), CHUNK_WORDS):
            w = words[i : i + CHUNK_WORDS]
            yield i // CHUNK_WORDS, " ".join(w), len(w)


@declare(
    "q_udtf_chunks",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, CAST(i - 1 AS INT) AS wi, segs[i] AS word
        FROM (
            SELECT doc_id, string_split_regex(text, '\\s+') AS segs
            FROM documents WHERE doc_id < {UDTF_DOC_BOUND}
        ), unnest(generate_series(1, len(segs))) AS u(i)
        WHERE length(segs[i]) > 0
    )
    SELECT doc_id,
           CAST(wi // {CHUNK_WORDS} AS INT) AS chunk_idx,
           string_agg(word, ' ' ORDER BY wi) AS chunk,
           CAST(count(*) AS INT) AS n_words
    FROM words
    GROUP BY doc_id, wi // {CHUNK_WORDS}
    """,
    tier="P2",
)
def q_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed word-window document chunking via a LATERAL Python UDTF (see
    module docstring for why production would use the relational split)."""
    from mysql_to_clickhouse_sync_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < UDTF_DOC_BOUND
    )
    spark.udtf.register("chunk_words", ChunkWords)
    docs.select("doc_id", "text").createOrReplaceTempView("udtf_docs_in")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk, c.n_words
        FROM udtf_docs_in d, LATERAL chunk_words(d.text) c
        """
    )
