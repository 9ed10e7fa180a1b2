"""Streaming substring-span dedup — q_substring_dedup taken online.

The batch query (operators/dedup.py, the ExactSubstr recipe) marks every
stride-1 SPAN_TOKENS-token shingle occurring >= 2 times corpus-wide and
merges consecutive marks per document into maximal spans. Online, the
shingle count is an associative BIGINT sum — which is exactly what makes
a FULL oracle possible (the s_kmeans_stream argument): however documents
are sliced into micro-batches, the converged per-shingle counts equal
the batch counts, so the converged spans equal the batch spans.

The hard case is the CROSS-micro-batch duplicate: a shingle seen once in
batch 1 and again in batch 2 becomes duplicated only at batch 2, and the
BATCH-1 document's spans must be (re)derived then. The sink therefore
maintains three keyed LakeTables, each committed exactly-once under its
own batch-id watermark (the s_mv_stream discipline, three watermarks):

  * store  (doc_id, pos) -> shingle      — positions are written once
  * counts (h) -> cnt                    — running shingle totals
  * spans  (doc_id) -> array<struct>     — the doc's CURRENT maximal
    spans as ONE row (replace-per-key upsert, so spans that merge into a
    longer island need no delete choreography)

Per batch: commit the batch's shingles; fold batch counts into the
totals; derive which shingles JUST crossed 2 — idempotently, as
cnt_before = committed_cnt_after - batch_cnt, so a redelivery that finds
the counts already committed reconstructs the same crossing set instead
of seeing an empty one (the torn-commit trap between the three
watermarks); recompute spans ONLY for affected documents (docs holding a
just-crossed shingle anywhere in the store, plus batch docs holding any
already-duplicated shingle) and upsert them.

Scale notes (100 TB/day): per batch the work is O(batch tokens) map-side
shingling + keyed lookups/upserts restricted to the batch's shingle
hashes and the affected documents — never a corpus rescan. Locally the
keyed lookups are joins against the state tables; at scale `counts` is a
key-hash-bucketed LakeTable (point-probe by h) and the store carries an
h-keyed inverted index (the mark-back lookup), the standard trade for
online ExactSubstr. Span recompute is a per-doc window over only the
affected docs' marked positions.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.operators.dedup import (
    SUBSTR_ORACLE,
    shingle_positions,
    spans_from_marked,
)
from mysql_to_clickhouse_sync_spark.registry import declare
from mysql_to_clickhouse_sync_spark.sinks.merge import LakeTable
from mysql_to_clickhouse_sync_spark.streaming.tuning import tuned

N_SUBSTR_BATCHES = 2


class SubstrDedupSink:
    """foreachBatch sink maintaining (shingle store, shingle counts,
    span view) as three exactly-once LakeTable commits per micro-batch.
    Torn commits between the three watermarks converge on redelivery:
    every derived quantity is reconstructed from COMMITTED state plus
    the (redelivered, identical) batch — never from 'what this attempt
    already did'."""

    def __init__(self, spark: SparkSession, workdir: str) -> None:
        self.spark = spark
        self.store = LakeTable(
            spark,
            f"{workdir}/store",
            keys=["doc_id", "pos"],
            version_cols=["b"],
            retention=0,
        )
        self.counts = LakeTable(
            spark,
            f"{workdir}/counts",
            keys=["h"],
            version_cols=["b"],
            retention=0,
        )
        self.spans = LakeTable(
            spark,
            f"{workdir}/spans",
            keys=["doc_id"],
            version_cols=["b"],
            retention=0,
        )

    def apply(self, batch_df: DataFrame, batch_id: int) -> None:
        b = F.lit(batch_id).cast("long")
        # NOT checkpointed: shingling a micro-batch is a cheap map-only
        # pass; the batch query's lesson (materialize the shared explode
        # subtree) applies to a CORPUS-wide scan, not a micro-batch —
        # here the checkpoint write costs more than three recomputes
        sh_b = shingle_positions(batch_df)
        # 1. store the batch's positions (each position arrives exactly
        #    once — its document lives in exactly one batch)
        self.store.merge(
            sh_b.withColumn("b", b).withColumn("op", F.lit("upsert")),
            batch_id=batch_id,
        )
        # 2. fold batch counts into the running totals (read-add-upsert;
        #    the watermark makes the fold idempotent under redelivery)
        cnt_b = sh_b.groupBy("h").agg(F.count("*").alias("c"))
        cur = self.counts.current_version()
        if cur is None:
            merged = cnt_b.select("h", F.col("c").alias("cnt"))
        else:
            old = self.counts.read().select(
                "h", F.col("cnt").alias("old_cnt")
            )
            merged = cnt_b.join(old, "h", "left").select(
                "h",
                (F.col("c") + F.coalesce(F.col("old_cnt"), F.lit(0)))
                .cast("long")
                .alias("cnt"),
            )
        self.counts.merge(
            merged.withColumn("b", b).withColumn("op", F.lit("upsert")),
            batch_id=batch_id,
        )
        # 3. idempotent crossing set: cnt_before = committed_after -
        #    batch contribution (redelivery-safe even if step 2 had
        #    already committed on a previous attempt)
        after = self.counts.read().join(
            cnt_b.select("h").distinct(), "h"
        )
        state = after.join(cnt_b, "h").select(
            "h",
            F.col("cnt").alias("cnt_after"),
            (F.col("cnt") - F.col("c")).alias("cnt_before"),
        )
        crossed = state.filter(
            (F.col("cnt_before") < 2) & (F.col("cnt_after") >= 2)
        ).select("h")
        dup_now = state.filter(F.col("cnt_after") >= 2).select("h")
        # 4. affected docs: any doc holding a just-crossed shingle
        #    (including docs from EARLIER batches — the cross-batch
        #    case), plus batch docs holding an already-duplicated one
        stored = self.store.read().select("doc_id", "pos", "h")
        affected = (
            stored.join(crossed, "h")
            .select("doc_id")
            .union(sh_b.join(dup_now, "h").select("doc_id"))
            .distinct()
        )
        # 5. recompute spans for affected docs only, upsert one row per
        #    doc (replace semantics: merged islands need no deletes)
        dup_all = (
            self.counts.read()
            .filter(F.col("cnt") >= 2)
            .select("h")
        )
        marked = (
            stored.join(affected, "doc_id").join(dup_all, "h")
        )
        doc_spans = (
            spans_from_marked(marked)
            .groupBy("doc_id")
            .agg(
                F.sort_array(
                    F.collect_list(
                        F.struct("span_start", "span_tokens", "n_shingles")
                    )
                ).alias("spans")
            )
        )
        self.spans.merge(
            doc_spans.withColumn("b", b).withColumn("op", F.lit("upsert")),
            batch_id=batch_id,
        )

    def readout(self) -> DataFrame:
        if self.spans.current_version() is None:
            return self.spark.createDataFrame(
                [],
                "doc_id long, span_start long, span_tokens long,"
                " n_shingles long",
            )
        return self.spans.read().select(
            "doc_id", F.explode("spans").alias("s")
        ).select(
            "doc_id",
            F.col("s.span_start").alias("span_start"),
            F.col("s.span_tokens").alias("span_tokens"),
            F.col("s.n_shingles").alias("n_shingles"),
        )


def substr_stream_batches(
    spark: SparkSession, sf_dir: str
) -> list[DataFrame]:
    """Documents in N_SUBSTR_BATCHES deterministic micro-batches (split
    by doc_id so cross-batch duplicate shingles genuinely occur)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return [
        docs.filter(F.pmod(F.col("doc_id"), N_SUBSTR_BATCHES) == i)
        for i in range(N_SUBSTR_BATCHES)
    ]


@declare("s_substring_stream", oracle=SUBSTR_ORACLE, tier="P3")
@tuned
def s_substring_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE ExactSubstr span dedup: documents arrive in micro-batches;
    each batch lands its shingles, folds the associative per-shingle
    counts, and re-derives maximal spans for exactly the documents whose
    mark set changed — including documents from EARLIER batches whose
    shingle just crossed the duplicate threshold. The readout is the
    committed span view; the oracle is the batch q_substring_dedup SQL —
    convergence to the batch answer is the hash check, independent of
    the slicing (shingle counting is associative, so it cannot be
    otherwise).

    Cites the reference's continuous-replication north star
    (mysql_to_clickhouse_sync.py main loop): the curation pass runs
    WHILE data lands, rather than as a nightly full rescan."""
    batches = substr_stream_batches(spark, sf_dir)
    schema = batches[0].schema
    workdir = tempfile.mkdtemp(prefix="substr_stream_")
    in_dir = f"{workdir}/in"
    ckpt = f"{workdir}/ckpt"
    os.makedirs(in_dir, exist_ok=True)
    sink = SubstrDedupSink(spark, workdir)
    query = None
    try:
        query = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
            .writeStream.foreachBatch(sink.apply)
            .option("checkpointLocation", ckpt)
            .start()
        )
        for b in batches:
            b.coalesce(1).write.mode("append").parquet(in_dir)
            query.processAllAvailable()
        return sink.readout().localCheckpoint(eager=True)
    finally:
        if query is not None:
            query.stop()
        shutil.rmtree(workdir, ignore_errors=True)
