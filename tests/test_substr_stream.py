"""Behavioral pins for s_substring_stream: the cross-micro-batch
duplicate (a batch-1 shingle marked only when batch 2 lands its second
occurrence), span growth across batches, and redelivery convergence of
the three-watermark sink."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.streaming.substr import SubstrDedupSink

# 8 tokens = SPAN_TOKENS: one exact shared shingle between doc 1 and 3
SHARED = "a b c d e f g h"
DOC1 = f"x1 x2 {SHARED} y1 y2"  # batch 1
DOC2 = "unrelated tokens only p q r s t u v w"  # batch 1
DOC3 = f"z1 {SHARED} z2 z3"  # batch 2 — duplicates doc 1's shingle


def _batches(spark):
    b1 = spark.createDataFrame(
        [(1, DOC1), (2, DOC2)], "doc_id long, text string"
    )
    b2 = spark.createDataFrame([(3, DOC3)], "doc_id long, text string")
    return b1, b2


def _spans(sink):
    return {
        (r["doc_id"], r["span_start"], r["span_tokens"])
        for r in sink.readout().collect()
    }


def test_cross_batch_duplicate_marks_earlier_doc(spark, tmp_path):
    b1, b2 = _batches(spark)
    sink = SubstrDedupSink(spark, str(tmp_path))
    sink.apply(b1, 0)
    # nothing duplicated yet: doc 1's shingle has count 1
    assert _spans(sink) == set()
    sink.apply(b2, 1)
    got = _spans(sink)
    # doc 1 (from BATCH 1) gained its span only when batch 2 landed the
    # second occurrence — the cross-micro-batch case. DOC1 tokens:
    # x1 x2 a..h y1 y2 -> the duplicated 8-token shingle starts at pos 2;
    # DOC3: z1 a..h z2 z3 -> pos 1.
    assert (1, 2, 8) in got, got
    assert (3, 1, 8) in got, got
    assert {d for d, *_ in got} == {1, 3}


def test_redelivery_converges(spark, tmp_path):
    """At-least-once foreachBatch: redelivering both batches (same ids)
    must not change the spans, the derived counts, or the store."""
    b1, b2 = _batches(spark)
    sink = SubstrDedupSink(spark, str(tmp_path))
    sink.apply(b1, 0)
    sink.apply(b1, 0)  # immediate redelivery
    sink.apply(b2, 1)
    want = _spans(sink)
    counts_before = {
        r["h"]: r["cnt"] for r in sink.counts_view().collect()
    }
    sink.apply(b2, 1)  # redelivery AFTER both commits + flip landed
    sink.apply(b1, 0)  # stale redelivery of an older batch
    assert _spans(sink) == want
    assert {
        r["h"]: r["cnt"] for r in sink.counts_view().collect()
    } == counts_before
    assert sink.store.read().count() == sum(
        max(0, len(d.split()) - 7) for d in (DOC1, DOC2, DOC3)
    )


def test_torn_member_commit_is_unobservable(spark, tmp_path):
    """Round 10: a crash BETWEEN the store commit and the group flip
    must leave readers on the PREVIOUS consistent vector — no torn
    state is observable, not merely survivable. Redelivery then
    publishes the batch exactly once."""
    b1, b2 = _batches(spark)
    sink = SubstrDedupSink(spark, str(tmp_path))
    sink.apply(b1, 0)
    pre_spans = _spans(sink)
    pre_counts = {
        r["h"]: r["cnt"] for r in sink.counts_view().collect()
    }
    pre_store = sink.group.read("store").count()

    # simulated crash: the store member commits batch 1, nothing else
    from mysql_to_clickhouse_sync_spark.operators.dedup import (
        shingle_positions,
    )

    sink.store.merge(
        shingle_positions(b2)
        .withColumn("b", F.lit(1).cast("long"))
        .withColumn("op", F.lit("upsert")),
        batch_id=1,
    )
    # group-resolved reads still serve the PRE-batch vector consistently
    assert _spans(sink) == pre_spans
    assert {
        r["h"]: r["cnt"] for r in sink.counts_view().collect()
    } == pre_counts
    assert sink.group.read("store").count() == pre_store
    assert sink.group.last_batch() == 0

    # redelivery heals: store merge skips (member watermark), spans fold,
    # one flip publishes the converged batch
    sink.apply(b2, 1)
    got = _spans(sink)
    assert (1, 2, 8) in got and (3, 1, 8) in got
    assert sink.group.last_batch() == 1
    ref = SubstrDedupSink(spark, str(tmp_path / "ref"))
    ref.apply(b1, 0)
    ref.apply(b2, 1)
    assert got == _spans(ref)
