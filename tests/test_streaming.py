"""Streaming declared-query tests: the streaming paths must agree with their
batch twins (the strongest check available where no SQL oracle exists)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.registry import queries
from mysql_to_clickhouse_sync_spark.streaming.cdc import latest_per_key
from tests.conftest import SF_DIR


def test_cdc_apply_equals_batch_semantics(spark):
    """Streaming CDC replay == batch 'latest per user minus trailing
    deletes' over the same data."""
    out = queries()["s_cdc_apply"](spark, SF_DIR)
    events = load_table(spark, SF_DIR, "events")
    expected = (
        latest_per_key(
            events.select("user_id", "event_id", "ts", "event_type", "value"),
            ["user_id"],
            [F.col("ts").desc(), F.col("event_id").desc()],
        )
        # Only POST-split 'error' events act as deletes (pre-split ones are
        # plain snapshot rows): a user disappears iff their overall-latest
        # event is a changelog delete.
        .filter(
            ~(
                (F.col("event_type") == "error")
                & (F.col("ts") >= F.lit("2024-01-20 00:00:00"))
            )
        )
    )
    got = {tuple(r) for r in out.collect()}
    want = {tuple(r) for r in expected.collect()}
    assert got == want


def test_tumbling_stream_equals_batch(spark):
    stream_out = queries()["s_tumbling_stream"](spark, SF_DIR)
    batch = queries()["q_tumbling_count"](spark, SF_DIR)
    got = {tuple(map(str, r)) for r in stream_out.collect()}
    want = {tuple(map(str, r)) for r in batch.collect()}
    assert got == want


def test_stateful_profile_equals_batch_groupby(spark):
    out = queries()["s_stateful_profile"](spark, SF_DIR)
    events = load_table(spark, SF_DIR, "events")
    expected = events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(
            F.round(F.col("value") * 100).cast("bigint")
        ).alias("sum_value_cents"),
        F.max("ts").alias("last_ts"),
    )
    got = {tuple(map(str, r)) for r in out.collect()}
    want = {tuple(map(str, r)) for r in expected.collect()}
    assert got == want


def test_session_stream_sessions_are_closed_subset(spark):
    """Append-mode sessions must be a subset of the batch session set."""
    stream_sessions = queries()["s_session_stream"](spark, SF_DIR)
    batch_sessions = queries()["q_session_native"](spark, SF_DIR)
    got = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in stream_sessions.collect()
    }
    want = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in batch_sessions.collect()
    }
    assert got <= want
    assert len(got) > 0


def test_topk_stream_equals_batch_topk(spark):
    """s_topk_stream's materialized ranks must equal the batch top-k over
    the same events exactly — exact BIGINT counts + deterministic
    tie-break make micro-batch slicing invisible."""
    from pyspark.sql.window import Window

    out = queries()["s_topk_stream"](spark, SF_DIR)
    events = load_table(spark, SF_DIR, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("n_events").desc(), F.col("user_id")
    )
    expected = (
        events.groupBy("event_type", "user_id")
        .agg(F.count("*").alias("n_events"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
    )
    got = {tuple(map(str, r)) for r in out.collect()}
    want = {tuple(map(str, r)) for r in expected.collect()}
    assert got == want and len(got) > 0


def test_watermark_boundary_event_pins_lte_convention(spark, tmp_path):
    """ADVICE r3: the s_watermark_late / s_session_stream closed-form
    oracles emit windows with window_end <= floor_ms(max ts) - delay; the
    fixtures never land max ts exactly on a window_end + delay edge, so
    the <= (vs <) choice was unverified. Plant that event: max ts
    11:00:00.000 with a 1 h delay puts the watermark at exactly 10:00:00 —
    the [9:00,10:00) window's end. Spark's append-mode eviction DOES emit
    it (observed: StateStoreSave evicts window_end <= watermark), so <=
    is the verified convention, not an assumption."""
    import datetime
    import os

    t = datetime.datetime
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    schema = "event_id long, ts timestamp, event_type string, value double"
    b1 = spark.createDataFrame(
        [(1, t(2024, 1, 1, 9, 10), "a", 1.0), (2, t(2024, 1, 1, 9, 50), "a", 1.0)],
        schema,
    )
    # the boundary event: exactly window_end (10:00) + delay (1 h)
    b2 = spark.createDataFrame([(3, t(2024, 1, 1, 11, 0, 0), "a", 1.0)], schema)
    agg = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("ws"), "event_type", "n")
    )
    b1.coalesce(1).write.mode("append").parquet(in_dir)
    query = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_boundary")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        b2.coalesce(1).write.mode("append").parquet(in_dir)
        query.processAllAvailable()
        rows = spark.table("wm_boundary").collect()
    finally:
        query.stop()
    # window_end == watermark -> EMITTED (the <= side); 11:00 stays open
    assert sorted((r.ws, r.event_type, r.n) for r in rows) == [
        (t(2024, 1, 1, 9, 0), "a", 2)
    ]


def test_minhash_stream_matches_batch_law_and_crosses_batches(spark):
    """s_minhash_stream's admission flags equal the batch per-bucket
    argmin law computed directly, AND at least one veto crosses the
    micro-batch boundary (a batch-2 doc rejected purely by GroupState
    from batch 1) — the property that distinguishes real state from
    batch-local dedup."""
    from pyspark.sql import functions as F

    from mysql_to_clickhouse_sync_spark.catalog import load_table
    from mysql_to_clickhouse_sync_spark.operators.dedup import (
        minhash_band_table,
        minhash_signatures_table,
    )
    from mysql_to_clickhouse_sync_spark.streaming.stateful import (
        s_minhash_stream,
    )
    from tests.conftest import SF_DIR

    got = {r.doc_id: r for r in s_minhash_stream(spark, SF_DIR).collect()}

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    bands = minhash_band_table(minhash_signatures_table(docs))
    bmin = bands.groupBy("band_idx", "bucket").agg(
        F.min("doc_id").alias("m")
    )
    law = (
        bands.join(bmin, ["band_idx", "bucket"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bands"),
            F.sum(F.when(F.col("doc_id") == F.col("m"), 1).otherwise(0)).alias(
                "owned"
            ),
        )
        .collect()
    )
    assert len(law) == len(got)
    rejected_late = 0
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    split = (int(lo) + int(hi)) // 2
    for r in law:
        g = got[r.doc_id]
        assert (g.n_bands, g.n_owned_bands) == (r.n_bands, r.owned), r.doc_id
        assert g.admitted == (r.n_bands == r.owned)
        if r.doc_id > split and not (r.n_bands == r.owned):
            rejected_late += 1
    # the corpus carries verbatim dup pairs spanning the split, so the
    # cross-batch veto must actually fire
    assert rejected_late > 0
