"""Semantic tests the oracle diff can't express: IVF recall against the
brute-force ground truth, and real watermark eviction in the stream-stream
join (the declared query uses an eviction-free delay; here we shrink it and
assert state is actually dropped)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.operators.ivf import (
    IVF_QUERIES,
    IVF_TOPK,
    q_ann_ivf,
)
from mysql_to_clickhouse_sync_spark.operators.similarity import dot, with_norm
from tests.conftest import SF_DIR


def test_ivf_recall_vs_brute_force(spark):
    """Every IVF neighbor must carry the true cosine (scored exactly), and
    recall against the exact top-k must be positive — probing 4/16 lists
    cannot return garbage on clustered synthetic data."""
    ivf = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in q_ann_ivf(spark, SF_DIR).collect()
    }
    assert ivf, "IVF returned nothing"

    emb = with_norm(load_table(spark, SF_DIR, "embeddings")).select(
        "vec_id", "embedding", "norm"
    )
    q = emb.filter(F.col("vec_id") < IVF_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qemb"),
        F.col("norm").alias("qnorm"),
    )
    from pyspark.sql.window import Window

    pairs = (
        q.crossJoin(emb.withColumnRenamed("vec_id", "neighbor_id"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot(F.col("qemb"), F.col("embedding"))
                / (F.col("qnorm") * F.col("norm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    exact = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= IVF_TOPK)
        .collect()
    }
    # Exactness of returned scores: IVF's cosine for a pair == brute force's.
    for pair, cos in ivf.items():
        if pair in exact:
            assert cos == exact[pair]
    recall = len(ivf.keys() & exact.keys()) / len(exact)
    assert recall > 0.3, f"IVF recall {recall:.2f} implausibly low"


@pytest.mark.slow
def test_stream_stream_watermark_evicts_old_state(spark):
    """With a tiny watermark delay, a click from micro-batch 1 must NOT join
    a purchase replayed days later in micro-batch 2 — the state store has
    evicted it. (The declared s_stream_stream_join uses a 40-day delay where
    the same pair WOULD match; this pins the eviction behavior.)"""
    rows_b1 = [(1, "2024-01-01 00:00:00", 7, "click")]
    # Batch 2 must advance BOTH sides' watermarks: the global watermark is
    # min() across all watermark operators, so a click alone leaves the
    # purchases watermark at -inf and nothing evicts. The advance takes
    # effect from batch 3 on (Spark applies the updated watermark at the
    # NEXT micro-batch); batch 3 then replays a purchase 10 minutes after
    # the click (inside the 1h join window) whose partner state has been
    # evicted. Neither batch-2 row joins anything (different users).
    rows_b2 = [
        (2, "2024-01-05 00:00:00", 99, "click"),
        (4, "2024-01-05 00:00:00", 98, "purchase"),
    ]
    rows_b3 = [(3, "2024-01-01 00:10:00", 7, "purchase")]
    schema = "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING"

    def df(rows):
        return (
            spark.createDataFrame(rows, schema=schema)
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )

    workdir = tempfile.mkdtemp(prefix="evict_")
    in_dir = f"{workdir}/in"
    os.makedirs(in_dir, exist_ok=True)
    src = (
        spark.readStream.schema(df(rows_b1).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    clicks = (
        src.filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), "user_id",
                F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        src.filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user_id"),
                F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    sink = f"evict_{abs(hash(workdir)) % 10**9}"
    query = None
    try:
        df(rows_b1).coalesce(1).write.mode("append").parquet(in_dir)
        query = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(sink)
            .option("checkpointLocation", f"{workdir}/ckpt")
            .start()
        )
        query.processAllAvailable()
        df(rows_b2).coalesce(1).write.mode("append").parquet(in_dir)
        query.processAllAvailable()
        df(rows_b3).coalesce(1).write.mode("append").parquet(in_dir)
        query.processAllAvailable()
        assert spark.table(sink).count() == 0, (
            "late purchase joined an evicted click — watermark not enforced"
        )
    finally:
        if query is not None:
            query.stop()
        shutil.rmtree(workdir, ignore_errors=True)


def test_bulk_ranker_tiny_training_prefix(spark):
    """Fewer centroid-source rows than BULK_MIN_K (round-7 ADVICE): the
    super-centroid stride must run over the COLLECTED row count, not k —
    arange(0, k) indexed past the end of the centroid matrix and raised
    IndexError while the DuckDB oracle handled the same input fine."""
    from pyspark.sql import functions as F

    from mysql_to_clickhouse_sync_spark.operators.ivf import (
        _bulk_base,
        _make_ranker,
    )

    base = _bulk_base(spark, "/root/testdata/sf0.001")
    tiny = base.filter(F.col("vec_id") < 5)
    ranked = base.filter(F.col("vec_id") < 12).mapInPandas(
        _make_ranker(tiny), "vec_id long, centroid_id long, rn long"
    )
    rows = ranked.collect()
    assert {r.vec_id for r in rows} == set(range(12))
    assert all(r.centroid_id < 5 for r in rows)  # only the 5 trained
    assert all(r.rn >= 1 for r in rows)


def test_filtered_plans_are_result_identical(spark):
    """The two physical plans behind q_ann_filtered — label-partitioned
    (centroid_id, label) cogroup vs masked kernel — must return the
    SAME rows; the adaptive switch is a performance decision only."""
    from pyspark.sql import functions as F

    from mysql_to_clickhouse_sync_spark.catalog import load_table
    from mysql_to_clickhouse_sync_spark.operators.ivf import (
        _bulk_index,
        _bulk_score,
    )

    sf = "/root/testdata/sf0.001"
    base, ranked = _bulk_index(spark, sf)
    labels = load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("label").cast("long").alias("label")
    )
    part = sorted(
        map(
            tuple,
            _bulk_score(
                base, ranked, labels=labels, label_partition=True
            ).collect(),
        )
    )
    mask = sorted(
        map(
            tuple,
            _bulk_score(
                base, ranked, labels=labels, label_partition=False
            ).collect(),
        )
    )
    assert part == mask and len(part) > 0


def test_ann_stream_survives_midstream_restart(spark, tmp_path):
    """s_ann_stream's law must hold across a connector restart: stop the
    stream after the first arrival micro-batch, start a NEW query on the
    same checkpoint and table, feed the rest — the final committed index
    and retrieval must equal the batch incremental build (same frozen
    quantizer, same lists; slicing and restarts invisible)."""
    import os

    from pyspark.sql import functions as F

    from mysql_to_clickhouse_sync_spark.operators.ivf import (
        INC_TRAIN_MOD,
        _bulk_base,
        _bulk_score,
        _make_ranker,
        q_ann_incremental,
    )
    from mysql_to_clickhouse_sync_spark.sinks.merge import LakeTable
    from mysql_to_clickhouse_sync_spark.streaming.cdc import (
        OP_COL,
        UPSERT,
        live_rows,
    )

    sf = "/root/testdata/sf0.001"
    train_pred = F.col("vec_id") % INC_TRAIN_MOD != INC_TRAIN_MOD - 1
    base = _bulk_base(spark, sf)
    cbase = base.filter(train_pred)
    ranker = _make_ranker(cbase)
    schema = "vec_id long, centroid_id long, rn long"
    arrivals = base.filter(~train_pred)
    slices = [
        arrivals.filter(
            F.expr(f"(vec_id div {INC_TRAIN_MOD}) % 3") == i
        )
        for i in range(3)
    ]

    in_dir = str(tmp_path / "arrivals")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    table = LakeTable(
        spark,
        str(tmp_path / "ivf_index"),
        keys=["vec_id", "rn"],
        version_cols=["centroid_id"],
        retention=4,
    )
    table.merge(
        cbase.mapInPandas(ranker, schema).withColumn(OP_COL, F.lit(UPSERT))
    )

    def land(batch_df, batch_id):
        table.merge_with_retry(
            batch_df.mapInPandas(ranker, schema).withColumn(
                OP_COL, F.lit(UPSERT)
            ),
            batch_id=batch_id,
        )

    def start():
        return (
            spark.readStream.schema(arrivals.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
            .writeStream.foreachBatch(land)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    try:
        slices[0].coalesce(1).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
    finally:
        q.stop()  # the connector dies mid-stream
    assert table.current_version() == 1
    # restart: the checkpoint resumes; remaining slices land
    q = start()
    try:
        for s in slices[1:]:
            s.coalesce(1).write.mode("append").parquet(in_dir)
            q.processAllAvailable()
    finally:
        q.stop()
    assert table.current_version() == 3
    assert table.last_batch() == 2
    persisted = live_rows(table.raw()).select("vec_id", "centroid_id", "rn")
    streamed = sorted(
        map(tuple, _bulk_score(base, persisted).collect())
    )
    batch = sorted(map(tuple, q_ann_incremental(spark, sf).collect()))
    assert streamed == batch and len(streamed) > 0
