"""Stateful streaming operators.

The reference has no stateful processing at all; this provides the extension
points a CDC pipeline needs beyond windowed aggregation. Two tiers (the
guide §4.1 rule, applied in round 10):

- ASSOCIATIVE state (running counters/sums/min/max — s_stateful_profile,
  s_quality_stream, s_drift_stream, s_minhash_stream) runs as JVM-native
  streaming aggregations: the state store still carries batch-1 state into
  batch 2, but there is no Python worker round-trip.
- ORDER-DEPENDENT state (the Holt recurrence, funnel chain starts) keeps
  the custom applyInPandasWithState handler: state is a compact tuple per
  key, updates are Arrow-batched, and each handler documents the replay
  precondition its law needs.

Output after draining a bounded replay equals the batch groupBy — asserted
in tests and pinned by each query's full DuckDB oracle."""

from __future__ import annotations

import shutil
import tempfile
from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from mysql_to_clickhouse_sync_spark.catalog import EVENTS_US_CTE, load_table
from mysql_to_clickhouse_sync_spark.registry import declare
from mysql_to_clickhouse_sync_spark.streaming.tuning import tuned
from mysql_to_clickhouse_sync_spark.shipping import ensure_package_shipped

if TYPE_CHECKING:
    import pandas as pd

_STATEFUL_PROFILE_ORACLE = f"""
    {EVENTS_US_CTE}
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT))
               AS BIGINT) AS sum_value_cents,
           max(ts) AS last_ts
    FROM events_us
    WHERE ts IS NOT NULL
    GROUP BY user_id
"""


@declare("s_stateful_profile", oracle=_STATEFUL_PROFILE_ORACLE, tier="P3")
@tuned
def s_stateful_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running profile maintained by a JVM streaming
    aggregation across two deterministic micro-batches; returns each
    user's FINAL profile (the last update emitted per user).

    FULL ORACLE (the sixth streaming query to carry one — the roster's
    rows-only set is now empty): integer-cent accumulation makes the
    state replay-order independent, and the per-row cents rounding is
    TIE-FREE on this data (values carry <= 2 decimals; measured
    max |value*100 - round(value*100)| = 3.6e-12 at every SF), so
    pandas' half-even, Spark's HALF_UP and DuckDB's half-away all land
    on the same integer. The final state is then exactly the batch
    GROUP BY stated in the oracle; the state store carries batch-1
    profiles into batch 2."""
    # NULL-ts contract pin, as in every sibling stream.
    events = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "value")
        .filter(F.col("ts").isNotNull())
    )
    early = events.filter(F.col("ts") < F.lit("2024-01-20 00:00:00"))
    late = events.filter(F.col("ts") >= F.lit("2024-01-20 00:00:00"))

    workdir = tempfile.mkdtemp(prefix="stateful_")
    in_dir = f"{workdir}/in"
    ckpt = f"{workdir}/ckpt"
    import os

    os.makedirs(in_dir, exist_ok=True)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    # count/sum/max are associative, so the profile runs as a JVM
    # streaming aggregation (guide §4.1; see module docstring). The
    # cents rounding is tie-free on this data (docstring above), so
    # Spark HALF_UP lands on the same integers the oracle's round does.
    out = stream.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("sum_value_cents"),
        F.max("ts").alias("last_ts"),
    )
    sink = f"profiles_{abs(hash(workdir)) % 10**9}"
    query = None
    try:
        early.coalesce(1).write.mode("append").parquet(in_dir)
        query = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        query.processAllAvailable()
        late.coalesce(1).write.mode("append").parquet(in_dir)
        query.processAllAvailable()
        # The memory sink accumulates one row per (user, update); keep the
        # final state per user = the row with the max n_events.
        from pyspark.sql.window import Window

        all_updates = spark.table(sink)
        w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
        final = (
            all_updates.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
            .localCheckpoint(eager=True)
        )
        return final
    finally:
        if query is not None:
            query.stop()
        shutil.rmtree(workdir, ignore_errors=True)


# --- Streaming near-dup admission (MinHash-LSH bucket state) ----------------

def _minhash_stream_oracle() -> str:
    from mysql_to_clickhouse_sync_spark.operators.dedup import (
        _minhash_cand_cte,
    )

    return f"""
    {_minhash_cand_cte()}
    , bmin AS (
        SELECT band_idx, bucket, min(doc_id) AS m
        FROM bands GROUP BY band_idx, bucket
    )
    SELECT b.doc_id,
           CAST(count(*) AS BIGINT) AS n_bands,
           CAST(sum(CASE WHEN b.doc_id = m.m THEN 1 ELSE 0 END) AS BIGINT)
               AS n_owned_bands,
           (count(*) = sum(CASE WHEN b.doc_id = m.m THEN 1 ELSE 0 END))
               AS admitted
    FROM bands b
    JOIN bmin m ON m.band_idx = b.band_idx AND m.bucket = b.bucket
    GROUP BY b.doc_id
    """


@declare("s_minhash_stream", oracle=_minhash_stream_oracle(), tier="P3")
@tuned
def s_minhash_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING near-dup admission — the online half of the MinHash-LSH
    dedup family: documents arrive in doc_id order, their LSH band
    buckets hit a per-bucket GroupState, and a document is ADMITTED iff
    every one of its bands lands in a bucket no earlier document has
    produced. This is the shape a continuous-crawl ingest pipeline
    needs (admit-or-drop each new document against everything already
    accepted) without re-scanning the corpus: state is one BIGINT per
    bucket, the stream shuffles once on (band_idx, bucket), and the
    decision is a batch-local per-doc AND over NUM_BANDS flags.

    FULL ORACLE: the bucket-state law is deliberately order-
    independent — "fresh iff no SMALLER doc_id ever produced the
    bucket" — so the converged result is exactly the batch per-bucket
    argmin stated relationally (bands joined to bucket minima), reusing
    the shared _minhash_cand_cte banding SQL. The signature/banding
    parity Spark-vs-DuckDB is already pinned by q_minhash_dedup; what
    this query adds to the contract is the STATE machinery: bucket
    ownership must survive the micro-batch boundary (a bucket seen in
    batch 1 must veto a batch-2 doc via the state store, not via
    batch-local data).

    The per-bucket state ("smallest doc_id ever seen") is an ASSOCIATIVE
    MIN, so since round 10 it runs as a JVM-native streaming aggregation
    in update mode instead of applyInPandasWithState: the state store
    still carries batch-1 minima into batch 2 (same veto machinery), but
    there is no Python worker round-trip and no per-group pandas frame —
    the guide §4.1 rule (replace a row/group-at-a-time Python UDF with a
    built-in aggregate). Update mode emits one row per bucket whose min
    CHANGED in the batch; the converged owner of a bucket is the min
    over its emitted rows, and the admission flags are re-derived by
    joining the banding table to the converged owners — bit-for-bit the
    oracle's relational form.

    Scale notes: state size = number of distinct buckets (bounded by
    corpus bands, ~NUM_BANDS per admitted doc), keyed exactly like the
    batch LSH shuffle; RocksDB state store holds it off-heap at real
    scale. Update mode also fixes the scale posture: per batch the sink
    receives only CHANGED buckets, never a state-sized re-emission. The
    degenerate-bucket guard story carries over: a hot bucket here costs
    one state row + per-arrival rejection, NOT a quadratic join —
    streaming admission is inherently guarded."""
    from mysql_to_clickhouse_sync_spark.operators.dedup import (
        minhash_band_table,
        minhash_signatures_table,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # Materialize the banding ONCE (parallel): the per-wave writes below
    # coalesce to one file each, and without the checkpoint each wave
    # re-ran the whole signature/banding computation INSIDE its single
    # coalesced task (round 10, guide §1.3/§2.1).
    bands = (
        minhash_band_table(minhash_signatures_table(docs))
        .select(
            "doc_id",
            F.col("band_idx").cast("long").alias("band_idx"),
            "bucket",
        )
        .localCheckpoint(eager=True)
    )
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    split = (int(lo) + int(hi)) // 2  # scalar bounds: the reference's
    # own MIN/MAX chunking pattern (S:163)
    early = bands.filter(F.col("doc_id") <= split)
    late = bands.filter(F.col("doc_id") > split)

    workdir = tempfile.mkdtemp(prefix="minhash_stream_")
    in_dir = f"{workdir}/in"
    ckpt = f"{workdir}/ckpt"
    import os

    os.makedirs(in_dir, exist_ok=True)
    stream = (
        spark.readStream.schema(bands.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    owners = stream.groupBy("band_idx", "bucket").agg(
        F.min("doc_id").alias("owner")
    )
    sink = f"minhash_admit_{abs(hash(workdir)) % 10**9}"
    query = None
    try:
        early.coalesce(1).write.mode("append").parquet(in_dir)
        query = (
            owners.writeStream.outputMode("update")
            .format("memory")
            .queryName(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        query.processAllAvailable()
        late.coalesce(1).write.mode("append").parquet(in_dir)
        query.processAllAvailable()
        converged = spark.table(sink).groupBy("band_idx", "bucket").agg(
            F.min("owner").alias("owner")
        )
        final = (
            bands.join(converged, ["band_idx", "bucket"])
            .groupBy("doc_id")
            .agg(
                F.count("*").cast("bigint").alias("n_bands"),
                F.sum(
                    F.when(F.col("doc_id") == F.col("owner"), 1).otherwise(0)
                )
                .cast("bigint")
                .alias("n_owned_bands"),
            )
            .withColumn(
                "admitted", F.col("n_bands") == F.col("n_owned_bands")
            )
            .localCheckpoint(eager=True)
        )
        return final
    finally:
        if query is not None:
            query.stop()
        shutil.rmtree(workdir, ignore_errors=True)


# --- Streaming learned quality gate (per-lang admission counters) -----------

def _quality_stream_oracle() -> str:
    from mysql_to_clickhouse_sync_spark.operators.mlscore import logistic_cte

    return f"""
    WITH {logistic_cte()}
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_seen,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(p_milli) AS BIGINT) AS sum_p_milli,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) * 1000 // count(*)
                AS BIGINT) AS kept_ratio_milli
    FROM scored
    GROUP BY lang
    """


@declare("s_quality_stream", oracle=_quality_stream_oracle(), tier="P3")
@tuned
def s_quality_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING learned quality gate — the online half of
    q_logistic_quality: documents arrive in two micro-batches, each is
    scored ON THE STREAM by the same stateless column chain (milli
    features + fixed-point exp2 sigmoid — `logistic_scored` runs
    unchanged on a streaming DataFrame, which is the point: the Q8
    kernel is plain codegen, so batch and streaming scoring cannot
    diverge), and a per-lang JVM streaming aggregation keeps running (seen,
    kept, sum_p) admission counters in the state store — the live acceptance-rate dashboard a curation
    ingest pipeline watches for drift.

    FULL ORACLE: the counters are exact integer sums, replay-order
    independent, so the converged state equals the batch GROUP BY over
    the shared `logistic_cte` relation. What the streaming form adds to
    the contract is the state boundary: batch-1 counts must survive
    into batch 2 via the streaming aggregation's state store.

    Scale notes: state is three BIGINTs per lang (a handful of keys);
    one lang-keyed shuffle per micro-batch; scoring stays map-side in
    whole-stage codegen before the shuffle."""
    from mysql_to_clickhouse_sync_spark.operators.mlscore import (
        logistic_scored,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", "lang", "text", "n_chars")
    )
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    split = (int(lo) + int(hi)) // 2  # the reference's MIN/MAX chunking
    early = docs.filter(F.col("doc_id") <= split)
    late = docs.filter(F.col("doc_id") > split)

    workdir = tempfile.mkdtemp(prefix="quality_stream_")
    in_dir = f"{workdir}/in"
    ckpt = f"{workdir}/ckpt"
    import os

    os.makedirs(in_dir, exist_ok=True)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    scored = logistic_scored(stream).select("lang", "p_milli", "keep")
    # The counters are exact integer SUMS — associative — so they run
    # as a JVM-native streaming aggregation (state store still carries
    # batch-1 counts into batch 2); round 10 removed the
    # applyInPandasWithState Python round-trip per guide §4.1.
    counters = scored.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_seen"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.sum("p_milli").cast("long").alias("sum_p_milli"),
    )
    sink = f"quality_gate_{abs(hash(workdir)) % 10**9}"
    query = None
    try:
        early.coalesce(1).write.mode("append").parquet(in_dir)
        query = (
            counters.writeStream.outputMode("update")
            .format("memory")
            .queryName(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        query.processAllAvailable()
        late.coalesce(1).write.mode("append").parquet(in_dir)
        query.processAllAvailable()
        from pyspark.sql.window import Window

        updates = spark.table(sink)
        w = Window.partitionBy("lang").orderBy(F.col("n_seen").desc())
        final = (
            updates.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
            .withColumn(
                "kept_ratio_milli", F.expr("n_kept * 1000 div n_seen")
            )
            .localCheckpoint(eager=True)
        )
        return final
    finally:
        if query is not None:
            query.stop()
        shutil.rmtree(workdir, ignore_errors=True)


# --- s_holt_stream -----------------------------------------------------------

HOLT_OUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType(), False),
        StructField("n_days", LongType(), False),
        StructField("level_milli", LongType(), False),
        StructField("trend_milli", LongType(), False),
        StructField("forecast_milli", LongType(), False),
        StructField("sse", LongType(), False),
    ]
)

HOLT_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), False),
        StructField("l", LongType(), False),
        StructField("b", LongType(), False),
        StructField("sse", LongType(), False),
    ]
)


def update_holt_state(
    key: tuple[Any, ...],
    pdfs: "Iterator[pd.DataFrame]",
    state: GroupState,
) -> "Iterator[pd.DataFrame]":
    """Fold this micro-batch's (day-sorted) daily counts into the Holt
    (n, l, b, sse) state. Python's // floors — the same arithmetic as
    q_holt_linear's positivity-offset `div` (operators/timeseries.py),
    so the converged state equals the batch fold EXACTLY."""
    import pandas as pd

    (etype,) = key
    n, l, b, sse = state.get if state.exists else (0, 0, 0, 0)
    rows = pd.concat(list(pdfs)).sort_values("day_n")
    for y in rows["y"].astype("int64"):
        y = int(y)
        if n == 0:
            n, l, b, sse = 1, y * 1000, 0, 0
        else:
            err = y * 1000 - l - b
            sse += err * err
            l_new = (y * 1000 + l + b) // 2
            b = (b + l_new - l) // 2
            l = l_new
            n += 1
    state.update((n, l, b, sse))
    yield pd.DataFrame(
        {
            "event_type": [etype],
            "n_days": [n],
            "level_milli": [l],
            "trend_milli": [b],
            "forecast_milli": [l + b],
            "sse": [sse],
        }
    )


def _holt_stream_oracle() -> str:
    from mysql_to_clickhouse_sync_spark.operators.timeseries import (
        _holt_oracle,
    )

    return _holt_oracle()


@declare("s_holt_stream", oracle=_holt_stream_oracle(), tier="P3")
@tuned
def s_holt_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING Holt smoothing — the online half of q_holt_linear: the
    per-day event-count rollup arrives in two day-ordered micro-batches
    (early days, then late days — the calendar order a live pipeline
    sees) and per-event_type GroupState carries the (n, l, b, sse)
    recurrence across the batch boundary. The live forecast dashboard:
    after every micro-batch each key emits its refreshed level / trend /
    one-step forecast.

    FULL ORACLE: unlike the counter streams, this state is
    ORDER-DEPENDENT — the oracle (q_holt_linear's recursive CTE) only
    equals the converged state because the micro-batches partition the
    series by day and arrive in order, which is exactly the
    event-time-ordered replay contract a checkpointed daily rollup
    gives. The handler's Python // floors match the batch fold's
    positivity-offset div by construction (both are floor division).

    Scale notes: state is four BIGINTs per event_type; each micro-batch
    shuffles only the daily rollup rows (|keys| x |new days|), with the
    heavy count pre-aggregation upstream. Arrow-batched handler, one
    group per key per batch."""
    ev = load_table(spark, sf_dir, "events")
    ser = (
        ev.groupBy(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("day_n"),
        )
        .agg(F.count("*").cast("long").alias("y"))
        .select("event_type", "day_n", "y")
    )
    lo, hi = ser.agg(F.min("day_n"), F.max("day_n")).first()
    split = (int(lo) + int(hi)) // 2
    early = ser.filter(F.col("day_n") <= split)
    late = ser.filter(F.col("day_n") > split)

    workdir = tempfile.mkdtemp(prefix="holt_stream_")
    in_dir = f"{workdir}/in"
    ckpt = f"{workdir}/ckpt"
    import os

    os.makedirs(in_dir, exist_ok=True)
    stream = (
        spark.readStream.schema(ser.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    ensure_package_shipped(spark)
    states = stream.groupBy("event_type").applyInPandasWithState(
        update_holt_state,
        outputStructType=HOLT_OUT_SCHEMA,
        stateStructType=HOLT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    sink = f"holt_stream_{abs(hash(workdir)) % 10**9}"
    query = None
    try:
        early.coalesce(1).write.mode("append").parquet(in_dir)
        query = (
            states.writeStream.outputMode("update")
            .format("memory")
            .queryName(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        query.processAllAvailable()
        late.coalesce(1).write.mode("append").parquet(in_dir)
        query.processAllAvailable()
        from pyspark.sql.window import Window

        updates = spark.table(sink)
        w = Window.partitionBy("event_type").orderBy(F.col("n_days").desc())
        return (
            updates.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
            .localCheckpoint(eager=True)
        )
    finally:
        if query is not None:
            query.stop()
        shutil.rmtree(workdir, ignore_errors=True)


# --- s_drift_stream ----------------------------------------------------------

def _drift_stream_oracle() -> str:
    from mysql_to_clickhouse_sync_spark.operators.mlscore import logistic_cte

    return f"""
    WITH {logistic_cte()},
    sl AS (
        SELECT least(p_milli // 100, 9) AS bin,
               CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS in_base
        FROM scored
    ), g AS (
        SELECT bin, CAST(sum(in_base) AS BIGINT) AS n_base,
               CAST(sum(1 - in_base) AS BIGINT) AS n_cur
        FROM sl GROUP BY bin
    ), tot AS (
        SELECT CAST(sum(n_base) AS BIGINT) AS ta,
               CAST(sum(n_cur) AS BIGINT) AS tb
        FROM g
    )
    SELECT bin, n_base, n_cur,
           CAST(n_base * 1000000 // ta - n_cur * 1000000 // tb AS BIGINT)
               AS diff_micro
    FROM g CROSS JOIN tot
    """


@declare("s_drift_stream", oracle=_drift_stream_oracle(), tier="P3")
@tuned
def s_drift_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING score-drift monitor — q_psi_drift's ingestion half
    taken online: the baseline (even doc_id) half arrives in
    micro-batch 1, the "current" (odd) half in micro-batch 2, each row
    scored on the stream by the stateless logistic chain and bucketed
    into score deciles; a per-bin JVM streaming aggregation keeps
    (n_base, n_cur) counters in the state store across the batch
    boundary. The finalizer computes each
    bin's share gap against the converged totals — the per-bin table a
    PSI/KS alarm reads every trigger.

    FULL ORACLE: counts are exact integer sums (replay-order
    independent), so converged state equals the batch GROUP BY over the
    shared logistic relation; the contract pin is the per-bin state
    surviving the batch boundary.

    Scale notes: state is two BIGINTs per bin (<= 10 keys); scoring and
    bucketing stay map-side codegen before the tiny bin shuffle."""
    from mysql_to_clickhouse_sync_spark.operators.mlscore import (
        logistic_scored,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", "lang", "text", "n_chars")
    )
    base = docs.filter(F.col("doc_id") % 2 == 0)
    cur = docs.filter(F.col("doc_id") % 2 == 1)

    workdir = tempfile.mkdtemp(prefix="drift_stream_")
    in_dir = f"{workdir}/in"
    ckpt = f"{workdir}/ckpt"
    import os

    os.makedirs(in_dir, exist_ok=True)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    binned = logistic_scored(stream).select(
        F.expr("least(p_milli div 100, 9)").alias("bin"),
        F.expr("CAST(doc_id % 2 = 0 AS BOOLEAN)").alias("is_base"),
    )
    # Exact integer SUMS per bin — associative — so the state runs as a
    # JVM-native streaming aggregation (state store still carries
    # batch-1 counts into batch 2); round 10 removed the
    # applyInPandasWithState Python round-trip per guide §4.1.
    # diff_micro is filled by the finalizer against the converged
    # totals, exactly as the pandas handler left it.
    counters = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("is_base"), 1).otherwise(0))
        .cast("long")
        .alias("n_base"),
        F.sum(F.when(F.col("is_base"), 0).otherwise(1))
        .cast("long")
        .alias("n_cur"),
    ).withColumn("diff_micro", F.lit(0).cast("long"))
    sink = f"drift_stream_{abs(hash(workdir)) % 10**9}"
    query = None
    try:
        base.coalesce(1).write.mode("append").parquet(in_dir)
        query = (
            counters.writeStream.outputMode("update")
            .format("memory")
            .queryName(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        query.processAllAvailable()
        cur.coalesce(1).write.mode("append").parquet(in_dir)
        query.processAllAvailable()
        from pyspark.sql.window import Window

        updates = spark.table(sink)
        w = Window.partitionBy("bin").orderBy(
            (F.col("n_base") + F.col("n_cur")).desc()
        )
        final = (
            updates.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn", "diff_micro")
        )
        tot = final.agg(
            F.sum("n_base").cast("long").alias("ta"),
            F.sum("n_cur").cast("long").alias("tb"),
        )
        return (
            final.crossJoin(F.broadcast(tot))
            .select(
                "bin",
                "n_base",
                "n_cur",
                F.expr(
                    "n_base * 1000000 div ta - n_cur * 1000000 div tb"
                ).alias("diff_micro"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        if query is not None:
            query.stop()
        shutil.rmtree(workdir, ignore_errors=True)


# --- s_funnel_stream ---------------------------------------------------------

FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("p1", LongType(), True),  # best (latest) level-1 start
        StructField("p2", LongType(), True),  # best level-2 chain start
        StructField("last_t", LongType(), True),  # order-precondition pin
        StructField("n1", LongType(), False),
        StructField("n2", LongType(), False),
        StructField("n3", LongType(), False),
        StructField("n_seen", LongType(), False),  # cumulative arrivals:
        # the monotone column the final-state extraction orders by
    ]
)

FUNNEL_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("funnel_level", LongType(), False),
        StructField("n_step1", LongType(), False),
        StructField("n_step2_chained", LongType(), False),
        StructField("n_step3_chained", LongType(), False),
        StructField("n_seen", LongType(), False),
    ]
)

_FUNNEL_NEG = -(1 << 62)  # "no chain yet" sentinel inside the numpy DP


def update_funnel(
    key: tuple[Any, ...],
    batches: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    """Per-user streaming realization of the q_funnel optimal-chain DP:
    GroupState carries the best level-1/level-2 chain starts (the
    running maxima the batch form computes with window passes) plus the
    step counters; each micro-batch replays its arrivals in (t,
    event_id) order through the same transition law, vectorized —
    running maxima via np.maximum.accumulate, no per-event Python loop.

    PRECONDITION (asserted — raise, never a strippable assert):
    arrivals are event-time-ordered ACROSS micro-batches — the feed
    replays disjoint increasing time slices. Within a batch, rows are
    sorted here."""
    import numpy as np
    import pandas as pd

    from mysql_to_clickhouse_sync_spark.operators.clickhouse import (
        FUNNEL_STEPS,
        FUNNEL_WINDOW_US,
    )

    if state.exists:
        p1, p2, last_t, n1, n2, n3, n_seen = state.get
    else:
        p1 = p2 = last_t = None
        n1 = n2 = n3 = n_seen = 0
    rows = pd.concat(list(batches), ignore_index=True)
    rows = rows.sort_values(["t", "event_id"])
    t = rows["t"].to_numpy(dtype=np.int64)
    if len(t) and last_t is not None and t[0] <= last_t:
        # data-dependent runtime precondition: raise explicitly (a bare
        # assert is stripped under python -O and would silently produce
        # wrong funnel levels)
        raise ValueError(
            f"funnel stream fed out of event-time order: batch min {t[0]}"
            f" <= already-processed max {last_t}"
        )
    typ = rows["event_type"].to_numpy()
    s1, s2_, s3_ = FUNNEL_STEPS
    w = FUNNEL_WINDOW_US
    neg = _FUNNEL_NEG

    # p1 BEFORE each row: running max of prior signup times (seeded by
    # the carried state) — np.maximum.accumulate of the shifted series.
    sig = np.where(typ == s1, t, neg)
    seed1 = neg if p1 is None else p1
    p1_prev = np.maximum.accumulate(
        np.concatenate(([seed1], sig))
    )[:-1]
    s2v = np.where(
        (typ == s2_) & (p1_prev > neg) & (t - p1_prev <= w), p1_prev, neg
    )
    seed2 = neg if p2 is None else p2
    p2_prev = np.maximum.accumulate(
        np.concatenate(([seed2], s2v))
    )[:-1]
    s3v = (typ == s3_) & (p2_prev > neg) & (t - p2_prev <= w)

    n1 += int((typ == s1).sum())
    n2 += int((s2v > neg).sum())
    n3 += int(s3v.sum())
    new_p1 = int(max(seed1, sig.max())) if len(t) else int(seed1)
    new_p2 = int(max(seed2, s2v.max())) if len(t) else int(seed2)
    new_last = int(t.max()) if len(t) else last_t
    n_seen += int(len(t))
    state.update(
        (
            None if new_p1 == neg else new_p1,
            None if new_p2 == neg else new_p2,
            new_last,
            n1,
            n2,
            n3,
            n_seen,
        )
    )
    level = 3 if n3 > 0 else 2 if n2 > 0 else 1 if n1 > 0 else 0
    yield pd.DataFrame(
        {
            "user_id": [int(key[0])],
            "funnel_level": [level],
            "n_step1": [n1],
            "n_step2_chained": [n2],
            "n_step3_chained": [n3],
            "n_seen": [n_seen],
        }
    )


def _funnel_stream_oracle() -> str:
    from mysql_to_clickhouse_sync_spark.operators.clickhouse import (
        _funnel_cte,
        FUNNEL_STEPS,
    )

    return f"""
    {_funnel_cte()}
    SELECT user_id,
           CAST(CASE WHEN count(s3) > 0 THEN 3
                     WHEN count(s2) > 0 THEN 2
                     WHEN count(CASE WHEN event_type = '{FUNNEL_STEPS[0]}'
                                     THEN 1 END) > 0 THEN 1
                     ELSE 0 END AS BIGINT) AS funnel_level,
           CAST(count(CASE WHEN event_type = '{FUNNEL_STEPS[0]}' THEN 1 END)
                AS BIGINT) AS n_step1,
           CAST(count(s2) AS BIGINT) AS n_step2_chained,
           CAST(count(s3) AS BIGINT) AS n_step3_chained
    FROM w3 GROUP BY user_id
    """


@declare("s_funnel_stream", oracle=_funnel_stream_oracle(), tier="P3")
@tuned
def s_funnel_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING windowFunnel — live conversion tracking: funnel-step
    events replay as three event-time slices; per-user GroupState
    carries the optimal-chain DP state (best level-1/level-2 chain
    starts + counters); the converged per-user levels must equal the
    batch q_funnel exactly (same oracle). Chains that SPAN micro-batch
    boundaries are the point: a signup in slice 1 must open the window
    for a click arriving in slice 2 via state, not batch-local data.

    Scale notes: state is six BIGINTs per user, the stream shuffles
    once on user_id, and the per-batch DP is vectorized numpy over each
    user's arrivals — O(events) total, the streaming mirror of the
    batch form's K-1 window sweeps."""
    from mysql_to_clickhouse_sync_spark.operators.clickhouse import (
        FUNNEL_STEPS,
    )

    events = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isin(*FUNNEL_STEPS)
    )
    e = events.select(
        "user_id",
        "event_id",
        F.expr("unix_micros(ts)").alias("t"),
        "event_type",
    )
    cuts = ("2024-01-11 00:00:00", "2024-01-21 00:00:00")
    bounds = [F.expr(f"unix_micros(TIMESTAMP '{c}')") for c in cuts]
    slices = [
        e.filter(F.col("t") < bounds[0]),
        e.filter((F.col("t") >= bounds[0]) & (F.col("t") < bounds[1])),
        e.filter(F.col("t") >= bounds[1]),
    ]

    workdir = tempfile.mkdtemp(prefix="funnel_stream_")
    in_dir = f"{workdir}/in"
    ckpt = f"{workdir}/ckpt"
    import os

    os.makedirs(in_dir, exist_ok=True)
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    ensure_package_shipped(spark)
    levels = stream.groupBy("user_id").applyInPandasWithState(
        update_funnel,
        outputStructType=FUNNEL_OUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    sink = f"funnel_stream_{abs(hash(workdir)) % 10**9}"
    query = None
    try:
        query = None
        for part in slices:
            part.coalesce(1).write.mode("append").parquet(in_dir)
            if query is None:
                query = (
                    levels.writeStream.outputMode("update")
                    .format("memory")
                    .queryName(sink)
                    .option("checkpointLocation", ckpt)
                    .start()
                )
            query.processAllAvailable()
        from pyspark.sql.window import Window

        updates = spark.table(sink)
        w = Window.partitionBy("user_id").orderBy(F.col("n_seen").desc())
        final = (
            updates.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "user_id",
                "funnel_level",
                "n_step1",
                "n_step2_chained",
                "n_step3_chained",
            )
            .localCheckpoint(eager=True)
        )
        return final
    finally:
        if query is not None:
            query.stop()
        shutil.rmtree(workdir, ignore_errors=True)
