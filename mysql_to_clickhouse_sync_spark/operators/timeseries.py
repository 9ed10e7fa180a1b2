"""Time-series operators — calendar-spine resampling with forward fill, and
full-outer-join null semantics (extensions; SURVEY.md §2.5/§2.4. The
reference moves raw rows only — these are the shapes its ClickHouse users
run downstream on event streams).

q_resample is the hypertable/ASOF-rollup pattern: a dense hourly spine per
key (sequence + explode — generated JVM-side, no driver loop), left-joined
with the per-hour aggregate, then gaps forward-filled with
last_value(ignore nulls) over an ordered window. One shuffle on user_id
serves both the join and the fill window.

Scale notes: the spine is |keys| x |buckets| rows of three columns — at
100 TB you generate it per key-partition (it broadcasts or co-partitions
with the fact side, never materializing globally). Forward fill is a
single window pass; state per key is one value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_to_clickhouse_sync_spark.catalog import EVENTS_US_CTE, load_table
from mysql_to_clickhouse_sync_spark.registry import declare

RESAMPLE_USERS = 30  # user_id bound for the declared spine
RESAMPLE_START = "2024-01-01 00:00:00"
RESAMPLE_END = "2024-01-07 23:00:00"  # inclusive hourly spine, 168 buckets


@declare(
    "q_resample",
    oracle=f"""
    {EVENTS_US_CTE},
    keys AS (
        SELECT DISTINCT user_id FROM events_us
        WHERE user_id < {RESAMPLE_USERS}
    ), spine AS (
        SELECT k.user_id, s.h AS hour_start
        FROM keys k
        CROSS JOIN (
            SELECT unnest(generate_series(
                TIMESTAMP '{RESAMPLE_START}',
                TIMESTAMP '{RESAMPLE_END}',
                INTERVAL 1 HOUR)) AS h
        ) s
    ), hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS hour_start,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,2))
                   AS sum_value
        FROM events_us
        WHERE user_id < {RESAMPLE_USERS}
          AND ts >= TIMESTAMP '{RESAMPLE_START}'
          AND ts < TIMESTAMP '{RESAMPLE_END}' + INTERVAL 1 HOUR
        GROUP BY user_id, date_trunc('hour', ts)
    )
    SELECT s.user_id, s.hour_start,
           coalesce(h.n_events, 0) AS n_events,
           CAST(h.sum_value AS DOUBLE) AS sum_value_raw,
           CAST(last_value(h.sum_value IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.hour_start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS sum_value_ffill
    FROM spine s
    LEFT JOIN hourly h USING (user_id, hour_start)
    """,
    tier="P2",
)
def q_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample of the first week per user with a dense spine: empty
    hours appear with n_events=0 and carry the last observed sum forward
    (NULL until a first observation — exactly what last_value(ignore nulls)
    yields on both engines)."""
    events = load_table(spark, sf_dir, "events").filter(
        (F.col("user_id") < RESAMPLE_USERS)
        & (F.col("ts") >= F.lit(RESAMPLE_START))
        & (F.col("ts") < F.to_timestamp(F.lit(RESAMPLE_END)) + F.expr("INTERVAL 1 HOUR"))
    )
    keys = events.select("user_id").distinct()
    spine = keys.select(
        "user_id",
        F.explode(
            F.sequence(
                F.to_timestamp(F.lit(RESAMPLE_START)),
                F.to_timestamp(F.lit(RESAMPLE_END)),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour_start"),
    )
    hourly = events.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour_start")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("decimal(18,2)")
        .cast("double")
        .alias("sum_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["user_id", "hour_start"], "left")
        .select(
            "user_id",
            "hour_start",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            F.col("sum_value").alias("sum_value_raw"),
            F.last("sum_value", ignorenulls=True).over(w).alias("sum_value_ffill"),
        )
    )


@declare(
    "q_interpolate",
    oracle=f"""
    {EVENTS_US_CTE},
    keys AS (
        SELECT DISTINCT user_id FROM events_us
        WHERE user_id < {RESAMPLE_USERS}
    ), spine AS (
        SELECT k.user_id, s.h AS hour_start
        FROM keys k
        CROSS JOIN (
            SELECT unnest(generate_series(
                TIMESTAMP '{RESAMPLE_START}',
                TIMESTAMP '{RESAMPLE_END}',
                INTERVAL 1 HOUR)) AS h
        ) s
    ), hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS hour_start,
               CAST(sum(CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT))
                   AS BIGINT) AS c
        FROM events_us
        WHERE user_id < {RESAMPLE_USERS}
          AND ts >= TIMESTAMP '{RESAMPLE_START}'
          AND ts < TIMESTAMP '{RESAMPLE_END}' + INTERVAL 1 HOUR
        GROUP BY user_id, date_trunc('hour', ts)
    ), grid AS (
        SELECT s.user_id, s.hour_start,
               epoch_ms(s.hour_start) // 3600000 AS h, hourly.c
        FROM spine s LEFT JOIN hourly USING (user_id, hour_start)
    ), ctx AS (
        SELECT user_id, hour_start, h, c,
               last_value(c IGNORE NULLS) OVER wp AS prev_c,
               last_value(CASE WHEN c IS NOT NULL THEN h END IGNORE NULLS)
                   OVER wp AS prev_h,
               first_value(c IGNORE NULLS) OVER wf AS next_c,
               first_value(CASE WHEN c IS NOT NULL THEN h END IGNORE NULLS)
                   OVER wf AS next_h
        FROM grid
        WINDOW wp AS (PARTITION BY user_id ORDER BY h
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY user_id ORDER BY h
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, hour_start, (c IS NOT NULL) AS is_observed,
           CAST(CASE
                WHEN c IS NOT NULL THEN c
                WHEN prev_c IS NOT NULL AND next_c IS NOT NULL
                THEN (prev_c * (next_h - h) + next_c * (h - prev_h))
                     // (next_h - prev_h)
                ELSE NULL END AS BIGINT) AS cents_interp
    FROM ctx
    """,
    tier="P2",
)
def q_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap fill over the hourly spine: observed hours
    keep their exact cent sum; interior gaps take the time-weighted line
    between the surrounding observations; hours before the first / after
    the last observation stay NULL (q_resample's ffill answers the
    carry-forward variant). All arithmetic is integer — cents and epoch-
    hour indices — finished by one floor division of positive BIGINTs, so
    Spark's `div` and DuckDB's `//` agree exactly (no float round-trip).
    Plan: the same single user_id shuffle serves the spine join and BOTH
    direction windows (one sort, ascending h — the backward-looking and
    forward-looking frames share it). State per key is one value per
    direction; linear at any key count."""
    events = load_table(spark, sf_dir, "events").filter(
        (F.col("user_id") < RESAMPLE_USERS)
        & (F.col("ts") >= F.lit(RESAMPLE_START))
        & (
            F.col("ts")
            < F.to_timestamp(F.lit(RESAMPLE_END)) + F.expr("INTERVAL 1 HOUR")
        )
    )
    spine = (
        events.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.to_timestamp(F.lit(RESAMPLE_START)),
                    F.to_timestamp(F.lit(RESAMPLE_END)),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ).alias("hour_start"),
        )
    )
    cents = (F.col("value").cast("decimal(10,2)") * 100).cast("bigint")
    hourly = events.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour_start")
    ).agg(F.sum(cents).cast("bigint").alias("c"))
    grid = spine.join(hourly, ["user_id", "hour_start"], "left").withColumn(
        "h", (F.unix_millis("hour_start") / F.lit(3600000)).cast("bigint")
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("c").isNotNull(), F.col("h"))
    ctx = grid.select(
        "user_id",
        "hour_start",
        "h",
        "c",
        F.last("c", ignorenulls=True).over(wp).alias("prev_c"),
        F.last(obs_h, ignorenulls=True).over(wp).alias("prev_h"),
        F.first("c", ignorenulls=True).over(wf).alias("next_c"),
        F.first(obs_h, ignorenulls=True).over(wf).alias("next_h"),
    )
    interp = ctx.withColumn(
        "num",
        F.col("prev_c") * (F.col("next_h") - F.col("h"))
        + F.col("next_c") * (F.col("h") - F.col("prev_h")),
    ).withColumn("den", F.col("next_h") - F.col("prev_h"))
    return interp.select(
        "user_id",
        "hour_start",
        F.col("c").isNotNull().alias("is_observed"),
        F.when(F.col("c").isNotNull(), F.col("c"))
        .when(
            F.col("prev_c").isNotNull() & F.col("next_c").isNotNull(),
            F.expr("num div den"),
        )
        .cast("bigint")
        .alias("cents_interp"),
    )


OUTER_CUST_BOUND = 1000  # customers kept on the dim side to force unmatched orders


@declare(
    "q_outer_join",
    oracle=f"""
    WITH per_cust AS (
        SELECT o_custkey, count(*) AS n_orders,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                   AS DECIMAL(18,2)) AS DOUBLE) AS total_spend
        FROM orders GROUP BY o_custkey
    ), dims AS (
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE c_custkey < {OUTER_CUST_BOUND}
    )
    SELECT coalesce(c_custkey, o_custkey) AS custkey,
           c_mktsegment,
           coalesce(n_orders, 0) AS n_orders,
           total_spend,
           (c_custkey IS NULL) AS dim_missing,
           (o_custkey IS NULL) AS fact_missing
    FROM dims FULL OUTER JOIN per_cust ON c_custkey = o_custkey
    """,
    tier="P2",
)
def q_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join null semantics: the dim side is truncated so both
    unmatched-fact rows (customers >= bound with orders) and unmatched-dim
    rows (customers without any order) survive, with coalesced keys and
    explicit missing-side flags."""
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("total_spend"),
        )
    )
    dims = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < OUTER_CUST_BOUND)
        .select("c_custkey", "c_mktsegment")
    )
    joined = dims.join(per_cust, dims.c_custkey == per_cust.o_custkey, "full_outer")
    return joined.select(
        F.coalesce(F.col("c_custkey"), F.col("o_custkey")).alias("custkey"),
        "c_mktsegment",
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        "total_spend",
        F.col("c_custkey").isNull().alias("dim_missing"),
        F.col("o_custkey").isNull().alias("fact_missing"),
    )


# --- q_holt_linear -----------------------------------------------------------

HOLT_OFF = 1 << 40  # positivity offset: truncating div == floor div on both
_US_PER_DAY = 86_400_000_000


def _holt_oracle() -> str:
    # The recursive step references l_new twice (for b_new) — template it
    # so both engines run the literally identical expression tree.
    l_new = f"((o.y * 1000 + s.l + s.b + {2 * HOLT_OFF}) // 2 - {HOLT_OFF})"
    b_new = f"((s.b + {l_new} - s.l + {2 * HOLT_OFF}) // 2 - {HOLT_OFF})"
    return f"""
    WITH RECURSIVE ser AS (
        SELECT event_type, epoch_us(ts) // {_US_PER_DAY} AS day_n,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY event_type, day_n
    ), ord AS (
        SELECT *, row_number() OVER (PARTITION BY event_type
                       ORDER BY day_n) AS rn,
               count(*) OVER (PARTITION BY event_type) AS nd
        FROM ser
    ), st AS (
        SELECT event_type, rn, nd, y * 1000 AS l,
               CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS sse
        FROM ord WHERE rn = 1
        UNION ALL
        SELECT s.event_type, o.rn, s.nd,
               {l_new} AS l,
               {b_new} AS b,
               s.sse + (o.y * 1000 - s.l - s.b) * (o.y * 1000 - s.l - s.b)
                   AS sse
        FROM st s JOIN ord o ON o.event_type = s.event_type
             AND o.rn = s.rn + 1
    )
    SELECT event_type, CAST(rn AS BIGINT) AS n_days,
           CAST(l AS BIGINT) AS level_milli, CAST(b AS BIGINT) AS trend_milli,
           CAST(l + b AS BIGINT) AS forecast_milli, CAST(sse AS BIGINT) AS sse
    FROM st WHERE rn = nd
    """


@declare("q_holt_linear", oracle=_holt_oracle(), tier="P2")
def q_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (level + linear trend, alpha =
    beta = 1/2) over the per-day event-count series of each event_type,
    in exact integer milli-units: l_t = (y_t*1000 + l + b) / 2,
    b_t = (b + (l_t - l)) / 2, one-step-ahead SSE accumulated along the
    way and a 1-step forecast l + b at the end. Divisions carry the
    positivity offset so Spark's truncating `div` equals DuckDB's floor
    `//` even when the trend is negative. The Spark side folds the
    day-sorted series with ONE `aggregate()` over a sorted struct array;
    the oracle unrolls the same recurrence as a per-key recursive CTE —
    identical integer programs, bitwise parity (the ADPCM state-machine
    recipe, operators/audio_codecs.py).

    Scale notes: the daily rollup is one map-side-combined shuffle; the
    fold state is 4 BIGINTs per key and the per-key array is |days| —
    bounded by calendar span, not corpus size (a 100 TB corpus still has
    ~365 points/key/year). For day-counts beyond array comfort, the same
    recurrence runs under applyInPandasWithState on the streaming path
    (s_stateful_profile's pattern)."""
    ev = load_table(spark, sf_dir, "events")
    ser = ev.groupBy(
        "event_type",
        F.expr(f"unix_micros(ts) div {_US_PER_DAY}").alias("day_n"),
    ).agg(F.count("*").cast("long").alias("y"))
    l_new = (
        f"((o.y * 1000 + acc.l + acc.b + {2 * HOLT_OFF}) div 2 - {HOLT_OFF})"
    )
    b_new = f"((acc.b + {l_new} - acc.l + {2 * HOLT_OFF}) div 2 - {HOLT_OFF})"
    fold = f"""
        aggregate(
            sort_array(collect_list(named_struct('day_n', day_n, 'y', y))),
            named_struct('n', CAST(0 AS BIGINT), 'l', CAST(0 AS BIGINT),
                         'b', CAST(0 AS BIGINT), 'sse', CAST(0 AS BIGINT)),
            (acc, o) -> CASE WHEN acc.n = 0 THEN
                named_struct('n', CAST(1 AS BIGINT), 'l', o.y * 1000,
                             'b', CAST(0 AS BIGINT), 'sse', CAST(0 AS BIGINT))
            ELSE
                named_struct('n', acc.n + 1,
                             'l', {l_new},
                             'b', {b_new},
                             'sse', acc.sse + (o.y * 1000 - acc.l - acc.b)
                                    * (o.y * 1000 - acc.l - acc.b))
            END)
    """
    st = ser.groupBy("event_type").agg(F.expr(fold).alias("st"))
    return st.select(
        "event_type",
        F.col("st.n").alias("n_days"),
        F.col("st.l").alias("level_milli"),
        F.col("st.b").alias("trend_milli"),
        (F.col("st.l") + F.col("st.b")).cast("long").alias("forecast_milli"),
        F.col("st.sse").alias("sse"),
    )


# --- q_acf -------------------------------------------------------------------

ACF_MAX_LAG = 7  # weekly seasonality window over the daily series


def _acf_oracle() -> str:
    from mysql_to_clickhouse_sync_spark.operators.stats import floor_div

    lags = ", ".join(f"({k})" for k in range(1, ACF_MAX_LAG + 1))
    r = floor_div("1000 * nm", "dd", "//")
    return f"""
    WITH d AS (
        SELECT epoch_us(ts) // {_US_PER_DAY} AS day_n,
               CAST(count(*) AS BIGINT) AS x
        FROM events WHERE ts IS NOT NULL GROUP BY day_n
    ), s AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx
        FROM d
    ), dev AS (
        SELECT day_n, n * x - sx AS e FROM d, s
    ), den AS (
        SELECT CAST(sum(e * e) AS BIGINT) AS dd FROM dev
    ), lags(k) AS (VALUES {lags}),
    num AS (
        SELECT l.k, CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(a.e * b.e) AS BIGINT) AS nm
        FROM lags l
        JOIN dev a ON TRUE
        JOIN dev b ON b.day_n = a.day_n + l.k
        GROUP BY l.k
    )
    SELECT CAST(k AS BIGINT) AS lag, n_pairs,
           CAST(CASE WHEN dd > 0 THEN {r} ELSE NULL END AS BIGINT)
               AS acf_milli
    FROM num, den
    """


@declare("q_acf", oracle=_acf_oracle(), tier="P1")
def q_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily event-count series at lags
    1..ACF_MAX_LAG: the seasonality diagnostic next to the trend (q_linreg_trend)
    and smoothing (q_holt_linear) views. Deviations are cleared of the
    rational mean by the n-scaling trick (e_t = n*x_t - S, exact BIGINT),
    so each r_k = sum(e_t * e_(t+k)) / sum(e_t^2) divides exact integers
    once, through the signed floor_div kernel; a constant series
    (denominator 0) yields NULL. BIGINT-safe while n_days * x_day stays
    under ~1.7e7 (n=30: ~5.8e5 events/day — document counts beyond that
    at 100 TB pre-aggregate to DECIMAL, same recipe as the variance
    numerators).

    Scale notes: ONE corpus aggregation to the ~30-row daily table
    (map-side combined), checkpoint-materialized for its three
    consumers; every join after that is constant-size."""
    from mysql_to_clickhouse_sync_spark.operators.stats import floor_div

    events = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    )
    d = events.groupBy(
        F.expr(f"unix_micros(ts) div {_US_PER_DAY}").alias("day_n")
    ).agg(F.count("*").cast("long").alias("x"))
    s = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
    )
    dev = (
        d.crossJoin(F.broadcast(s))
        .select("day_n", F.expr("n * x - sx").alias("e"))
        .localCheckpoint(eager=True)  # three consumers, one corpus scan
    )
    den = dev.agg(F.sum(F.expr("e * e")).cast("long").alias("dd"))
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").alias("k"))
    a = dev.select(F.col("day_n").alias("da"), F.col("e").alias("ea"))
    b = dev.select(F.col("day_n").alias("db"), F.col("e").alias("eb"))
    num = (
        lags.crossJoin(a)
        .join(b, F.col("db") == F.col("da") + F.col("k"))
        .groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum(F.expr("ea * eb")).cast("long").alias("nm"),
        )
    )
    r = floor_div("1000 * nm", "dd")
    return num.crossJoin(F.broadcast(den)).select(
        F.col("k").cast("long").alias("lag"),
        "n_pairs",
        F.expr(
            f"CAST(CASE WHEN dd > 0 THEN {r} ELSE NULL END AS BIGINT)"
        ).alias("acf_milli"),
    )


# --- q_seasonal_decompose ----------------------------------------------------

_MA_HALF = 3  # centered 7-day moving average


def _seasonal_oracle() -> str:
    from mysql_to_clickhouse_sync_spark.operators.stats import floor_div

    seas = floor_div("sd", "sc", "//")
    return f"""
    WITH d AS (
        SELECT epoch_us(ts) // {_US_PER_DAY} AS day_n,
               CAST(count(*) AS BIGINT) AS x
        FROM events WHERE ts IS NOT NULL GROUP BY day_n
    ), t AS (
        SELECT day_n, x,
               CASE WHEN count(*) OVER w7 = {2 * _MA_HALF + 1}
                    THEN CAST(sum(x) OVER w7 * 1000
                              // {2 * _MA_HALF + 1} AS BIGINT)
               END AS trend_milli
        FROM d
        WINDOW w7 AS (ORDER BY day_n
                      ROWS BETWEEN {_MA_HALF} PRECEDING
                               AND {_MA_HALF} FOLLOWING)
    ), det AS (
        SELECT *, x * 1000 - trend_milli AS det_milli,
               day_n % 7 AS wd
        FROM t
    ), seas AS (
        SELECT wd,
               CAST(sum(det_milli) AS BIGINT) AS sd,
               CAST(count(det_milli) AS BIGINT) AS sc
        FROM det WHERE det_milli IS NOT NULL GROUP BY wd
    )
    SELECT det.day_n, det.x, det.trend_milli,
           CAST(CASE WHEN sc > 0 THEN {seas} END AS BIGINT)
               AS seasonal_milli,
           CAST(det.det_milli - CASE WHEN sc > 0 THEN {seas} END AS BIGINT)
               AS residual_milli
    FROM det JOIN seas ON seas.wd = det.wd
    """


@declare("q_seasonal_decompose", oracle=_seasonal_oracle(), tier="P1")
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of the daily event series (the
    classical decompose, STL's deterministic ancestor): trend = centered
    7-day moving average in exact milli-units (full windows only — the
    3-day edges carry NULL), weekday seasonal = per-weekday mean of the
    detrended series through the signed floor_div kernel, residual =
    detrended minus seasonal. Closes the time-series battery: trend
    (q_linreg_trend), smoothing/forecast (q_holt_linear), memory
    (q_acf), and now the trend/seasonal/residual split a monitoring
    pipeline alerts on (a residual spike is an anomaly AFTER seasonality
    is explained — q_anomaly_mad on the raw series cannot tell a Sunday
    from an outage).

    Scale notes: ONE corpus aggregation to the ~30-row daily table;
    windows and the weekday join run on that table. The law is defined
    over the OBSERVED day sequence (the rows window spans observed
    days; the fixture series is contiguous)."""
    from mysql_to_clickhouse_sync_spark.operators.stats import floor_div

    events = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    )
    d = events.groupBy(
        F.expr(f"unix_micros(ts) div {_US_PER_DAY}").alias("day_n")
    ).agg(F.count("*").cast("long").alias("x"))
    span = 2 * _MA_HALF + 1
    t = d.select(
        "day_n",
        "x",
        F.expr(
            f"CASE WHEN count(*) OVER (ORDER BY day_n"
            f" ROWS BETWEEN {_MA_HALF} PRECEDING AND {_MA_HALF} FOLLOWING)"
            f" = {span} THEN CAST(sum(x) OVER (ORDER BY day_n"
            f" ROWS BETWEEN {_MA_HALF} PRECEDING AND {_MA_HALF} FOLLOWING)"
            f" * 1000 div {span} AS BIGINT) END"
        ).alias("trend_milli"),
    )
    det = t.select(
        "day_n",
        "x",
        "trend_milli",
        F.expr("x * 1000 - trend_milli").alias("det_milli"),
        F.expr("day_n % 7").alias("wd"),
    ).localCheckpoint(eager=True)  # two consumers: seasonal means + join
    seas = (
        det.filter(F.col("det_milli").isNotNull())
        .groupBy("wd")
        .agg(
            F.sum("det_milli").cast("long").alias("sd"),
            F.count("det_milli").cast("long").alias("sc"),
        )
    )
    sexpr = floor_div("sd", "sc")
    return det.join(F.broadcast(seas), "wd").select(
        "day_n",
        "x",
        "trend_milli",
        F.expr(
            f"CAST(CASE WHEN sc > 0 THEN {sexpr} END AS BIGINT)"
        ).alias("seasonal_milli"),
        F.expr(
            f"CAST(det_milli - CASE WHEN sc > 0 THEN {sexpr} END"
            " AS BIGINT)"
        ).alias("residual_milli"),
    )
