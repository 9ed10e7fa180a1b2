"""Statistical aggregates + collection functions + correlated subqueries
(extensions — SURVEY.md §2.3/§2.8; the reference has no aggregation at all,
mysql_to_clickhouse_sync.py:97-116 just counts batch lengths).

Portability design:

  * Built-in stddev/var accumulate doubles in partition order — results
    drift between engines AND between runs (Spark merges partial moments in
    nondeterministic order). q_stats_moments instead computes exact decimal
    power sums (n, Σx, Σx² — associative, order-free), then applies the
    closed-form formula to the exact scalars; the one double division/sqrt
    at the end is bitwise-identical on both engines because the operands
    are identical AND their raw decimal integers stay below 2^53 (above
    that, DuckDB's int128→double→/10^scale cast double-rounds).
  * q_array_battery normalizes every collected array deterministically
    (sorted distinct) before comparison — collect_set order is undefined.
  * q_correlated_subquery phrases "above nation average" as
    c_acctbal * n_count > n_sum in exact decimal — no division, no float.

Scale notes: power sums are plain map-side-combined aggregations (one
shuffle by group, constant state per group). The correlated subquery
decorrelates to a broadcast join against the 25-row per-nation aggregate —
Catalyst does the same rewrite for the SQL form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.registry import declare


@declare(
    "q_stats_moments",
    oracle="""
    WITH sums AS (
        SELECT c_nationkey,
               count(*) AS n,
               sum(CAST(c_acctbal AS DECIMAL(18,6))) AS sx,
               sum(CAST(CAST(c_acctbal AS DECIMAL(12,2))
                        * CAST(c_acctbal AS DECIMAL(12,2))
                        AS DECIMAL(18,4))) AS sxx
        FROM customer
        GROUP BY c_nationkey
    )
    SELECT c_nationkey, n,
           CAST(CAST(sx AS DECIMAL(18,2)) AS DOUBLE) AS sum_bal,
           CAST(CAST(sx AS DOUBLE) / n AS DOUBLE) AS mean_bal,
           CAST(sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                      * CAST(sx AS DOUBLE) / n) / (n - 1)) AS DOUBLE)
               AS stddev_bal
    FROM sums
    WHERE n > 1
    """,
    tier="P2",
)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation mean + sample stddev of customer balance via exact decimal
    power sums (order-free), with the float math applied only to the final
    exact scalars — the engine-portable (and run-deterministic) alternative
    to the built-in stddev_samp, whose partial-moment merge order varies."""
    customer = load_table(spark, sf_dir, "customer")
    x = F.col("c_acctbal").cast("decimal(18,6)")
    # Squares at scale 4 (balances carry 2 decimal digits, so the (12,2)
    # cast is tie-free and the square exact): keeps the summed raw integer
    # below 2^53, where BOTH engines' decimal->double casts are correctly
    # rounded — DuckDB double-rounds wider decimals (int128 -> double ->
    # /10^scale), which costs 1 ulp and splits the hash.
    x2 = F.col("c_acctbal").cast("decimal(12,2)")
    sums = customer.groupBy("c_nationkey").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum((x2 * x2).cast("decimal(18,4)")).alias("sxx"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    return sums.filter(n > 1).select(
        "c_nationkey",
        "n",
        F.col("sx").cast("decimal(18,2)").cast("double").alias("sum_bal"),
        (sx / n).cast("double").alias("mean_bal"),
        F.sqrt((sxx - sx * sx / n) / (n - F.lit(1))).cast("double").alias(
            "stddev_bal"
        ),
    )


@declare(
    "q_array_battery",
    oracle="""
    SELECT user_id,
           len(list(DISTINCT event_type))       AS n_types,
           list_contains(list(DISTINCT event_type), 'purchase')
               AS has_purchase,
           array_to_string(list_sort(list(DISTINCT event_type)), ',')
               AS types_csv
    FROM events
    GROUP BY user_id
    """,
    tier="P2",
)
def q_array_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection-function roster: per-user distinct event types as a
    deterministically-sorted array, plus size / membership / join-to-string
    over it. collect_set order is undefined — sort_array pins it (the
    hash-stability rule for any collected array). The sorted array itself
    leaves the query only as types_csv: raw array cells are unhashable in
    the driver's pandas canonicalization."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(F.sort_array(F.collect_set("event_type")).alias("types_seen"))
        .select(
            "user_id",
            F.size("types_seen").cast("long").alias("n_types"),
            F.array_contains("types_seen", "purchase").alias("has_purchase"),
            F.array_join("types_seen", ",").alias("types_csv"),
        )
    )


@declare(
    "q_correlated_subquery",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal
    FROM customer o
    WHERE CAST(c_acctbal AS DECIMAL(18,6))
          * (SELECT count(*) FROM customer i
             WHERE i.c_nationkey = o.c_nationkey)
          > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,6))) FROM customer i
             WHERE i.c_nationkey = o.c_nationkey)
    """,
    tier="P2",
)
def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with above-nation-average balance — the canonical
    correlated scalar subquery, decorrelated to a broadcast join against
    the per-nation aggregate (exactly Catalyst's own rewrite). The
    comparison is bal*count > sum in exact decimal: division-free, so no
    float rounding can split the engines."""
    customer = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal").cast("decimal(18,6)")
    per_nation = customer.groupBy("c_nationkey").agg(
        F.count("*").alias("n_cnt"), F.sum(bal).alias("n_sum")
    )
    return (
        customer.join(
            F.broadcast(per_nation.withColumnRenamed("c_nationkey", "pn_key")),
            F.col("c_nationkey") == F.col("pn_key"),
        )
        .filter(bal * F.col("n_cnt") > F.col("n_sum"))
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    )


@declare(
    "q_zscore_outliers",
    oracle="""
    WITH cents AS (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(10,2)) * 100 AS HUGEINT) AS c
        FROM events
    ),
    stats AS (
        SELECT event_type, c,
               count(*) OVER (PARTITION BY event_type) AS n,
               sum(c) OVER (PARTITION BY event_type) AS s,
               sum(c * c) OVER (PARTITION BY event_type) AS s2
        FROM cents
    )
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CASE WHEN (n * c - s) * (n * c - s)
                             > 4 * (n * s2 - s * s)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(sum(CASE WHEN (n * c - s) * (n * c - s)
                              > 4 * (n * s2 - s * s)
                         THEN c ELSE 0 END) AS BIGINT) AS outlier_cents
    FROM stats
    GROUP BY event_type
    """,
    tier="P2",
)
def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outlier detection (|z| > 2), division-free:
    (x-mu)^2 > 4*sigma^2 rearranged over integer cent power sums to
    (n*x - sx)^2 > 4*(n*sxx - sx^2) — every operand exact in decimal(38)
    (Spark) / int128 (DuckDB), so the flag is bit-identical. Scale: the
    per-type moments are one map-side-combined groupBy (constant state per
    type) BROADCAST back over the stream — not a window: partitionBy on a
    5-value key would funnel the whole table into 5 tasks. The oracle
    phrases the same moments as a window, which DuckDB is free to execute
    however it likes. Magnitudes stay far below 10^38 even at sf1000."""
    events = load_table(spark, sf_dir, "events")
    c = (F.col("value").cast("decimal(10,2)") * 100).cast("decimal(38,0)")
    moments = events.groupBy(F.col("event_type").alias("m_type")).agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum(c).cast("decimal(38,0)").alias("s"),
        F.sum((c * c).cast("decimal(38,0)")).cast("decimal(38,0)").alias("s2"),
    )
    stats = events.select("event_type", c.alias("c")).join(
        F.broadcast(moments),
        F.col("event_type") == F.col("m_type"),
    )
    dev = F.col("n") * F.col("c") - F.col("s")
    is_out = (dev * dev) > 4 * (
        F.col("n") * F.col("s2") - F.col("s") * F.col("s")
    )
    return stats.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(is_out.cast("int")).alias("n_outliers"),
        F.sum(F.when(is_out, F.col("c")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("outlier_cents"),
    )


@declare(
    "q_corr_pearson",
    oracle="""
    WITH sums AS (
        SELECT l_returnflag,
               count(*) AS n,
               sum(CAST(l_quantity AS DECIMAL(18,6))) AS sx,
               sum(CAST(l_discount AS DECIMAL(18,6))) AS sy,
               sum(CAST(CAST(l_quantity AS DECIMAL(12,2))
                        * CAST(l_quantity AS DECIMAL(12,2))
                        AS DECIMAL(18,4))) AS sxx,
               sum(CAST(CAST(l_discount AS DECIMAL(12,2))
                        * CAST(l_discount AS DECIMAL(12,2))
                        AS DECIMAL(18,4))) AS syy,
               sum(CAST(CAST(l_quantity AS DECIMAL(12,2))
                        * CAST(l_discount AS DECIMAL(12,2))
                        AS DECIMAL(18,4))) AS sxy
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           CAST((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(sy AS DOUBLE) / n) / (n - 1) AS DOUBLE)
               AS covar_samp,
           CAST(CASE WHEN (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                           * CAST(sx AS DOUBLE) / n) > 0
                      AND (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                           * CAST(sy AS DOUBLE) / n) > 0
                THEN (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                      * CAST(sy AS DOUBLE) / n)
                     / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                             * CAST(sx AS DOUBLE) / n)
                            * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                               * CAST(sy AS DOUBLE) / n))
                ELSE NULL END AS DOUBLE)
               AS corr_qty_disc
    FROM sums
    WHERE n > 1
    """,
    tier="P2",
)
def q_corr_pearson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + sample covariance of (l_quantity,
    l_discount) per return flag — the two-column completion of
    q_stats_moments, by the same engine-portable recipe: EXACT decimal
    power/cross sums (order-free, associative), float math only on the
    final exact scalars in one fixed textual order. The built-in
    corr()/covar_samp() merge partial moments in partition order and are
    not run-deterministic, let alone engine-portable. Bounds: products
    at scale 4 keep every unscaled sum below 2^53 through ~sf10 (qty <=
    50, disc <= 0.1), so the decimal->double casts are correctly rounded
    on both engines. One map-side-combined shuffle on the 3-value flag."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    x6 = F.col("l_quantity").cast("decimal(18,6)")
    y6 = F.col("l_discount").cast("decimal(18,6)")
    x2 = F.col("l_quantity").cast("decimal(12,2)")
    y2 = F.col("l_discount").cast("decimal(12,2)")
    sums = lineitem.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x6).alias("sx"),
        F.sum(y6).alias("sy"),
        F.sum((x2 * x2).cast("decimal(18,4)")).alias("sxx"),
        F.sum((y2 * y2).cast("decimal(18,4)")).alias("syy"),
        F.sum((x2 * y2).cast("decimal(18,4)")).alias("sxy"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    cov_num = sxy - sx * sy / n
    # Degenerate-group guard (review r4/r5): a constant-x or constant-y
    # group makes its variance 0, and Spark 4 ANSI THROWS on double
    # division by zero where DuckDB yields NULL. Each variance is
    # guarded SEPARATELY (not via their product — float rounding can
    # make both slightly negative and the product spuriously positive,
    # emitting a meaningless |r|>1); the conditions are computed on
    # bit-identical doubles so both engines take the same branch.
    var_x = sxx - sx * sx / n
    var_y = syy - sy * sy / n
    return sums.filter(n > 1).select(
        "l_returnflag",
        "n",
        (cov_num / (n - F.lit(1))).cast("double").alias("covar_samp"),
        F.when((var_x > 0) & (var_y > 0), cov_num / F.sqrt(var_x * var_y))
        .cast("double")
        .alias("corr_qty_disc"),
    )


@declare(
    "q_linreg_trend",
    oracle="""
    WITH sums AS (
        SELECT l_returnflag,
               count(*) AS n,
               sum(CAST(datediff('day',
                        (SELECT min(CAST(l_shipdate AS DATE)) FROM lineitem),
                        CAST(l_shipdate AS DATE)) AS BIGINT)) AS sx,
               sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                        AS BIGINT)) AS sy,
               sum(CAST(datediff('day',
                        (SELECT min(CAST(l_shipdate AS DATE)) FROM lineitem),
                        CAST(l_shipdate AS DATE)) AS BIGINT)
                   * CAST(datediff('day',
                        (SELECT min(CAST(l_shipdate AS DATE)) FROM lineitem),
                        CAST(l_shipdate AS DATE)) AS BIGINT)) AS sxx,
               sum(CAST(datediff('day',
                        (SELECT min(CAST(l_shipdate AS DATE)) FROM lineitem),
                        CAST(l_shipdate AS DATE)) AS BIGINT)
                   * CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                          AS BIGINT)) AS sxy
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, n, slope_cents_per_day,
           CAST((CAST(sy AS DOUBLE) - slope_cents_per_day
                 * CAST(sx AS DOUBLE)) / n AS DOUBLE) AS intercept_cents
    FROM (
        SELECT l_returnflag, n, sx, sy,
               CAST(CASE WHEN n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                              * CAST(sx AS DOUBLE) > 0
                    THEN (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                          * CAST(sy AS DOUBLE))
                         / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                            * CAST(sx AS DOUBLE))
                    ELSE NULL END AS DOUBLE)
                   AS slope_cents_per_day
        FROM sums
        WHERE n > 1
    )
    """,
    tier="P2",
)
def q_linreg_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS trend: slope and intercept of extended price (exact
    integer CENTS) against ship day, the 'is this metric drifting' primitive.
    Numeric conditioning comes from the REFERENCE'S OWN pattern — one
    driver-side MIN scalar (mysql_to_clickhouse_sync.py:163's bounds
    query) recenters x to small day offsets (0..~2500), so every sum is
    an exact BIGINT (sxy <= ~8e17 at 30M rows) and the closed-form
    slope/intercept touch floats only on final exact scalars in one
    fixed textual order: bit-identical across engines, unlike the
    built-in regr_slope's merge-order-dependent partial moments.
    Scale: one scalar agg + one map-side-combined shuffle on the 3-value
    flag; the day-offset BIGINT bound holds to ~1e9 rows, past which x
    recenters per partition-range or the sums go decimal."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    m = lineitem.agg(
        F.min(F.col("l_shipdate").cast("date"))
    ).collect()[0][0]
    x = F.datediff(F.col("l_shipdate").cast("date"), F.lit(m)).cast("bigint")
    y = F.expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
    sums = lineitem.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    # Degenerate-group guard (review r4): constant-x groups zero the
    # denominator; ANSI Spark throws on double /0 where DuckDB yields
    # NULL — the NULL branch is taken identically on both engines (the
    # condition compares bit-identical doubles). Intercept goes NULL by
    # propagation.
    den = n * sxx - sx * sx
    slope = (
        F.when(den > 0, (n * sxy - sx * sy) / den)
    ).cast("double")
    with_slope = sums.filter(n > 1).select(
        "l_returnflag", "n", "sx", "sy",
        slope.alias("slope_cents_per_day"),
    )
    return with_slope.select(
        "l_returnflag",
        "n",
        "slope_cents_per_day",
        (
            (F.col("sy").cast("double")
             - F.col("slope_cents_per_day") * F.col("sx").cast("double"))
            / F.col("n")
        ).cast("double").alias("intercept_cents"),
    )


# --- Chi-square association (lang x source contingency) ---------------------


@declare(
    "q_chi2_assoc",
    oracle="""
    WITH cells AS (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS o
        FROM documents GROUP BY lang, source
    ), marg AS (
        SELECT lang, source, o,
               CAST(sum(o) OVER (PARTITION BY lang) AS BIGINT) AS r,
               CAST(sum(o) OVER (PARTITION BY source) AS BIGINT) AS c,
               CAST(sum(o) OVER () AS BIGINT) AS n
        FROM cells
    )
    SELECT lang, source, o,
           CAST(r * c * 1000 // n AS BIGINT) AS e_milli,
           CAST(floor((CAST(n * o - r * c AS DOUBLE)
                 * CAST(n * o - r * c AS DOUBLE) * 1000000.0)
                / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(c AS DOUBLE)))
                AS BIGINT) AS term_micro
    FROM marg
    """,
    tier="P2",
)
def q_chi2_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square association between lang and source — the
    standard contingency diagnostic of a curation pipeline (is a source
    language-skewed? is a split leaking a language?). Per-cell output so
    the analyst sees WHICH cells drive the statistic; the global
    chi-square is the exact integer sum of term_micro.

    Parity contract: observed/expected stay integer (e_milli = r*c*1000
    floor-div n); each cell's term (nO - rc)^2 / (n*r*c) crosses into
    DOUBLE — but only as one mirrored left-associated expression of
    identical integer operands, computed PER CELL (never summed as
    floats), then FLOORED before the integer cast (DuckDB's
    double->BIGINT cast rounds where Spark's truncates — floor makes
    the double integral first, so both casts are exact), and both
    engines agree bitwise. n*o and r*c stay below 2^53 for any fixture scale (n, o,
    r, c are document counts).

    Scale notes: one (lang, source) map-side-combined shuffle; the
    windows run over the cell table (cardinality = |langs| x |sources|,
    independent of corpus size)."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("o")
    )
    w_lang = Window.partitionBy("lang")
    w_src = Window.partitionBy("source")
    w_all = Window.partitionBy()
    marg = cells.select(
        "lang",
        "source",
        "o",
        F.sum("o").over(w_lang).cast("long").alias("r"),
        F.sum("o").over(w_src).cast("long").alias("c"),
        F.sum("o").over(w_all).cast("long").alias("n"),
    )
    return marg.select(
        "lang",
        "source",
        "o",
        F.expr("CAST(r * c * 1000 div n AS BIGINT)").alias("e_milli"),
        F.expr(
            "CAST(floor((CAST(n * o - r * c AS DOUBLE)"
            " * CAST(n * o - r * c AS DOUBLE) * 1000000.0)"
            " / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(c AS DOUBLE)))"
            " AS BIGINT)"
        ).alias("term_micro"),
    )


# --- exact integer square root (isqrt) kernel --------------------------------
#
# floor(sqrt(x)) for 0 <= x < 2^62, ENTIRELY engine-portable: seed with the
# double sqrt (IEEE correctly-rounded on both the JVM and DuckDB, so the
# floored seed is within +-1 of the true isqrt; two correction steps each
# direction absorb any conceivable double-rounding slack), then fix the seed
# with EXACT integer square comparisons. The result is the true floor sqrt
# on both engines bitwise — the primitive that unlocks every
# standard-deviation / confidence-interval shape without libm parity risk.


def floor_div(a: str, b: str, op: str = "div") -> str:
    """SQL fragment computing EXACT floor(a/b) for b > 0 with a possibly
    NEGATIVE numerator, identical on Spark (op='div', truncating) and
    DuckDB (op='//', flooring): every division the fragment actually
    emits has a non-negative numerator, where truncation and floor are
    the same function. This is the n-INDEPENDENT replacement for the
    positivity-offset trick — an offset only floors correctly while the
    quotient stays inside the offset range, an invariant that breaks
    once the statistic grows with data (Welch t ~ sqrt(n))."""
    return (
        f"(CASE WHEN ({a}) >= 0 THEN ({a}) {op} ({b})"
        f" ELSE -(((-({a})) + ({b}) - 1) {op} ({b})) END)"
    )


def with_isqrt(df: DataFrame, xcol: str, out: str) -> DataFrame:
    d = df.withColumn(
        "_s",
        F.expr(f"CAST(floor(sqrt(CAST({xcol} AS DOUBLE))) AS BIGINT)"),
    )
    for _ in range(2):
        d = d.withColumn(
            "_s",
            F.expr(f"CASE WHEN _s * _s > {xcol} THEN _s - 1 ELSE _s END"),
        )
    for _ in range(2):
        d = d.withColumn(
            "_s",
            F.expr(
                f"CASE WHEN (_s + 1) * (_s + 1) <= {xcol}"
                f" THEN _s + 1 ELSE _s END"
            ),
        )
    return d.withColumn(out, F.col("_s")).drop("_s")


def _isqrt_sql(src: str, final: str = "sq") -> str:
    """DuckDB CTE chain computing s = floor(sqrt(x)) over the one-column
    table `src`(x) — the exact mirror of `with_isqrt` (same seed, same
    four correction steps)."""
    ctes = [
        f"q0 AS (SELECT x, CAST(floor(sqrt(CAST(x AS DOUBLE))) AS BIGINT)"
        f" AS s FROM {src})"
    ]
    for step in range(2):
        ctes.append(
            f"q{step + 1} AS (SELECT x, CASE WHEN s * s > x THEN s - 1"
            f" ELSE s END AS s FROM q{step})"
        )
    for step in range(2, 4):
        ctes.append(
            f"q{step + 1} AS (SELECT x, CASE WHEN (s + 1) * (s + 1) <= x"
            f" THEN s + 1 ELSE s END AS s FROM q{step})"
        )
    ctes.append(f"{final} AS (SELECT x, s FROM q4)")
    return ",\n    ".join(ctes)


# --- q_wilson_ci --------------------------------------------------------------

WILSON_Z_MILLI = 1960  # z for the 95% two-sided interval, milli-units


def _wilson_oracle() -> str:
    from mysql_to_clickhouse_sync_spark.operators.mlscore import logistic_cte

    zm = WILSON_Z_MILLI
    return f"""
    WITH {logistic_cte()},
    g AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS k
        FROM scored GROUP BY lang
    ), rad AS (
        SELECT lang, n, k,
               ((4 * k * (n - k)) * 1000000 // n + {zm * zm}) AS x
        FROM g
    ),
    {_isqrt_sql('(SELECT DISTINCT x FROM rad)')}
    SELECT rad.lang, rad.n, rad.k,
           CAST((2000000 * k + {zm * zm}) * 1000000
                // (2000000 * n + {2 * zm * zm}) AS BIGINT) AS center_micro,
           CAST(greatest((2000000 * k + {zm * zm}) * 1000000
                // (2000000 * n + {2 * zm * zm})
                - ({zm} * sq.s * 1000000)
                  // (2000000 * n + {2 * zm * zm}), 0) AS BIGINT)
               AS lo_micro,
           CAST(least((2000000 * k + {zm * zm}) * 1000000
                // (2000000 * n + {2 * zm * zm})
                + ({zm} * sq.s * 1000000)
                  // (2000000 * n + {2 * zm * zm}), 1000000) AS BIGINT)
               AS hi_micro
    FROM rad JOIN sq ON sq.x = rad.x
    """


@declare("q_wilson_ci", oracle=_wilson_oracle(), tier="P1")
def q_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson 95% score interval for the per-language keep rate of the
    logistic quality filter — the CORRECT small-sample proportion
    interval (never escapes [0,1], sane at k=0 or k=n, unlike the
    normal approximation): center = (k + z^2/2)/(n + z^2), half-width
    = z*sqrt(4k(n-k)/n + z^2)/(2(n + z^2)), every step in exact
    integers with the isqrt kernel on the radicand (micro-scaled; the
    floor program is identical on both engines by construction).
    This is the number an acceptance dashboard shows with error bars.

    Scale notes: one lang-keyed map-side-combined shuffle into a
    |langs|-row table; the kernel is four CASE steps on that table.
    4k(n-k)*1e6/n <= n*1e6 keeps the radicand < 2^62 to ~4e12 rows/key.
    Linear at 100 TB."""
    from mysql_to_clickhouse_sync_spark.operators.mlscore import (
        logistic_scored,
    )

    zm = WILSON_Z_MILLI
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    g = (
        logistic_scored(docs)
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.expr("CASE WHEN keep THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("k"),
        )
    )
    rad = g.withColumn(
        "x", F.expr(f"(4 * k * (n - k)) * 1000000 div n + {zm * zm}")
    )
    rad = with_isqrt(rad, "x", "s")
    center = f"(2000000 * k + {zm * zm}) * 1000000 div (2000000 * n + {2 * zm * zm})"
    half = f"({zm} * s * 1000000) div (2000000 * n + {2 * zm * zm})"
    return rad.select(
        "lang",
        "n",
        "k",
        F.expr(center).alias("center_micro"),
        F.expr(f"greatest({center} - {half}, 0)").alias("lo_micro"),
        F.expr(f"least({center} + {half}, 1000000)").alias("hi_micro"),
    )


# --- q_stddev_exact -----------------------------------------------------------


@declare(
    "q_stddev_exact",
    oracle=f"""
    WITH c AS (
        SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS xc
        FROM events
    ), g AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(xc) AS BIGINT) AS sx,
               CAST(sum(xc * xc) AS BIGINT) AS sxx
        FROM c GROUP BY event_type
    ), rad AS (
        SELECT event_type, n, sx, sxx,
               ((n * sxx - sx * sx) // (n * (n - 1))) * 1000000 AS x
        FROM g WHERE n >= 2
    ),
    {_isqrt_sql('(SELECT DISTINCT x FROM rad)')}
    SELECT rad.event_type, rad.n,
           CAST(rad.sx * 1000 // rad.n AS BIGINT) AS mean_cents_milli,
           CAST(sq.s AS BIGINT) AS sd_cents_milli
    FROM rad JOIN sq ON sq.x = rad.x
    """,
    tier="P1",
)
def q_stddev_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type sample standard deviation of the value column in
    EXACT integer milli-cents via the isqrt kernel: variance numerator
    n*sum(x^2) - sum(x)^2 over exact cents, one floor division by
    n(n-1), micro-scale, integer square root — no libm stddev (whose
    last-ulp differs between engines) anywhere. The dashboard-grade
    dispersion number next to q_stats_moments' double-precision view.

    Scale notes: one event_type-keyed map-side-combined shuffle; the
    kernel runs on the |types|-row table. Variance numerators are
    BIGINT-safe to ~3e6 rows/key at cents scale (the q_auc_roc
    DECIMAL note beyond)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("xc"),
    )
    g = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("xc").cast("long").alias("sx"),
        F.sum(F.expr("xc * xc")).cast("long").alias("sxx"),
    )
    rad = g.filter(F.col("n") >= 2).withColumn(
        "x",
        F.expr("((n * sxx - sx * sx) div (n * (n - 1))) * 1000000"),
    )
    rad = with_isqrt(rad, "x", "s")
    return rad.select(
        "event_type",
        "n",
        F.expr("sx * 1000 div n").alias("mean_cents_milli"),
        F.col("s").alias("sd_cents_milli"),
    )


# --- q_welch_ttest ------------------------------------------------------------

WELCH_A = "purchase"  # the two compared event populations
WELCH_B = "click"


def _welch_oracle() -> str:
    ma = floor_div("rad.sxa * 1000", "rad.na", "//")
    mb = floor_div("rad.sxb * 1000", "rad.nb", "//")
    t = floor_div(f"(({ma}) - ({mb})) * 1000", "sq.s", "//")
    return f"""
    WITH c AS (
        SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS xc
        FROM events WHERE event_type IN ('{WELCH_A}', '{WELCH_B}')
    ), g AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(xc) AS BIGINT) AS sx,
               CAST(sum(xc * xc) AS BIGINT) AS sxx
        FROM c GROUP BY event_type
        HAVING count(*) >= 2
    ), w AS (
        SELECT max(CASE WHEN event_type = '{WELCH_A}' THEN n END) AS na,
               max(CASE WHEN event_type = '{WELCH_A}' THEN sx END) AS sxa,
               max(CASE WHEN event_type = '{WELCH_A}' THEN sxx END) AS sxxa,
               max(CASE WHEN event_type = '{WELCH_B}' THEN n END) AS nb,
               max(CASE WHEN event_type = '{WELCH_B}' THEN sx END) AS sxb,
               max(CASE WHEN event_type = '{WELCH_B}' THEN sxx END) AS sxxb
        FROM g
    ), rad AS (
        -- se^2 = s_a^2/na + s_b^2/nb in micro-cents^2: each variance is
        -- (n*sxx - sx^2) / (n*(n-1)), divided once more by n
        SELECT *,
               ((na * sxxa - sxa * sxa) // (na * (na - 1)) * 1000000 // na
                + (nb * sxxb - sxb * sxb) // (nb * (nb - 1)) * 1000000 // nb)
                   AS x
        FROM w
    ),
    {_isqrt_sql('(SELECT x FROM rad WHERE x IS NOT NULL)')}
    SELECT rad.na, rad.nb,
           CAST({ma} AS BIGINT) AS mean_a_milli,
           CAST({mb} AS BIGINT) AS mean_b_milli,
           CAST(sq.s AS BIGINT) AS se_cents_milli,
           CAST(CASE WHEN sq.s > 0 THEN {t} ELSE NULL END AS BIGINT)
               AS t_milli
    FROM rad LEFT JOIN sq ON sq.x = rad.x
    """


@declare("q_welch_ttest", oracle=_welch_oracle(), tier="P1")
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t statistic for purchase vs click values — the
    unequal-variance mean-difference test (the A/B-testing staple):
    t = (mean_a - mean_b) / sqrt(s_a^2/n_a + s_b^2/n_b), entirely in
    exact integers over cents — sample variances via the one-pass
    numerator identity, the standard error via the isqrt kernel on the
    micro-scaled radicand, and the final division through a positivity
    offset (the mean difference is signed). Completes the inference
    battery next to chi-square (q_chi2_assoc), KS (q_ks_2samp) and the
    rank-sum AUC (q_auc_roc). The signed final division runs through
    the floor_div kernel (positive-numerator decomposition), NOT a
    positivity offset: Welch t grows ~sqrt(n), so any fixed offset
    bound would eventually be breached at scale and split Spark's
    truncating div from DuckDB's flooring // — floor_div is exact for
    every representable t. Degenerate inputs are guarded, not thrown:
    populations with n < 2 are dropped before the pivot (no n-1=0
    division under ANSI), and s = 0 (both groups constant) yields
    t_milli NULL, mirroring q_corr_pearson's zero-variance branch.

    Scale notes: one event_type-keyed map-side-combined shuffle into a
    2-row table pivoted to one row; kernel arithmetic on that row.
    Variance numerators BIGINT-safe to ~3e6 rows/type at cents scale
    (the q_stddev_exact bound)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(WELCH_A, WELCH_B)
    ).select(
        "event_type",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("xc"),
    )
    g = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("xc").cast("long").alias("sx"),
        F.sum(F.expr("xc * xc")).cast("long").alias("sxx"),
    )
    g = g.filter(F.col("n") >= 2)
    w = g.agg(
        *[
            F.max(
                F.expr(f"CASE WHEN event_type = '{t}' THEN {c} END")
            ).alias(f"{c}{suf}")
            for t, suf in ((WELCH_A, "a"), (WELCH_B, "b"))
            for c in ("n", "sx", "sxx")
        ]
    )
    rad = w.withColumn(
        "x",
        F.expr(
            "(na * sxxa - sxa * sxa) div (na * (na - 1)) * 1000000 div na"
            " + (nb * sxxb - sxb * sxb) div (nb * (nb - 1)) * 1000000 div nb"
        ),
    )
    rad = with_isqrt(rad, "x", "s")
    ma = floor_div("sxa * 1000", "na")
    mb = floor_div("sxb * 1000", "nb")
    t = floor_div(f"(({ma}) - ({mb})) * 1000", "s")
    return rad.select(
        F.col("na"),
        F.col("nb"),
        F.expr(ma).alias("mean_a_milli"),
        F.expr(mb).alias("mean_b_milli"),
        F.col("s").alias("se_cents_milli"),
        F.expr(
            f"CAST(CASE WHEN s > 0 THEN {t} ELSE NULL END AS BIGINT)"
        ).alias("t_milli"),
    )


# --- q_cohens_d --------------------------------------------------------------


def _cohens_d_oracle() -> str:
    d = floor_div("(ma - mb) * 1000", "sq.s", "//")
    return f"""
    WITH c AS (
        SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS xc
        FROM events WHERE event_type IN ('{WELCH_A}', '{WELCH_B}')
    ), g AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(xc) AS BIGINT) AS sx,
               CAST(sum(xc * xc) AS BIGINT) AS sxx
        FROM c GROUP BY event_type
        HAVING count(*) >= 2
    ), w AS (
        SELECT max(CASE WHEN event_type = '{WELCH_A}' THEN n END) AS na,
               max(CASE WHEN event_type = '{WELCH_A}' THEN sx END) AS sxa,
               max(CASE WHEN event_type = '{WELCH_A}' THEN sxx END) AS sxxa,
               max(CASE WHEN event_type = '{WELCH_B}' THEN n END) AS nb,
               max(CASE WHEN event_type = '{WELCH_B}' THEN sx END) AS sxb,
               max(CASE WHEN event_type = '{WELCH_B}' THEN sxx END) AS sxxb
        FROM g
    ), pool AS (
        SELECT *,
               {floor_div('sxa * 1000', 'na', '//')} AS ma,
               {floor_div('sxb * 1000', 'nb', '//')} AS mb,
               (((na * sxxa - sxa * sxa) // (na * (na - 1))) * (na - 1)
                + ((nb * sxxb - sxb * sxb) // (nb * (nb - 1))) * (nb - 1))
                   // (na + nb - 2) AS s2p
        FROM w
    ), rad AS (
        SELECT *, s2p * 1000000 AS x FROM pool
    ),
    {_isqrt_sql('(SELECT x FROM rad WHERE x IS NOT NULL)')}
    SELECT rad.na, rad.nb,
           CAST(rad.s2p AS BIGINT) AS pooled_var_cents2,
           CAST(sq.s AS BIGINT) AS pooled_sd_cents_milli,
           CAST(CASE WHEN sq.s > 0 THEN {d} ELSE NULL END AS BIGINT)
               AS cohens_d_milli
    FROM rad LEFT JOIN sq ON sq.x = rad.x
    """


@declare("q_cohens_d", oracle=_cohens_d_oracle(), tier="P1")
def q_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d effect size for the purchase-vs-click value gap — the
    number q_welch_ttest's significance needs next to it (with enough
    data everything is significant; d says whether the gap MATTERS):
    d = (mean_a - mean_b) / pooled_sd, pooled variance the
    (n-1)-weighted average through one-pass exact numerators, the sd
    via the isqrt kernel on the micro-scaled radicand, the final signed
    division through floor_div. Same degenerate guards as Welch (n<2
    populations dropped; zero pooled sd -> NULL).

    Scale notes: identical shape to q_welch_ttest — one event_type
    shuffle into a pivoted row, scalar kernel arithmetic."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(WELCH_A, WELCH_B))
        .select(
            "event_type",
            F.expr("CAST(floor(value * 100) AS BIGINT)").alias("xc"),
        )
    )
    g = (
        ev.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("xc").cast("long").alias("sx"),
            F.sum(F.expr("xc * xc")).cast("long").alias("sxx"),
        )
        .filter(F.col("n") >= 2)
    )
    w = g.agg(
        *[
            F.max(
                F.expr(f"CASE WHEN event_type = '{t}' THEN {c} END")
            ).alias(f"{c}{suf}")
            for t, suf in ((WELCH_A, "a"), (WELCH_B, "b"))
            for c in ("n", "sx", "sxx")
        ]
    )
    pool = w.select(
        "*",
        F.expr(floor_div("sxa * 1000", "na")).alias("ma"),
        F.expr(floor_div("sxb * 1000", "nb")).alias("mb"),
        F.expr(
            "(((na * sxxa - sxa * sxa) div (na * (na - 1))) * (na - 1)"
            " + ((nb * sxxb - sxb * sxb) div (nb * (nb - 1))) * (nb - 1))"
            " div (na + nb - 2)"
        ).alias("s2p"),
    ).withColumn("x", F.expr("s2p * 1000000"))
    rad = with_isqrt(pool, "x", "s")
    d = floor_div("(ma - mb) * 1000", "s")
    return rad.select(
        "na",
        "nb",
        F.col("s2p").cast("long").alias("pooled_var_cents2"),
        F.col("s").cast("long").alias("pooled_sd_cents_milli"),
        F.expr(
            f"CAST(CASE WHEN s > 0 THEN {d} ELSE NULL END AS BIGINT)"
        ).alias("cohens_d_milli"),
    )


# --- q_cramers_v -------------------------------------------------------------


def _cramers_oracle() -> str:
    from mysql_to_clickhouse_sync_spark.registry import REGISTRY

    chi2 = REGISTRY["q_chi2_assoc"].oracle
    return f"""
    WITH terms AS ({chi2}),
    agg AS (
        SELECT CAST(sum(term_micro) AS BIGINT) AS chi2_micro,
               CAST(count(DISTINCT lang) AS BIGINT) AS nl,
               CAST(count(DISTINCT source) AS BIGINT) AS ns,
               CAST(sum(o) AS BIGINT) AS n
        FROM terms
    ), rad AS (
        SELECT *,
               -- degenerate-input guard (the q_mcc_eval pattern): a
               -- single-lang or single-source corpus has min(r,c)=1 and
               -- V is undefined, not a division error
               CASE WHEN n > 0 AND least(nl, ns) > 1
                    THEN chi2_micro // (n * (least(nl, ns) - 1))
                    END AS x,
               (nl - 1) * (ns - 1) AS dof
        FROM agg
    ),
    {_isqrt_sql('(SELECT x FROM rad)')}
    SELECT rad.n, rad.dof, rad.chi2_micro,
           CAST(sq.s AS BIGINT) AS cramers_v_milli
    FROM rad CROSS JOIN sq
    """


@declare("q_cramers_v", oracle=_cramers_oracle(), tier="P2")
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect size for the lang x source association —
    q_chi2_assoc's per-cell statistic collapsed to the [0,1] strength
    number: V = sqrt(chi2 / (n * (min(r,c) - 1))), computed by summing
    the exact per-cell term_micro and running the isqrt kernel on the
    floored quotient (the law is defined on that integer grid, so both
    engines agree bitwise). The question chi-square cannot answer
    alone: a huge corpus makes ANY dependence significant; V says how
    strong it is.

    Scale notes: composes the q_chi2_assoc plan (cell-table windows)
    with one scalar aggregation — nothing corpus-sized is added."""
    t = q_chi2_assoc(spark, sf_dir)
    agg = t.agg(
        F.sum("term_micro").cast("long").alias("chi2_micro"),
        F.countDistinct("lang").cast("long").alias("nl"),
        F.countDistinct("source").cast("long").alias("ns"),
        F.sum("o").cast("long").alias("n"),
    )
    rad = agg.select(
        "*",
        F.expr(
            "CASE WHEN n > 0 AND least(nl, ns) > 1"
            " THEN chi2_micro div (n * (least(nl, ns) - 1)) END"
        ).alias("x"),
        F.expr("(nl - 1) * (ns - 1)").alias("dof"),
    )
    rad = with_isqrt(rad, "x", "s")
    return rad.select(
        "n",
        "dof",
        "chi2_micro",
        F.col("s").cast("long").alias("cramers_v_milli"),
    )


# --- q_power_sample_size -----------------------------------------------------

POWER_Z_ALPHA_MILLI = 1960  # two-sided alpha = 0.05
POWER_Z_BETA_MILLI = 842  # power = 0.80
POWER_MDE_PCT = 5  # minimum detectable effect: 5% of the mean


def _power_oracle() -> str:
    z = POWER_Z_ALPHA_MILLI + POWER_Z_BETA_MILLI
    return f"""
    WITH c AS (
        SELECT CAST(floor(value * 100) AS BIGINT) AS xc
        FROM events WHERE event_type = '{WELCH_A}'
    ), g AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(xc) AS BIGINT) AS sx,
               CAST(sum(xc * xc) AS BIGINT) AS sxx
        FROM c
    ), p AS (
        -- mean can be signed: floor_div keeps truncating `div` and
        -- flooring `//` identical (the welch lesson applied here too)
        SELECT n,
               (n * sxx - sx * sx) // (n * (n - 1)) AS s2,
               {floor_div('sx * 1000', 'n', '//')} AS mean_milli,
               {floor_div(
                   f"({floor_div('sx * 1000', 'n', '//')})"
                   f" * {POWER_MDE_PCT}", '100', '//')} AS delta_milli
        FROM g WHERE n >= 2
    )
    SELECT n AS n_observed, s2 AS var_cents2, mean_milli, delta_milli,
           CAST(CASE WHEN delta_milli > 0 THEN
                ({z} * {z} * 2 * s2 + delta_milli * delta_milli - 1)
                // (delta_milli * delta_milli)
                ELSE NULL END AS BIGINT) AS n_per_arm
    FROM p
    """


@declare("q_power_sample_size", oracle=_power_oracle(), tier="P1")
def q_power_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment planning: the per-arm sample size for a two-sample
    test on purchase values at alpha = 0.05 (two-sided), power = 0.80,
    MDE = 5% of the observed mean — n = ceil(2 (z_a + z_b)^2 sigma^2 /
    delta^2) with the z constants pinned in milli-units and sigma^2 the
    exact one-pass cents variance; the ceil is the exact integer
    (num + den - 1) // den. Completes the A/B toolkit's forward
    direction: q_srm_check validates the assignment, q_welch_ttest
    reads the result, q_cohens_d sizes the effect, and this says how
    long to run BEFORE starting. Units: (z milli)^2 x cents^2 over
    (milli-cents)^2 — both (milli-cents)^2, the scales cancel exactly.

    Scale notes: one global map-side-combined aggregation, then scalar
    arithmetic. Variance numerator BIGINT-safe to ~3e6 rows (the
    q_stddev_exact bound); z^2 * 2 * s2 stays under 2^63 while the
    cents variance is below ~6e11."""
    z = POWER_Z_ALPHA_MILLI + POWER_Z_BETA_MILLI
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == WELCH_A)
        .select(F.expr("CAST(floor(value * 100) AS BIGINT)").alias("xc"))
    )
    g = ev.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("xc").cast("long").alias("sx"),
        F.sum(F.expr("xc * xc")).cast("long").alias("sxx"),
    )
    mean = floor_div("sx * 1000", "n")
    p = g.filter(F.col("n") >= 2).select(
        "n",
        F.expr("(n * sxx - sx * sx) div (n * (n - 1))").alias("s2"),
        F.expr(mean).alias("mean_milli"),
        F.expr(
            floor_div(f"({mean}) * {POWER_MDE_PCT}", "100")
        ).alias("delta_milli"),
    )
    return p.select(
        F.col("n").alias("n_observed"),
        F.col("s2").alias("var_cents2"),
        "mean_milli",
        "delta_milli",
        F.expr(
            f"CAST(CASE WHEN delta_milli > 0 THEN"
            f" ({z} * {z} * 2 * s2 + delta_milli * delta_milli - 1)"
            f" div (delta_milli * delta_milli)"
            f" ELSE NULL END AS BIGINT)"
        ).alias("n_per_arm"),
    )
