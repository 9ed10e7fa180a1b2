"""Distributed linear algebra over the embeddings table — the PCA /
random-projection toolkit of an embedding-curation pipeline, exact-integer
end to end:

  * q_cov_matrix — the upper-triangular 64x64 covariance of the
                   grid-quantized embedding matrix as exact integer
                   numerators cov_num = n*Sxy - Sx*Sy (the one-pass
                   textbook identity; divide by n^2 only when a float
                   covariance is actually needed).
  * q_pca_power  — the dominant eigenvector of that covariance by THREE
                   unrolled power-iteration rounds in Q14 fixed point
                   with L-infinity normalization (no square roots —
                   engine-parity-safe), plus the final iteration norm
                   (the un-normalized eigenvalue scale).
  * q_jl_project — Johnson-Lindenstrauss projection 64 -> 16 dims with a
                   Rademacher (+-1) matrix drawn from md5(k:d) bits, and
                   its own distortion audit on a bounded vector panel:
                   E[<Ra, Rb>] = K * <a, b>, so est = dot16 / K is an
                   unbiased estimate of the true dot — the audit reports
                   the exact integer error per pair.

Why this shape at 100 TB: covariance is ONE map-side-combined shuffle of
D*(D+1)/2 cell partials (the data is touched once); the eigensolve then
runs on a 64x64 table that broadcasts — the classic "reduce to a tiny
Gram matrix, solve centrally" decomposition, except even the central
solve stays a (tiny) dataframe program with a DuckDB oracle. JL
projection is a broadcast of a 1024-row sign matrix and one
(vec, out-dim) shuffle.

Overflow discipline (documented bounds, all BIGINT):
  - cov_num <= n^2 * GRID^2: safe to n ~ 3e6 vectors; beyond that,
    DECIMAL(38,0) for the two products (the q_auc_roc note).
  - power iteration rescales A by ceil(max|cov_num| / 1024) with a
    positivity-offset floor div (covariances CAN be negative —
    truncating vs floor div differ there; the offset makes both engines
    floor), so iteration arithmetic is bounded ~2^30 INDEPENDENT of n.

The reference (mysql_to_clickhouse_sync) moves rows; it has no linear
algebra (SURVEY.md §2.8). These are north-star pipeline extensions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.registry import declare

LA_DIM = 64  # embedding width of the fixture table
LA_GRID = 1024  # element quantization: floor(x * 1024) is float-exact

# --- q_cov_matrix ------------------------------------------------------------

_COV_CTE = f"""
    qvs AS (
        SELECT vec_id,
               list_transform(embedding,
                   v -> CAST(floor(CAST(v AS DOUBLE) * {LA_GRID}) AS BIGINT))
                   AS qv
        FROM embeddings
    ), cells AS (
        SELECT i.i, j.j,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(qv[i.i + 1] * qv[j.j + 1]) AS BIGINT) AS sxy,
               CAST(sum(qv[i.i + 1]) AS BIGINT) AS sx,
               CAST(sum(qv[j.j + 1]) AS BIGINT) AS sy
        FROM qvs
        CROSS JOIN (SELECT unnest(generate_series(0, {LA_DIM - 1})) AS i) i
        CROSS JOIN (SELECT unnest(generate_series(0, {LA_DIM - 1})) AS j) j
        WHERE i.i <= j.j
        GROUP BY i.i, j.j
    ), cov AS (
        SELECT i, j, n, (n * sxy - sx * sy) AS cov_num FROM cells
    )"""


_GRAM_SCHEMA = "i long, j long, n long, sxy long, sx long, sy long"


def _gram_partials(batches):
    """Per-Arrow-batch integer Gram partials: X^T X, column sums and row
    count as 2080 upper-triangular cells. numpy int64 matmul is exact
    under the module's documented cov bound; a JVM HOF pair-explode of
    the same cells is interpreted (not codegen) and measured 10x slower
    at 10x scale — this is the legitimate vectorized-Python slot."""
    import numpy as np
    import pandas as pd

    iu, ju = np.triu_indices(LA_DIM)
    for pdf in batches:
        if pdf.empty:
            continue
        x = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
        g = x.T @ x
        s = x.sum(axis=0, dtype=np.int64)
        yield pd.DataFrame(
            {
                "i": iu.astype("int64"),
                "j": ju.astype("int64"),
                "n": np.full(iu.shape, x.shape[0], dtype="int64"),
                "sxy": g[iu, ju],
                "sx": s[iu],
                "sy": s[ju],
            }
        )


@declare(
    "q_cov_matrix",
    oracle=f"""
    WITH {_COV_CTE}
    SELECT i, j, n, cov_num FROM cov
    """,
    tier="P2",
)
def q_cov_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact upper-triangular covariance of the grid-quantized embedding
    matrix: cov_num = n*sum(x_i x_j) - sum(x_i) sum(x_j) per dim pair
    (i <= j), the one-pass identity — true covariance is cov_num / n^2,
    left as an exact integer numerator so downstream consumers (the
    power iteration, whitening, feature pruning) stay bitwise
    engine-identical. 2080 output cells regardless of corpus size.

    Scale notes: each Arrow batch contributes one numpy X^T X partial
    MAP-SIDE (the data is read once; the shuffle carries only
    cells x partitions rows into the (i, j)-keyed sum). This is the
    canonical distributed Gram/covariance shape; BIGINT-safe to ~3e6
    vectors (module docstring)."""
    from mysql_to_clickhouse_sync_spark.shipping import (
        ensure_package_shipped,
    )

    ensure_package_shipped(spark)
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            F.expr(
                f"transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE)"
                f" * {LA_GRID}) AS BIGINT))"
            ).alias("qv")
        )
        # single-split parquet would serialize the Gram work onto one
        # worker — the codec round-robin exchange (PLANS.md round 5)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    cells = (
        emb.mapInPandas(_gram_partials, schema=_GRAM_SCHEMA)
        .groupBy("i", "j")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sxy").cast("long").alias("sxy"),
            F.sum("sx").cast("long").alias("sx"),
            F.sum("sy").cast("long").alias("sy"),
        )
    )
    return cells.select(
        "i",
        "j",
        "n",
        F.expr("n * sxy - sx * sy").alias("cov_num"),
    )


# --- q_pca_power -------------------------------------------------------------

PCA_ROUNDS = 3
PCA_Q = 1 << 14  # eigenvector fixed point (Q14)
_A_Q = 1024  # normalized-matrix magnitude: |a| <= ~_A_Q after rescale
_A_OFF = 2 * _A_Q  # positivity offset for the matrix floor-div
_V_OFF = 1 << 15  # positivity offset for the normalization floor-div
# Rescaling A by ceil(max|cov_num| / _A_Q) bounds every matvec term by
# 64 * _A_Q * PCA_Q ~ 2^30 REGARDLESS of corpus size — the iteration's
# arithmetic never grows with n (eigenvectors are scale-invariant).


def _pca_cte() -> str:
    """WITH-body (no leading WITH) through the final iterate
    v{PCA_ROUNDS}(d, v) / m{PCA_ROUNDS}(m) — shared by q_pca_power and
    q_component_removal."""
    rounds = []
    prev = "v0"
    for r in range(1, PCA_ROUNDS + 1):
        rounds.append(
            f"""u{r} AS (
        SELECT a.i AS d, CAST(sum(a.a * v.v) AS BIGINT) AS u
        FROM asym a JOIN {prev} v ON v.d = a.j
        GROUP BY a.i
    ), m{r} AS (
        SELECT CAST(max(abs(u)) AS BIGINT) AS m FROM u{r}
    ), v{r} AS (
        SELECT d, (u * {PCA_Q} + {_V_OFF} * m) // m - {_V_OFF} AS v
        FROM u{r} CROSS JOIN m{r}
    )"""
        )
        prev = f"v{r}"
    chain = ",\n    ".join(rounds)
    a_sql = f"(cov_num + {_A_OFF} * ds) // ds - {_A_OFF}"
    return f"""{_COV_CTE},
    cmax AS (
        SELECT (CAST(max(abs(cov_num)) AS BIGINT) + {_A_Q - 1}) // {_A_Q}
                   AS ds
        FROM cov
    ), asym AS (
        SELECT i, j, {a_sql} AS a FROM cov CROSS JOIN cmax
        UNION ALL
        SELECT j, i, {a_sql} AS a FROM cov CROSS JOIN cmax WHERE i <> j
    ), v0 AS (
        SELECT unnest(generate_series(0, {LA_DIM - 1})) AS d,
               CAST({PCA_Q} AS BIGINT) AS v
    ),
    {chain}"""


def _pca_oracle() -> str:
    return f"""
    WITH {_pca_cte()}
    SELECT v{PCA_ROUNDS}.d AS dim, v{PCA_ROUNDS}.v AS v_q14,
           m{PCA_ROUNDS}.m AS iter_norm
    FROM v{PCA_ROUNDS} CROSS JOIN m{PCA_ROUNDS}
    """


@declare("q_pca_power", oracle=_pca_oracle(), tier="P2")
def q_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the embedding covariance by three
    unrolled power-iteration rounds, entirely in BIGINT: the covariance
    numerators rescale by 2^20 (positivity-offset floor-div — they can
    be negative), v starts all-ones in Q14, and each round is one
    matvec + an L-infinity normalization (max |u| — no square root,
    which would not be engine-exact). Emits the Q14 iterate and the
    final iteration norm (the eigenvalue up to the known scales). The
    declared contract is the exact ITERATION (each round provably
    raises the Rayleigh quotient); on a spectrum with a real gap three
    rounds reach the dominant eigenvector to cos > 0.99 (pinned on a
    planted spike in tests/test_linalg.py — the fixture embeddings are
    near-isotropic, lam1/lam2 ~ 1.07, so no iteration count converges
    THERE; production runs more rounds or deflates as needed). The
    first step of whitening / top-component removal in embedding
    curation (e.g. the common "remove the dominant direction before
    similarity" trick).

    Scale notes: the data is touched ONCE (inside q_cov_matrix's cell
    shuffle); all three rounds run on the broadcast 64x64 table — a
    4096-row join each, independent of corpus size. This is how PCA
    actually scales: reduce to the Gram matrix, solve tiny."""
    cov = q_cov_matrix(spark, sf_dir).localCheckpoint(eager=True)
    cmax = cov.agg(
        F.expr(
            f"(CAST(max(abs(cov_num)) AS BIGINT) + {_A_Q - 1})"
            f" div {_A_Q}"
        ).alias("ds")
    )
    covs = cov.crossJoin(F.broadcast(cmax))
    a_expr = f"(cov_num + {_A_OFF} * ds) div ds - {_A_OFF}"
    asym = (
        covs.select("i", "j", F.expr(a_expr).alias("a"))
        .unionAll(
            covs.filter(F.col("i") != F.col("j")).select(
                F.col("j").alias("i"),
                F.col("i").alias("j"),
                F.expr(a_expr).alias("a"),
            )
        )
        .localCheckpoint(eager=True)
    )
    spark_ = cov.sparkSession
    v = spark_.range(LA_DIM).select(
        F.col("id").cast("long").alias("d"),
        F.lit(PCA_Q).cast("long").alias("v"),
    )
    m = None
    for _ in range(PCA_ROUNDS):
        u = (
            asym.join(F.broadcast(v), F.col("j") == F.col("d"))
            .groupBy("i")
            .agg(F.sum(F.expr("a * v")).cast("long").alias("u"))
        )
        m = u.agg(F.max(F.abs(F.col("u"))).cast("long").alias("m"))
        v = (
            u.crossJoin(F.broadcast(m))
            .select(
                F.col("i").alias("d"),
                F.expr(
                    f"(u * {PCA_Q} + {_V_OFF} * m) div m - {_V_OFF}"
                ).alias("v"),
            )
        )
    return v.crossJoin(F.broadcast(m)).select(
        F.col("d").alias("dim"),
        F.col("v").alias("v_q14"),
        F.col("m").alias("iter_norm"),
    )


# --- q_jl_project ------------------------------------------------------------

JL_K = 16  # projected width
JL_PANEL = 100  # distortion-audit panel: vec_id < JL_PANEL


def _jl_oracle() -> str:
    u = (
        "CAST('0x' || substr(md5(CAST(k.k AS VARCHAR) || ':'"
        " || CAST(d.d AS VARCHAR)), 1, 12) AS BIGINT)"
    )
    return f"""
    WITH r AS (
        SELECT k.k, d.d, 1 - 2 * ({u} % 2) AS sgn
        FROM (SELECT unnest(generate_series(0, {JL_K - 1})) AS k) k
        CROSS JOIN (SELECT unnest(generate_series(0, {LA_DIM - 1})) AS d) d
    ), qvs AS (
        SELECT vec_id,
               list_transform(embedding,
                   v -> CAST(floor(CAST(v AS DOUBLE) * {LA_GRID}) AS BIGINT))
                   AS qv
        FROM embeddings WHERE vec_id < {JL_PANEL}
    ), proj AS (
        SELECT qvs.vec_id, r.k,
               CAST(sum(r.sgn * qv[r.d + 1]) AS BIGINT) AS y
        FROM qvs CROSS JOIN r
        GROUP BY qvs.vec_id, r.k
    ), pv AS (
        SELECT vec_id, list(y ORDER BY k) AS yv FROM proj GROUP BY vec_id
    ), pairs AS (
        SELECT a.vec_id AS va, b.vec_id AS vb,
               list_reduce(list_transform(list_zip(a.qv, b.qv),
                           p -> p[1] * p[2]), (x, y) -> x + y) AS dot_true
        FROM qvs a JOIN qvs b ON a.vec_id < b.vec_id
    ), ppro AS (
        SELECT pairs.va, pairs.vb, pairs.dot_true,
               list_reduce(list_transform(list_zip(pa.yv, pb.yv),
                           p -> p[1] * p[2]), (x, y) -> x + y) AS dot_proj
        FROM pairs JOIN pv pa ON pa.vec_id = pairs.va
                   JOIN pv pb ON pb.vec_id = pairs.vb
    )
    SELECT va, vb, dot_true,
           (dot_proj + {JL_K} * {1 << 40}) // {JL_K} - {1 << 40} AS dot_est,
           abs((dot_proj + {JL_K} * {1 << 40}) // {JL_K} - {1 << 40}
               - dot_true) AS abs_err
    FROM ppro
    """


@declare("q_jl_project", oracle=_jl_oracle(), tier="P2")
def q_jl_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sketch with its own distortion audit: a
    Rademacher +-1 matrix (sign = low bit of md5(k:d) — the same
    hash-parity recipe as q_feature_hash) projects 64-dim grid vectors
    to 16 dims; for every pair in the bounded audit panel
    (vec_id < 100, the ground-truth-twin convention) the query reports
    the true integer dot, the unbiased estimate dot_proj/K
    (E[<Ra,Rb>] = K<a,b> for Rademacher rows; positivity-offset floor
    div — projected dots go negative), and the exact error. This is the
    audit a pipeline runs before trusting a sketched similarity index;
    the production projection is the same broadcast-R map over the full
    corpus.

    Scale notes: R is a 1024-row broadcast; projection is one
    (vec, k)-keyed map-side-combined shuffle (16 rows out per vector).
    The quadratic pair audit is panel-bounded, constant cost at every
    SF — exactly like q_dedup_recall's bounded ground truth."""
    u = (
        "CAST(conv(substr(md5(concat(CAST(k AS STRING), ':',"
        " CAST(d AS STRING))), 1, 12), 16, 10) AS BIGINT)"
    )
    spark_r = spark.range(JL_K).select(
        F.col("id").cast("long").alias("k")
    )
    r = (
        spark_r.crossJoin(
            spark.range(LA_DIM).select(F.col("id").cast("long").alias("d"))
        )
        .select(
            "k",
            "d",
            F.expr(f"1 - 2 * ({u} % 2)").cast("long").alias("sgn"),
        )
    )
    qvs = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < JL_PANEL
    ).select(
        "vec_id",
        F.expr(
            f"transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE)"
            f" * {LA_GRID}) AS BIGINT))"
        ).alias("qv"),
    )
    proj = (
        qvs.crossJoin(F.broadcast(r))
        .groupBy("vec_id", "k")
        .agg(F.sum(F.expr("sgn * qv[d]")).cast("long").alias("y"))
    )
    pv = proj.groupBy("vec_id").agg(
        F.expr(
            "transform(sort_array(collect_list(named_struct('k', k,"
            " 'y', y))), s -> s.y)"
        ).alias("yv")
    )
    a = qvs.select(
        F.col("vec_id").alias("va"), F.col("qv").alias("qa")
    )
    b = qvs.select(F.col("vec_id").alias("vb"), F.col("qv").alias("qb"))
    pairs = a.join(F.broadcast(b), F.col("va") < F.col("vb")).select(
        "va",
        "vb",
        F.aggregate(
            F.zip_with("qa", "qb", lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("dot_true"),
    )
    pa = pv.select(F.col("vec_id").alias("va"), F.col("yv").alias("ya"))
    pb = pv.select(F.col("vec_id").alias("vb"), F.col("yv").alias("yb"))
    ppro = (
        pairs.join(F.broadcast(pa), "va")
        .join(F.broadcast(pb), "vb")
        .withColumn(
            "dot_proj",
            F.aggregate(
                F.zip_with("ya", "yb", lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )
    )
    est = f"(dot_proj + {JL_K} * {1 << 40}) div {JL_K} - {1 << 40}"
    return ppro.select(
        "va",
        "vb",
        "dot_true",
        F.expr(est).alias("dot_est"),
        F.expr(f"abs({est} - dot_true)").alias("abs_err"),
    )


# --- q_component_removal -----------------------------------------------------

CR_PANEL = 100  # audit panel: vec_id < CR_PANEL
_CR_VQ = 128  # eigenvector down-scale Q14 -> Q7 for the removal products
_CR_OFF = 1 << 10  # positivity offset for that floor-div (v has signs)
# exact floor(p2 * 1e6 / den) in two *1000 steps: p2, den <= ~2^47, so a
# direct *1e6 would overflow; q1 = p2*1000 // den, then (r1*1000 // den)
# stays under 2^57 throughout. Same decomposition on both engines.
_RATIO_SQL = (
    "(proj * proj * 1000 // den) * 1000"
    " + ((proj * proj * 1000 - (proj * proj * 1000 // den) * den)"
    " * 1000 // den)"
)


def _component_removal_oracle() -> str:
    return f"""
    WITH {_pca_cte()},
    vr AS (
        SELECT d, (v + {_CR_OFF} * {_CR_VQ}) // {_CR_VQ} - {_CR_OFF} AS vr
        FROM v{PCA_ROUNDS}
    ), vvt AS (
        SELECT CAST(sum(vr * vr) AS BIGINT) AS vv FROM vr
    ), panel AS (
        SELECT vec_id, d.d, qv[d.d + 1] AS x
        FROM qvs
        CROSS JOIN (SELECT unnest(generate_series(0, {LA_DIM - 1})) AS d) d
        WHERE vec_id < {CR_PANEL}
    ), sums AS (
        SELECT panel.vec_id,
               CAST(sum(panel.x * vr.vr) AS BIGINT) AS proj,
               CAST(sum(panel.x * panel.x) AS BIGINT) AS xx
        FROM panel JOIN vr ON vr.d = panel.d
        GROUP BY panel.vec_id
    ), den0 AS (
        SELECT sums.*, vvt.vv, xx * vvt.vv AS den FROM sums CROSS JOIN vvt
    )
    SELECT vec_id, proj, xx, vv,
           CAST(den - proj * proj AS BIGINT) AS resid_num,
           CAST({_RATIO_SQL} AS BIGINT) AS removed_ratio_micro
    FROM den0
    """


@declare(
    "q_component_removal", oracle=_component_removal_oracle(), tier="P2"
)
def q_component_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant-component removal audit — the standard "drop the top
    principal direction before similarity" trick (common-crawl-style
    embedding pipelines do this to kill the corpus-wide mean/style
    direction): for each panel vector, the exact projection onto the
    q_pca_power iterate (down-scaled to Q7 so every product stays in
    BIGINT), the residual norm numerator |x|^2|v|^2 - <x,v>^2 (>= 0 by
    Cauchy-Schwarz — an in-query invariant), and the removed-variance
    share <x,v>^2 / (|x|^2|v|^2) in exact micro-units via a two-step
    *1000 floor decomposition (a direct *1e6 would overflow).

    Scale notes: the eigenvector is a 64-row broadcast; the projection
    is one map-side dot per vector and the panel bound keeps the audit
    constant-cost (production removes the component corpus-wide with
    the same broadcast map — linear, shuffle-free)."""
    v = q_pca_power(spark, sf_dir).localCheckpoint(eager=True)
    vr = v.select(
        F.col("dim").alias("d"),
        F.expr(
            f"(v_q14 + {_CR_OFF} * {_CR_VQ}) div {_CR_VQ} - {_CR_OFF}"
        ).alias("vr"),
    )
    vvt = vr.agg(F.sum(F.expr("vr * vr")).cast("long").alias("vv"))
    qvs = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < CR_PANEL
    ).select(
        "vec_id",
        F.expr(
            f"transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE)"
            f" * {LA_GRID}) AS BIGINT))"
        ).alias("qv"),
    )
    panel = qvs.select(
        "vec_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {LA_DIM - 1}),"
                f" d -> named_struct('d', CAST(d AS BIGINT), 'x', qv[d]))"
            )
        ).alias("c"),
    ).select("vec_id", "c.d", "c.x")
    sums = (
        panel.join(F.broadcast(vr), "d")
        .groupBy("vec_id")
        .agg(
            F.sum(F.expr("x * vr")).cast("long").alias("proj"),
            F.sum(F.expr("x * x")).cast("long").alias("xx"),
        )
    )
    den0 = sums.crossJoin(F.broadcast(vvt)).withColumn(
        "den", F.expr("xx * vv")
    )
    ratio = _RATIO_SQL.replace("//", "div")
    return den0.select(
        "vec_id",
        "proj",
        "xx",
        "vv",
        F.expr("den - proj * proj").cast("long").alias("resid_num"),
        F.expr(ratio).cast("long").alias("removed_ratio_micro"),
    )
