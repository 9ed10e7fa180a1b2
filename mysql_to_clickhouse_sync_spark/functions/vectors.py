"""Vector arithmetic over `array<float>` embedding columns.

Float determinism contract (shared by similarity / IVF / clustering): every
dot product is a sequential left-fold over double-cast elements — Spark's
`F.aggregate` and DuckDB's `list_reduce` both fold left starting from +0.0,
so the two engines produce bitwise-identical doubles and oracles compare
exactly, no rounding. Keep any new vector expression on this pattern.

Scale notes: these are pure codegen expressions (no shuffle, no Python).
Norms must be attached once per vector (`with_norm`) BEFORE any pair join —
recomputing inside the join multiplies the flops by the candidate count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double — deterministic and
    engine-portable (matches DuckDB list_reduce exactly)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


DOT_SQL = """
    list_reduce(list_transform(list_zip({a}, {b}),
                p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                (x, y) -> x + y)
"""


def with_norm(df: DataFrame, vec: str = "embedding") -> DataFrame:
    """Attach the L2 norm once per vector (never recompute per pair)."""
    return df.withColumn("norm", F.sqrt(dot(F.col(vec), F.col(vec))))


NORM_SQL = f"sqrt({DOT_SQL.format(a='embedding', b='embedding')})"
