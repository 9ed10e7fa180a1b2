"""Deterministic cross-engine hashing.

Spark's native hash()/xxhash64 have no DuckDB twin, so everything that must
verify across engines hashes through md5 and parses a 60-bit prefix — slower
per byte than xxhash64 but portable everywhere md5 exists. Single-engine
pipelines (bucketing, salting) should keep using F.xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hash64(col: Column, seed: str = "") -> Column:
    """Deterministic 60-bit integer hash via md5 — reproducible in any engine
    with md5 + hex parsing (DuckDB: CAST('0x'||substr(md5(..),1,15) AS BIGINT))."""
    salted = F.concat(col, F.lit(seed)) if seed else col
    return F.conv(F.substring(F.md5(salted.cast("binary")), 1, 15), 16, 10).cast(
        "bigint"
    )


def md5_hash64_sql(expr: str, seed: str = "") -> str:
    """The DuckDB twin of md5_hash64."""
    salted = f"{expr} || '{seed}'" if seed else expr
    return f"CAST(concat('0x', substr(md5({salted}), 1, 15)) AS BIGINT)"
