"""Degenerate-bucket guard for LSH candidate generation.

Every banded near-dup path (MinHash bands, sign-LSH bands, SimHash
pigeonhole chunks) generates candidates through a bucket self-join, whose
cost is sum over buckets of n_b^2. At 100 TB one degenerate bucket —
empty-text shingles, all-zero vectors, a boilerplate header shared by
millions of docs — turns that term quadratic while every healthy bucket
stays tiny. The guard caps bucket size BEFORE the self-join: rows in
buckets above the cap are excluded from candidate generation and the
dropped buckets are returned as an audit table (bucket key + size), so the
pipeline degrades explicitly (documented recall loss on pathological keys)
instead of melting.

Dropping — not sampling — is the right default for near-dup: a bucket with
10^6 members is, overwhelmingly, one equivalence class of junk that exact
dedup already collapses cheaply; enumerating its pairs adds nothing but
cost. Callers that need those classes can route the audit table to exact
dedup on the bucket key.

Cost of the guard itself: one map-side-combinable count per bucket key and
a broadcast anti-join against the (tiny, <= n/cap rows) oversize-key set —
strictly cheaper than a single oversize bucket's self-join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Default cap: a bucket this size contributes ~cap^2/2 = 1.25e5 pairs —
# bounded work; anything bigger is a degenerate key at fixture scale AND at
# 100 TB (healthy LSH cells hold tens of rows; see PLANS.md band-dial data).
DEFAULT_MAX_BUCKET = 500


def cap_buckets(
    bands: DataFrame,
    key_cols: Sequence[str],
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> tuple[DataFrame, DataFrame]:
    """Split a banding table into (kept, dropped_audit).

    kept: rows whose bucket has <= max_bucket members — safe to self-join.
    dropped_audit: one row per EXCLUDED bucket: (*key_cols, bucket_n).
    """
    sizes = bands.groupBy(*key_cols).agg(F.count("*").alias("bucket_n"))
    big = sizes.filter(F.col("bucket_n") > max_bucket)
    kept = bands.join(
        F.broadcast(big.select(*key_cols)), list(key_cols), "left_anti"
    )
    return kept, big
