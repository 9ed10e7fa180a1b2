"""Declared-query registry — the driver-facing contract surface.

Every operator from SURVEY.md §2 registers here via ``@declare``. The driver
runs each ``queries()`` entry in PySpark and (when an oracle is declared) the
matching ANSI SQL in DuckDB over the same parquet fixtures, comparing
row-count + schema + order-insensitive value-hash. Queries without an oracle
(streaming / non-SQL-expressible) get a weaker rows-only check.

Hash-stability rules (SURVEY.md §2): alias every computed column identically
on both sides; aggregate doubles through decimal casts (exact, associative —
immune to partition-order float drift); give every LIMIT/OFFSET a total order
with a unique-key tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class DeclaredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    tier: str  # P0 reference-core, P1 north-star, P2 relational/LLM, P3 streaming


REGISTRY: dict[str, DeclaredQuery] = {}


def declare(name: str, oracle: str | None, tier: str) -> Callable[[QueryFn], QueryFn]:
    def _register(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate declared query {name!r}")
        REGISTRY[name] = DeclaredQuery(name=name, fn=fn, oracle=oracle, tier=tier)
        return fn

    return _register


def _load_all_modules() -> None:
    # Import for side effect: each operator module registers its queries.
    from mysql_to_clickhouse_sync_spark.operators import (  # noqa: F401
        aggregates,
        analytics,
        asof,
        audio_codecs,
        augment,
        behavior,
        bpe,
        bwt,
        clickhouse,
        clustering,
        corpusstats,
        curation,
        dedup,
        featurize,
        filter_pipeline,
        filters,
        ivf,
        ivm,
        joins,
        json_ops,
        kmeans,
        lakehouse,
        linalg,
        mleval,
        mlscore,
        multimodal,
        neardup_pipeline,
        normalize,
        packing,
        profiling,
        quality,
        reshape,
        robust,
        sampling,
        scans,
        similarity,
        sketches,
        skew,
        stats,
        text,
        timeseries,
        tpch,
        trees,
        tscodec,
        wordpiece,
        udtf_ops,
        unigram,
        validation,
        versioning,
        windows,
    )
    from mysql_to_clickhouse_sync_spark.streaming import (  # noqa: F401
        declared as _streaming,
    )
    from mysql_to_clickhouse_sync_spark.streaming import (  # noqa: F401
        joins as _streaming_joins,
    )
    from mysql_to_clickhouse_sync_spark.streaming import (  # noqa: F401
        evolution as _evolution,
    )
    from mysql_to_clickhouse_sync_spark.streaming import (  # noqa: F401
        lakehouse as _lakehouse_stream,
    )
    from mysql_to_clickhouse_sync_spark.streaming import (  # noqa: F401
        matview as _matview,
    )
    from mysql_to_clickhouse_sync_spark.streaming import (  # noqa: F401
        stateful as _stateful,
    )
    from mysql_to_clickhouse_sync_spark.streaming import (  # noqa: F401
        substr as _substr_stream,
    )
    from mysql_to_clickhouse_sync_spark.streaming import (  # noqa: F401
        decontam as _decontam_stream,
    )
    from mysql_to_clickhouse_sync_spark.sources import binlog as _binlog  # noqa: F401
    from mysql_to_clickhouse_sync_spark.streaming import (  # noqa: F401
        binlog_replay as _binlog_replay,
    )


def queries() -> dict[str, QueryFn]:
    _load_all_modules()
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all_modules()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
