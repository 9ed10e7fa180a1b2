"""Streaming-specific session tuning.

Stateful streaming operators instantiate one state store per shuffle
partition PER stateful operator PER micro-batch — with the batch default of
32 partitions, a 2-batch stream-stream join pays 32 x 2 sides x 2 batches
of store open/commit/snapshot overhead for a few thousand rows of state
(measured: 21 s -> 7 s on s_stream_stream_join at sf0.1 by dropping to 4).

The partition count is baked into the query at .start(), so the declared
streaming queries wrap construction+execution in this context manager. The
right number tracks stateful KEY CARDINALITY and per-trigger throughput
(fixtures: 150 users / ~720 windows -> 8), NOT data size at rest; at
production rates you size it to (state size / executor memory) and it can
exceed the batch default. Restores the session default afterwards so batch
queries are unaffected.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession

STREAM_SHUFFLE_PARTITIONS = 8


@contextmanager
def stream_shuffle_partitions(
    spark: SparkSession, n: int = STREAM_SHUFFLE_PARTITIONS
) -> Iterator[None]:
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def tuned(fn=None, *, n: int = STREAM_SHUFFLE_PARTITIONS):
    """Decorator: run a declared streaming query under the streaming
    shuffle-partition setting (place BELOW @declare so the registered
    callable is the tuned one).

    ``@tuned(n=...)`` overrides the count PER STREAM (round 11): the right
    number tracks that stream's stateful key cardinality and, for
    applyInPandasWithState handlers, the Python-worker parallelism — one
    global constant cannot fit both (the round-10 global 8->4 A/B was mixed
    for exactly this reason). Production sizes it to state-size/executor
    memory per the module docstring; these are fixture-cardinality values."""
    import functools

    def deco(f):
        @functools.wraps(f)
        def wrapper(spark: SparkSession, sf_dir: str):
            with stream_shuffle_partitions(spark, n):
                return f(spark, sf_dir)

        return wrapper

    return deco if fn is None else deco(fn)
