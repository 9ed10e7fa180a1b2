"""Shared column-expression library.

Every builder here returns a JVM-side Column expression (whole-stage
codegen, no Python workers) plus, where the declared-query oracles need it,
the DuckDB-SQL twin of the exact same arithmetic — the pairing that makes
hash-exact cross-engine verification possible. Operators import from here;
nothing here reads tables or registers queries.
"""

from mysql_to_clickhouse_sync_spark.functions.hashing import (  # noqa: F401
    md5_hash64,
    md5_hash64_sql,
)
from mysql_to_clickhouse_sync_spark.functions.textexpr import (  # noqa: F401
    NORM_TEXT_SQL,
    norm_text,
    tokens,
)
from mysql_to_clickhouse_sync_spark.functions.vectors import (  # noqa: F401
    DOT_SQL,
    NORM_SQL,
    dot,
    with_norm,
)
