"""ClickHouse DDL generation from Spark schemas — the setup step the
reference leaves to the user.

The reference assumes every ClickHouse table already exists with types
agreeing with MySQL (SURVEY.md §1.2: schema is "inferred per batch", the
tool never creates or checks target tables — mysql_to_clickhouse_sync.py:76
just inserts into whatever is there, and a mismatch surfaces as a runtime
insert error, S:87-89). A user switching a real pipeline needs the target
tables created; this module derives them mechanically from the Spark
`StructType` the extract side already has (parquet/JDBC metadata), so the
sync pipeline is self-contained: schema → DDL → (create) → typed insert.

Two engine presets matter for the reference's semantics:

  * `MergeTree` — plain append target for the bulk snapshot phase.
  * `ReplacingMergeTree(ver)` — the CDC endpoint: ClickHouse keeps the
    max-`ver` row per ORDER BY key at merge time, which is exactly the
    engine's `q_dedup_latest` / `apply_changelog` latest-per-key semantic
    pushed into the target store. Pairing the two keeps the sink idempotent
    under at-least-once micro-batch replay (foreachBatch re-delivery).

Type-mapping notes (ClickHouse rules, not ours): ORDER BY key columns must
not be Nullable — key columns are emitted bare and NULLs in them must be
cleaned upstream (the reference's auto-increment PK can't be NULL anyway,
S:163); Array columns can't be top-level Nullable either, so nullability
moves inside (`Array(Nullable(T))`). DateTime64(6) matches the engine's
µs-floored timestamps (catalog.py nanosAsLong handling).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    ShortType,
    StringType,
    StructType,
    TimestampNTZType,
    TimestampType,
)

_SIMPLE: list[tuple[type, str]] = [
    (ByteType, "Int8"),
    (ShortType, "Int16"),
    (IntegerType, "Int32"),
    (LongType, "Int64"),
    (FloatType, "Float32"),
    (DoubleType, "Float64"),
    (StringType, "String"),
    (BinaryType, "String"),  # CH has no dedicated binary; String is bytes
    (BooleanType, "Bool"),
    (DateType, "Date32"),
    (TimestampType, "DateTime64(6)"),
    (TimestampNTZType, "DateTime64(6)"),
]


def clickhouse_type(dt: DataType, nullable: bool) -> str:
    """Render one Spark type as a ClickHouse type, wrapping Nullable where
    ClickHouse permits it (scalars yes; Array/Map outer no — nullability
    moves to the element/value)."""
    if isinstance(dt, DecimalType):
        base = f"Decimal({dt.precision}, {dt.scale})"
    elif isinstance(dt, ArrayType):
        inner = clickhouse_type(dt.elementType, dt.containsNull)
        return f"Array({inner})"  # Array can't be Nullable in CH
    elif isinstance(dt, MapType):
        # CH Map keys can't be Nullable; values can.
        key = clickhouse_type(dt.keyType, False)
        val = clickhouse_type(dt.valueType, dt.valueContainsNull)
        return f"Map({key}, {val})"
    else:
        for cls, name in _SIMPLE:
            if isinstance(dt, cls):
                base = name
                break
        else:
            raise TypeError(f"no ClickHouse mapping for Spark type {dt}")
    return f"Nullable({base})" if nullable else base


def clickhouse_ddl(
    schema: StructType,
    table: str,
    *,
    order_by: list[str],
    engine: str = "MergeTree",
    version_col: str | None = None,
    partition_by: str | None = None,
    database: str | None = None,
) -> str:
    """CREATE TABLE statement for `schema`. `version_col` switches the engine
    to ReplacingMergeTree(version_col) — the CDC-upsert target."""
    missing = [c for c in order_by if c not in schema.fieldNames()]
    if missing:
        raise ValueError(f"ORDER BY columns not in schema: {missing}")
    if version_col is not None:
        if version_col not in schema.fieldNames():
            raise ValueError(f"version column {version_col!r} not in schema")
        engine = f"ReplacingMergeTree({version_col})"
    cols = []
    for f in schema.fields:
        # Key columns are forced non-Nullable (CH ORDER BY constraint).
        nullable = f.nullable and f.name not in order_by
        cols.append(f"    `{f.name}` {clickhouse_type(f.dataType, nullable)}")
    qualified = f"`{database}`.`{table}`" if database else f"`{table}`"
    lines = [
        f"CREATE TABLE IF NOT EXISTS {qualified} (",
        ",\n".join(cols),
        f") ENGINE = {engine}",
    ]
    if partition_by:
        lines.append(f"PARTITION BY {partition_by}")
    lines.append("ORDER BY (" + ", ".join(f"`{c}`" for c in order_by) + ")")
    return "\n".join(lines)


# Safe in-place widenings ClickHouse applies without rewriting parts:
# integer rank growth, float32 -> float64, and decimal precision growth
# at the SAME scale (values re-encode losslessly). Everything else is a
# rewrite (or a semantic change) and must be a deliberate migration,
# not an automatic drift step — we raise instead of guessing.
_INT_RANK = {ByteType: 1, ShortType: 2, IntegerType: 3, LongType: 4}


def _is_widening(old: DataType, new: DataType) -> bool:
    if old == new:
        return True
    ro = _INT_RANK.get(type(old))
    rn = _INT_RANK.get(type(new))
    if ro is not None and rn is not None:
        return rn >= ro
    if isinstance(old, FloatType) and isinstance(new, DoubleType):
        return True
    if isinstance(old, DecimalType) and isinstance(new, DecimalType):
        return new.scale == old.scale and new.precision >= old.precision
    return False


def alter_table_ddl(
    old: StructType,
    new: StructType,
    table: str,
    *,
    database: str | None = None,
    order_by: list[str] | tuple[str, ...] = (),
) -> list[str]:
    """`ALTER TABLE` statements bringing a ClickHouse table created from
    `old` up to `new` — the TARGET-side half of CDC schema drift (the
    data side is streaming/evolution.py s_cdc_schema_drift: the widest
    schema parses every wire generation; this emits the DDL that makes
    the target accept it). Reference contrast: the tool assumes source
    and target already agree (SURVEY §1.2, mysql_to_clickhouse_sync.py:
    76) and a drifted upstream surfaces as a runtime insert error —
    here the drift becomes explicit, idempotent DDL.

    Semantics: added columns are emitted as `ADD COLUMN IF NOT EXISTS`
    (idempotent under at-least-once replay), ALWAYS Nullable — rows
    serialized before the upstream ALTER carry no value, so the target
    type must admit NULL regardless of the new upstream nullability —
    and positioned with AFTER/FIRST to mirror upstream column order.
    In-place-safe type changes (int widening, float32→float64, decimal
    precision growth at equal scale, non-null→Nullable) become `MODIFY
    COLUMN`; any other change raises ValueError rather than guessing a
    lossy migration. Columns dropped upstream are LEFT IN PLACE:
    inserts that omit them fill defaults, and dropping data is never an
    automatic side effect. Returns [] when schemas already agree (the
    no-op case callers can log-and-skip).

    `order_by` is the target table's ORDER BY key set (what
    snapshot_ddl/cdc_ddl created it with): ClickHouse rejects MODIFY
    COLUMN on key columns (keys can neither change type nor become
    Nullable — the clickhouse_ddl header constraint), so ANY drift on a
    key column — even one that would be a safe widening elsewhere —
    raises the explicit non-widening ValueError here, at plan time,
    instead of surfacing as a runtime DDL rejection on the target."""
    qualified = f"`{database}`.`{table}`" if database else f"`{table}`"
    old_fields = {f.name: f for f in old.fields}
    stmts: list[str] = []
    prev: str | None = None
    for f in new.fields:
        have = old_fields.get(f.name)
        if have is None:
            ctype = clickhouse_type(f.dataType, True)
            pos = f" AFTER `{prev}`" if prev is not None else " FIRST"
            stmts.append(
                f"ALTER TABLE {qualified} ADD COLUMN IF NOT EXISTS"
                f" `{f.name}` {ctype}{pos}"
            )
        elif (have.dataType, have.nullable) != (f.dataType, f.nullable):
            if f.name in order_by:
                raise ValueError(
                    f"drift on ORDER BY key column {f.name!r}: ClickHouse"
                    f" key columns cannot change type or nullability"
                    f" ({have.dataType}/{have.nullable} ->"
                    f" {f.dataType}/{f.nullable})"
                )
            if not _is_widening(have.dataType, f.dataType) or (
                have.nullable and not f.nullable
            ):
                raise ValueError(
                    f"non-widening drift on column {f.name!r}: "
                    f"{have.dataType}/{have.nullable} -> "
                    f"{f.dataType}/{f.nullable}"
                )
            nullable = have.nullable or f.nullable
            stmts.append(
                f"ALTER TABLE {qualified} MODIFY COLUMN"
                f" `{f.name}` {clickhouse_type(f.dataType, nullable)}"
            )
        prev = f.name
    return stmts


def snapshot_ddl(schema: StructType, table: str, rowid: str, **kw) -> str:
    """Bulk-snapshot target: append-only MergeTree ordered by the same
    auto-increment key the reference chunks on (S:163)."""
    return clickhouse_ddl(schema, table, order_by=[rowid], **kw)


def cdc_ddl(
    schema: StructType, table: str, keys: list[str], version_col: str, **kw
) -> str:
    """CDC target: ReplacingMergeTree keyed on the merge keys, versioned by
    the changelog ordering column — ClickHouse-side q_dedup_latest."""
    return clickhouse_ddl(
        schema, table, order_by=keys, version_col=version_col, **kw
    )
