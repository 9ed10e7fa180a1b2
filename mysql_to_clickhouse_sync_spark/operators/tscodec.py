"""Time-series column codecs: DoubleDelta timestamps + Gorilla XOR
floats — ClickHouse parity on the STORAGE side.

The reference's target system compresses time-series columns with
specialized codecs (`CODEC(DoubleDelta)`, `CODEC(Gorilla)` — ClickHouse
SQL reference, Compression Codecs; both from Facebook's Gorilla paper,
Pelkonen et al. VLDB 2015). A sync pipeline that feeds ClickHouse
should understand these layouts, so this module implements both for
real — encoder AND decoder, bit-level (spec-inspired class ladders,
not byte-compatible with ClickHouse's on-disk format):

  * **DoubleDelta** (integers/timestamps): store ts[0] raw, then each
    second difference dd = delta[i] - delta[i-1] in a prefix-coded
    class ladder — '0' for dd == 0 (the overwhelmingly common case for
    near-regular timestamps), '10'+7b / '110'+9b / '1110'+12b for
    zigzagged small values, '1111'+64b escape.
  * **Gorilla** (floats): store bits[0] raw, then per value the XOR
    with the previous value's IEEE-754 bits — '0' when identical,
    '10' + significant bits when the nonzero window fits the previous
    (leading, trailing) window, '11' + 5b leading + 6b (sig_len - 1) +
    significant bits otherwise.

Both stream through the MSB-first bit writer shared with the Rice
codec. The sixth and seventh compressed layouts in the engine, and the
first two that compress COLUMNS rather than media payloads.

Scale notes: shuffle-free mapInPandas over doc_id (the q_png_decode
shape); each row's series is bounded by the geometry law. The float
law keeps every value an exact multiple of 1/8, so the oracle's
checksum is pure integer — no doubles cross the comparison boundary.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.operators.audio_codecs import (
    _MsbBitWriter,
)
from mysql_to_clickhouse_sync_spark.registry import declare

if TYPE_CHECKING:
    import pandas as pd

_TS_MAGIC = b"TS1"
_TS_BASE = 1700000000
_U64 = (1 << 64) - 1


def ts_geometry(doc_id: int) -> tuple[int, int]:
    """(n_points, seed)."""
    return 150 + doc_id % 150, doc_id % 251


def _ts_value(seed: int, i: int) -> int:
    """Timestamp law: near-regular 10s cadence with per-point jitter
    and a 100000s jump every 50 points — exercises the dd == 0 fast path,
    the small classes, AND the escape class."""
    return _TS_BASE + seed + 10 * i + (i % 7) + 100000 * (i // 50)


def _float_scaled(seed: int, i: int) -> int:
    """Float law in eighths: runs of 4 identical values (XOR == 0
    path), small steps (window-reuse path) and a seed offset. The
    actual double is this value / 8.0 — exact in IEEE-754."""
    return seed % 100 + 5 * (i // 4)


def _zz(v: int) -> int:
    return (v << 1) if v >= 0 else (-v << 1) - 1


def _unzz(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _dd_put(w: _MsbBitWriter, dd: int) -> None:
    if dd == 0:
        w.put(0, 1)
        return
    u = _zz(dd)
    if u < (1 << 7):
        w.put(0b10, 2)
        w.put(u, 7)
    elif u < (1 << 9):
        w.put(0b110, 3)
        w.put(u, 9)
    elif u < (1 << 12):
        w.put(0b1110, 4)
        w.put(u, 12)
    else:
        w.put(0b1111, 4)
        w.put(u & _U64, 64)


class _MsbBitReader:
    """Big-int bit cursor: one from_bytes conversion, then every read
    is a C-level shift+mask (the per-bit sibling loop cost ~8 us/bit —
    see the FLAC decoder's rewrite note)."""

    def __init__(self, data: bytes) -> None:
        self.big = int.from_bytes(data, "big")
        self.pos = 0
        self.total = 8 * len(data)

    def read(self, width: int):
        if self.pos + width > self.total:
            return None
        v = (self.big >> (self.total - self.pos - width)) & (
            (1 << width) - 1
        )
        self.pos += width
        return v

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _dd_get(r: _MsbBitReader):
    b = r.read(1)
    if b is None:
        return None
    if b == 0:
        return 0
    b = r.read(1)
    if b is None:
        return None
    if b == 0:
        u = r.read(7)
    else:
        b = r.read(1)
        if b is None:
            return None
        if b == 0:
            u = r.read(9)
        else:
            b = r.read(1)
            if b is None:
                return None
            u = r.read(12) if b == 0 else r.read(64)
    if u is None:
        return None
    return _unzz(u if u < (1 << 63) else u - (1 << 64))


def encode_timeseries(n: int, seed: int) -> bytes:
    """DoubleDelta-encode the timestamp law and Gorilla-encode the
    float law into one framed payload (value stream byte-aligned after
    the timestamp stream)."""
    import struct

    w = _MsbBitWriter()
    ts = [_ts_value(seed, i) for i in range(n)]
    w.put(ts[0] & _U64, 64)
    prev_delta = 0
    for i in range(1, n):
        delta = ts[i] - ts[i - 1]
        _dd_put(w, delta - prev_delta)
        prev_delta = delta
    w.align()

    vals = [_float_scaled(seed, i) for i in range(n)]
    bits = []
    for k in vals:
        (b,) = struct.unpack("<Q", struct.pack("<d", k / 8.0))
        bits.append(b)
    w.put(bits[0], 64)
    prev_lz, prev_sig = -1, -1
    for i in range(1, n):
        x = bits[i] ^ bits[i - 1]
        if x == 0:
            w.put(0, 1)
            continue
        lz = 64 - x.bit_length()
        if lz > 31:
            lz = 31
        tz = (x & -x).bit_length() - 1
        sig = 64 - lz - tz
        if (
            prev_lz >= 0
            and lz >= prev_lz
            and (64 - prev_lz - prev_sig) <= tz
        ):
            w.put(0b10, 2)
            w.put(x >> (64 - prev_lz - prev_sig), prev_sig)
        else:
            w.put(0b11, 2)
            w.put(lz, 5)
            w.put(sig - 1, 6)
            w.put(x >> tz, sig)
            prev_lz, prev_sig = lz, sig
    w.align()
    return _TS_MAGIC + struct.pack("<I", n) + bytes(w.buf)


def decode_timeseries(payload: bytes | None):
    """Real bit-level decode of both streams; returns (n_points,
    ts_sum, value_scaled_sum) where value_scaled_sum is sum(v * 8) as
    exact integers; malformed -> NULLs (quarantine)."""
    import struct

    bad = (None, None, None)
    try:
        if payload is None or len(payload) < 7:
            return bad
        if payload[:3] != _TS_MAGIC:
            return bad
        (n,) = struct.unpack_from("<I", payload, 3)
        if n == 0 or n > 10**6:
            return bad
        r = _MsbBitReader(payload[7:])
        t = r.read(64)
        if t is None:
            return bad
        if t >= (1 << 63):
            t -= 1 << 64
        ts_sum = t
        prev_ts = t
        prev_delta = 0
        for _ in range(n - 1):
            dd = _dd_get(r)
            if dd is None:
                return bad
            prev_delta += dd
            prev_ts += prev_delta
            ts_sum += prev_ts
        r.align()

        b = r.read(64)
        if b is None:
            return bad
        vsum = 0

        def scaled(bits_val: int):
            (v,) = struct.unpack("<d", struct.pack("<Q", bits_val))
            k = v * 8.0
            if k != int(k):
                return None
            return int(k)

        k0 = scaled(b)
        if k0 is None:
            return bad
        vsum += k0
        prev_bits = b
        prev_lz, prev_sig = -1, -1
        for _ in range(n - 1):
            c = r.read(1)
            if c is None:
                return bad
            if c == 0:
                pass  # identical value
            else:
                c = r.read(1)
                if c is None:
                    return bad
                if c == 0:
                    if prev_sig < 0:
                        return bad  # window reuse before any window
                    sigbits = r.read(prev_sig)
                    if sigbits is None:
                        return bad
                    x = sigbits << (64 - prev_lz - prev_sig)
                else:
                    lz = r.read(5)
                    slen = r.read(6)
                    if lz is None or slen is None:
                        return bad
                    sig = slen + 1
                    if lz + sig > 64:
                        return bad
                    sigbits = r.read(sig)
                    if sigbits is None:
                        return bad
                    x = sigbits << (64 - lz - sig)
                    prev_lz, prev_sig = lz, sig
                prev_bits ^= x
            k = scaled(prev_bits)
            if k is None:
                return bad
            vsum += k
        r.align()
        if r.pos != r.total:
            return bad  # trailing garbage
        return (n, ts_sum, vsum)
    except Exception:
        return bad


@declare(
    "q_timeseries_codec",
    oracle="""
    WITH geo AS (
        SELECT doc_id AS media_id,
               150 + doc_id % 150 AS n,
               doc_id % 251 AS seed
        FROM documents
    )
    SELECT media_id,
           CAST(n AS INTEGER) AS n_points,
           CAST(list_sum(list_transform(
                    generate_series(0, n - 1),
                    i -> 1700000000 + seed + 10 * i + (i % 7)
                         + 100000 * (i // 50)
           )) AS BIGINT) AS ts_sum,
           CAST(list_sum(list_transform(
                    generate_series(0, n - 1),
                    i -> seed % 100 + 5 * (i // 4)
           )) AS BIGINT) AS value_scaled_sum
    FROM geo
    """,
    tier="P2",
)
def q_timeseries_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL DoubleDelta + Gorilla decode end to end — the ClickHouse
    column-codec layouts a sync pipeline writes into (`CODEC(
    DoubleDelta)` / `CODEC(Gorilla)`): synthesize each document's
    timestamp + float series, encode both bit-streams, decode them back
    through the full class-ladder / XOR-window walk inside mapInPandas.
    The timestamp law exercises the dd == 0 fast path, every small
    class AND the 64-bit escape; the float law exercises identical-
    value, window-reuse and new-window paths. The float values are
    exact eighths, so value_scaled_sum (sum of v*8) is a pure-integer
    closed form — no doubles cross the oracle boundary."""
    from mysql_to_clickhouse_sync_spark.shipping import ensure_package_shipped

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        # CPU-bound Python codec behind this frame: a single parquet
        # split would serialize the whole decode onto one worker
        # (measured 101 s -> 11 s at the 10x stress) — spread the
        # doc_ids across all cores first; the shuffle moves only ids.
        .repartition(spark.sparkContext.defaultParallelism)
    )
    ensure_package_shipped(spark)

    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("n_points", IntegerType(), True),
            StructField("ts_sum", LongType(), True),
            StructField("value_scaled_sum", LongType(), True),
        ]
    )

    def batches(bt: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in bt:
            rows = []
            for d in batch["doc_id"]:
                d = int(d)
                n, seed = ts_geometry(d)
                np_, tsum, vsum = decode_timeseries(
                    encode_timeseries(n, seed)
                )
                rows.append((d, np_, tsum, vsum))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_points", "ts_sum", "value_scaled_sum"],
            )

    return docs.mapInPandas(batches, schema=out_schema)


# --- ZigZag + LEB128 varint column codec ------------------------------------
#
# The protobuf wire format's integer layout (also Parquet's ULEB128 length
# headers and Thrift's zigzag varints — all public specs): zigzag folds the
# sign into bit 0 (0,-1,1,-2 -> 0,1,2,3), then base-128 little-endian groups
# with a continuation MSB per byte. Unlike the bit-stream codecs above, the
# encoded SIZE has a closed form — bytes(v) = ceil(bit_length(zigzag(v))/7),
# min 1 — so the oracle verifies the real encoder's compression ratio
# exactly, not just the lossless round trip.

_VARINT_MAGIC = b"VI1"


def varint_geometry(doc_id: int) -> tuple[int, int]:
    """(n_values, seed)."""
    return 200 + doc_id % 200, doc_id % 97


def _varint_value(seed: int, i: int) -> int:
    """Value law: small signed deltas (1-byte codes) with a periodic
    large spike (multi-byte codes) — both LEB128 paths provably
    exercised for every document."""
    v = (seed + i) % 19 - 9
    if i % 31 == 0:
        v += seed * 100_000 + i * 977
    return v


def encode_varints(n: int, seed: int) -> bytes:
    """ZigZag + LEB128 encode the value law (framed)."""
    import struct

    out = bytearray()
    for i in range(n):
        u = _zz(_varint_value(seed, i))
        while True:
            b = u & 0x7F
            u >>= 7
            if u:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    return _VARINT_MAGIC + struct.pack("<I", n) + bytes(out)


def decode_varints(payload: bytes | None):
    """Real LEB128 walk; returns (n_values, payload_bytes, value_sum)
    with exact stream-exhaustion checking; malformed -> NULLs."""
    import struct

    bad = (None, None, None)
    try:
        if payload is None or len(payload) < 7:
            return bad
        if payload[:3] != _VARINT_MAGIC:
            return bad
        (n,) = struct.unpack_from("<I", payload, 3)
        if n == 0 or n > 10**6:
            return bad
        data = payload[7:]
        pos = 0
        vsum = 0
        for _ in range(n):
            u = 0
            shift = 0
            while True:
                if pos >= len(data) or shift > 63:
                    return bad  # truncated or over-wide varint
                b = data[pos]
                pos += 1
                u |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            vsum += _unzz(u)
        if pos != len(data):
            return bad  # trailing garbage: zero-slack stream check
        return (n, len(data), vsum)
    except Exception:
        return bad


@declare(
    "q_varint_codec",
    oracle="""
    WITH geo AS (
        SELECT doc_id AS media_id,
               200 + doc_id % 200 AS n,
               doc_id % 97 AS seed
        FROM documents
    ), vals AS (
        SELECT media_id, n,
               (seed + i) % 19 - 9
                   + CASE WHEN i % 31 = 0
                          THEN seed * 100000 + i * 977 ELSE 0 END AS v
        FROM geo, unnest(generate_series(0, n - 1)) AS t(i)
    ), zz AS (
        SELECT media_id, n, v,
               CASE WHEN v >= 0 THEN 2 * v ELSE -2 * v - 1 END AS u
        FROM vals
    )
    SELECT media_id,
           CAST(max(n) AS INTEGER) AS n_values,
           CAST(sum(CASE WHEN u = 0 THEN 1
                    ELSE (length(bin(u)) + 6) // 7 END) AS BIGINT)
               AS payload_bytes,
           CAST(sum(v) AS BIGINT) AS value_sum
    FROM zz GROUP BY media_id
    """,
    tier="P2",
)
def q_varint_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZigZag + LEB128 varint column codec (the protobuf/Parquet/Thrift
    integer wire layout) decoded for real — and, uniquely in the codec
    suite, with the encoded SIZE verified closed-form: the oracle
    computes ceil(bit_length(zigzag(v))/7) per value from the synthesis
    law and must equal the real encoder's byte count exactly, so the
    hash check pins the continuation-bit layout itself, not just the
    round trip. The value law forces both the 1-byte and multi-byte
    paths in every document; the decoder enforces zero-slack stream
    exhaustion and a 10-byte varint bound.

    Scale notes: shuffle-free mapInPandas keyed by doc_id, series
    bounded by the geometry law — the q_timeseries_codec shape,
    repartitioned to full parallelism (CPU-bound Python; see
    q_tiff_decode)."""
    from mysql_to_clickhouse_sync_spark.shipping import ensure_package_shipped

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        # CPU-bound Python codec behind this frame: a single parquet
        # split would serialize the whole decode onto one worker
        # (measured 101 s -> 11 s at the 10x stress) — spread the
        # doc_ids across all cores first; the shuffle moves only ids.
        .repartition(spark.sparkContext.defaultParallelism)
    )
    ensure_package_shipped(spark)

    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("n_values", IntegerType(), True),
            StructField("payload_bytes", LongType(), True),
            StructField("value_sum", LongType(), True),
        ]
    )

    def batches(bt: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in bt:
            rows = []
            for d in batch["doc_id"]:
                d = int(d)
                n, seed = varint_geometry(d)
                np_, nbytes, vsum = decode_varints(encode_varints(n, seed))
                rows.append((d, np_, nbytes, vsum))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_values", "payload_bytes", "value_sum"],
            )

    return docs.mapInPandas(batches, schema=out_schema)
