"""Block-sorting compression: the bzip2 pipeline over real document text.

The SIXTH entropy-coding family in the engine — block sorting — and the
first codec whose input is the corpus's OWN text rather than a synthetic
law: per document, the normalized text is split into 256-byte blocks,
each block Burrows-Wheeler transformed (suffix sort of cyclic rotations,
primary index kept), the transformed stream move-to-front coded, zero
runs run-length coded (MTF output is zero-heavy by construction — that
IS the point of the BWT), and the result entropy-coded by the engine's
own adaptive order-0 range coder (`_rc_encode_syms`, the q_range_decode
machinery — the full bzip2 shape: BWT → MTF → RLE → entropy coder,
Burrows & Wheeler 1994 / Seward's bzip2). The decoder inverts every
stage for real: range decode with lockstep model state and zero-slack
end check, RLE expansion, MTF restore, and inverse BWT via the LF
mapping (counting sort + rank walk).

Oracle shape: lossless round trip over real data means the outputs
(byte count + byte sum of the DECODED text) are computable by DuckDB
directly from the documents table — the codec never has to be
re-implemented in SQL, exactly like the media codecs' closed-form laws,
but grounded in actual corpus bytes.

Scale notes: shuffle-free mapInPandas over (doc_id, normalized text);
per-block cost is bounded (256-byte blocks: the rotation sort compares
C-level byte slices), linear in corpus bytes.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.operators.multimodal import (
    _rc_decode_syms,
    _rc_encode_syms,
)
from mysql_to_clickhouse_sync_spark.registry import declare

if TYPE_CHECKING:
    import pandas as pd

_BWT_MAGIC = b"BZ5"
BWT_BLOCK = 256
_BWT_MAX_BYTES = 1 << 22  # bomb bound on the declared decode


def _bwt_forward(block: bytes) -> tuple[bytes, int]:
    """(last column, primary index) of the cyclic-rotation sort."""
    n = len(block)
    doubled = block + block
    order = sorted(range(n), key=lambda i: doubled[i : i + n])
    idx = order.index(0)
    last = bytes(block[(i - 1) % n] for i in order)
    return last, idx


def _bwt_inverse(last: bytes, idx: int):
    """Invert via the LF mapping: stable-sort positions by symbol gives
    the first column's row order; walking it from the primary row
    reproduces the original block. None on an invalid index."""
    n = len(last)
    if not 0 <= idx < n:
        return None
    order = sorted(range(n), key=lambda i: (last[i], i))
    out = bytearray()
    p = order[idx]
    for _ in range(n):
        out.append(last[p])
        p = order[p]
    return bytes(out)


def _mtf_encode(data: bytes) -> list[int]:
    alpha = list(range(256))
    out = []
    for b in data:
        r = alpha.index(b)
        out.append(r)
        del alpha[r]
        alpha.insert(0, b)
    return out


def _mtf_decode(ranks) -> bytes | None:
    alpha = list(range(256))
    out = bytearray()
    for r in ranks:
        if not 0 <= r < 256:
            return None
        b = alpha[r]
        out.append(b)
        del alpha[r]
        alpha.insert(0, b)
    return bytes(out)


def _rle0_encode(ranks) -> list[int]:
    """Zero-run coding of the MTF stream: literal 1..255 pass through;
    a run of k zeros becomes 0 followed by LEB128(k - 1) in 7-bit
    groups re-expressed as symbols (values 0..255 stay one alphabet)."""
    out = []
    i = 0
    n = len(ranks)
    while i < n:
        if ranks[i] != 0:
            out.append(ranks[i])
            i += 1
            continue
        j = i
        while j < n and ranks[j] == 0:
            j += 1
        k = j - i - 1  # run length - 1
        out.append(0)
        while True:
            g = k & 0x7F
            k >>= 7
            out.append(g | 0x80 if k else g)
            if not k:
                break
        i = j
    return out


def _rle0_decode(syms, max_out: int):
    out = []
    i = 0
    n = len(syms)
    while i < n:
        s = syms[i]
        if s != 0:
            out.append(s)
            i += 1
        else:
            i += 1
            k = 0
            shift = 0
            while True:
                if i >= n or shift > 28:
                    return None  # truncated or over-wide run length
                g = syms[i]
                i += 1
                k |= (g & 0x7F) << shift
                shift += 7
                if not g & 0x80:
                    break
            out.extend([0] * (k + 1))
        if len(out) > max_out:
            return None  # bomb bound
    return out


def encode_bwt(text: bytes) -> bytes:
    """Full stack: per-block BWT -> whole-stream MTF -> RLE0 -> adaptive
    range coder. Frame: magic, n_bytes, n_blocks, per-block primary
    index (2B), n_rle symbols, coder body."""
    import struct

    blocks = [
        text[i : i + BWT_BLOCK] for i in range(0, len(text), BWT_BLOCK)
    ]
    lasts = []
    idxs = []
    for b in blocks:
        last, idx = _bwt_forward(b)
        lasts.append(last)
        idxs.append(idx)
    stream = b"".join(lasts)
    rle = _rle0_encode(_mtf_encode(stream))
    body = _rc_encode_syms(rle, 256)
    head = _BWT_MAGIC + struct.pack("<IH", len(text), len(blocks))
    head += b"".join(struct.pack("<H", i) for i in idxs)
    head += struct.pack("<I", len(rle))
    return head + body


def decode_bwt(payload: bytes | None):
    """Invert every stage for real; returns (n_bytes, byte_sum);
    malformed -> NULLs (quarantine, never an abort)."""
    import struct

    bad = (None, None)
    try:
        if payload is None or len(payload) < 13:
            return bad
        if payload[:3] != _BWT_MAGIC:
            return bad
        n_bytes, n_blocks = struct.unpack_from("<IH", payload, 3)
        if n_bytes == 0 or n_bytes > _BWT_MAX_BYTES:
            return bad
        if n_blocks != (n_bytes + BWT_BLOCK - 1) // BWT_BLOCK:
            return bad
        pos = 9
        if pos + 2 * n_blocks + 4 > len(payload):
            return bad
        idxs = [
            struct.unpack_from("<H", payload, pos + 2 * k)[0]
            for k in range(n_blocks)
        ]
        pos += 2 * n_blocks
        (n_rle,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        if n_rle > 2 * n_bytes + 16:
            return bad  # RLE0 never expands beyond 2x + slack
        rle = _rc_decode_syms(payload[pos:], n_rle, 256)
        if rle is None:
            return bad
        ranks = _rle0_decode(rle, n_bytes)
        if ranks is None or len(ranks) != n_bytes:
            return bad
        stream = _mtf_decode(ranks)
        if stream is None:
            return bad
        out = bytearray()
        for k in range(n_blocks):
            last = stream[k * BWT_BLOCK : k * BWT_BLOCK + BWT_BLOCK]
            blk = _bwt_inverse(last, idxs[k])
            if blk is None:
                return bad
            out += blk
        if len(out) != n_bytes:
            return bad
        return (len(out), sum(out))
    except Exception:
        return bad


_BWT_NORM_RE = "[^a-z ]"


@declare(
    "q_bwt_codec",
    oracle=f"""
    WITH norm AS (
        SELECT doc_id,
               regexp_replace(lower(text), '{_BWT_NORM_RE}', '', 'g') AS s
        FROM documents
    )
    SELECT doc_id,
           CAST(length(s) AS BIGINT) AS n_bytes,
           CAST(list_sum(list_transform(
                    generate_series(1, length(s)),
                    i -> ord(substr(s, i, 1)))) AS BIGINT) AS byte_sum
    FROM norm
    WHERE length(s) > 0
    """,
    tier="P1",
)
def q_bwt_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL block-sorting compression round trip over the corpus's own
    text: normalize to the [a-z ] ASCII projection (computed in Spark
    SQL so it provably matches the oracle's regexp), push every
    document through BWT → MTF → RLE0 → the engine's adaptive range
    coder, decode the whole stack back, and emit the decoded byte count
    + byte sum — which DuckDB computes directly from the text, so a
    wrong primary index, a drifted MTF table, a mis-expanded zero run,
    or a desynced coder model cannot hash-match. Sixth entropy-coding
    family (block sorting), first codec over real corpus bytes;
    compression ratio vs the raw projection is pinned in
    tests/test_bwt.py.

    Scale notes: shuffle-free mapInPandas; 256-byte blocks bound the
    rotation sort; linear in corpus bytes at any SF."""
    from mysql_to_clickhouse_sync_spark.shipping import ensure_package_shipped

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace(F.lower(F.col("text")), _BWT_NORM_RE, "").alias("s"),
    ).filter(F.length("s") > 0)
    # CPU-bound Python codec: spread across all cores (see q_tiff_decode)
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    ensure_package_shipped(spark)

    out_schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("n_bytes", LongType(), True),
            StructField("byte_sum", LongType(), True),
        ]
    )

    def batches(bt: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in bt:
            rows = []
            for d, s in zip(batch["doc_id"], batch["s"]):
                nb, bs = decode_bwt(encode_bwt(s.encode("ascii")))
                rows.append((int(d), nb, bs))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "byte_sum"]
            )

    return docs.mapInPandas(batches, schema=out_schema)
