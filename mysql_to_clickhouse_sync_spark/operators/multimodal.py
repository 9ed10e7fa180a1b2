"""Multimodal (image/audio/video) column handling for the training-data
pipeline — north-star extension.

Media travels as an opaque `binary` column plus typed metadata; all
byte-level work happens in Arrow-batched pandas iterators (mapInPandas) so
nothing row-at-a-time crosses the JVM/Python boundary.

Codec status, honestly: the IMAGE path is a REAL codec — `encode_bmp` /
`decode_bmp` build and parse valid 24-bit uncompressed BMPs with pure
struct/numpy (magic/bpp/compression validation, row-stride padding), and
`q_image_decode` proves the round trip against a closed-form oracle that
never sees the bytes. Compressed formats and audio/video need
PIL/ffmpeg/librosa, which are NOT in this container, so those kernels are
STUBBED: `decode_media` raises NotImplementedError unless `fake=True`,
in which case a clearly-marked deterministic fake derives metadata from
the bytes. The Spark-side plumbing — schema, batch iteration,
partitioning, UDF signatures — is identical on both paths; a real codec
swaps into the same slot `decode_bmp` occupies.

The fixtures carry no binary table, so `media_table` synthesizes one
deterministically from `documents` (text bytes as payload, media_type cycled
from doc_id) — which also lets q_multimodal_meta be a full oracle-checked
declared query (byte length + md5 + type dispatch are engine-portable).

Scale notes: mapInPandas streams Arrow record batches — peak memory is one
batch, not one partition; decode output schemas are declared up front so the
plan stays columnar; per-media-type processing partitions by media_type
first so a batch holds one codec's work.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.registry import declare

if TYPE_CHECKING:
    import pandas as pd

MEDIA_TYPES = ("image", "audio", "video")

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)


def media_table(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic media table from documents: payload = UTF-8
    text bytes, media_type cycled by doc_id (the binary-column plumbing is
    what's under test — the payload only needs to be opaque bytes)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col("doc_id") % len(MEDIA_TYPES) + 1).cast("int"),
        ).alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
    )


def _fake_decode_one(media_type: str, payload: bytes | None):
    """DETERMINISTIC FAKE decode — stands in for PIL/ffmpeg/librosa, which
    are not installed in this container. Derives plausible metadata purely
    from byte content so tests are reproducible."""
    if payload is None:
        return (None, None, None, None)
    n = len(payload)
    if media_type == "image":
        return (n, (n % 640) + 1, (n % 480) + 1, None)
    if media_type == "video":
        return (n, (n % 1280) + 1, (n % 720) + 1, (n % 120) + 1)
    return (n, None, None, (n % 16000) + 1)  # audio: frames = samples


def decode_media(media: DataFrame, *, fake: bool = False) -> DataFrame:
    """Decode a media table to typed metadata via mapInPandas.

    With fake=False this raises NotImplementedError from the workers — the
    real codecs are not available here; the distributed plumbing is identical
    either way.
    """

    def decode_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            if not fake:
                raise NotImplementedError(
                    "real media codecs (PIL/ffmpeg) are not installed in "
                    "this environment; pass fake=True for the deterministic "
                    "stub decoder"
                )
            decoded = [
                _fake_decode_one(t, p)
                for t, p in zip(batch["media_type"], batch["payload"])
            ]
            out = pd.DataFrame(
                decoded, columns=["n_bytes", "width", "height", "n_frames"]
            )
            out.insert(0, "media_type", batch["media_type"].values)
            out.insert(0, "media_id", batch["media_id"].values)
            yield out

    from mysql_to_clickhouse_sync_spark.shipping import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)
    # Partition by media type first so each Arrow batch is one codec's work.
    return media.repartition("media_type").mapInPandas(
        decode_batches, schema=DECODED_SCHEMA
    )


def frame_sample(media: DataFrame, every_n: int = 10, *, fake: bool = False) -> DataFrame:
    """Sample every n-th 'frame' of video payloads (fake frames = fixed-size
    byte slices). Output: (media_id, frame_idx, frame binary)."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def sample_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            if not fake:
                raise NotImplementedError(
                    "real video decoding is not installed; pass fake=True"
                )
            rows = []
            for mid, payload in zip(batch["media_id"], batch["payload"]):
                if payload is None:
                    continue
                frame_size = 64  # fake: fixed-size byte slices as frames
                frames = [
                    payload[i : i + frame_size]
                    for i in range(0, len(payload), frame_size)
                ]
                for idx in range(0, len(frames), every_n):
                    rows.append((mid, idx, frames[idx]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    from mysql_to_clickhouse_sync_spark.shipping import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)
    return (
        media.filter(F.col("media_type") == "video")
        .repartition("media_id")
        .mapInPandas(sample_batches, schema=out_schema)
    )


# --- Real image codec: 24-bit uncompressed BMP, pure struct/numpy ---------
#
# PIL/ffmpeg are absent, but BMP needs neither: 14-byte file header +
# 40-byte BITMAPINFOHEADER + BGR rows padded to 4-byte strides. The encode
# and decode below handle real format concerns (magic validation, header
# offsets, bpp/compression checks, row-stride padding), so the image half
# of the pipeline is an actual codec, not a stub — audio/video stay
# honestly gated on their missing libraries.

_BMP_HEADER = 54  # 14 file + 40 info


def bmp_geometry(doc_id: int) -> tuple[int, int, int]:
    """Deterministic (width, height, pixel seed) for the synthetic corpus —
    the closed form the oracle re-derives independently."""
    return 4 + doc_id % 13, 3 + doc_id % 7, doc_id % 251


def encode_bmp(width: int, height: int, seed: int) -> bytes:
    """A valid 24-bit BMP whose pixel byte i (in raster order, padding
    excluded) is (seed + 31*i) % 256."""
    import struct

    import numpy as np

    stride = ((3 * width + 3) // 4) * 4
    size = _BMP_HEADER + stride * height
    header = struct.pack(
        "<2sIHHI", b"BM", size, 0, 0, _BMP_HEADER
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, stride * height, 0, 0, 0, 0
    )
    pix = (seed + 31 * np.arange(3 * width * height, dtype=np.int64)) % 256
    rows = pix.reshape(height, 3 * width).astype(np.uint8)
    padded = np.zeros((height, stride), dtype=np.uint8)
    padded[:, : 3 * width] = rows
    return header + padded.tobytes()


def decode_bmp(payload: bytes | None):
    """Parse a 24-bit BMP: returns (width, height, pix_sum) where pix_sum
    is the sum of pixel bytes with row padding STRIPPED — wrong stride
    handling cannot produce the right checksum. Malformed payloads return
    NULLs (the quarantine pattern, not an abort)."""
    import struct

    import numpy as np

    if payload is None or len(payload) < _BMP_HEADER or payload[:2] != b"BM":
        return (None, None, None)
    width = struct.unpack_from("<i", payload, 18)[0]
    height = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0 or width <= 0 or height <= 0:
        return (None, None, None)
    stride = ((3 * width + 3) // 4) * 4
    if len(payload) < _BMP_HEADER + stride * height:
        return (None, None, None)
    data = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=_BMP_HEADER
    ).reshape(height, stride)
    pix = data[:, : 3 * width]  # strip per-row padding
    return (width, height, int(pix.astype(np.int64).sum()))


@declare(
    "q_image_decode",
    oracle=f"""
    WITH geo AS (
        SELECT doc_id AS media_id,
               4 + doc_id % 13 AS width,
               3 + doc_id % 7 AS height,
               doc_id % 251 AS seed
        FROM documents
    )
    SELECT media_id, width, height,
           CAST({_BMP_HEADER} + ((3 * width + 3) // 4) * 4 * height
               AS BIGINT) AS n_bytes,
           CAST(list_sum(list_transform(
                    generate_series(0, 3 * width * height - 1),
                    i -> (seed + 31 * i) % 256)) AS BIGINT) AS pix_sum
    FROM geo
    """,
    tier="P1",
)
def q_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, end to end: synthesize a valid 24-bit BMP per
    document (Arrow-batched pandas UDF), then parse it back with the
    numpy decoder — header validation, stride arithmetic, padding strip —
    inside mapInPandas. The oracle never sees the bytes: it recomputes
    width/height/file size/pixel checksum from the closed-form geometry,
    so a decoder that mis-handles the header layout or the row padding
    cannot hash-match. This is the codec slot the stubbed audio/video
    paths plug into when their libraries exist."""
    from mysql_to_clickhouse_sync_spark.shipping import ensure_package_shipped

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    ensure_package_shipped(spark)

    def encode_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            payloads = [
                encode_bmp(*bmp_geometry(int(d))) for d in batch["doc_id"]
            ]
            yield pd.DataFrame(
                {"media_id": batch["doc_id"].values, "payload": payloads}
            )

    encoded_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("payload", BinaryType(), True),
        ]
    )
    encoded = docs.mapInPandas(encode_batches, schema=encoded_schema)

    decoded_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("n_bytes", LongType(), True),
            StructField("pix_sum", LongType(), True),
        ]
    )

    def decode_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            rows = []
            for mid, payload in zip(batch["media_id"], batch["payload"]):
                w, h, s = decode_bmp(payload)
                n = len(payload) if payload is not None else None
                rows.append((mid, w, h, n, s))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "n_bytes", "pix_sum"],
            )

    return encoded.mapInPandas(decode_batches, schema=decoded_schema)


@declare(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
    tier="P1",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata pass: payload size + content hash + type
    dispatch — the (oracle-checkable) JVM-side half of the multimodal path;
    the decode half is the mapInPandas kernel above."""
    media = media_table(load_table(spark, sf_dir, "documents"))
    return media.select(
        "media_id",
        "media_type",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )
