"""QOI codec tests: per-document op coverage (all five op kinds), spec
arithmetic round trip, compression, quarantine."""

import random
import struct


def _op_census(payload: bytes) -> dict:
    """Walk the chunk stream tag-by-tag (no pixel state) and census op
    kinds — independent of the decoder under test."""
    ops = {"run": 0, "index": 0, "diff": 0, "luma": 0, "rgb": 0}
    pos = 14
    end = len(payload) - 8
    while pos < end:
        b0 = payload[pos]
        pos += 1
        if b0 == 0xFE:
            ops["rgb"] += 1
            pos += 3
        else:
            tag = b0 >> 6
            if tag == 0:
                ops["index"] += 1
            elif tag == 1:
                ops["diff"] += 1
            elif tag == 2:
                ops["luma"] += 1
                pos += 1
            else:
                ops["run"] += 1
    return ops


def test_qoi_roundtrip_and_full_op_coverage():
    from mysql_to_clickhouse_sync_spark.operators.multimodal import (
        _qoi_pixel,
        decode_qoi,
        encode_qoi,
        qoi_geometry,
    )

    for d in (0, 1, 17, 55, 123, 998):
        w, h, seed = qoi_geometry(d)
        pay = encode_qoi(w, h, seed)
        ww, hh, npx, psum = decode_qoi(pay)
        want = sum(sum(_qoi_pixel(seed, i)) for i in range(w * h))
        assert (ww, hh, npx, psum) == (w, h, w * h, want)
        ops = _op_census(pay)
        assert all(v > 0 for v in ops.values()), (d, ops)  # all 5 kinds
        assert len(pay) < 0.5 * 3 * w * h  # genuinely compresses


def test_qoi_cache_is_load_bearing():
    """Flipping the cache-hash multiplier convention would break INDEX
    ops: encode with the spec hash, then decode with a decoder whose
    cache is poisoned — simulated by corrupting one INDEX chunk's slot
    number; the strict pixel-law mismatch must surface as a different
    pix_sum or a quarantine, never a silent pass."""
    from mysql_to_clickhouse_sync_spark.operators.multimodal import (
        _qoi_pixel,
        decode_qoi,
        encode_qoi,
        qoi_geometry,
    )

    w, h, seed = qoi_geometry(17)
    pay = bytearray(encode_qoi(w, h, seed))
    want = sum(sum(_qoi_pixel(seed, i)) for i in range(w * h))
    pos = 14
    end = len(pay) - 8
    flipped = False
    while pos < end:
        b0 = pay[pos]
        if b0 == 0xFE:
            pos += 4
        elif (b0 >> 6) == 0:
            pay[pos] = (b0 + 1) % 64  # point at a different cache slot
            flipped = True
            break
        elif (b0 >> 6) == 2:
            pos += 2
        else:
            pos += 1
    assert flipped
    got = decode_qoi(bytes(pay))
    assert got[3] is None or got[3] != want


def test_qoi_quarantine():
    from mysql_to_clickhouse_sync_spark.operators.multimodal import (
        decode_qoi,
        encode_qoi,
        qoi_geometry,
    )

    pay = encode_qoi(*qoi_geometry(5))
    assert decode_qoi(None) == (None,) * 4
    assert decode_qoi(b"qoix" + pay[4:]) == (None,) * 4
    assert decode_qoi(pay[:-1]) == (None,) * 4  # broken end marker
    assert decode_qoi(pay + b"\x00") == (None,) * 4
    # a header promising more pixels than the stream carries quarantines
    big = bytearray(pay)
    big[4:8] = struct.pack(">I", 4096)
    assert decode_qoi(bytes(big)) == (None,) * 4
    rng = random.Random(2)
    for _ in range(150):
        b = bytearray(pay)
        i = rng.randrange(len(b))
        b[i] ^= 1 << rng.randrange(8)
        decode_qoi(bytes(b))  # must never raise
