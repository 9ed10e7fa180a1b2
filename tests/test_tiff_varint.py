"""TIFF-LZW (early change) + ZigZag/LEB128 varint codec tests.

The load-bearing pin is the LZW width-schedule contrast: TIFF's decoder
widens at table length 2^w - 2, GIF's at 2^w - 1. A decoder carrying the
GIF rule desynchronizes the moment a stream crosses the 511 boundary —
the first test proves the fixture law crosses it, the second proves the
wrong rule actually breaks there (the regression is observable, not
hypothetical).
"""

import random

import pytest


def _alt_decode_gif_rule(data: bytes, max_out: int):
    """The TIFF decoder with ONE change: the GIF-style late width bump
    (2^w - 1). Used to prove the schedules genuinely diverge."""
    big = int.from_bytes(data, "big")
    total = 8 * len(data)
    pos = 0

    def read(width):
        nonlocal pos
        if pos + width > total:
            return None
        v = (big >> (total - pos - width)) & ((1 << width) - 1)
        pos += width
        return v

    table = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev = None
    out = bytearray()
    while True:
        code = read(width)
        if code is None:
            return None
        if code == 256:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == 257:
            break
        if code < len(table) and (code < 256 or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            return None
        out += entry
        if len(out) > max_out:
            return None
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        if len(table) == (1 << width) - 1 and width < 12:  # GIF rule
            width += 1
        prev = entry
    return bytes(out)


def test_tiff_lzw_roundtrip_all_widths():
    """Round trips across every width boundary (511/1023/2047) and the
    4094 cap reset — random data grows the dictionary maximally."""
    from mysql_to_clickhouse_sync_spark.operators.multimodal import (
        _tiff_lzw_compress,
        _tiff_lzw_decompress,
    )

    rng = random.Random(7)
    for n in (10, 300, 1000, 5000, 20000):
        data = bytes(rng.randrange(256) for _ in range(n))
        assert _tiff_lzw_decompress(_tiff_lzw_compress(data), n) == data
    # compressible data too (the law regime)
    data = bytes((i * 7) % 256 for i in range(4000))
    assert _tiff_lzw_decompress(_tiff_lzw_compress(data), 4000) == data


def test_tiff_early_change_diverges_from_gif_rule():
    """The fixture-law streams cross the 9->10 early-change boundary in
    every document (that is what makes the schedule observable), and a
    decoder carrying the GIF rule must NOT reproduce the data."""
    from mysql_to_clickhouse_sync_spark.operators.multimodal import (
        _tiff_lzw_compress,
        _tiff_lzw_decompress,
        _tiff_pixel,
        tiff_geometry,
    )

    for d in (0, 5, 11):
        w, h, seed = tiff_geometry(d)
        raw = bytearray()
        for y in range(h):
            for x in range(w):
                p = _tiff_pixel(seed, x, y)
                raw.append(
                    p if x == 0 else (p - _tiff_pixel(seed, x - 1, y)) % 256
                )
        raw = bytes(raw)
        enc = _tiff_lzw_compress(raw)
        assert _tiff_lzw_decompress(enc, len(raw)) == raw
        # dictionary must cross 511 (the early-change boundary): a
        # stream that never leaves 9-bit codes cannot pin the schedule
        alt = _alt_decode_gif_rule(enc, len(raw))
        assert alt != raw, d


def test_tiff_container_roundtrip_and_quarantine():
    from mysql_to_clickhouse_sync_spark.operators.multimodal import (
        _tiff_pixel,
        decode_tiff,
        encode_tiff,
        tiff_geometry,
    )

    for d in (0, 1, 7, 123, 999):
        w, h, seed = tiff_geometry(d)
        ww, hh, npx, psum = decode_tiff(encode_tiff(w, h, seed))
        want = sum(_tiff_pixel(seed, x, y) for y in range(h) for x in range(w))
        assert (ww, hh, npx, psum) == (w, h, w * h, want)
    # big-endian header variant parses too (byte-order handling is real)
    assert decode_tiff(b"MM\x00\x2a\x00\x00\x00\x08") == (None,) * 4
    # quarantine: truncation, bad magic, bit flips — never an exception
    pay = encode_tiff(*tiff_geometry(3))
    assert decode_tiff(None) == (None,) * 4
    assert decode_tiff(b"XX" + pay[2:]) == (None,) * 4
    assert decode_tiff(pay[:20]) == (None,) * 4
    rng = random.Random(1)
    for _ in range(150):
        b = bytearray(pay)
        i = rng.randrange(len(b))
        b[i] ^= 1 << rng.randrange(8)
        decode_tiff(bytes(b))  # must never raise


def test_varint_size_formula_matches_encoder():
    """The oracle's closed-form byte count (ceil(bitlen(zigzag)/7), min
    1) must equal the real encoder's output length value-for-value."""
    from mysql_to_clickhouse_sync_spark.operators.tscodec import (
        _zz,
        decode_varints,
        encode_varints,
        varint_geometry,
        _varint_value,
    )

    for d in (0, 3, 42, 555):
        n, seed = varint_geometry(d)
        payload = encode_varints(n, seed)
        want_bytes = 0
        want_sum = 0
        for i in range(n):
            v = _varint_value(seed, i)
            u = _zz(v)
            want_bytes += max(1, (u.bit_length() + 6) // 7)
            want_sum += v
        np_, nbytes, vsum = decode_varints(payload)
        assert (np_, nbytes, vsum) == (n, want_bytes, want_sum)


def test_varint_quarantine():
    from mysql_to_clickhouse_sync_spark.operators.tscodec import (
        decode_varints,
        encode_varints,
        varint_geometry,
    )

    pay = encode_varints(*varint_geometry(9))
    assert decode_varints(None) == (None,) * 3
    assert decode_varints(pay[:-1]) == (None,) * 3  # truncated stream
    assert decode_varints(pay + b"\x00") == (None,) * 3  # trailing slack
    assert decode_varints(b"ZZ" + pay[2:]) == (None,) * 3
    # an over-wide varint (11 continuation bytes) must quarantine
    bad = pay[:7] + b"\x80" * 11 + b"\x00" + pay[8:]
    assert decode_varints(bad) == (None,) * 3
