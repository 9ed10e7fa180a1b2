"""BWT stack tests: stage-level inverses, whole-stack round trip on
real-ish text, compression, quarantine."""

import random


def test_bwt_forward_inverse():
    from mysql_to_clickhouse_sync_spark.operators.bwt import (
        _bwt_forward,
        _bwt_inverse,
    )

    rng = random.Random(3)
    for n in (1, 2, 5, 37, 256):
        for _ in range(10):
            b = bytes(rng.randrange(97, 123) for _ in range(n))
            last, idx = _bwt_forward(b)
            assert _bwt_inverse(last, idx) == b
    # BWT genuinely groups contexts: on repetitive text the transformed
    # stream has longer same-byte runs than the input
    t = b"the quick brown fox " * 12
    last, idx = _bwt_forward(t[:256])

    def runs(s):
        return sum(1 for a, b in zip(s, s[1:]) if a == b)

    assert runs(last) > runs(t[:256])


def test_mtf_rle_inverses():
    from mysql_to_clickhouse_sync_spark.operators.bwt import (
        _mtf_decode,
        _mtf_encode,
        _rle0_decode,
        _rle0_encode,
    )

    rng = random.Random(5)
    for _ in range(20):
        data = bytes(
            rng.choice(b"aab") if rng.random() < 0.7 else rng.randrange(256)
            for _ in range(rng.randrange(1, 400))
        )
        ranks = _mtf_encode(data)
        assert _mtf_decode(ranks) == data
        rle = _rle0_encode(ranks)
        assert _rle0_decode(rle, len(ranks)) == ranks
    # zero-heavy stream genuinely shrinks under RLE0
    zeros = [0] * 300 + [5] + [0] * 100
    assert len(_rle0_encode(zeros)) < 10


def test_bwt_stack_roundtrip_and_compression():
    from mysql_to_clickhouse_sync_spark.operators.bwt import (
        decode_bwt,
        encode_bwt,
    )

    rng = random.Random(7)
    texts = [
        b"a",
        b"the quick brown fox jumps over the lazy dog " * 20,
        bytes(rng.randrange(256) for _ in range(1000)),
        b"x" * 700,
        b"ab" * 500,
    ]
    for t in texts:
        assert decode_bwt(encode_bwt(t)) == (len(t), sum(t))
    # word-salad text (the corpus regime) compresses through the stack
    t = (b"value scan vector batch query column filter spark row " * 12)[:600]
    assert len(encode_bwt(t)) < 0.6 * len(t)


def test_bwt_quarantine():
    from mysql_to_clickhouse_sync_spark.operators.bwt import (
        decode_bwt,
        encode_bwt,
    )

    pay = encode_bwt(b"some words repeated some words repeated " * 10)
    assert decode_bwt(None) == (None, None)
    assert decode_bwt(b"XX" + pay[2:]) == (None, None)
    assert decode_bwt(pay[:-1]) == (None, None)  # range coder slack check
    assert decode_bwt(pay + b"\x00") == (None, None)
    rng = random.Random(1)
    for _ in range(150):
        b = bytearray(pay)
        i = rng.randrange(len(b))
        b[i] ^= 1 << rng.randrange(8)
        decode_bwt(bytes(b))  # must never raise
