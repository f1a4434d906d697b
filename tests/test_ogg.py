"""Ogg container metadata tests: CRC correctness, Vorbis/Opus id
headers, granule-derived durations, fuzz."""

from __future__ import annotations

import numpy as np

from deltalake2db_spark.operators.ogg import (
    encode_ogg_meta,
    ogg_crc,
    parse_ogg_meta,
)


def test_ogg_crc_matches_bitwise_reference():
    import os

    def crc_ref(data):
        crc = 0
        for b in data:
            crc ^= b << 24
            for _ in range(8):
                crc = (
                    ((crc << 1) ^ 0x04C11DB7) & 0xFFFFFFFF
                    if crc & 0x80000000
                    else (crc << 1) & 0xFFFFFFFF
                )
        return crc

    rng = np.random.RandomState(4)
    for n in (0, 1, 7, 64, 300):
        d = bytes(rng.randint(0, 256, n, dtype=np.uint8))
        assert ogg_crc(d) == crc_ref(d)


def test_vorbis_and_opus_meta():
    m = parse_ogg_meta(encode_ogg_meta("vorbis", 2, 44100, 44100 * 3))
    assert m == {"codec": "vorbis", "channels": 2,
                 "sample_rate": 44100, "pre_skip": 0, "n_pages": 2,
                 "duration_ms": 3000}
    m = parse_ogg_meta(
        encode_ogg_meta("opus", 1, 16000, 48000 * 2, pre_skip=312)
    )
    assert m["codec"] == "opus" and m["sample_rate"] == 16000
    assert m["duration_ms"] == 2000  # pre-skip subtracted exactly


def test_malformed_ogg():
    assert parse_ogg_meta(None) is None
    assert parse_ogg_meta(b"") is None
    assert parse_ogg_meta(b"OggS but not really a page") is None
    rng = np.random.RandomState(2)
    v = encode_ogg_meta("vorbis", 2, 44100, 44100)
    o = encode_ogg_meta("opus", 1, 24000, 48000)
    for i in range(200):
        buf = bytearray(v if i % 2 else o)
        if i % 3 == 0:
            buf = buf[: rng.randint(1, len(buf))]
        else:
            for _ in range(rng.randint(1, 6)):
                buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
        out = parse_ogg_meta(bytes(buf))
        assert out is None or out["codec"] in ("vorbis", "opus")
